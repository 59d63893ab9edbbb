package graft.sources

import graft.SparkSpecBase

/** Hermetic S5 traversal: fake listing API over an in-memory tree.
  * Covers BFS completeness, skip pruning (subtrees never fetched),
  * hidden filtering, seen-path dedup, and ns→µs conversion (F10).
  */
object FakeApi {
  import RestWalker.ApiEntry
  // path → children
  val tree: Map[String, Seq[ApiEntry]] = Map(
    "/fs" -> Seq(
      ApiEntry("/fs/a", "directory", 0L, 1700000000000000000L),
      ApiEntry("/fs/b", "directory", 0L, 1700000000000000000L),
      ApiEntry("/fs/.git", "directory", 0L, 1700000000000000000L),
      ApiEntry("/fs/top.txt", "file", 5L, 1700000001500000000L)),
    "/fs/a" -> Seq(
      ApiEntry("/fs/a/f1.bin", "file", 10L, 1700000002000000000L),
      ApiEntry("/fs/a/skipme", "directory", 0L, 1700000000000000000L)),
    "/fs/a/skipme" -> Seq(
      ApiEntry("/fs/a/skipme/huge.bin", "file", 999L, 1700000000000000000L)),
    "/fs/b" -> Seq(
      ApiEntry("/fs/b/f2.bin", "file", 20L, 1700000003000000000L)),
    "/fs/.git" -> Seq(
      ApiEntry("/fs/.git/conf", "file", 1L, 1700000000000000000L)))

  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  val fetch: RestWalker.Fetch = new RestWalker.Fetch {
    def apply(dir: String): Seq[RestWalker.ApiEntry] = {
      calls.add(dir)
      tree.getOrElse(dir, Nil)
    }
  }
}

class RestWalkerSpec extends SparkSpecBase {

  test("BFS lists the whole tree minus skipped/hidden subtrees") {
    FakeApi.calls.clear()
    val df = RestWalker.traverse(spark, FakeApi.fetch, "/fs",
      skipPatterns = Seq("skipme"))
    val paths = df.collect().map(_.getAs[String]("path")).toSet
    assert(paths == Set("/fs/a", "/fs/b", "/fs/top.txt", "/fs/a/f1.bin",
      "/fs/b/f2.bin"))
    // pruned: the skipme AND hidden subtrees were never even fetched
    // (pushdown — their rows would all be dropped post-filter anyway)
    import scala.jdk.CollectionConverters._
    assert(!FakeApi.calls.asScala.toSet.contains("/fs/a/skipme"))
    assert(!FakeApi.calls.asScala.toSet.contains("/fs/.git"))
  }

  test("ns epochs become µs timestamps (F10)") {
    val df = RestWalker.traverse(spark, FakeApi.fetch, "/fs")
    val m = df.collect().map(r => r.getAs[String]("path") ->
      r.getAs[java.sql.Timestamp]("modified_time")).toMap
    assert(m("/fs/top.txt").getTime == 1700000001500L)
  }

  test("the distributed-frontier twin returns the identical row set " +
      "with the identical fetch pruning — and no path ever rides a " +
      "driver collect") {
    FakeApi.calls.clear()
    val dist = RestWalker.traverseDistributed(spark, FakeApi.fetch, "/fs",
      skipPatterns = Seq("skipme"))
    val distRows = dist.collect()
      .map(r => (r.getAs[String]("path"), r.getAs[String]("entry_type"),
        r.getAs[Long]("size_bytes"),
        r.getAs[java.sql.Timestamp]("modified_time"))).toSet
    import scala.jdk.CollectionConverters._
    val fetched = FakeApi.calls.asScala.toSet
    assert(!fetched.contains("/fs/a/skipme"), "skip pruning must reach " +
      "the distributed frontier before the fetch")
    assert(!fetched.contains("/fs/.git"))
    FakeApi.calls.clear()
    val par = RestWalker.traverse(spark, FakeApi.fetch, "/fs",
      skipPatterns = Seq("skipme"))
    val parRows = par.collect()
      .map(r => (r.getAs[String]("path"), r.getAs[String]("entry_type"),
        r.getAs[Long]("size_bytes"),
        r.getAs[java.sql.Timestamp]("modified_time"))).toSet
    assert(distRows == parRows)
  }

  test("per-level checkpoint volume ∝ frontier: a traversal " +
      "materializes root + (listing, frontier) per level and NEVER " +
      "the cumulative seen union") {
    // r13 shape re-checkpointed seen = union(all levels) every level —
    // one extra persistent RDD per level whose SIZE grows with the
    // whole tree (O(depth × total_dirs) checkpoint I/O). The fixture
    // walks 2 levels (root-frontier, then {a,b}, then empty), so the
    // per-level discipline admits at most 1 + 2×2 = 5 new persisted
    // RDDs; the cumulative-union shape would add 2 more.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    RestWalker.traverseDistributed(spark, FakeApi.fetch, "/fs",
      skipPatterns = Seq("skipme")).collect()
    val created =
      spark.sparkContext.getPersistentRDDs.keySet.diff(before).size
    assert(created <= 5,
      s"$created persistent RDDs created — the seen union is being " +
        "re-materialized per level")
  }

  test("the distributed twin dedups re-discovered directories (SO4): " +
      "a diamond tree fetches each directory exactly once") {
    DiamondApi.calls.clear()
    val rows = RestWalker.traverseDistributed(spark, DiamondApi.fetch, "/r")
      .collect().map(_.getAs[String]("path"))
    import scala.jdk.CollectionConverters._
    assert(DiamondApi.calls.asScala.count(_ == "/r/shared") == 1)
    assert(rows.count(_ == "/r/shared/leaf.txt") == 1)
  }
}

/** Two parents both list the same child directory. Call tracking lives
  * on a top-level object (static access from deserialized task
  * closures — a captured local queue would be a per-task COPY and
  * record nothing).
  */
object DiamondApi {
  import RestWalker.ApiEntry
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val fetch: RestWalker.Fetch = new RestWalker.Fetch {
    def apply(d: String): Seq[ApiEntry] = {
      calls.add(d)
      d match {
        case "/r" => Seq(
          ApiEntry("/r/p1", "directory", 0L, 1700000000000000000L),
          ApiEntry("/r/p2", "directory", 0L, 1700000000000000000L))
        case "/r/p1" | "/r/p2" => Seq(
          ApiEntry("/r/shared", "directory", 0L, 1700000000000000000L))
        case "/r/shared" => Seq(
          ApiEntry("/r/shared/leaf.txt", "file", 3L, 1700000000000000000L))
        case _ => Nil
      }
    }
  }
}
