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
}
