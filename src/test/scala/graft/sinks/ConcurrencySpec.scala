package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Optimistic concurrency on the snapshot store: two writers that both
  * derived from the same base must not silently lose one update to the
  * pointer swap (the lost-update anomaly a bare last-writer-wins
  * pointer permits). `writeIfCurrent` commits only if the writer's
  * base is still current; `commitWithRetry` is the standard
  * read-derive-commit loop over it.
  */
class ConcurrencySpec extends SparkSpecBase {

  private def mkStore(): ParquetIndex = {
    import spark.implicits._
    val idx = new ParquetIndex(
      Files.createTempDirectory("occ").toString, writeFiles = 1)
    idx.write(Seq(("a", 1L, 1L), ("b", 1L, 1L)).toDF("k", "ts", "v")): Unit
    idx
  }

  test("a stale writer is refused: pointer, manifest and live data " +
    "untouched, its snapshot dir removed") {
    import spark.implicits._
    val idx = mkStore()
    val base = idx.currentId
    // writer 1 wins the race
    val id1 = idx.writeIfCurrent(
      Seq(("a", 2L, 10L), ("b", 1L, 1L)).toDF("k", "ts", "v"), base)
    assert(id1.isDefined && idx.currentId == id1)
    // writer 2 derived from the SAME base — must be refused
    val history = idx.history
    val id2 = idx.writeIfCurrent(
      Seq(("a", 1L, 1L), ("b", 2L, 20L)).toDF("k", "ts", "v"), base)
    assert(id2.isEmpty)
    assert(idx.currentId == id1 && idx.history == history)
    val got = idx.read(spark).get.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("a" -> 10L, "b" -> 1L)) // winner's state intact
    // the loser's dangling dir is gone (nothing for pruning to trip on)
    val root = java.nio.file.Paths.get(
      idx.read(spark).get.inputFiles.head
        .stripPrefix("file:")).getParent.getParent
    val snaps = root.toFile.listFiles
      .count(f => f.getName.startsWith("snap-"))
    assert(snaps == idx.history.size,
      s"dangling snapshot dirs: $snaps vs ${idx.history.size}")
  }

  test("the refused writer retries against the winner's state and " +
    "neither update is lost") {
    import spark.implicits._
    val idx = mkStore()
    val base = idx.currentId
    idx.writeIfCurrent(
      Seq(("a", 2L, 10L), ("b", 1L, 1L)).toDF("k", "ts", "v"), base): Unit
    // loser's retry: re-read current, re-apply ITS change (bump b)
    val (_, attempts) = idx.commitWithRetry(spark, "k", "ts", cur =>
      cur.get.withColumn("v",
        when(col("k") === "b", lit(20L)).otherwise(col("v")))
        .withColumn("ts",
          when(col("k") === "b", lit(2L)).otherwise(col("ts"))))
    assert(attempts == 1)
    val got = idx.read(spark).get.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("a" -> 10L, "b" -> 20L)) // BOTH updates present
  }

  test("N racing increment writers all land: the counter reaches N " +
    "(the lost-update litmus), even through differently-spelled " +
    "handles on one store") {
    import spark.implicits._
    val root = Files.createTempDirectory("occN").toString
    val idx = new ParquetIndex(root, writeFiles = 1)
    // a second handle with a different spelling of the same root: both
    // must share the commit monitor (pre-normalization this raced to
    // OverlappingFileLockException at the OS file lock)
    val idx2 = new ParquetIndex(root + "/", writeFiles = 1)
    idx.write(Seq(("ctr", 0L, 0L)).toDF("k", "ts", "v")): Unit
    val n = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val tasks = (1 to n).map { i =>
        val handle = if (i % 2 == 0) idx else idx2
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = handle.commitWithRetry(spark, "k", "ts", cur =>
            cur.get.withColumn("v", col("v") + 1L)
              .withColumn("ts", col("ts") + 1L))._2
        })
      }
      val attempts = tasks.map(_.get(300,
        java.util.concurrent.TimeUnit.SECONDS))
      val v = idx.read(spark).get
        .filter(col("k") === "ctr").collect()(0).getLong(2)
      assert(v == n.toLong,
        s"lost updates: counter $v after $n writers ($attempts)")
    } finally pool.shutdownNow()
  }
}
