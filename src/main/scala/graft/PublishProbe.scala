package graft

import java.nio.file.{Files, Path}

import graft.pipeline.{Indexer, IndexerConfig}
import graft.sinks.EsSink

/** Incremental-vs-full PUBLISH cost probe (r13 verdict #2's PERF row):
  * the claim behind [[graft.pipeline.Indexer.publishScoped]] is that
  * an event-driven deployment pays scan + rollup + ES traffic ∝ the
  * changed scope, while the reference re-walks, re-aggregates and
  * re-publishes the corpus every run (main.py:245-365). This main
  * builds a real on-disk tree of `files` entries, runs the full
  * pipeline once (base state), then mutates a single subdir
  * (delete/resize/add) and times
  *   - `full`: a complete re-run (rescan + merge + rollup + publish
  *     of every doc — the reference's only mode),
  *   - `scoped`: [[Indexer.publishScoped]] on the one changed dir.
  * ES traffic is counted through a no-op transport, so the numbers
  * are engine cost, not network.
  *
  * usage: `graft.PublishProbe [nFiles...]` (defaults 10000 50000);
  * prints one JSON line per size.
  */
object PublishProbe {

  /** JVM-static line counter: the transport closure is SERIALIZED into
    * the sink's foreachPartition task, so instance state would count
    * on a deserialized copy (always zero back on the driver, local
    * mode included); a singleton's field resolves to the one true
    * object in this JVM — the same trick the specs' TransportProbe
    * uses. Measurement-only; production transports carry no state.
    */
  private object CountingTransport {
    val lines = new java.util.concurrent.atomic.AtomicLong
  }

  private final class CountingTransport extends EsSink.Transport {
    def lines: java.util.concurrent.atomic.AtomicLong =
      CountingTransport.lines
    def apply(batch: Seq[String]): Seq[Int] = {
      CountingTransport.lines.addAndGet(batch.size): Unit
      batch.filter(l => l.startsWith("{\"index\":") ||
        l.startsWith("{\"delete\":")).map(_ => 200)
    }
  }

  private def mkTree(root: Path, nFiles: Int): Unit = {
    val perDir = 50
    val nDirs = math.max(1, nFiles / perDir)
    (0 until nDirs).foreach { di =>
      val dir = root.resolve(f"top${di % 16}%02d/d$di%05d")
      Files.createDirectories(dir)
      (0 until perDir).foreach { fi =>
        Files.writeString(dir.resolve(f"f$fi%03d.dat"),
          "x" * (10 + (di + fi) % 90)): Unit
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(10000, 50000)
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    sizes.foreach { n =>
      val root = Files.createTempDirectory(s"pubprobe$n")
      mkTree(root, n)
      val idxRoot = Files.createTempDirectory(s"pubstore$n").toString
      val t = new CountingTransport
      val indexer = new Indexer(
        IndexerConfig(root.toString, idxRoot, getDirectLinks = false),
        Some(t))
      indexer.run(spark) // base state: snapshot + rollup + full publish
      // the delta: one subdir — delete 10, resize 10, add 10
      val dir = root.resolve("top00/d00000")
      (0 until 10).foreach(i =>
        Files.delete(dir.resolve(f"f$i%03d.dat")))
      (10 until 20).foreach(i =>
        Files.writeString(dir.resolve(f"f$i%03d.dat"), "y" * 500): Unit)
      (0 until 10).foreach(i =>
        Files.writeString(dir.resolve(f"new$i%02d.dat"), "z" * 77): Unit)
      t.lines.set(0)
      val (scopedRep, scopedSec) =
        timed(indexer.publishScoped(spark, Seq("top00/d00000")))
      val scopedLines = t.lines.get()
      // second, disjoint delta for the full-rerun leg (same shape)
      val dir2 = root.resolve("top01/d00001")
      (0 until 10).foreach(i =>
        Files.delete(dir2.resolve(f"f$i%03d.dat")))
      (10 until 20).foreach(i =>
        Files.writeString(dir2.resolve(f"f$i%03d.dat"), "y" * 500): Unit)
      (0 until 10).foreach(i =>
        Files.writeString(dir2.resolve(f"new$i%02d.dat"), "z" * 77): Unit)
      t.lines.set(0)
      val (fullRep, fullSec) = timed(indexer.run(spark))
      // third, disjoint delta, indexed WITHOUT publishing (the bare
      // runScoped interlude) — publishCatchUp then replays exactly
      // that churn from the MOR log suffix; its cost column proves
      // repair traffic ∝ the unpublished churn, never the corpus
      val dir3 = root.resolve("top02/d00002")
      (0 until 10).foreach(i =>
        Files.delete(dir3.resolve(f"f$i%03d.dat")))
      (10 until 20).foreach(i =>
        Files.writeString(dir3.resolve(f"f$i%03d.dat"), "y" * 500): Unit)
      (0 until 10).foreach(i =>
        Files.writeString(dir3.resolve(f"new$i%02d.dat"), "z" * 77): Unit)
      indexer.runScoped(spark, Seq("top02/d00002"))
      t.lines.set(0)
      val (cuRep, cuSec) = timed(indexer.publishCatchUp(spark))
      val cuLines = t.lines.get()
      println(s"""{"files":$n,"scoped_sec":${f"$scopedSec%.2f"},""" +
        s""""full_sec":${f"$fullSec%.2f"},""" +
        s""""catchup_sec":${f"$cuSec%.2f"},""" +
        s""""scoped_docs":${scopedRep.indexed},""" +
        s""""full_docs":${fullRep.indexed},""" +
        s""""catchup_docs":${cuRep.indexed},""" +
        s""""scoped_bulk_lines":$scopedLines,""" +
        s""""catchup_bulk_lines":$cuLines,""" +
        s""""scoped_removed":${scopedRep.removed},""" +
        s""""full_removed":${fullRep.removed},""" +
        s""""catchup_removed":${cuRep.removed}}""")
      Bench.rm(root)
      Bench.rm(java.nio.file.Paths.get(idxRoot))
    }
    spark.stop()
  }
}
