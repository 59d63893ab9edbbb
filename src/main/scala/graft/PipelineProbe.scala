package graft

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Stage/job-level probe of the BENCH's pipeline legs (the files/s
  * numbers the driver compares against the reference's measured sweep):
  * builds the same 100×200 on-disk tree, runs the index-only and
  * ES-mode [[pipeline.Indexer]] passes, and prints every job and its
  * stages with wall/CPU/shuffle — the per-action cost breakdown the
  * aggregate files/s number hides. usage: `graft.PipelineProbe [mode]`
  * (mode ∈ index-only | elasticsearch | both, default both).
  */
object PipelineProbe {

  private final class Listener extends SparkListener {
    case class J(id: Int, desc: String, var wallMs: Long,
        var taskMs: Long = 0L, var stages: Int = 0)
    val jobs = new mutable.ArrayBuffer[J]
    private val byJob = new mutable.HashMap[Int, J]
    private val stageJob = new mutable.HashMap[Int, Int]
    private val t0j = new mutable.HashMap[Int, Long]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val j = J(e.jobId, Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(e.stageInfos.headOption.map(_.name.takeWhile(_ != '\n')))
        .getOrElse(""), 0L)
      byJob(e.jobId) = j
      jobs += j
      t0j(e.jobId) = e.time
      e.stageIds.foreach(s => stageJob(s) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      byJob.get(e.jobId).foreach(_.wallMs = e.time - t0j(e.jobId))
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      val m = e.taskMetrics
      if (m != null) stageJob.get(e.stageId).flatMap(byJob.get).foreach {
        j => j.taskMs += m.executorRunTime
      }
    }
    override def onStageCompleted(
        e: SparkListenerStageCompleted): Unit = synchronized {
      stageJob.get(e.stageInfo.stageId).flatMap(byJob.get)
        .foreach(_.stages += 1)
    }
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("both")
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val root = java.nio.file.Files.createTempDirectory("pipeprobe")
    val dirs = 100
    val filesPerDir = 200
    for (d <- 0 until dirs) {
      val dir = root.resolve(f"d$d%03d/sub")
      java.nio.file.Files.createDirectories(dir)
      for (f <- 0 until filesPerDir)
        java.nio.file.Files.writeString(dir.resolve(s"f$f.dat"), "x")
    }
    val listener = new Listener
    def leg(name: String, esMode: Boolean): Unit = {
      val idxRoot = java.nio.file.Files.createTempDirectory(s"pp-$name")
      val cfg = pipeline.IndexerConfig(root.toString, idxRoot.toString,
        mode = if (esMode) "elasticsearch" else "index-only")
      val transport = if (esMode) Some(new sinks.EsSink.Transport {
        def apply(lines: Seq[String]): Seq[Int] =
          Seq.fill(lines.count(l => l.startsWith("{\"index\"") ||
            l.startsWith("{\"delete\"")))(200)
      }) else None
      val fetch = if (esMode) Some(new pipeline.LinkRefresh.Fetch {
        def apply(fp: String, cached: Option[String]) =
          Some(pipeline.LinkRefresh.FetchedLink(
            "https://fs.example/bench", cached.orElse(Some("fse-bench"))))
      }) else None
      // warmup pass on a scratch store (codegen paths)
      new pipeline.Indexer(cfg.copy(indexRoot = java.nio.file.Files
        .createTempDirectory(s"ppw-$name").toString), transport,
        linkFetch = fetch).run(spark)
      listener.jobs.synchronized { listener.jobs.clear() }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val rep = new pipeline.Indexer(cfg, transport, linkFetch = fetch)
        .run(spark)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      println(f"== $name: $sec%.3f s, ${rep.stats.files} files " +
        f"(${rep.stats.files / sec}%.0f files/s), " +
        s"${listener.jobs.length} jobs ==")
      println(f"${"job"}%4s ${"wall_ms"}%8s ${"task_ms"}%8s " +
        f"${"stages"}%6s  description")
      listener.jobs.sortBy(-_.wallMs).foreach { j =>
        println(f"${j.id}%4d ${j.wallMs}%8d ${j.taskMs}%8d " +
          f"${j.stages}%6d  ${j.desc.take(90)}")
      }
    }
    if (mode == "both" || mode == "index-only") leg("index-only", false)
    if (mode == "both" || mode == "elasticsearch")
      leg("elasticsearch", true)
    Bench.rm(root)
    spark.stop()
  }
}
