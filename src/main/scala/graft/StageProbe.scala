package graft

import scala.collection.mutable

import org.apache.spark.scheduler._

/** Per-stage timing probe for one declared query (optimization guide
  * §1.1 "empirical loop" without the UI, which bench sessions disable):
  * `graft.StageProbe <query> [sfDir]` runs the query exactly like
  * [[QueryTime]] (same session, same staged inputs, warmup + one timed
  * run) and prints, for the TIMED run only, every stage's wall clock,
  * summed task time, shuffle read/write and spill, tagged with the
  * stage's callsite — the "which operator owns the seconds" question
  * every optimization here starts from.
  */
object StageProbe {

  private final case class StageRow(
      id: Int, name: String, wallMs: Long, taskMs: Long,
      readMb: Double, writeMb: Double, spillMb: Double, tasks: Int)

  private final class Listener extends SparkListener {
    val rows = new mutable.ArrayBuffer[StageRow]
    private val taskMs = new mutable.HashMap[Int, Long]
    private val read = new mutable.HashMap[Int, Long]
    private val write = new mutable.HashMap[Int, Long]
    private val spill = new mutable.HashMap[Int, Long]
    private val nTasks = new mutable.HashMap[Int, Int]
    @volatile var enabled = false

    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = if (enabled) {
      val m = e.taskMetrics
      if (m != null) synchronized {
        val sid = e.stageId
        taskMs(sid) = taskMs.getOrElse(sid, 0L) + m.executorRunTime
        read(sid) = read.getOrElse(sid, 0L) +
          m.shuffleReadMetrics.totalBytesRead
        write(sid) = write.getOrElse(sid, 0L) +
          m.shuffleWriteMetrics.bytesWritten
        spill(sid) = spill.getOrElse(sid, 0L) +
          m.memoryBytesSpilled + m.diskBytesSpilled
        nTasks(sid) = nTasks.getOrElse(sid, 0) + 1
      }
    }

    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      if (enabled) synchronized {
        val i = e.stageInfo
        val wall = (for {
          a <- i.completionTime; b <- i.submissionTime
        } yield a - b).getOrElse(0L)
        val sid = i.stageId
        rows += StageRow(sid, i.name.takeWhile(_ != '\n'), wall,
          taskMs.getOrElse(sid, 0L), read.getOrElse(sid, 0L) / 1048576.0,
          write.getOrElse(sid, 0L) / 1048576.0,
          spill.getOrElse(sid, 0L) / 1048576.0, nTasks.getOrElse(sid, 0))
      }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.StageProbe <query> [sfDir]")
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name"))
    val reshard = !sys.env.get("SPARK_GRAFT_BENCH_RESHARD").contains("0")
    val dir =
      if (reshard) Bench.stageResharded(spark, sfDir)._1 else sfDir
    val listener = new Listener
    spark.sparkContext.addSparkListener(listener)
    Bench.checksum(fn(spark, dir)) // warmup (codegen, caches, broadcast)
    Bench.checksum(fn(spark, dir)) // second warmup = bench's min-of-2 shape
    Thread.sleep(300)
    listener.enabled = true
    val t0 = System.nanoTime()
    Bench.checksum(fn(spark, dir))
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // listener events post asynchronously
    listener.enabled = false
    println(f"== $name timed run: $sec%.3f s, " +
      s"${listener.rows.length} stages ==")
    println(f"${"stage"}%6s ${"wall_ms"}%8s ${"task_ms"}%8s " +
      f"${"tasks"}%5s ${"read"}%7s ${"write"}%7s ${"spill"}%7s  name")
    listener.rows.sortBy(-_.wallMs).foreach { r =>
      println(f"${r.id}%6d ${r.wallMs}%8d ${r.taskMs}%8d ${r.tasks}%5d " +
        f"${r.readMb}%7.1f ${r.writeMb}%7.1f ${r.spillMb}%7.1f  ${r.name}")
    }
    if (dir != sfDir) Bench.rm(java.nio.file.Paths.get(dir))
    spark.stop()
  }
}
