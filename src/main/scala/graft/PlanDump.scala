package graft

/** Plan inspection main: `graft.PlanDump <query> [sfDir]` prints the
  * FORMATTED physical plan of a declared query — the artifact every
  * scale claim in COVERAGE.md/PERF.md reduces to (PushedFilters,
  * ReadSchema, exchange keys, WholeStageCodegen spans). One command to
  * audit a plan instead of pasting query code into a REPL; the same
  * session config as Bench/QueryTime so the plan matches what the
  * bench actually ran.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.PlanDump <query|ALL> [sfDir]")
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val qs = SparkEntry.queries
    val names =
      if (args(0) == "ALL") qs.keys.toSeq.sorted
      else {
        require(qs.contains(args(0)),
          s"unknown query '${args(0)}' — declared: " +
            qs.keys.toSeq.sorted.mkString(", "))
        Seq(args(0))
      }
    names.foreach { n =>
      println(s"==== $n ====")
      try qs(n)(spark, sfDir).explain("formatted")
      catch {
        case e: Throwable =>
          println(s"[plandump] $n failed to plan: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
