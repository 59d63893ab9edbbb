package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness: `graft.QueryTime <query> [sfDir]` —
  * same methodology as [[Bench]] (checksum-forced evaluation, warmup,
  * min of two timed runs) for one named query, so optimization
  * experiments measure exactly one plan without the full headline run.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.QueryTime <query> [sfDir]")
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name (known: " +
        s"${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
    import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}
    def checksum(): Long = {
      val df = fn(spark, sfDir)
      val row = df.select(
        xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()(0)
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }
    checksum() // warmup
    val timed = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val chk = checksum()
      ((System.nanoTime() - t0) / 1e9, chk)
    }
    val (sec, chk) = timed.minBy(_._1)
    println(f"""{"query":"$name","sec":$sec%.3f,"checksum":$chk,"sf":"$sfDir"}""")
    spark.stop()
  }
}
