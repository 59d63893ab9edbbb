package graft.stats

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

import graft.functions.SizeFormat

/** A8/A9: run statistics — the reference's WorkflowStats counters
  * (utils/workflow_stats.py:30-70: files/dirs/bytes/rates) collected in
  * ONE pass with `observe` (no second scan, no driver-side loop;
  * accumulated map-side during whatever action consumes the frame).
  */
object RunStats {

  final case class Stats(
      files: Long, dirs: Long, bytes: Long, elapsedSec: Double) {
    def filesPerSec: Double = if (elapsedSec > 0) files / elapsedSec else 0.0
    /** workflow_stats.py:49-70 log_summary parity. */
    def summary: String =
      f"indexed $files files, $dirs dirs, ${SizeFormat.formatSize(bytes)} " +
        f"in $elapsedSec%.1f s (${filesPerSec}%.0f files/s)"
  }

  /** Attach scan counters to `df`; read them with [[collect]] after any
    * action has consumed the observed frame.
    */
  def observed(df: DataFrame, typeCol: String = "entry_type",
      sizeCol: String = "size_bytes"): (DataFrame, Observation) = {
    val obs = Observation()
    val observed = df.observe(obs,
      sum(when(col(typeCol) === "file", 1L).otherwise(0L)).as("files"),
      sum(when(col(typeCol) === "directory", 1L).otherwise(0L)).as("dirs"),
      coalesce(sum(when(col(typeCol) === "file", col(sizeCol))), lit(0L))
        .as("bytes"))
    (observed, obs)
  }

  def collect(obs: Observation, elapsedSec: Double): Stats = {
    val m = obs.get
    Stats(
      m.get("files").fold(0L)(_.asInstanceOf[Long]),
      m.get("dirs").fold(0L)(_.asInstanceOf[Long]),
      m.get("bytes").fold(0L)(_.asInstanceOf[Long]),
      elapsedSec)
  }
}
