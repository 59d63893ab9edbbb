package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The probe's kernel must BE the gated query's segment arithmetic —
  * PackProbe mirrors packSegments rather than calling it (so the probe
  * times the window + explode, not tokenization), and this spec pins
  * the mirror: on the real documents table, the probe kernel over the
  * same (doc_id, nt) frame reproduces `docs_pack_segments`' segments
  * exactly (modulo seg_idx, which the probe doesn't rank).
  */
class PackProbeSpec extends SparkSpecBase {

  test("probe kernel ≡ docs_pack_segments' segment arithmetic") {
    val sf = "/root/testdata/sf0.001"
    val nts = SparkEntry.queries("docs_pack_segments")(spark, sf)
    val fromQuery = nts
      .select("pack_id", "doc_id", "doc_from", "seg_len", "pack_off")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    // the probe kernel on the same (doc_id, nt) frame, global window
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        expr("size(split(text, ' '))").cast("long").as("nt"))
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fromProbe = PackProbe.segments(docs, w, Nil)
      .select("pack_id", "doc_id", "doc_from", "seg_len", "pack_off")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(fromProbe == fromQuery)
  }
}
