package graft.sinks

/** S12: Kibana saved-objects setup (reference:
  * kibana_data_views.py:245-333 — NDJSON import of a data view + default
  * search over the files index). Out-of-engine utility: builds the exact
  * payload; posting goes through the same pluggable-transport idea as
  * [[EsSink]] so it is testable without a Kibana.
  */
object KibanaSetup {

  /** Field list mirroring the ES mapping's query-side schema
    * (elasticsearch_integration.py:43-96 / kibana_data_views.py:133-157).
    */
  val fields: Seq[(String, String)] = Seq(
    "id" -> "keyword", "name" -> "text", "relative_path" -> "keyword",
    "filepath" -> "text", "size_bytes" -> "long", "size" -> "keyword",
    "modified_time" -> "date", "creation_time" -> "date",
    "type" -> "keyword", "extension" -> "keyword",
    "checksum" -> "keyword", "direct_link" -> "keyword",
    "last_seen" -> "date")

  // shared escape (control chars included — a newline in a view title
  // must not split an NDJSON saved-object line in two)
  private def esc(s: String): String = graft.functions.JsonText.esc(s)

  /** The data-view saved object (one NDJSON line). */
  def dataViewLine(indexName: String, viewTitle: String): String = {
    val fieldJson = fields.map { case (n, t) =>
      s"""{"name":"${esc(n)}","type":"${esc(t)}"}"""
    }.mkString("[", ",", "]")
    s"""{"type":"index-pattern","id":"${esc(indexName)}-view","attributes":{"title":"${esc(indexName)}","name":"${esc(viewTitle)}","timeFieldName":"modified_time","fields":"${esc(fieldJson)}"}}"""
  }

  /** The default-search saved object (one NDJSON line). */
  def searchLine(indexName: String): String =
    s"""{"type":"search","id":"${esc(indexName)}-search","attributes":{"title":"${esc(indexName)} files","columns":["name","filepath","size","modified_time"],"sort":[["modified_time","desc"]]},"references":[{"type":"index-pattern","id":"${esc(indexName)}-view","name":"kibanaSavedObjectMeta.searchSourceJSON.index"}]}"""

  /** Full NDJSON import payload. */
  def importPayload(indexName: String, viewTitle: String): String =
    dataViewLine(indexName, viewTitle) + "\n" + searchLine(indexName) + "\n"
}
