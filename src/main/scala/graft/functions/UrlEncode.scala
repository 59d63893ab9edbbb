package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F20: URL percent-encoding with the reference's semantics —
  * Python's `urllib.parse.quote(path)` (lucidlink_api.py:88,345,390):
  * RFC 3986 unreserved chars plus `/` stay literal, spaces become `%20`
  * (NOT `+`), everything else is `%XX` of its UTF-8 bytes.
  *
  * Spark's built-in `url_encode` is `application/x-www-form-urlencoded`
  * (space→`+`, `/`→`%2F`), so the parity form post-processes it: this
  * stays a codegen'd expression chain, no UDF, and is exercised at the
  * API-sink boundary only (never in a hot relational path).
  */
object UrlEncode {

  /** `quote(path, safe='/')` parity. `~` is unreserved in RFC 3986 (and
    * Python's quote) but form-encoded by the builtin, so it is restored;
    * conversely `*` is kept literal by the form encoding but quoted by
    * Python, so it is encoded.
    */
  def quotePath(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(url_encode(c), "\\+", "%20"),
          "%2F", "/"),
        "%7E", "~"),
      "\\*", "%2A")
}
