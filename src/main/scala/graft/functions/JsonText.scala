package graft.functions

/** JSON string-escape for hand-built payloads (NDJSON bulk action
  * lines, saved-object imports, search DSL bodies, oracle dumps):
  * quotes, backslashes, and ALL control characters — caller-supplied
  * text (often path-derived) must never corrupt line framing or JSON
  * syntax. One definition; every sink delegates here so an escaping
  * fix can't be missed in a divergent copy.
  */
object JsonText {
  def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
