package graft.pipeline

/** Minimal YAML-subset parser — just enough surface to load the
  * reference's `config/indexer-config.yaml` verbatim (config/config.py:6-26
  * does `yaml.safe_load`): nested maps by 2+-space indentation, block
  * sequences (`- item`), inline sequences (`[a, "b"]`), scalars
  * (quoted/plain strings, int, float, bool, null), and `#` comments.
  * No anchors, aliases, multi-doc, flow maps, or multi-line scalars —
  * the reference file uses none of them, and a zero-egress build cannot
  * take a YAML dependency (SURVEY §7 / build.sbt constraint).
  *
  * Values come back as: `Map[String, Any]`, `List[Any]`, `String`,
  * `Long`, `Double`, `Boolean`, or `null`.
  */
object Yaml {

  private final case class Line(indent: Int, text: String)

  def parse(text: String): Any = {
    val lines = text.linesIterator
      .map(stripComment)
      .filter(_.trim.nonEmpty)
      .map(l => Line(l.takeWhile(_ == ' ').length, l.trim))
      .toList
    if (lines.isEmpty) Map.empty[String, Any]
    else {
      val (v, rest) = parseNode(lines, lines.head.indent)
      require(rest.isEmpty,
        s"unparsed trailing content at indent ${rest.headOption.map(_.text)}")
      v
    }
  }

  /** Typed path lookup over a parsed document. */
  def at(doc: Any, path: String*): Option[Any] =
    path.foldLeft(Option(doc)) {
      case (Some(m: Map[_, _]), k) =>
        m.asInstanceOf[Map[String, Any]].get(k)
      case _ => None
    }

  def str(doc: Any, path: String*): Option[String] =
    at(doc, path: _*).collect { case s: String => s }

  def long(doc: Any, path: String*): Option[Long] =
    at(doc, path: _*).collect { case n: Long => n }

  def bool(doc: Any, path: String*): Option[Boolean] =
    at(doc, path: _*).collect { case b: Boolean => b }

  def list(doc: Any, path: String*): Option[List[Any]] =
    at(doc, path: _*).collect { case l: List[_] => l }

  // ------------------------------------------------------------------ //

  /** A quote char starts a quoted scalar only at a VALUE boundary
    * (line start or after `:`, `,`, `[`, `-`, whitespace-separated) —
    * an apostrophe inside a plain scalar (`o'brien`) is literal text,
    * exactly YAML's rule. Without this, the dangling "open quote"
    * swallows any trailing comment.
    */
  private def opensQuote(prevNonSpace: Char): Boolean =
    prevNonSpace == 0 || prevNonSpace == ':' || prevNonSpace == ',' ||
      prevNonSpace == '[' || prevNonSpace == '-'

  /** A `#` begins a comment at line start or after whitespace, never
    * inside a quoted scalar.
    */
  private def stripComment(line: String): String = {
    var quote: Char = 0
    var prevNonSpace: Char = 0
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if ((c == '"' || c == '\'') && opensQuote(prevNonSpace))
        quote = c
      else if (c == '#' && (i == 0 || line.charAt(i - 1).isWhitespace))
        return line.substring(0, i)
      if (!c.isWhitespace) prevNonSpace = c
      i += 1
    }
    line
  }

  private def parseNode(lines: List[Line], indent: Int): (Any, List[Line]) =
    if (lines.nonEmpty && lines.head.indent == indent &&
        (lines.head.text == "-" || lines.head.text.startsWith("- ")))
      parseSeq(lines, indent)
    else parseMap(lines, indent)

  private def parseSeq(lines: List[Line],
      indent: Int): (List[Any], List[Line]) = {
    val items = List.newBuilder[Any]
    var rest = lines
    while (rest.nonEmpty && rest.head.indent == indent &&
        (rest.head.text == "-" || rest.head.text.startsWith("- "))) {
      items += scalar(rest.head.text.stripPrefix("-").trim)
      rest = rest.tail
    }
    (items.result(), rest)
  }

  private def parseMap(lines: List[Line],
      indent: Int): (Map[String, Any], List[Line]) = {
    val m = Map.newBuilder[String, Any]
    var rest = lines
    while (rest.nonEmpty && rest.head.indent == indent) {
      val Line(_, text) = rest.head
      val colon = keyColonIndex(text)
      require(colon > 0, s"expected 'key:' but got: $text")
      val key = unquote(text.substring(0, colon).trim)
      val inline = text.substring(colon + 1).trim
      rest = rest.tail
      if (inline.nonEmpty) m += key -> scalar(inline)
      else if (rest.nonEmpty && rest.head.indent > indent) {
        val (child, r2) = parseNode(rest, rest.head.indent)
        m += key -> child
        rest = r2
      } else m += key -> null // `key:` with no value
    }
    (m.result(), rest)
  }

  /** Index of the `:` that separates key from value (quote-aware; the
    * value itself may contain colons, e.g. URLs — `: ` or line-end
    * terminates the key, mirroring YAML's plain-scalar rule).
    */
  private def keyColonIndex(text: String): Int = {
    var quote: Char = 0
    var prevNonSpace: Char = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if ((c == '"' || c == '\'') && opensQuote(prevNonSpace))
        quote = c
      else if (c == ':' &&
        (i + 1 == text.length || text.charAt(i + 1).isWhitespace)) return i
      if (!c.isWhitespace) prevNonSpace = c
      i += 1
    }
    -1
  }

  private val IntPat = "^[-+]?\\d+$".r
  private val FloatPat = "^[-+]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][-+]?\\d+)?$".r

  private def scalar(s: String): Any = s match {
    case "" => null
    case "~" | "null" | "Null" | "NULL" => null
    case "true" | "True" | "TRUE" => true
    case "false" | "False" | "FALSE" => false
    case q if q.startsWith("[") && q.endsWith("]") =>
      splitTopLevel(q.substring(1, q.length - 1))
        .map(_.trim).filter(_.nonEmpty).map(scalar)
    case q if (q.startsWith("\"") && q.endsWith("\"") && q.length >= 2) ||
        (q.startsWith("'") && q.endsWith("'") && q.length >= 2) =>
      q.substring(1, q.length - 1)
    case IntPat() => s.toLong
    case FloatPat(_, _) => s.toDouble
    case other => other
  }

  private def unquote(s: String): String = scalar(s) match {
    case str: String => str
    case other => String.valueOf(other)
  }

  private def splitTopLevel(s: String): List[String] = {
    val parts = List.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var prevNonSpace: Char = ','  // list start = value position
    s.foreach { c =>
      if (quote != 0) { if (c == quote) quote = 0; cur += c }
      else if ((c == '"' || c == '\'') && opensQuote(prevNonSpace)) {
        quote = c; cur += c
      } else if (c == ',') { parts += cur.result(); cur.clear() }
      else cur += c
      if (!c.isWhitespace) prevNonSpace = c
    }
    parts += cur.result()
    parts.result()
  }
}
