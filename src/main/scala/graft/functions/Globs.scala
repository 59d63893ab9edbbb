package graft.functions

/** fnmatch-faithful glob handling (reference: scanner/scanner.py:71-97).
  *
  * The reference checks each pattern against the FULL path (where fnmatch's
  * `*` crosses `/` freely) AND against every individual path segment. We
  * compile the whole pattern list once into two anchored regexes so the
  * filter is a single codegen'd `rlike` — no UDF, no per-row Python-style
  * loop — and the same regex is reusable inside the listing source for
  * subtree pruning (SURVEY.md §4.1 "pushdown to source").
  */
object Globs {

  /** Translate one fnmatch glob into a regex body. `starCrossesSlash`
    * controls whether `*`/`?` may match `/` (true for full-path matching,
    * false for per-segment matching — a segment never contains `/`).
    */
  def translate(glob: String, starCrossesSlash: Boolean): String = {
    val any = if (starCrossesSlash) "." else "[^/]"
    val sb = new StringBuilder
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(any).append('*')
        case '?' => sb.append(any)
        case '[' =>
          // fnmatch.translate's scan: a leading `!` negates; a `]` directly
          // after `[` or `[!` is a literal member, so the closing bracket
          // search starts past it (patterns `[]]` and `[!]x]` are valid).
          var k = i + 1
          if (k < glob.length && glob.charAt(k) == '!') k += 1
          if (k < glob.length && glob.charAt(k) == ']') k += 1
          val j = glob.indexOf(']', k)
          if (j < 0) { sb.append("\\["); }
          else {
            val body0 = glob.substring(i + 1, j)
            val neg = body0.startsWith("!")
            val body1 = if (neg) body0.drop(1) else body0
            // Escape metacharacters inside the class so Java regex and RE2
            // (the DuckDB oracle) agree: `\ ] [ &` always; `^` is escaped
            // because fnmatch treats a non-leading-`!` caret as literal.
            val esc = body1.flatMap {
              case c @ ('\\' | ']' | '[' | '&' | '^') => s"\\$c"
              case c => c.toString
            }
            sb.append('[')
            if (neg) {
              sb.append('^')
              // segment mode runs against the FULL path string: a real
              // segment never contains '/', so a negated class must not
              // swallow one and falsely match across a boundary
              if (!starCrossesSlash) sb.append('/')
            }
            sb.append(esc).append(']')
            i = j
          }
        case c if "\\.^$+{}()|".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** One regex matching iff the full path OR any `/`-separated segment
    * matches any of the glob patterns — the reference's skip test.
    */
  def skipRegex(patterns: Seq[String]): String = {
    require(patterns.nonEmpty)
    val full = patterns.map(p => s"(?:${translate(p, starCrossesSlash = true)})")
      .mkString("|")
    val seg = patterns.map(p => s"(?:${translate(p, starCrossesSlash = false)})")
      .mkString("|")
    s"(?s)^(?:$full)$$|(?:^|/)(?:$seg)(?:/|$$)"
  }
}
