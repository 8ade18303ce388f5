package graft.query

/** SQLite → Spark SQL dialect translation for the predicate/expression
  * strings the chain DSL passes through verbatim.
  *
  * The reference delegates WHERE/ORDER/GROUP/extra-column strings straight to
  * SQLite (graphydb.py:810-811 "a thin wrapper around SQL"); the SQLite-isms
  * its docs and tests actually exercise are:
  *
  *   - `x.data.y` JSON paths, rewritten by `jsonextract`
  *     (graphydb.py:170-177) to `json_extract(x.data, "$.y")`
  *   - `==` as equality (SQLite accepts both `=` and `==`)
  *   - `GLOB` patterns (tests/test_graphdb.py:64-67)
  *   - `:name` bind parameters (graphydb.py:846-848)
  *   - double-quoted "string" literals (SQLite fallback-identifier quirk;
  *     Spark SQL treats double quotes as string literals natively, so these
  *     pass through untouched)
  *
  * Everything else is already shared SQL surface — Spark's is strictly
  * larger. Translation is purely string-level, applied before `spark.sql`.
  */
object Dialect {

  private val ParamRef = """:(\w+)""".r
  private val JsonPath = """(\w+)\.data\.(\w+)""".r
  private val GlobExpr = """(\S+)\s+GLOB\s+('(?:[^']|'')*')""".r

  /** Full translation: bind params, then GLOB, then json paths, then `==`.
    * All rewrites except GLOB (which consumes its own quoted pattern) are
    * quote-aware: text inside single-quoted literals passes through
    * untouched — `'a==b'` or `'see :note'` stay literal. */
  def translate(s: String, params: Map[String, Any] = Map.empty): String = {
    var out = mapOutsideQuotes(s)(bindParamsRaw(_, params))
    out = rewriteGlob(out)
    out = mapOutsideQuotes(out)(seg => rewriteDoubleEqualsRaw(rewriteJsonPathsRaw(seg)))
    out
  }

  /** Apply `f` only to the segments of `s` outside single-quoted string
    * literals ('' escapes handled). */
  private[query] def mapOutsideQuotes(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    var inQuote = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (!inQuote && c == '\'') {
        out.append(f(seg.toString)); seg.clear()
        out.append(c); inQuote = true
      } else if (inQuote && c == '\'') {
        out.append(c)
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') { out.append('\''); i += 1 }
        else inQuote = false
      } else if (inQuote) out.append(c)
      else seg.append(c)
      i += 1
    }
    out.append(f(seg.toString))
    out.toString
  }

  /** `:name` → rendered SQL literal (injection-safe: values rendered, never
    * spliced as code). Unknown params are left untouched so errors surface
    * in Spark's parser with context. */
  def bindParams(s: String, params: Map[String, Any]): String =
    mapOutsideQuotes(s)(bindParamsRaw(_, params))

  private def bindParamsRaw(s: String, params: Map[String, Any]): String =
    ParamRef.replaceAllIn(s, m => {
      params.get(m.group(1)) match {
        case Some(v) => java.util.regex.Matcher.quoteReplacement(renderLiteral(v))
        case None    => m.matched
      }
    })

  def renderLiteral(v: Any): String = v match {
    case null                => "NULL"
    case s: String           => "'" + s.replace("'", "''") + "'"
    case b: Boolean          => if (b) "true" else "false"
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double           => d.toString
    case f: Float            => f.toString
    case b: BigDecimal       => b.toString
    case other               => "'" + other.toString.replace("'", "''") + "'"
  }

  /** `x.data.y` → `get_json_object(x.props, '$.y')`.
    * One path component, same as the reference's `\w+` regex. */
  def rewriteJsonPaths(s: String): String = mapOutsideQuotes(s)(rewriteJsonPathsRaw)

  private def rewriteJsonPathsRaw(s: String): String =
    JsonPath.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
      s"get_json_object(${m.group(1)}.props, '$$.${m.group(2)}')"))

  /** `expr GLOB 'pat'` → pure-prefix patterns (`abc*`) become
    * `LIKE 'abc%'` (pushed down to the scan as StartsWith); everything else
    * becomes `RLIKE '^regex$'`. Run after param binding so the pattern is a
    * literal. */
  def rewriteGlob(s: String): String =
    GlobExpr.replaceAllIn(s, m => {
      val lhs = m.group(1)
      val quoted = m.group(2)
      val pat = quoted.substring(1, quoted.length - 1).replace("''", "'")
      val rewritten =
        if (pat.nonEmpty && pat.endsWith("*") &&
            !pat.dropRight(1).exists(c => "*?[%_".indexOf(c) >= 0))
          s"$lhs LIKE '${pat.dropRight(1).replace("'", "''")}%'"
        else
          s"$lhs RLIKE '${globToRegex(pat).replace("'", "''")}'"
      java.util.regex.Matcher.quoteReplacement(rewritten)
    })

  /** SQLite GLOB (case-sensitive, `*` `?` `[seq]`) → anchored Java regex. */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          // copy the character class through (glob and regex agree), except
          // fnmatch/SQLite negation `[!...]` → regex `[^...]`
          val close = glob.indexOf(']', i + 1)
          if (close < 0) { sb.append("\\[") }
          else {
            val body = glob.substring(i + 1, close)
            sb.append('[')
              .append(if (body.startsWith("!")) "^" + body.drop(1) else body)
              .append(']')
            i = close
          }
        case c if "\\.[]{}()<>+-=!$^|,".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('$').toString
  }

  /** `==` → `=` (token-wise; leaves `!=`, `<=`, `>=` alone). */
  def rewriteDoubleEquals(s: String): String = mapOutsideQuotes(s)(rewriteDoubleEqualsRaw)

  private def rewriteDoubleEqualsRaw(s: String): String = s.replaceAll("(?<![<>!=])==", "=")
}
