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

  /** Full translation: GLOB first (its scanner consumes the `:param` or
    * quoted pattern operand directly), then bind params, json paths, `==`.
    * Every rewrite is quote-aware: text inside single- OR double-quoted
    * string literals (Spark treats both as strings) passes through
    * untouched — `'a==b'`, `"see :note"` stay literal. */
  def translate(s: String, params: Map[String, Any] = Map.empty): String = {
    var out = rewriteGlobScan(s, params)
    out = rewriteAggFns(out)
    out = mapOutsideQuotes(out)(bindParamsRaw(_, params))
    out = mapOutsideQuotes(out)(seg =>
      rewriteSqliteFnsRaw(rewriteDoubleEqualsRaw(rewriteJsonPathsRaw(seg))))
    out
  }

  /** Apply `f` only to the segments of `s` outside single/double-quoted
    * string literals ('' escape handled inside single quotes). */
  private[query] def mapOutsideQuotes(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote == 0 && (c == '\'' || c == '"')) {
        out.append(f(seg.toString)); seg.clear()
        out.append(c); quote = c
      } else if (quote != 0 && c == quote) {
        out.append(c)
        if (c == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
          out.append('\''); i += 1
        } else quote = 0
      } else if (quote != 0) out.append(c)
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
    case d: Double           => renderFloating(d)
    case f: Float            => renderFloating(f.toDouble)
    case b: BigDecimal       => b.toString
    case other               => "'" + other.toString.replace("'", "''") + "'"
  }

  // bare NaN/Infinity are not Spark SQL literals — render through double()
  // so a non-finite bind param stays usable instead of a parser error
  private def renderFloating(d: Double): String =
    if (d.isNaN) "double('NaN')"
    else if (d.isPosInfinity) "double('Infinity')"
    else if (d.isNegInfinity) "double('-Infinity')"
    else d.toString

  /** `x.data.y` → `get_json_object(x.props, '$.y')`.
    * One path component, same as the reference's `\w+` regex. */
  def rewriteJsonPaths(s: String): String = mapOutsideQuotes(s)(rewriteJsonPathsRaw)

  private def rewriteJsonPathsRaw(s: String): String =
    JsonPath.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
      s"get_json_object(${m.group(1)}.props, '$$.${m.group(2)}')"))

  /** Quote-aware GLOB rewrite: scans for the `GLOB` keyword OUTSIDE string
    * literals (a data value containing "GLOB '…'" is never rewritten) and
    * replaces `GLOB <operand>` in place — the lhs stays where it is. The
    * operand is either a `:param` (value taken from `params`) or a
    * single-quoted literal. Pure-prefix patterns (`abc*`) become
    * `LIKE 'abc%'` (pushed to the scan as StartsWith); everything else
    * becomes `RLIKE '^regex$'`. Regex backslashes are doubled when rendered
    * into the SQL literal — Spark's string parser consumes one level of
    * backslash escapes, which would otherwise turn `\.` into a live `.`. */
  def rewriteGlobScan(s: String, params: Map[String, Any]): String = {
    val out = new StringBuilder
    var i = 0
    var quote: Char = 0
    def isWordBoundary(idx: Int): Boolean =
      idx < 0 || idx >= s.length || !Character.isLetterOrDigit(s.charAt(idx))
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        out.append(c)
        if (c == quote) {
          if (c == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
            out.append('\''); i += 1
          } else quote = 0
        }
        i += 1
      } else if (c == '\'' || c == '"') {
        out.append(c); quote = c; i += 1
      } else if (s.regionMatches(i, "GLOB", 0, 4) &&
          isWordBoundary(i - 1) && isWordBoundary(i + 4)) {
        // parse the operand after GLOB: whitespace, then :param or 'literal'
        var j = i + 4
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        val patternOpt: Option[(String, Int)] =
          if (j < s.length && s.charAt(j) == ':') {
            val m = ParamRef.pattern.matcher(s.substring(j))
            if (m.lookingAt() && params.contains(m.group(1)))
              Some((String.valueOf(params(m.group(1))), j + m.end()))
            else None
          } else if (j < s.length && s.charAt(j) == '\'') {
            var k = j + 1
            val lit = new StringBuilder
            var closed = false
            while (k < s.length && !closed) {
              if (s.charAt(k) == '\'') {
                if (k + 1 < s.length && s.charAt(k + 1) == '\'') { lit.append('\''); k += 2 }
                else { closed = true; k += 1 }
              } else { lit.append(s.charAt(k)); k += 1 }
            }
            if (closed) Some((lit.toString, k)) else None
          } else None
        patternOpt match {
          case Some((pat, next)) =>
            out.append(globOperatorSql(pat))
            i = next
          case None =>
            out.append(c); i += 1 // malformed/unbound: leave for Spark's parser
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def globOperatorSql(pat: String): String =
    if (pat.nonEmpty && pat.endsWith("*") &&
        !pat.dropRight(1).exists(c => "*?[%_\\".indexOf(c) >= 0))
      s"LIKE '${pat.dropRight(1).replace("\\", "\\\\").replace("'", "''")}%'"
    else
      s"RLIKE '${globToRegex(pat).replace("\\", "\\\\").replace("'", "''")}'"

  /** Legacy single-string form (pattern must already be a literal). */
  def rewriteGlob(s: String): String = rewriteGlobScan(s, Map.empty)

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

  /** SQLite-only scalar functions → their Spark equivalents: `iif(c,a,b)` →
    * `if(c,a,b)`, `printf(fmt,…)` → `format_string(fmt,…)` (case-insensitive
    * names, as SQLite resolves them). `typeof`/`ifnull`/`instr`/`substr`
    * exist in Spark under the same names and pass through untouched (typeof
    * returns Spark's type vocabulary — 'int' where SQLite says 'integer'). */
  def rewriteSqliteFns(s: String): String = mapOutsideQuotes(s)(rewriteSqliteFnsRaw)

  private val FnRenames = Seq("iif" -> "if", "printf" -> "format_string")
  private def rewriteSqliteFnsRaw(s: String): String =
    FnRenames.foldLeft(s) { case (acc, (from, to)) =>
      acc.replaceAll(s"(?i)(?<![\\w.])$from\\s*\\(", to + "(")
    }

  /** SQLite aggregate functions Spark lacks under those names
    * (graphydb.py:810-811 passes aggregate strings to SQLite verbatim;
    * SURVEY §2.4 names these two as contract):
    *
    *   - `group_concat(x)`        → `concat_ws(',', collect_list(x))`
    *   - `group_concat(x, sep)`   → `concat_ws(sep, collect_list(x))`
    *     (SQLite's separator is the SECOND argument; concat_ws wants it
    *     first, so this is argument-aware, not a rename)
    *   - `group_concat(DISTINCT x)` → `concat_ws(',', collect_set(x))`
    *     (SQLite allows DISTINCT only in the 1-arg form; element order is
    *     unspecified in both engines)
    *   - `total(x)` → `coalesce(sum(CAST(x AS DOUBLE)), 0.0D)` (SQLite
    *     total() is the always-REAL, NULL→0.0 sum; `0.0D` keeps Spark's
    *     literal a double, not a decimal)
    *
    * Unlike the simple renames this must scan the WHOLE string quote-aware
    * (the separator operand is itself a quoted literal, so the
    * `mapOutsideQuotes` segment path can't see the full call) and split
    * arguments at top-level commas only. Arguments are rewritten
    * recursively, then re-wrapped. A call that never closes its paren is
    * left untouched for Spark's parser to report. */
  def rewriteAggFns(s: String): String = {
    // fast path: almost no query names these aggregates — one contains()
    // pass instead of the per-character scan ("total" also matches
    // subtotal/o_totalprice, but that only means the full scan runs and
    // then correctly leaves them alone)
    val lower = s.toLowerCase
    if (!lower.contains("group_concat") && !lower.contains("total")) return s
    val out = new StringBuilder
    var i = 0
    var quote: Char = 0
    def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    def nameStartsAt(idx: Int, name: String): Boolean =
      s.regionMatches(true, idx, name, 0, name.length) &&
        (idx == 0 || (!isWordChar(s.charAt(idx - 1)) && s.charAt(idx - 1) != '.'))
    // from `open` (index of '('), return (args split at top-level commas,
    // index just past the closing ')') — or None if unbalanced
    def parseArgs(open: Int): Option[(List[String], Int)] = {
      var k = open + 1
      var depth = 1
      var q: Char = 0
      var argStart = k
      val args = List.newBuilder[String]
      while (k < s.length && depth > 0) {
        val c = s.charAt(k)
        if (q != 0) {
          if (c == q) {
            if (c == '\'' && k + 1 < s.length && s.charAt(k + 1) == '\'') k += 1
            else q = 0
          }
        } else c match {
          case '\'' | '"' => q = c
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) { args += s.substring(argStart, k) }
          case ',' if depth == 1 =>
            args += s.substring(argStart, k); argStart = k + 1
          case _ =>
        }
        k += 1
      }
      if (depth == 0) Some((args.result(), k)) else None
    }
    def fnAt(idx: Int): Option[(String, Int)] =
      Seq("group_concat", "total").collectFirst {
        case name if nameStartsAt(idx, name) &&
            // require '(' (after optional whitespace) so a bare column named
            // `total` is never rewritten
            { var j = idx + name.length
              while (j < s.length && s.charAt(j).isWhitespace) j += 1
              j < s.length && s.charAt(j) == '(' } =>
          var j = idx + name.length
          while (j < s.length && s.charAt(j).isWhitespace) j += 1
          (name, j)
      }
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        out.append(c)
        if (c == quote) {
          if (c == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
            out.append('\''); i += 1
          } else quote = 0
        }
        i += 1
      } else if (c == '\'' || c == '"') {
        out.append(c); quote = c; i += 1
      } else fnAt(i) match {
        case Some((name, open)) =>
          parseArgs(open) match {
            case Some((rawArgs, next)) =>
              val args = rawArgs.map(a => rewriteAggFns(a).trim)
              // SQLite's group_concat is NULL (not '') over a group with
              // zero non-null values — concat_ws over an empty collected
              // array yields '', so the rewrite guards on count(x) = 0
              def gc(x: String, sep: String, distinct: Boolean): String = {
                val collected =
                  if (distinct) s"collect_set($x)" else s"collect_list($x)"
                s"CASE WHEN count($x) = 0 THEN NULL " +
                  s"ELSE concat_ws($sep, $collected) END"
              }
              val sql = (name, args) match {
                case ("total", List(x)) =>
                  // try_cast, not CAST: under Spark's default ANSI mode a
                  // non-numeric string would THROW, where SQLite's total()
                  // converts it leniently. Full fidelity (r15): SQLite's
                  // text→REAL (sqlite3AtoF) parses the longest NUMERIC
                  // PREFIX — '12abc' → 12.0, '.5x' → 0.5, '1e2y' → 100.0,
                  // '1e' → 1.0 (incomplete exponent drops), 'abc' → 0.0 —
                  // so when the direct cast misses, a second branch
                  // extracts that prefix (regex in backslash-free char
                  // classes — the leading-skip class spells out the six
                  // isspace() bytes sqlite3AtoF skips as RAW characters;
                  // empty extract → NULL → 0.0)
                  s"coalesce(sum(coalesce(try_cast($x AS DOUBLE), " +
                    s"try_cast(regexp_extract(CAST($x AS STRING), " +
                    "'^[ \t\n\u000B\f\r]*[+-]?([0-9]+[.]?[0-9]*|[.][0-9]+)([eE][+-]?[0-9]+)?', 0) " +
                    "AS DOUBLE), 0.0D)), 0.0D)"
                case ("group_concat", List(x)) if x.toUpperCase.startsWith("DISTINCT ") =>
                  gc(x.drop("DISTINCT ".length).trim, "','", distinct = true)
                case ("group_concat", List(x)) =>
                  gc(x, "','", distinct = false)
                case ("group_concat", List(x, sep)) =>
                  gc(x, sep, distinct = false)
                case _ => // wrong arity: leave verbatim for Spark to reject
                  s.substring(i, next)
              }
              out.append(sql); i = next
            case None => out.append(c); i += 1
          }
        case None => out.append(c); i += 1
      }
    }
    out.toString
  }
}
