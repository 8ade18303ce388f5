package graft.query

import org.scalatest.funsuite.AnyFunSuite

class DialectSpec extends AnyFunSuite {

  test("json path rewrite (graphydb.py:170-177)") {
    assert(Dialect.rewriteJsonPaths("""n.data.name = "Bob"""") ==
      """get_json_object(n.props, '$.name') = "Bob"""")
    assert(Dialect.rewriteJsonPaths("e.data.strength") ==
      "get_json_object(e.props, '$.strength')")
    // core columns untouched
    assert(Dialect.rewriteJsonPaths("n.uid = m.uid") == "n.uid = m.uid")
  }

  test("double-equals to equals, comparisons preserved") {
    assert(Dialect.rewriteDoubleEquals("n1.uid == n2.uid") == "n1.uid = n2.uid")
    assert(Dialect.rewriteDoubleEquals("a != b AND c <= d AND e >= f") ==
      "a != b AND c <= d AND e >= f")
  }

  test("param binding renders literals, string-escaped") {
    assert(Dialect.bindParams("n.uid = :a AND n.x = :b", Map("a" -> "O'x", "b" -> 7)) ==
      "n.uid = 'O''x' AND n.x = 7")
  }

  test("GLOB translation (tests/test_graphdb.py:64-67)") {
    // pure prefix glob → LIKE (pushdown-friendly StartsWith)
    assert(Dialect.translate("n.uid GLOB :a", Map("a" -> "ABC1*")) ==
      "n.uid LIKE 'ABC1%'")
    // general glob → anchored RLIKE
    assert(Dialect.translate("n.uid GLOB :a", Map("a" -> "A?C*")) ==
      "n.uid RLIKE '^A.C.*$'")
    assert(Dialect.globToRegex("a?c[xy]*") == "^a.c[xy].*$")
  }

  test("full translate composes") {
    val t = Dialect.translate("""p.data.age == :min""", Map("min" -> 21))
    assert(t == "get_json_object(p.props, '$.age') = 21")
  }

  test("SQLite-only scalars: iif -> if, printf -> format_string (case-insensitive, quote-safe)") {
    assert(Dialect.translate("iif(n.data.a == 1, 'y', 'n')") ==
      "if(get_json_object(n.props, '$.a') = 1, 'y', 'n')")
    assert(Dialect.translate("PRINTF('%s-%d', n.kind, 3)") ==
      "format_string('%s-%d', n.kind, 3)")
    // names embedded in identifiers or literals are untouched
    assert(Dialect.translate("verifiif(x)") == "verifiif(x)")
    assert(Dialect.translate("n.s = 'iif(1,2,3)'") == "n.s = 'iif(1,2,3)'")
    // Spark shares typeof/ifnull under the same names: passthrough
    assert(Dialect.translate("ifnull(n.a, 0)") == "ifnull(n.a, 0)")
  }

  test("SQLite aggregates: group_concat 1/2-arg + DISTINCT, total (SURVEY §2.4)") {
    // empty-group guard: SQLite group_concat is NULL over zero non-null
    // values; concat_ws alone would yield ''
    def gc(x: String, sep: String, coll: String) =
      s"CASE WHEN count($x) = 0 THEN NULL ELSE concat_ws($sep, $coll($x)) END"
    assert(Dialect.translate("group_concat(c.uid)") ==
      gc("c.uid", "','", "collect_list"))
    // SQLite's separator is the SECOND argument; concat_ws wants it first
    assert(Dialect.translate("group_concat(c.uid, '; ')") ==
      gc("c.uid", "'; '", "collect_list"))
    assert(Dialect.translate("GROUP_CONCAT(DISTINCT n.kind)") ==
      gc("n.kind", "','", "collect_set"))
    assert(Dialect.translate("total(n.data.v)") ==
      "coalesce(sum(coalesce(try_cast(get_json_object(n.props, '$.v') " +
        "AS DOUBLE), try_cast(regexp_extract(CAST(get_json_object(n.props, " +
        "'$.v') AS STRING), " +
        // r16: the leading-skip class covers the six isspace() bytes
        // sqlite3AtoF skips (raw chars inside the SQL literal)
        "'^[ \t\n\u000B\f\r]*[+-]?([0-9]+[.]?[0-9]*|[.][0-9]+)([eE][+-]?[0-9]+)?', 0) " +
        "AS DOUBLE), 0.0D)), 0.0D)")
    // nested inside another call; inner rewrites still apply
    assert(Dialect.translate("length(group_concat(c.uid, ','))") ==
      s"length(${gc("c.uid", "','", "collect_list")})")
    // a separator containing a comma and a paren must not split/terminate args
    assert(Dialect.translate("group_concat(x, ',)')") ==
      gc("x", "',)'", "collect_list"))
    // identifiers and quoted literals are untouched; bare `total` column too
    assert(Dialect.translate("subtotal(x)") == "subtotal(x)")
    assert(Dialect.translate("n.total + 1") == "n.total + 1")
    assert(Dialect.translate("n.s = 'total(1)'") == "n.s = 'total(1)'")
    // wrong arity is left verbatim for Spark's parser to reject
    assert(Dialect.translate("total(a, b)") == "total(a, b)")
  }

  test("group_concat/total SEMANTICS in Spark: NULL-skipping, NULL (not '') on empty groups, total is 0.0 and REAL") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    Seq(("g1", Some("a")), ("g1", None), ("g1", Some("b")),
        ("g2", Option.empty[String]))
      .toDF("g", "v").createOrReplaceTempView("dialect_agg_pin")
    val sql = "SELECT g, " +
      Dialect.translate("group_concat(v, '|')") + " AS gc, " +
      Dialect.translate("total(v)") + " AS tot " +
      "FROM dialect_agg_pin GROUP BY g ORDER BY g"
    val rows = spark.sql(sql).collect()
    // g1: NULLs skipped, separator honored (order from collect_list is
    // arrival order on this single partition)
    assert(rows(0).getString(1) == "a|b")
    // g2: all-NULL group → NULL, matching SQLite (concat_ws alone → '')
    assert(rows(1).isNullAt(1), "empty group_concat must be NULL, not ''")
    // total: non-numeric strings cast to NULL under try-ish double cast?
    // v is non-numeric, so sum is NULL → total falls to 0.0 (SQLite treats
    // non-numeric text as 0.0 in total(); both engines land on 0.0 here)
    assert(rows(1).getDouble(2) == 0.0)
  }

  test("total() parses SQLite's NUMERIC PREFIX from text (sqlite3AtoF fidelity, r15)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // one row per case so each total() isolates one conversion;
    // expectations are sqlite3AtoF's: longest valid numeric prefix,
    // incomplete exponents drop, garbage → 0.0
    val cases = Seq(
      ("12abc", 12.0), (".5x", 0.5), ("1e2y", 100.0), ("1e", 1.0),
      ("1e+", 1.0), ("-3.5junk", -3.5), ("  7rest", 7.0), ("0x1A", 0.0),
      ("abc", 0.0), ("", 0.0), ("+.25z", 0.25), ("1.2.3", 1.2),
      ("42", 42.0), ("-0.0", -0.0), ("e5", 0.0),
      // r16 (advisor): sqlite3AtoF skips ALL isspace() whitespace, not
      // just spaces — tab/newline/CR-prefixed numerics must parse
      ("\t12abc", 12.0), ("\n 8x", 8.0), ("\r\t-4.5q", -4.5))
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      Seq(in).toDF("v").createOrReplaceTempView(s"dialect_total_pin_$i")
      val got = spark.sql("SELECT " + Dialect.translate("total(v)") +
        s" AS t FROM dialect_total_pin_$i").head().getDouble(0)
      assert(got == want, s"total('$in') = $got, want $want")
    }
  }

  test("rewrites never touch single-quoted literals") {
    assert(Dialect.translate("n.data.op = 'a==b'") ==
      "get_json_object(n.props, '$.op') = 'a==b'")
    assert(Dialect.translate("n.x = 'see :note'", Map("note" -> 1)) ==
      "n.x = 'see :note'")
    assert(Dialect.translate("n.y = 'x.data.y'") == "n.y = 'x.data.y'")
    // escaped quotes inside literals stay intact
    assert(Dialect.translate("n.z = 'it''s =='") == "n.z = 'it''s =='")
  }

  test("fnmatch/SQLite negated classes [!...] become [^...]") {
    assert(Dialect.globToRegex("[!a]*") == "^[^a].*$")
    assert("^[^a].*$".r.matches("bcd") && !"^[^a].*$".r.matches("abc"))
  }

  test("glob regex backslashes are doubled in the SQL literal") {
    // Spark's string parser consumes one escape level: '\\.' in the SQL text
    // is the regex '\.' at runtime
    assert(Dialect.translate("n.x GLOB '*.md'") == "n.x RLIKE '^.*\\\\.md$'")
  }

  test("double-quoted literals are protected too") {
    assert(Dialect.translate("""n.x == "a==b"""") == """n.x = "a==b"""")
    assert(Dialect.translate("""n.x = "see :v"""", Map("v" -> 1)) == """n.x = "see :v"""")
  }

  test("GLOB keyword inside a bound string value is never rewritten") {
    val t = Dialect.translate("note = :v", Map("v" -> "uses GLOB 'star'"))
    assert(t == "note = 'uses GLOB ''star'''")
  }

  test("non-finite double bind params render as parseable double() literals") {
    assert(Dialect.renderLiteral(Double.NaN) == "double('NaN')")
    assert(Dialect.renderLiteral(Double.PositiveInfinity) == "double('Infinity')")
    assert(Dialect.renderLiteral(Double.NegativeInfinity) == "double('-Infinity')")
    assert(Dialect.renderLiteral(Float.NaN) == "double('NaN')")
    assert(Dialect.renderLiteral(1.5) == "1.5")
  }
}
