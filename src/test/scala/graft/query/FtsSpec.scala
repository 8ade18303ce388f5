package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Inverted-index FTS semantics (SURVEY §7.5): tokenization, match grammar
  * subset (term / prefix* / field: scoping / implicit AND), incremental
  * posting maintenance. */
class FtsSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      ("u1", "Quantum Mechanics Primer", "intro text about waves"),
      ("u2", "Classical Mechanics", "newton laws primer"),
      ("u3", "Cooking 101", "quantum of flavor")
    ).toDF("uid", "title", "body")
  }

  private def idx = Fts.postings(docs, "uid", Map("title" -> "title", "body" -> "body"))

  private def uids(q: String): Set[String] =
    Fts.matchUids(idx, q).collect().map(_.getString(0)).toSet

  test("bare term matches any field, case-insensitive") {
    assert(uids("quantum") == Set("u1", "u3"))
    assert(uids("Quantum") == Set("u1", "u3"))
  }

  test("prefix term (FTS5 'pre*')") {
    assert(uids("mech*") == Set("u1", "u2"))
  }

  test("field-scoped term ('title: Quantum')") {
    assert(uids("title: quantum") == Set("u1"))
    assert(uids("body:primer") == Set("u2"))
  }

  test("column-list filter ('{title body}: term', r5)") {
    // quantum appears in u1.title and u3.body
    assert(uids("{title}: quantum") == Set("u1"))
    assert(uids("{body}: quantum") == Set("u3"))
    assert(uids("{title body}: quantum") == Set("u1", "u3"))
    // scopes only the following atom; composes with anchors and phrases
    assert(uids("{title body}: primer mechanics") == Set("u1", "u2"),
      "primer in either field AND unscoped mechanics (u1 has both in title)")
    assert(uids("{body}: primer mechanics") == Set("u2"),
      "body-scoped primer excludes u1 (title-only)")
    assert(uids("{body}: ^newton") == Set("u2"))
    assert(uids("{title}: \"quantum mechanics\"") == Set("u1"))
    // `{...}` without a colon is NOT a filter: the braces tokenize to the
    // junk terms `title`/`body`, which match no document (FTS5 errors here;
    // we degrade to an empty AND match)
    assert(uids("{title body} quantum") == Set.empty[String])
  }

  test("multiple terms AND (FTS5 implicit AND)") {
    assert(uids("mechanics primer") == Set("u1", "u2"))
    assert(uids("title:mechanics body:primer") == Set("u2"))
  }

  test("punctuated query terms split like the indexer tokenizes") {
    import spark.implicits._
    val d = Seq(("u9", "don't panic", "state-of-the-art prose")).toDF("uid", "title", "body")
    val i2 = Fts.postings(d, "uid", Map("title" -> "title", "body" -> "body"))
    def q(s: String) = Fts.matchUids(i2, s).collect().map(_.getString(0)).toSet
    assert(q("don't") == Set("u9"), "splits to don AND t, both posted")
    assert(q("state-of-the-art") == Set("u9"))
    assert(q("state-of-nothing") == Set.empty)
  }

  test("matchSql subquery form agrees with DataFrame form") {
    idx.createOrReplaceTempView("fts_spec_idx")
    val viaSql = spark.sql(Fts.matchSql("fts_spec_idx", "mech* primer"))
      .collect().map(_.getString(0)).toSet
    assert(viaSql == uids("mech* primer"))
  }

  test("OR unions branches; AND keyword intersects like implicit AND") {
    assert(uids("quantum OR newton") == Set("u1", "u2", "u3"))
    assert(uids("title:quantum OR body:primer") == Set("u1", "u2"))
    assert(uids("mechanics AND primer") == uids("mechanics primer"))
    assert(uids("waves OR flavor OR laws") == Set("u1", "u2", "u3"))
  }

  test("quoted phrase requires positional adjacency") {
    assert(uids("\"quantum mechanics\"") == Set("u1"))
    assert(uids("\"mechanics quantum\"") == Set.empty, "reversed order must not match")
    assert(uids("\"quantum of flavor\"") == Set("u3"), "3-token phrase")
    assert(uids("\"quantum flavor\"") == Set.empty, "gap must not match")
    assert(uids("title:\"classical mechanics\"") == Set("u2"))
    assert(uids("title:\"newton laws\"") == Set.empty, "phrase is field-scoped")
    assert(uids("\"newton laws\" OR \"quantum mechanics\"") == Set("u1", "u2"))
  }

  test("tf score counts matching posting occurrences") {
    import spark.implicits._
    val d = Seq(("u9", "spark spark spark", "tiny spark engine")).toDF("uid", "title", "body")
    val i2 = Fts.postings(docs.union(d), "uid", Map("title" -> "title", "body" -> "body"))
    val s = Fts.matchScores(i2, "spark").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == Map("u9" -> 4L), "3 title + 1 body occurrences")
    val s2 = Fts.matchScores(i2, "quantum OR \"newton laws\"").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s2 == Map("u1" -> 1L, "u3" -> 1L, "u2" -> 1L))
  }

  test("NOT and NEAR compose with scoring forms (r4)") {
    // NOT: quantum docs minus mechanics docs
    assert(uids("quantum NOT mechanics") == Set("u3"))
    // bm25 over a NOT query: negated atom restricts the match set but
    // contributes nothing to the score
    val bm = Fts.matchBm25(idx, "quantum NOT mechanics")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bm.keySet == Set("u3") && bm("u3") > 0)
    // tf-score form over NEAR: only the proximity-matching doc scores
    val near = Fts.matchScores(idx, "NEAR(quantum mechanics, 1)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(near.keySet == Set("u1") && near("u1") >= 1)
  }

  test("field-scoped NEAR and quoted NEAR-literals (r4 review fixes)") {
    // the pending field scopes the NEAR members
    assert(uids("title: NEAR(quantum mechanics, 2)") == Set("u1"))
    assert(uids("body: NEAR(quantum mechanics, 2)") == Set.empty)
    // ...and is consumed: 'primer' after the NEAR stays unscoped (u2 has it
    // only in body — a leaked title scope would wrongly drop u2)
    assert(uids("title: NEAR(quantum mechanics, 2) OR primer") == Set("u1", "u2"))
    // NEAR( inside a quoted phrase is literal phrase text, never lifted
    assert(uids("\"quantum NEAR(of, 2)\"") == Set.empty)
    assert(uids("\"quantum of\" OR \"NEAR(x)\"") == Set("u3"))
  }

  test("^anchor counts tokens, not separator slots; NEAR members honor ^ (r5 review fixes)") {
    import spark.implicits._
    val d = Seq(
      ("p1", "(red) october hunt"),  // leading punctuation: red IS the first token
      ("p2", "hunt for red october")
    ).toDF("uid", "body")
    val i2 = Fts.postings(d, "uid", Map("body" -> "body"))
    def u(q: String) = Fts.matchUids(i2, q).collect().map(_.getString(0)).toSet
    assert(u("^red") == Set("p1"), "FTS5 positions number tokens — '(red...' anchors")
    assert(u("^hunt") == Set("p2"))
    assert(u("^\"red october\"") == Set("p1"))
    // inside NEAR: ^ restricts the member to the field-initial occurrence
    assert(u("NEAR(^red october, 3)") == Set("p1"),
      "p2's red is not field-initial, so the anchored member can't match")
    assert(u("NEAR(red october, 3)") == Set("p1", "p2"))
  }

  test("NEAR group end scans outside quotes (r5 review fix)") {
    // a quoted member containing ')' must not truncate the group: ')' and
    // ',' vanish in tokenization, so these behave as the plain forms
    assert(uids("NEAR(\"quantum ) mechanics\" primer, 2)")
      == uids("NEAR(\"quantum mechanics\" primer, 2)"))
    assert(uids("NEAR(\"quantum , mechanics\" primer, 2)")
      == uids("NEAR(\"quantum mechanics\" primer, 2)"))
    assert(uids("NEAR(\"quantum mechanics\" primer, 2)") == Set("u1"),
      "sanity: the plain form matches u1")
  }

  test("bm25: higher tf ranks higher; rarer term outscores common term") {
    import spark.implicits._
    val d = Seq(
      ("u1", "spark spark spark filler filler filler"),
      ("u2", "spark filler filler filler filler filler"),
      ("u3", "rareword filler filler filler filler filler"),
      ("u4", "filler words only in this document here"))
      .toDF("uid", "body")
    val idx = Fts.postings(d, "uid", Map("body" -> "body"))
    val s = Fts.matchBm25(idx, "spark OR rareword").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s.keySet == Set("u1", "u2", "u3"))
    assert(s("u1") > s("u2"), "tf 3 must outrank tf 1 for the same term")
    assert(s("u3") > s("u2"), "df=1 term must outscore a df=2 term at equal tf")
    assert(s.values.forall(_ > 0))
  }

  test("upsertPostings replaces only the updated uid's postings") {
    import spark.implicits._
    val upd = Seq(("u3", "Quantum Cooking", "flavor waves")).toDF("uid", "title", "body")
    val next = Fts.upsertPostings(idx, upd, "uid", Map("title" -> "title", "body" -> "body"))
    val got = Fts.matchUids(next, "title: quantum").collect().map(_.getString(0)).toSet
    assert(got == Set("u1", "u3"))
    // old u3 title token gone
    assert(Fts.matchUids(next, "title: cooking").collect().map(_.getString(0)).toSet == Set("u3"))
    assert(Fts.matchUids(next, "101").collect().isEmpty)
  }

  test("deletePostings removes a uid from the index") {
    import spark.implicits._
    val next = Fts.deletePostings(idx, Seq("u1").toDF("uid"))
    assert(Fts.matchUids(next, "quantum").collect().map(_.getString(0)).toSet == Set("u3"))
  }

  test("ZFts: maintained postings z-table — init/updatefts/deletefts increments ≡ the DataFrame postings algebra, match parity across the grammar (r16)") {
    import spark.implicits._
    import graft.ops.ZFts
    val path = java.nio.file.Files.createTempDirectory("graft_zfts")
      .toString + "/idx"
    val f2t = Map("title" -> "title", "body" -> "body")
    ZFts.init(spark, docs, path, "uid", f2t, nFiles = 4)
    var mem = Fts.postings(docs, "uid", f2t)
    // compare by NAME: upsertPostings' uid join reorders columns
    val postingCols = Seq("term", "field", "uid", "pos").map(col)
    def assertParity(clue: String): Unit = {
      val live = ZFts.postings(spark, path).select(postingCols: _*)
      val memC = mem.select(postingCols: _*)
      assert(live.exceptAll(memC).count() == 0 &&
        memC.exceptAll(live).count() == 0,
        s"$clue: maintained postings must equal the DataFrame algebra")
    }
    assertParity("after init")
    // update = delete-then-insert: u3 re-texted, u4 created
    val upd = Seq(("u3", "Quantum Cooking", "flavor waves"),
      ("u4", "Wave Primer", "quantum waves again")).toDF("uid", "title", "body")
    ZFts.updatefts(spark, path, upd, "uid", f2t)
    mem = Fts.upsertPostings(mem, upd, "uid", f2t)
    assertParity("after updatefts")
    // pure tombstone delete
    ZFts.deletefts(spark, path, Seq("u1"))
    mem = Fts.deletePostings(mem, Seq("u1").toDF("uid"))
    assertParity("after deletefts")
    // the DISTRIBUTED path (collectThreshold = 0: semi-join tombstones)
    val upd2 = Seq(("u2", "Newton Rings", "rod and ring primer"))
      .toDF("uid", "title", "body")
    ZFts.updatefts(spark, path, upd2, "uid", f2t, collectThreshold = 0L)
    mem = Fts.upsertPostings(mem, upd2, "uid", f2t)
    assertParity("after distributed updatefts")
    // match parity across grammar forms, scores included
    def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    for (q <- Seq("quantum", "primer OR rings", "\"quantum waves\"",
        "quantum NOT cooking", "NEAR(rod primer, 4)", "wav*",
        "title:quantum", "^quantum"))
      assert(rowsOf(ZFts.matchScores(spark, path, q))
        == rowsOf(Fts.matchScores(mem, q)), s"query `$q` diverged")
  }

  test("snippet: best window by (terms, hits, earliest), markers, edge ellipses") {
    import spark.implicits._
    val docs = Seq(
      // match at the END: window pulls back to fill trailing slack, no
      // trailing ellipsis, leading one present
      (1L, "alpha beta gamma delta RED epsilon zeta"),
      // match at the START: no leading ellipsis, trailing one present
      (2L, "red start words here"),
      // two terms beat a lone later one: anchor covering red AND blue wins
      (3L, "x red y blue z z z blue"),
      // no match: absent from the result
      (4L, "nothing to see")).toDF("doc_id", "text")
    val got = Fts.snippet(docs, "doc_id", "text", Seq("red", "blue"), maxTokens = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "only matching docs get a snippet")
    // tokenization lowercases (same stream as the postings index)
    assert(got(1L) == "...<b>red</b> epsilon zeta", got(1L))
    assert(got(2L) == "<b>red</b> start words...", got(2L))
    assert(got(3L) == "...<b>red</b> y <b>blue</b>...", got(3L))
    // window wider than the doc: whole text, no ellipses
    val whole = Fts.snippet(docs.filter($"doc_id" === 2L), "doc_id", "text",
      Seq("red"), maxTokens = 10)
      .collect().head.getString(1)
    assert(whole == "<b>red</b> start words here")
  }

  test("highlight: whole doc, every occurrence marked, match count, non-matches excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "RED before blue and red again"),
      (2L, "nothing here")).toDF("doc_id", "text")
    val got = Fts.highlight(docs, "doc_id", "text", Seq("red", "blue"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got.keySet == Set(1L), "FTS5 aux functions run on matching rows only")
    assert(got(1L) == ("<b>red</b> before <b>blue</b> and <b>red</b> again", 3L))
    // custom markers pass through
    val custom = Fts.highlight(docs, "doc_id", "text", Seq("blue"), "[", "]")
      .collect().head.getString(1)
    assert(custom == "red before [blue] and red again")
  }

  test("negated column filter: -col and -{col list} match everywhere EXCEPT the listed fields (r11)") {
    // quantum: u1.title, u3.body
    assert(uids("-title: quantum") == Set("u3"))
    assert(uids("-body: quantum") == Set("u1"))
    assert(uids("-{body}: quantum") == Set("u1"))
    assert(uids("-{title body}: quantum") == Set.empty[String],
      "negating every field leaves nothing to match")
    // composes with phrases and groups
    assert(uids("-body:\"quantum mechanics\"") == Set("u1"))
    assert(uids("-title: (quantum OR newton)") == Set("u2", "u3"))
  }

  test("parenthesized grouping: (a OR b) AND c, NOT groups, scoped groups (r11)") {
    // (quantum ∪ newton) ∩ primer — the flat grammar would read this as
    // quantum OR (newton AND primer) and return u3 too
    assert(uids("(quantum OR newton) AND primer") == Set("u1", "u2"))
    assert(uids("quantum OR newton AND primer") == Set("u1", "u2", "u3"),
      "paren-free OR still binds looser")
    // binary NOT of a group: {u1,u3} minus title-mechanics {u1}
    assert(uids("quantum NOT (title: mechanics)") == Set("u3"))
    assert(uids("mechanics NOT (body: primer)") == Set("u1"))
    // field scope distributes over the group (FTS5 colset-before-parens)
    assert(uids("title: (quantum OR cooking)") == Set("u1", "u3"))
    assert(uids("body: (quantum OR cooking)") == Set("u3"))
    // member scope wins over the group scope
    assert(uids("title: (body:flavor OR cooking)") == Set("u3"))
    // nesting
    assert(uids("((waves OR laws) AND mechanics) OR cooking") == Set("u1", "u2", "u3"))
    // parens glued to terms keep their old match set (tokenizer stripped
    // them before r11; now they group — same result)
    assert(uids("quantum(mechanics)") == Set("u1"))
    // empty groups contribute nothing
    assert(uids("quantum ()") == Set("u1", "u3"))
  }

  test("bm25 per-column weights reshape ranking; empty weights = unweighted (r11)") {
    import spark.implicits._
    val d = Seq(
      ("u1", "spark tuning", "filler filler filler filler"),
      ("u2", "filler filler", "spark spark filler filler"))
      .toDF("uid", "title", "body")
    val i2 = Fts.postings(d, "uid", Map("title" -> "title", "body" -> "body"))
    def scores(w: Map[String, Double]) =
      Fts.matchBm25(i2, "spark", fieldWeights = w).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = scores(Map.empty)
    assert(plain("u2") > plain("u1"), "unweighted: tf 2 in body outranks tf 1 in title")
    val weighted = scores(Map("title" -> 5.0))
    assert(weighted("u1") > weighted("u2"),
      "title weight 5 makes the title hit outrank two body hits")
    // weighting must not change the MATCH set
    assert(weighted.keySet == plain.keySet)
    // phrase and NEAR atoms run through the weighted tf path too
    val phr = Fts.matchBm25(i2, "\"spark spark\" OR NEAR(spark tuning, 3)",
        fieldWeights = Map("body" -> 2.0)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(phr.keySet == Set("u1", "u2") && phr.values.forall(_ > 0))
  }

  test("unicode61 fold (r14): diacritic corpus and query match in all four accent combinations; default tokenizer unchanged") {
    import spark.implicits._
    val accented = Seq(
      ("a1", "Café com leite à tarde"),   // é, à decompose
      ("a2", "cafe com leite a tarde"),   // plain twin
      ("a3", "résumé review"),
      ("a4", "resume review"),
      ("a5", "straße tour")               // ß does NOT decompose: stays distinct
    ).toDF("uid", "body")
    val folded = Fts.postings(accented, "uid", Map("body" -> "body"),
      unicode61 = true)
    def u61(q: String): Set[String] =
      Fts.matchScoresU61(folded, q).select("uid")
        .collect().map(_.getString(0)).toSet
    // plain query × accented corpus AND accented query × plain corpus
    assert(u61("cafe") == Set("a1", "a2"))
    assert(u61("café") == Set("a1", "a2"))
    assert(u61("resume") == Set("a3", "a4"))
    assert(u61("résumé") == Set("a3", "a4"))
    // prefix and phrase fold too
    assert(u61("caf*") == Set("a1", "a2"))
    assert(u61("\"café com\"") == Set("a1", "a2"))
    // non-decomposable letters pass through unmerged (unicode61 parity)
    assert(u61("straße") == Set("a5") && u61("strasse").isEmpty)
    // the DEFAULT tokenizer is untouched: accent-exact matching
    val ascii = Fts.postings(accented, "uid", Map("body" -> "body"))
    def plain(q: String): Set[String] =
      Fts.matchUids(ascii, q).collect().map(_.getString(0)).toSet
    assert(plain("café") == Set("a1") && plain("cafe") == Set("a2"))
  }

  test("unicode61 reaches EVERY entry point: matchUids, matchBm25, snippet, highlight (r14 review fix)") {
    import spark.implicits._
    val accented = Seq(
      ("a1", "Café com leite à tarde"),
      ("a2", "cafe com leite a tarde")
    ).toDF("uid", "body")
    val folded = Fts.postings(accented, "uid", Map("body" -> "body"),
      unicode61 = true)
    // matchUids and matchBm25 fold the query like matchScoresU61 does
    assert(Fts.matchUids(folded, "café", unicode61 = true)
      .collect().map(_.getString(0)).toSet == Set("a1", "a2"))
    val bm = Fts.matchBm25(folded, "café", unicode61 = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bm.keySet == Set("a1", "a2"))
    // snippet/highlight tokenize through the SAME fold, so an accented
    // occurrence is marked when queried plain (and vice versa)
    val hi = Fts.highlight(accented, "uid", "body", Seq("café"),
      unicode61 = true).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(hi.keySet == Set("a1", "a2"))
    assert(hi("a1").startsWith("<b>cafe</b>") && hi("a2").startsWith("<b>cafe</b>"))
    val sn = Fts.snippet(accented, "uid", "body", Seq("tarde"), maxTokens = 3,
      unicode61 = true).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sn.keySet == Set("a1", "a2"))
    assert(sn.values.forall(_.contains("<b>tarde</b>")))
  }
}
