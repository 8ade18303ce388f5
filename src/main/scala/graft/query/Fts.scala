package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text search as an inverted-index posting table + match compiler
  * (SURVEY §7.5). Replaces the reference's SQLite FTS5 virtual tables
  * (graphydb.py:638-658 schema, 876-898 MATCH joins).
  *
  * Postings: `term STRING, field STRING, uid STRING, pos INT`, one row per
  * token occurrence (position = token index within its field, so phrase
  * adjacency is a positional self-join). Tokenizer ≈ FTS5's default
  * unicode61: lowercase, split on non-alphanumeric.
  *
  * Match grammar — the FTS5 subset the reference exercises
  * (test_graphdb.py:107-110 prefix `An*`; docstring graphydb.py:855
  * column-scoped `title: Quantum`; implicit/explicit AND) plus `OR`
  * branches and `"quoted phrases"`. Every match also carries a `score`
  * column (term-frequency: total matching posting rows per uid), reachable
  * from fetch ORDER/extras as `<alias>_fts.score` — the analogue of the
  * reference ranking via ORDER passthrough (graphydb.py:956-962). NEAR,
  * NOT, and bm25 weighting stay out of scope.
  */
object Fts {

  val TokenSplit = "[^\\p{L}\\p{N}]+"

  /** Posting rows for (uid, field, text) triples: lower → split → posexplode.
    * One row PER OCCURRENCE (positions feed phrases, multiplicity feeds tf
    * scores); match sets always project DISTINCT uids. */
  def postings(df: DataFrame, uidCol: String, fieldToTextCol: Map[String, String]): DataFrame = {
    val perField = fieldToTextCol.toSeq.map { case (field, textCol) =>
      df.select(col(uidCol).as("uid"),
          posexplode(split(lower(col(textCol)), TokenSplit)).as(Seq("pos", "term")))
        .filter(col("term") =!= "")
        .select(col("term"), lit(field).as("field"), col("uid"), col("pos"))
    }
    perField.reduce(_ unionByName _)
  }

  private sealed trait Atom { def field: Option[String] }
  private final case class Term(text: String, prefix: Boolean, field: Option[String]) extends Atom
  private final case class Phrase(tokens: Seq[String], field: Option[String]) extends Atom

  /** Parse an FTS5-subset match string into OR-ed groups of AND-ed atoms.
    * A punctuated term splits the same way the indexer tokenizes ("don't" →
    * don AND t) so queries and postings agree; a trailing `*` applies prefix
    * matching to the final token; `"quoted text"` is a positional phrase;
    * uppercase OR/AND combine (OR binds looser, as in FTS5). */
  private def parseQuery(q: String): Seq[Seq[Atom]] = {
    val Tok = """(?:(\w+)\s*:\s*)?"([^"]*)"|(\S+)""".r
    val branches = Seq.newBuilder[Seq[Atom]]
    var group = Seq.newBuilder[Atom]
    var groupNonEmpty = false
    var pendingField: Option[String] = None
    def takeField(inline: Option[String]): Option[String] = {
      val f = inline.map(_.toLowerCase).orElse(pendingField)
      pendingField = None
      f
    }
    Tok.findAllMatchIn(q.trim).foreach { m =>
      if (m.group(2) != null) {
        val field = takeField(Option(m.group(1)))
        val toks = m.group(2).toLowerCase.split(TokenSplit).filter(_.nonEmpty).toSeq
        if (toks.nonEmpty) {
          group += (if (toks.size == 1) Term(toks.head, prefix = false, field)
                    else Phrase(toks, field))
          groupNonEmpty = true
        }
      } else m.group(3) match {
        case "OR" =>
          if (groupNonEmpty) branches += group.result()
          group = Seq.newBuilder[Atom]; groupNonEmpty = false
        case "AND" => ()
        case t0 if t0.endsWith(":") =>
          pendingField = Some(t0.dropRight(1).toLowerCase)
        case t0 =>
          var t = t0
          var inline: Option[String] = None
          if (t.contains(":")) {
            val Array(f, rest) = t.split(":", 2)
            inline = Some(f); t = rest
          }
          val field = takeField(inline)
          if (t.nonEmpty) {
            val prefix = t.endsWith("*")
            val pieces = (if (prefix) t.dropRight(1) else t).toLowerCase
              .split(TokenSplit).filter(_.nonEmpty)
            pieces.zipWithIndex.foreach { case (piece, idx) =>
              group += Term(piece, prefix && idx == pieces.length - 1, field)
              groupNonEmpty = true
            }
          }
      }
    }
    if (groupNonEmpty) branches += group.result()
    branches.result()
  }

  private def esc(s: String) = s.replace("'", "''")

  private def termCond(t: Term, alias: String = ""): String = {
    val p = if (alias.isEmpty) "" else s"$alias."
    val base =
      if (t.prefix) s"${p}term LIKE '${esc(t.text)}%'"
      else s"${p}term = '${esc(t.text)}'"
    t.field.map(f => s"$base AND ${p}field = '${esc(f)}'").getOrElse(base)
  }

  /** FROM/JOIN/WHERE body of a positional phrase self-join: token i must sit
    * at pos0 + i in the same (uid, field). */
  private def phraseBody(view: String, ph: Phrase): String = {
    val joins = ph.tokens.tail.zipWithIndex.map { case (tok, i) =>
      val a = s"p${i + 1}"
      s"\nJOIN $view $a ON $a.uid = p0.uid AND $a.field = p0.field" +
        s" AND $a.pos = p0.pos + ${i + 1} AND $a.term = '${esc(tok)}'"
    }.mkString
    val where = s"p0.term = '${esc(ph.tokens.head)}'" +
      ph.field.map(f => s" AND p0.field = '${esc(f)}'").getOrElse("")
    s"FROM $view p0$joins\nWHERE $where"
  }

  private def matchSelect(view: String, a: Atom): String = a match {
    case t: Term   => s"SELECT DISTINCT uid FROM $view WHERE ${termCond(t)}"
    case p: Phrase => s"SELECT DISTINCT p0.uid AS uid ${phraseBody(view, p)}"
  }

  private def scoreSelect(view: String, a: Atom): String = a match {
    case t: Term   => s"SELECT uid, COUNT(*) AS c FROM $view WHERE ${termCond(t)} GROUP BY uid"
    case p: Phrase => s"SELECT p0.uid AS uid, COUNT(*) AS c ${phraseBody(view, p)} GROUP BY p0.uid"
  }

  /** SQL subquery over a postings view returning matching uids with a tf
    * `score` (total posting rows matched by any query atom). AND-ed atoms
    * INTERSECT; OR branches UNION. */
  def matchSql(postingsView: String, query: String): String = {
    val branches = parseQuery(query)
    require(branches.nonEmpty, s"empty FTS match: '$query'")
    val matches = branches
      .map(atoms => atoms.map(matchSelect(postingsView, _)).mkString("\nINTERSECT\n"))
      .map(b => s"($b)")
      .mkString("\nUNION\n")
    val scores = branches.flatten
      .map(scoreSelect(postingsView, _))
      .mkString("\nUNION ALL\n")
    s"""SELECT m.uid AS uid, s.score AS score
       |FROM ($matches) AS m
       |JOIN (SELECT uid, CAST(SUM(c) AS BIGINT) AS score
       |      FROM ($scores) AS parts GROUP BY uid) AS s
       |ON m.uid = s.uid""".stripMargin
  }

  /** SQL subquery computing Okapi BM25 scores for a match (Lucene-style
    * idf: `ln(1 + (N − df + 0.5)/(df + 0.5))`): (uid, score ROUND roundTo).
    * Everything derives from the postings view — doc length = posting count
    * per uid, N/avgdl from one aggregate over it — so the same SQL runs on
    * any engine (the t05 oracle twin is textually the same formula). The
    * reference reaches bm25 via FTS5 ORDER passthrough (graphydb.py:956-962);
    * this is that surface re-expressed over the inverted index. */
  def bm25Sql(postingsView: String, query: String,
      k1: Double = 1.2, b: Double = 0.75, roundTo: Int = 4): String = {
    val branches = parseQuery(query)
    require(branches.nonEmpty, s"empty FTS match: '$query'")
    val atoms = branches.flatten
    val tfs = atoms.zipWithIndex.map { case (a, i) =>
      s"tf$i AS (${scoreSelect(postingsView, a)})"
    }
    // (k1+1) and (1-b) are pre-folded so both engines parse the SAME literal
    // (cross-engine '+' on inexact doubles can round differently)
    val parts = atoms.indices.map { i =>
      s"""SELECT t.uid AS uid,
         |  LN(1 + (st.n - (SELECT COUNT(*) FROM tf$i) + 0.5) / ((SELECT COUNT(*) FROM tf$i) + 0.5))
         |  * t.c * ${k1 + 1} / (t.c + $k1 * (${1 - b} + $b * l.len / st.avgdl)) AS part
         |FROM tf$i t JOIN lens l ON l.uid = t.uid CROSS JOIN stats st""".stripMargin
    }
    val matches = branches
      .map(atomsB => atomsB.map(matchSelect(postingsView, _)).mkString("\nINTERSECT\n"))
      .map(bb => s"($bb)")
      .mkString("\nUNION\n")
    s"""WITH lens AS (SELECT uid, COUNT(*) AS len FROM $postingsView GROUP BY uid),
       |stats AS (SELECT COUNT(*) AS n, AVG(len) AS avgdl FROM lens),
       |${tfs.mkString(",\n")}
       |SELECT m.uid AS uid, ROUND(s.score, $roundTo) AS score
       |FROM ($matches) AS m
       |JOIN (SELECT uid, SUM(part) AS score
       |      FROM (${parts.mkString("\nUNION ALL\n")}) AS parts GROUP BY uid) AS s
       |ON m.uid = s.uid""".stripMargin
  }

  /** Incremental posting maintenance at scale (the distributed twin of
    * `updatefts`, graphydb.py:1165-1196): drop every posting of the updated
    * uids, append freshly tokenized ones. One anti-join + union — no
    * full-index rebuild. `updates`: (uid, field→text columns as in
    * [[postings]]). */
  def upsertPostings(current: DataFrame, updates: DataFrame, uidCol: String,
      fieldToTextCol: Map[String, String]): DataFrame = {
    val fresh = postings(updates, uidCol, fieldToTextCol)
    current.join(updates.select(col(uidCol).as("uid")).distinct(), Seq("uid"), "left_anti")
      .unionByName(fresh)
  }

  /** Distributed `deletefts` (graphydb.py:1237-1244): drop postings by uid. */
  def deletePostings(current: DataFrame, uids: DataFrame, uidCol: String = "uid"): DataFrame =
    current.join(uids.select(col(uidCol).as("uid")).distinct(), Seq("uid"), "left_anti")

  // monotonic view names (identity hashes can collide between live frames);
  // each view is dropped as soon as spark.sql's EAGER analysis has resolved
  // the plan, so match calls leak nothing into the session catalog
  private val viewCounter = new java.util.concurrent.atomic.AtomicLong(0)

  private def withView(postings: DataFrame)(sql: String => String): DataFrame = {
    val spark = postings.sparkSession
    val view = s"graft_fts_${viewCounter.incrementAndGet()}"
    postings.createOrReplaceTempView(view)
    try spark.sql(sql(view))
    finally spark.catalog.dropTempView(view)
  }

  /** DataFrame form of a match: DISTINCT matching uids. */
  def matchUids(postings: DataFrame, query: String): DataFrame =
    withView(postings)(matchSql(_, query)).select("uid")

  /** DataFrame form with the tf ranking column: (uid, score). */
  def matchScores(postings: DataFrame, query: String): DataFrame =
    withView(postings)(matchSql(_, query))

  /** DataFrame form of [[bm25Sql]]: (uid, score). */
  def matchBm25(postings: DataFrame, query: String,
      k1: Double = 1.2, b: Double = 0.75, roundTo: Int = 4): DataFrame =
    withView(postings)(bm25Sql(_, query, k1, b, roundTo))
}
