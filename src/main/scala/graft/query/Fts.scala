package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text search as an inverted-index posting table + match compiler
  * (SURVEY §7.5). Replaces the reference's SQLite FTS5 virtual tables
  * (graphydb.py:638-658 schema, 876-898 MATCH joins).
  *
  * Postings: `term STRING, field STRING, uid STRING`, one row per
  * (token, field, item). Tokenizer ≈ FTS5's default unicode61: lowercase,
  * split on non-alphanumeric.
  *
  * Match grammar — scoped to what the reference exercises
  * (test_graphdb.py:107-110 prefix `An*`; docstring graphydb.py:855
  * column-scoped `title: Quantum`; implicit AND of terms). NEAR/OR/phrase
  * and bm25 ranking are explicitly out of v1.
  */
object Fts {

  val TokenSplit = "[^\\p{L}\\p{N}]+"

  /** Posting rows for (uid, field, text) triples: lower → split → explode. */
  def postings(df: DataFrame, uidCol: String, fieldToTextCol: Map[String, String]): DataFrame = {
    val perField = fieldToTextCol.toSeq.map { case (field, textCol) =>
      df.select(
        explode(split(lower(col(textCol)), TokenSplit)).as("term"),
        lit(field).as("field"),
        col(uidCol).as("uid"))
        .filter(col("term") =!= "")
    }
    perField.reduce(_ unionByName _).distinct()
  }

  private final case class Term(text: String, prefix: Boolean, field: Option[String])

  /** Parse an FTS5-subset match string into AND-ed terms. A punctuated term
    * splits the same way the indexer tokenizes ("don't" → don AND t;
    * "state-of-the-art" → four AND-ed tokens) so queries and postings agree;
    * a trailing `*` applies prefix matching to the final token. */
  private def parseMatch(q: String): Seq[Term] = {
    // "field: term" — field scoping applies to the term following the colon
    val toks = q.trim.split("\\s+").toSeq
    var field: Option[String] = None
    val out = Seq.newBuilder[Term]
    toks.foreach { t0 =>
      var t = t0
      if (t.endsWith(":")) { field = Some(t.dropRight(1).toLowerCase) }
      else {
        if (t.contains(":")) {
          val Array(f, rest) = t.split(":", 2)
          field = Some(f.toLowerCase); t = rest
        }
        if (t.nonEmpty) {
          val prefix = t.endsWith("*")
          val pieces = (if (prefix) t.dropRight(1) else t).toLowerCase
            .split(TokenSplit).filter(_.nonEmpty)
          pieces.zipWithIndex.foreach { case (piece, idx) =>
            out += Term(piece, prefix && idx == pieces.length - 1, field)
          }
          field = None
        }
      }
    }
    out.result()
  }

  private def esc(s: String) = s.replace("'", "''")

  /** SQL subquery over a postings view returning DISTINCT matching uids.
    * Multiple terms = implicit AND = INTERSECT of per-term uid sets. */
  def matchSql(postingsView: String, query: String): String = {
    val terms = parseMatch(query)
    require(terms.nonEmpty, s"empty FTS match: '$query'")
    terms.map { t =>
      val cond = new StringBuilder
      if (t.prefix) cond.append(s"term LIKE '${esc(t.text)}%'")
      else cond.append(s"term = '${esc(t.text)}'")
      t.field.foreach(f => cond.append(s" AND field = '${esc(f)}'"))
      s"SELECT DISTINCT uid FROM $postingsView WHERE $cond"
    }.mkString("\nINTERSECT\n")
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

  /** Column-expression form of a match for DataFrame-side use. */
  def matchUids(postings: DataFrame, query: String): DataFrame = {
    val terms = parseMatch(query)
    require(terms.nonEmpty, s"empty FTS match: '$query'")
    terms.map { t =>
      val base: Column =
        if (t.prefix) col("term").startsWith(t.text) else col("term") === t.text
      val cond = t.field.map(f => base && col("field") === f).getOrElse(base)
      postings.filter(cond).select("uid").distinct()
    }.reduce((a, b) => a.join(b, Seq("uid"), "left_semi"))
  }
}
