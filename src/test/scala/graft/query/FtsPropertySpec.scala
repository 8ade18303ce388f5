package graft.query

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized equivalence for the hand-rolled FTS grammar: for random small
  * corpora and random OR/AND/phrase/prefix/field query trees, the compiled
  * match must return the same uid set as a naive in-driver evaluator of the
  * FTS5-subset semantics. */
class FtsPropertySpec extends AnyFunSuite with SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
  private val fields = Vector("title", "body")

  private final case class NDoc(uid: String, title: Seq[String], body: Seq[String]) {
    def field(f: String): Seq[String] = if (f == "title") title else body
  }

  private sealed trait QAtom
  private final case class QTerm(t: String, prefix: Boolean, field: Option[String],
      anchor: Boolean = false) extends QAtom
  private final case class QPhrase(toks: Seq[String], field: Option[String],
      anchor: Boolean = false) extends QAtom

  // a field scope is comma-joined: "title" or the r5 column list
  // "title,body"; a leading "-" (r11, FTS5 `-col:`/-{col list}:`) negates
  // the scope — match in any field NOT listed
  private def scopeFields(f: Option[String]): Seq[String] = f match {
    case Some(s) if s.startsWith("-") =>
      val ex = s.drop(1).split(',').toSet
      fields.filterNot(ex)
    case Some(s) => s.split(',').toSeq
    case None => fields
  }

  private def naiveAtom(d: NDoc, a: QAtom): Boolean = a match {
    case QTerm(t, pre, f, anchor) =>
      scopeFields(f).exists { fl =>
        val toks = d.field(fl)
        // FTS5 `^term`: only the field's first token can match
        val cand = if (anchor) toks.take(1) else toks
        if (pre) cand.exists(_.startsWith(t)) else cand.contains(t)
      }
    case QPhrase(ts, f, anchor) =>
      scopeFields(f).exists { fl =>
        val toks = d.field(fl)
        val starts = if (anchor) Seq(0).filter(_ => toks.nonEmpty) else toks.indices
        starts.exists(i => i + ts.size <= toks.size && toks.slice(i, i + ts.size) == ts)
      }
  }

  // single field renders inline (`title:x`); a multi-field scope renders as
  // the FTS5 column-list form (`{title body}: x`)
  private def renderScope(f: Option[String]): String = f match {
    case Some(s) if s.startsWith("-") && s.contains(',') =>
      "-{" + s.drop(1).split(',').mkString(" ") + "}: "
    case Some(s) if s.startsWith("-") => s + ":" // -title:
    case Some(s) if s.contains(',') => "{" + s.split(',').mkString(" ") + "}: "
    case Some(s) => s + ":"
    case None => ""
  }

  private def render(branches: Seq[Seq[QAtom]]): String =
    branches.map(_.map {
      case QTerm(t, pre, f, anchor) =>
        renderScope(f) + (if (anchor) "^" else "") + t + (if (pre) "*" else "")
      case QPhrase(ts, f, anchor) =>
        renderScope(f) + (if (anchor) "^" else "") + "\"" + ts.mkString(" ") + "\""
    }.mkString(" ")).mkString(" OR ")

  // r4 grammar extensions: NEAR proximity groups and binary NOT;
  // r5: members may be ^anchored (position list restricted to {0})
  private def termPositions(toks: Seq[String], t: String): Seq[Int] =
    toks.zipWithIndex.collect { case (x, i) if x == t => i }

  private def naiveNear(d: NDoc, members: Seq[(String, Boolean)], dist: Int,
      scope: Seq[String] = fields): Boolean =
    scope.exists { fl =>
      val toks = d.field(fl)
      val posLists = members.map { case (t, anchored) =>
        val ps = termPositions(toks, t)
        if (anchored) ps.filter(_ == 0) else ps
      }
      posLists.forall(_.nonEmpty) && {
        val combos = posLists.foldLeft(Seq(Seq.empty[Int])) {
          (acc, ps) => acc.flatMap(c => ps.map(c :+ _))
        }
        combos.exists(c => c.max - c.min <= dist)
      }
    }
  private def naiveNear(d: NDoc, members: Seq[String], dist: Int): Boolean =
    naiveNear(d, members.map(_ -> false), dist)

  test("random NEAR/NOT trees ≡ naive evaluator") {
    val rng = new Random(2024)
    for (round <- 1 to 5) {
      val docs = (1 to (6 + rng.nextInt(4))).map { i =>
        def ts() = Seq.fill(3 + rng.nextInt(6))(vocab(rng.nextInt(vocab.size)))
        NDoc(s"u$i", ts(), ts())
      }
      import spark.implicits._
      val df = docs.map(d => (d.uid, d.title.mkString(" "), d.body.mkString(" ")))
        .toDF("uid", "title", "body")
      val idx = Fts.postings(df, "uid", Map("title" -> "title", "body" -> "body"))

      for (_ <- 1 to 8) {
        val kind = rng.nextInt(3)
        val (q, want) = kind match {
          case 0 => // NEAR(t1 t2, n)
            val t1 = vocab(rng.nextInt(vocab.size)); val t2 = vocab(rng.nextInt(vocab.size))
            val n = rng.nextInt(4)
            (s"NEAR($t1 $t2, $n)",
              docs.filter(d => naiveNear(d, Seq(t1, t2), n)).map(_.uid).toSet)
          case 1 => // a NOT b
            val a = vocab(rng.nextInt(vocab.size)); val b = vocab(rng.nextInt(vocab.size))
            def has(d: NDoc, t: String) = (d.title ++ d.body).contains(t)
            (s"$a NOT $b",
              docs.filter(d => has(d, a) && !has(d, b)).map(_.uid).toSet)
          case _ => // (a NOT b) OR NEAR(c d, n): NOT binds inside its branch
            val a = vocab(rng.nextInt(vocab.size)); val b = vocab(rng.nextInt(vocab.size))
            val c = vocab(rng.nextInt(vocab.size)); val e = vocab(rng.nextInt(vocab.size))
            val n = 1 + rng.nextInt(3)
            def has(d: NDoc, t: String) = (d.title ++ d.body).contains(t)
            (s"$a NOT $b OR NEAR($c $e, $n)",
              docs.filter(d => (has(d, a) && !has(d, b)) || naiveNear(d, Seq(c, e), n))
                .map(_.uid).toSet)
        }
        val got = Fts.matchUids(idx, q).collect().map(_.getString(0)).toSet
        assert(got == want, s"round $round query <$q>: got $got want $want")
      }
    }
  }

  test("random anchored/column-scoped NEAR groups ≡ naive evaluator (r5)") {
    val rng = new Random(777)
    for (round <- 1 to 4) {
      val docs = (1 to (6 + rng.nextInt(4))).map { i =>
        def ts() = Seq.fill(3 + rng.nextInt(5))(vocab(rng.nextInt(vocab.size)))
        NDoc(s"u$i", ts(), ts())
      }
      import spark.implicits._
      val df = docs.map(d => (d.uid, d.title.mkString(" "), d.body.mkString(" ")))
        .toDF("uid", "title", "body")
      val idx = Fts.postings(df, "uid", Map("title" -> "title", "body" -> "body"))

      for (_ <- 1 to 6) {
        val m1 = (vocab(rng.nextInt(vocab.size)), rng.nextInt(3) == 0)
        val m2 = (vocab(rng.nextInt(vocab.size)), rng.nextInt(3) == 0)
        val n = rng.nextInt(4)
        def mr(m: (String, Boolean)) = (if (m._2) "^" else "") + m._1
        val (scopePrefix, scope) = rng.nextInt(3) match {
          case 0 => ("", fields)
          case 1 => val f = fields(rng.nextInt(2)); (s"$f: ", Seq(f))
          case _ => ("{title body}: ", fields)
        }
        val q = s"${scopePrefix}NEAR(${mr(m1)} ${mr(m2)}, $n)"
        val want = docs.filter(d => naiveNear(d, Seq(m1, m2), n, scope)).map(_.uid).toSet
        val got = Fts.matchUids(idx, q).collect().map(_.getString(0)).toSet
        assert(got == want, s"round $round query <$q>: got $got want $want")
      }
    }
  }

  test("NEAR default distance is 10; phrase members anchor at phrase start") {
    import spark.implicits._
    val df = Seq(
      ("d1", "alpha beta gamma delta eps zeta"),
      ("d2", "alpha zeta beta other other other other other other other other gamma"),
      ("d3", "gamma alpha beta")).toDF("uid", "body")
    val idx = Fts.postings(df, "uid", Map("body" -> "body"))
    // alpha..gamma within default 10 in d1 (Δ2) and d3 (Δ1); d2 has Δ11
    assert(Fts.matchUids(idx, "NEAR(alpha gamma)").collect().map(_.getString(0)).toSet
      == Set("d1", "d3"))
    // phrase member: "alpha beta" starts at 0 (d1) / 1 (d3); gamma at 2 / 0
    assert(Fts.matchUids(idx, "NEAR(\"alpha beta\" gamma, 2)")
      .collect().map(_.getString(0)).toSet == Set("d1", "d3"))
    assert(Fts.matchUids(idx, "NEAR(\"alpha beta\" gamma, 1)")
      .collect().map(_.getString(0)).toSet == Set("d3"),
      "d1's phrase-start 0 to gamma 2 exceeds a 1-token window")
  }

  test("random OR/AND/phrase/prefix/field queries ≡ naive evaluator") {
    val rng = new Random(4242)
    for (round <- 1 to 5) {
      val docs = (1 to (6 + rng.nextInt(4))).map { i =>
        def ts() = Seq.fill(2 + rng.nextInt(5))(vocab(rng.nextInt(vocab.size)))
        NDoc(s"u$i", ts(), ts())
      }
      import spark.implicits._
      val df = docs.map(d => (d.uid, d.title.mkString(" "), d.body.mkString(" ")))
        .toDF("uid", "title", "body")
      val idx = Fts.postings(df, "uid", Map("title" -> "title", "body" -> "body"))

      for (_ <- 1 to 6) {
        def atom(): QAtom = {
          // r5: occasionally a `{...}:` column list (comma-joined internal
          // form) of 1 or 2 distinct fields
          val field = rng.nextInt(8) match {
            case 0 | 1 => Some(fields(rng.nextInt(2)))
            case 2     => Some(Seq.fill(1 + rng.nextInt(2))(fields(rng.nextInt(2))).distinct.mkString(","))
            // r11: negated scopes — `-title:` and `-{title body}:`
            case 3     => Some("-" + fields(rng.nextInt(2)))
            case 4     => Some("-" + Seq.fill(1 + rng.nextInt(2))(fields(rng.nextInt(2))).distinct.mkString(","))
            case _     => None
          }
          if (rng.nextInt(3) == 0) {
            // a phrase sampled from a real doc (random phrases rarely match)
            val d = docs(rng.nextInt(docs.size))
            val fl = field.getOrElse(fields(rng.nextInt(2)))
            val toks = d.field(fl)
            val n = 2 + rng.nextInt(2)
            if (toks.size < n) QTerm(vocab(rng.nextInt(vocab.size)), prefix = false, field)
            else {
              val i = rng.nextInt(toks.size - n + 1)
              QPhrase(toks.slice(i, i + n), field, anchor = rng.nextInt(4) == 0)
            }
          } else {
            val t = vocab(rng.nextInt(vocab.size))
            val prefix = rng.nextInt(4) == 0
            // r5 grammar extension: ^term initial-token anchor
            QTerm(if (prefix) t.take(2) else t, prefix, field, anchor = rng.nextInt(4) == 0)
          }
        }
        val branches = Seq.fill(1 + rng.nextInt(3))(Seq.fill(1 + rng.nextInt(2))(atom()))
        val q = render(branches)
        val got = Fts.matchUids(idx, q).collect().map(_.getString(0)).toSet
        val want = docs.filter(d => branches.exists(_.forall(naiveAtom(d, _)))).map(_.uid).toSet
        assert(got == want, s"round $round query <$q>: got $got want $want")
      }
    }
  }

  test("random parenthesized boolean trees ≡ naive evaluator (r11)") {
    // FTS5 full grammar: `(`…`)` groups nest AND/OR/binary-NOT arbitrarily,
    // and a preceding `field:` scopes every unscoped atom inside the group
    val rng = new Random(1111)
    sealed trait T
    final case class TL(a: QTerm) extends T
    final case class TA(l: T, r: T) extends T
    final case class TO(l: T, r: T) extends T
    final case class TN(l: T, r: T) extends T
    def leaf(): T = {
      // scopes may be negated (r11 `-col:`) — the naive side complements
      val field = if (rng.nextInt(4) == 0)
        Some((if (rng.nextInt(3) == 0) "-" else "") + fields(rng.nextInt(2)))
      else None
      val t = vocab(rng.nextInt(vocab.size))
      val prefix = rng.nextInt(5) == 0
      TL(QTerm(if (prefix) t.take(2) else t, prefix, field))
    }
    def gen(depth: Int): T =
      if (depth == 0 || rng.nextInt(3) == 0) leaf()
      else rng.nextInt(3) match {
        case 0 => TA(gen(depth - 1), gen(depth - 1))
        case 1 => TO(gen(depth - 1), gen(depth - 1))
        case _ => TN(gen(depth - 1), gen(depth - 1))
      }
    def pushScope(t: T, f: String): T = t match {
      case TL(a)    => TL(a.copy(field = a.field.orElse(Some(f))))
      case TA(l, r) => TA(pushScope(l, f), pushScope(r, f))
      case TO(l, r) => TO(pushScope(l, f), pushScope(r, f))
      case TN(l, r) => TN(pushScope(l, f), pushScope(r, f))
    }
    def render(t: T): String = t match {
      case TL(QTerm(s, pre, f, _)) => renderScope(f) + s + (if (pre) "*" else "")
      case TA(l, r) => s"( ${render(l)} AND ${render(r)} )"
      case TO(l, r) => s"( ${render(l)} OR ${render(r)} )"
      case TN(l, r) => s"( ${render(l)} NOT ${render(r)} )"
    }
    def eval(d: NDoc, t: T): Boolean = t match {
      case TL(a)    => naiveAtom(d, a)
      case TA(l, r) => eval(d, l) && eval(d, r)
      case TO(l, r) => eval(d, l) || eval(d, r)
      case TN(l, r) => eval(d, l) && !eval(d, r)
    }
    for (round <- 1 to 4) {
      val docs = (1 to (6 + rng.nextInt(4))).map { i =>
        def ts() = Seq.fill(2 + rng.nextInt(5))(vocab(rng.nextInt(vocab.size)))
        NDoc(s"u$i", ts(), ts())
      }
      import spark.implicits._
      val df = docs.map(d => (d.uid, d.title.mkString(" "), d.body.mkString(" ")))
        .toDF("uid", "title", "body")
      val idx = Fts.postings(df, "uid", Map("title" -> "title", "body" -> "body"))
      for (_ <- 1 to 6) {
        val t0 = gen(3)
        // occasionally scope the whole tree: `title: ( ... )`
        val (q, t) =
          if (rng.nextInt(4) == 0) {
            val f = (if (rng.nextInt(3) == 0) "-" else "") + fields(rng.nextInt(2))
            (s"$f: ( ${render(t0)} )", pushScope(t0, f))
          } else (render(t0), t0)
        val got = Fts.matchUids(idx, q).collect().map(_.getString(0)).toSet
        val want = docs.filter(eval(_, t)).map(_.uid).toSet
        assert(got == want, s"round $round query <$q>: got $got want $want")
      }
    }
  }

  test("random accented corpora: unicode61 fold ≡ naive evaluator over folded tokens (r14)") {
    // accent VARIANTS that fold together (café/cafe, résumé/resume …) plus
    // ß, which does NOT decompose and must stay its own token
    val accVocab = Vector("café", "cafe", "résumé", "resume", "naïve",
      "naive", "tarde", "tàrde", "straße", "beta")
    def fold(t: String): String = Fts.unicode61Fold(t)
    val rng = new Random(4114)
    for (round <- 1 to 4) {
      val docs = (1 to (6 + rng.nextInt(4))).map { i =>
        def ts() = Seq.fill(3 + rng.nextInt(5))(accVocab(rng.nextInt(accVocab.size)))
        NDoc(s"u$i", ts(), ts())
      }
      // the naive twin evaluates over FOLDED tokens with FOLDED query text
      val folded = docs.map(d =>
        d.copy(title = d.title.map(fold), body = d.body.map(fold)))
      import spark.implicits._
      val df = docs.map(d => (d.uid, d.title.mkString(" "), d.body.mkString(" ")))
        .toDF("uid", "title", "body")
      val idx = Fts.postings(df, "uid",
        Map("title" -> "title", "body" -> "body"), unicode61 = true)
      for (_ <- 1 to 8) {
        def pick() = accVocab(rng.nextInt(accVocab.size))
        val (q, atom) = rng.nextInt(4) match {
          case 0 => // bare term, random accent variant
            val t = pick()
            (t, QTerm(fold(t), prefix = false, None))
          case 1 => // prefix (fold the stem, then prefix-match folded tokens)
            val t = pick()
            val stem = t.substring(0, math.max(1, t.length - 2))
            (stem + "*", QTerm(fold(stem), prefix = true, None))
          case 2 => // two-token phrase of random variants
            val (t1, t2) = (pick(), pick())
            (s"\"$t1 $t2\"", QPhrase(Seq(fold(t1), fold(t2)), None))
          case _ => // field-scoped term
            val t = pick(); val f = fields(rng.nextInt(2))
            (s"$f:$t", QTerm(fold(t), prefix = false, Some(f)))
        }
        val got = Fts.matchUids(idx, q, unicode61 = true)
          .collect().map(_.getString(0)).toSet
        val want = folded.filter(naiveAtom(_, atom)).map(_.uid).toSet
        assert(got == want, s"round $round query <$q>: got $got want $want")
      }
    }
  }
}
