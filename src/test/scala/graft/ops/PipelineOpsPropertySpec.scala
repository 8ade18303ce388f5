package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Seeded-random equivalence suites for the training-pipeline operators:
  * each distributed plan is checked against a naive in-driver evaluator on
  * randomized inputs (the same doctrine as FetchPropertySpec/UndoPropertySpec,
  * which found real bugs in round 2). */
class PipelineOpsPropertySpec extends AnyFunSuite with SparkSpec {

  test("asofJoin ≡ naive per-row scan on random event streams") {
    import spark.implicits._
    val rnd = new Random(20260812L)
    for (round <- 1 to 3) {
      // dense ts range forces collisions so the (ts, event_id) tiebreak is hit
      val events = (1 to 200).map { i =>
        (i.toLong, rnd.nextInt(8), if (rnd.nextBoolean()) "view" else "purchase",
          rnd.nextInt(40))
      }
      val naive = events.filter(_._3 == "purchase").map { case (id, u, _, t) =>
        val prior = events.filter { case (vid, vu, vt, vts) =>
          vt == "view" && vu == u && (vts < t || (vts == t && vid < id))
        }
        // latest prior in (ts, event_id) order
        id -> prior.sortBy(e => (e._4, e._1)).lastOption.map(_._1)
      }.toMap
      val df = events.toDF("event_id", "user_id", "event_type", "secs")
        .withColumn("ts", timestamp_seconds(col("secs"))).drop("secs")
      val got = Events.asofJoin(df, "purchase", "view")
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long]))
        .toMap
      assert(got == naive, s"round $round diverged from the naive evaluator")
    }
  }

  test("stratifiedExact is invariant under input partitioning and row order") {
    import spark.implicits._
    val rnd = new Random(7L)
    val rows = rnd.shuffle((1 to 300).toList).map(i => (i.toLong, s"g${i % 5}"))
    val base = rows.toDF("id", "grp")
    val expected = Sampling.stratifiedExact(base, "grp", "id", 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    for (parts <- Seq(1, 3, 17)) {
      val reshaped = rows.reverse.toDF("id", "grp").repartition(parts)
      val got = Sampling.stratifiedExact(reshaped, "grp", "id", 7)
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == expected, s"sample changed under repartition($parts)")
    }
  }

  test("packBins ≡ naive sequential cumulative-sum fold per shard") {
    import spark.implicits._
    val rnd = new Random(42L)
    val docs = (1 to 120).map { i =>
      val shard = s"sh${i % 3}"
      val tokens = (1 to (1 + rnd.nextInt(9))).map(k => s"w$k").mkString(" ")
      (i.toLong, shard, tokens)
    }
    val budget = 12
    val naive = docs.groupBy(_._2).flatMap { case (_, shardDocs) =>
      var cum = 0L
      shardDocs.sortBy(_._1).map { case (id, _, text) =>
        val bin = (cum / budget).toInt
        cum += text.split(" ").length
        id -> bin
      }
    }
    val got = TextAnalysis.packBins(docs.toDF("doc_id", "shard", "text"),
        "shard", "doc_id", "text", budget)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("bin")).toMap
    assert(got == naive)
  }

  test("scrubRepeatedNgrams ≡ naive hot-span masking on random corpora") {
    import spark.implicits._
    val rnd = new Random(20260813L)
    for ((n, minDf) <- Seq((2, 2), (3, 2), (3, 3))) {
      // tiny vocab forces heavy n-gram collisions across docs
      val vocab = Seq("a", "b", "c", "d")
      val docs = (1 to 30).map { i =>
        val len = 1 + rnd.nextInt(10) // includes docs shorter than n
        (i.toLong, (1 to len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val grams = docs.flatMap { case (id, text) =>
        text.split(" ").sliding(n).filter(_.length == n).map(g => (id, g.mkString(" ")))
      }
      val hot = grams.distinct.groupBy(_._2).filter(_._2.size >= minDf).keySet
      val naive = docs.map { case (id, text) =>
        val toks = text.split(" ")
        val covered = toks.sliding(n).zipWithIndex
          .filter { case (g, _) => g.length == n && hot(g.mkString(" ")) }
          .flatMap { case (_, s) => s until s + n }.toSet
        val keptToks = toks.zipWithIndex.filterNot(t => covered(t._2)).map(_._1)
        id -> ((toks.length.toLong, (toks.length - keptToks.length).toLong,
          keptToks.mkString(" ")))
      }.toMap
      val got = Dedup.scrubRepeatedNgrams(docs.toDF("doc_id", "text"),
          "doc_id", "text", n, minDf)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got == naive, s"(n=$n, minDf=$minDf) diverged from the naive evaluator")
    }
  }

  test("contamination ratio equals the naive shingle-set intersection") {
    import spark.implicits._
    val rnd = new Random(99L)
    val vocab = (1 to 20).map(i => s"tok$i")
    val docs = (1 to 40).map { i =>
      (i.toLong, (1 to 15).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val k = 3
    def shingles(text: String): Set[String] =
      text.split(" ").sliding(k).filter(_.length == k).map(_.mkString(" ")).toSet
    val isEval = (id: Long) => id % 7 == 0
    val trainSh = docs.filterNot(d => isEval(d._1)).flatMap(d => shingles(d._2)).toSet
    val naive = docs.filter(d => isEval(d._1)).map { case (id, text) =>
      val sh = shingles(text)
      id -> (sh.size.toLong, sh.count(trainSh.contains).toLong)
    }.toMap
    val got = Dedup.contamination(docs.toDF("doc_id", "text"), "doc_id", "text",
        col("doc_id") % 7 === 0, k)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == naive)
  }

  /** Guards the r8 bucket-array pair rewrite: jaccard values and pair sets
    * against a naive evaluator, capped and uncapped, across partitionings
    * (collect_list order is nondeterministic — results must not be). */
  test("ngramJaccardPairs ≡ naive shingle-set evaluator, capped and uncapped") {
    import spark.implicits._
    val rnd = new Random(20260813L)
    // tiny vocab so shingles actually collide across docs
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val k = 3
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ")
      (0 to toks.length - k).map(i => toks.slice(i, i + k).mkString(" ")).toSet
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (round <- 1 to 3) {
      val docs = (1L to 30L).map { id =>
        id -> Seq.fill(3 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val sets = docs.map { case (id, t) => id -> shingles(t) }.toMap
      val dfCount = sets.values.flatten.groupBy(identity).map { case (s, xs) => s -> xs.size }
      for (maxDf <- Seq(Long.MaxValue, 4L)) {
        val naive = (for {
          (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a < b
          shared = (sa intersect sb).count(s => dfCount(s) <= maxDf)
          if shared >= 1
        } yield (a, b) -> round6(
          shared.toDouble / (sa.size + sb.size - shared))).toMap
        for (nPart <- Seq(1, 7)) {
          val got = Dedup.ngramJaccardPairs(
              docs.toDF("doc_id", "text").repartition(nPart),
              "doc_id", "text", k, threshold = 0.0, maxDf = maxDf)
            .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
          assert(got == naive,
            s"round $round maxDf=$maxDf nPart=$nPart diverged from naive")
        }
      }
    }
  }

  test("embeddingDupPairs ≡ naive per-block cosine; partitioning-invariant") {
    import spark.implicits._
    val rnd = new Random(424242L)
    for (round <- 1 to 3) {
      val vecs = (1L to 30L).map { id =>
        (id, Array.fill(6)(rnd.nextFloat() * 2f - 1f), rnd.nextInt(4))
      }
      // mirror CosineSimilarity.nullSafeEval: float->double per element,
      // dot / (sqrt(nx) * sqrt(ny)), then round to 6 dp
      def cos(x: Array[Float], y: Array[Float]): Double = {
        var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
        while (i < x.length) {
          val xi = x(i).toDouble; val yi = y(i).toDouble
          dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
        }
        BigDecimal(dot / (math.sqrt(nx) * math.sqrt(ny)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val threshold = 0.5
      val naive = (for {
        (a, va, ba) <- vecs; (b, vb, bb) <- vecs
        if a < b && ba == bb
        c = cos(va, vb) if c >= threshold
      } yield (a, b) -> c).toMap
      for (nPart <- Seq(1, 7)) {
        val got = Dedup.embeddingDupPairs(
            vecs.toDF("vec_id", "embedding", "label").repartition(nPart),
            "vec_id", "embedding", "label", threshold)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        assert(got == naive, s"round $round nPart=$nPart diverged from naive")
      }
    }
  }

  test("lshCandidates: partitioning-invariant; cap is exact and audited") {
    import spark.implicits._
    val rnd = new Random(777L)
    val base = "the quick brown fox jumps over the lazy dog by the river"
    val docs = (1L to 24L).map { id =>
      // clusters of identical docs -> guaranteed full-signature collisions
      id -> (if (id <= 8) base else if (id <= 12) base.replace("dog", "cat")
             else Seq.fill(10)(s"w${rnd.nextInt(30)}").mkString(" "))
    }.toDF("doc_id", "text")
    val p1 = Dedup.lshCandidates(docs.repartition(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p7 = Dedup.lshCandidates(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 == p7, "candidate set must not depend on input partitioning")
    assert((1L to 8L).flatMap(a => (a + 1 to 8L).map(a -> _)).forall(p1.contains),
      "identical docs collide in every band")
    // capping at 7 drops the 8-doc identical bucket; the audit names it
    val capped = Dedup.lshCandidates(docs, "doc_id", "text", maxBucket = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(p1))
    assert(!capped.contains((1L, 2L)), "over-cap bucket pairs must be dropped")
    val audit = Dedup.lshOverflowBuckets(docs, "doc_id", "text", maxBucket = 7L)
    assert(audit.count() > 0, "a non-silent cap names what it dropped")
  }

  test("Quality.check / violations ≡ naive evaluators on random frames with nulls") {
    import spark.implicits._
    val rnd = new Random(20260814L)
    for (round <- 1 to 3) {
      val rows = (1 to 150).map { i =>
        val id = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(60).toLong)
        val v = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(200) - 50.0)
        val kind = Seq("a", "b", "c", "junk")(rnd.nextInt(4))
        (i.toLong, id, v, kind)
      }
      val df = rows.toDF("row_id", "id", "value", "kind").repartition(4)
      val rules = Seq(
        Quality.notNull("id_not_null", col("id")),
        Quality.inRange("value_0_100", col("value"), 0.0, 100.0),
        Quality.inSet("kind_known", col("kind"), Seq("a", "b", "c")))
      // naive: NULL evaluations are violations
      def bad(r: (Long, Option[Long], Option[Double], String)): Seq[String] =
        Seq(
          if (r._2.isEmpty) Some("id_not_null") else None,
          if (!r._3.exists(v => v >= 0.0 && v <= 100.0)) Some("value_0_100") else None,
          if (!Seq("a", "b", "c").contains(r._4)) Some("kind_known") else None).flatten
      val naiveCounts = rules.map(_.name).map(n =>
        n -> rows.count(bad(_).contains(n)).toLong).toMap +
        ("unique:id" -> (rows.size - rows.flatMap(_._2).distinct.size).toLong)
      val got = Quality.check(df, rules, uniqueKeys = Seq("id"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == naiveCounts, s"round $round check diverged: $got vs $naiveCounts")
      val gotRows = Quality.violations(df, rules)
        .collect().map(r => r.getAs[Long]("row_id") -> r.getAs[String]("broken_rules")).toMap
      val naiveRows = rows.flatMap(r =>
        Option(bad(r)).filter(_.nonEmpty).map(b => r._1 -> b.mkString(","))).toMap
      assert(gotRows == naiveRows, s"round $round violations diverged")
    }
  }

  test("paragraphDedup ≡ naive first-occurrence scan on random corpora") {
    import spark.implicits._
    val rnd = new Random(20260814L)
    for (round <- 1 to 3) {
      // tiny vocab + short window force heavy cross-doc segment collisions
      val docs = (1L to 40L).map { id =>
        id -> (1 to (1 + rnd.nextInt(12)))
          .map(_ => s"w${rnd.nextInt(4)}").mkString(" ")
      }
      val window = 2
      // naive: global (doc, idx)-ordered scan keeps first occurrence of text
      val seen = scala.collection.mutable.Set.empty[String]
      val naive = docs.map { case (id, text) =>
        val segs = text.split(" ").grouped(window).map(_.mkString(" ")).toSeq
        val kept = segs.filter(s => seen.add(s))
        id -> ((segs.size.toLong, kept.size.toLong, kept.mkString(" ")))
      }.toMap
      val got = TextAnalysis.paragraphDedup(
          docs.toDF("doc_id", "text").repartition(5), "doc_id", "text", window)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == naive, s"round $round diverged from the naive evaluator")
    }
  }

  test("triangleCounts ≡ brute-force triple enumeration on random graphs") {
    import spark.implicits._
    val rnd = new Random(42L)
    for (round <- 1 to 3) {
      val n = 14
      val edges = (for {
        a <- 1 to n; b <- (a + 1) to n if rnd.nextDouble() < 0.35
      } yield (a.toLong, b.toLong)).toSeq
      val adj = edges.toSet
      def conn(x: Long, y: Long) = adj((math.min(x, y), math.max(x, y)))
      val naive = (for {
        x <- 1L to n.toLong; y <- (x + 1) to n.toLong; z <- (y + 1) to n.toLong
        if conn(x, y) && conn(y, z) && conn(x, z)
      } yield Seq(x, y, z)).flatten
        .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
      // feed shuffled orientations and duplicates — canonicalization's job
      val noisy = rnd.shuffle(edges ++ edges.take(5).map(_.swap))
        .map { case (a, b) => if (rnd.nextBoolean()) (b, a) else (a, b) }
      val got = Analytics.triangleCounts(noisy.toDF("src", "dst").repartition(4))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive, s"round $round diverged from brute force")
    }
  }
}
