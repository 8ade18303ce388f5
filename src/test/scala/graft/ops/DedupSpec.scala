package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit coverage of the dedup family on planted duplicates (the
  * oracle queries d01–d05 cover cross-engine equality; these pin algorithmic
  * behavior: recall of LSH vs exact jaccard, blocking filters, hamming
  * locality of simhash). */
class DedupSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val nearDup = base.replace("today", "tonight") // 1-token edit
    val half = "the quick brown fox sleeps all day long under a warm summer sun here"
    val unrelated = "completely different words about spark engines and parquet columnar files"
    Seq((1L, base), (2L, nearDup), (3L, half), (4L, unrelated), (5L, base))
      .toDF("doc_id", "text")
  }

  test("exact dedup keeps min id per identical text") {
    val kept = Dedup.exactDedup(docs, "doc_id", Seq("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L), "doc 5 is an exact copy of 1")
    val groups = Dedup.exactDupGroups(docs, "doc_id", Seq("text")).collect()
    assert(groups.length == 1 && groups.head.getAs[Long]("keep_id") == 1L
      && groups.head.getAs[Long]("copies") == 2L)
  }

  test("jaccard pairs rank exact copy > near-dup > unrelated") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 5L)) == 1.0)
    assert(pairs((1L, 2L)) > 0.6 && pairs((1L, 2L)) < 1.0)
    assert(!pairs.contains((1L, 4L)), "no shared shingle, pair never generated")
  }

  test("LSH candidates recall the high-jaccard pairs") {
    val cands = Dedup.lshCandidates(docs, "doc_id", "text", k = 3, bands = 4, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 5L)), "identical docs always collide in every band")
    assert(cands.contains((1L, 2L)) || cands.contains((2L, 5L)),
      "near-dup should collide in at least one band")
    assert(!cands.contains((1L, 4L)) && !cands.contains((3L, 4L)),
      "unrelated docs must not be candidates")
  }

  test("pair generation is join-free: bucket arrays, not self-joins (plan audit)") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.99f, 0.05f), 0),
      (3L, Array(0.0f, 1.0f), 0), (4L, Array(1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    // force real partitions: the tiny Seq fixtures constant-fold to a
    // LocalTableScan, which would make no-Exchange asserts vacuous
    val d = docs.repartition(2)
    // simhashDupPairs is deliberately absent: its 16-byte rows keep the
    // codegen'd self-join faster than interpreted bucket-array HOFs
    // (measured r8 — see its scaladoc)
    val plans = Map(
      "lshCandidates" -> Dedup.lshCandidates(d, "doc_id", "text", maxBucket = 1000L),
      "embeddingDupPairs" -> Dedup.embeddingDupPairs(
        vecs.repartition(2), "vec_id", "embedding", "label", 0.9))
      .map { case (n, df) => n -> df.queryExecution.executedPlan.toString }
    plans.foreach { case (n, p) =>
      assert(!p.contains("Join"),
        s"$n must generate pairs in-task from bucket arrays, not a self-join:\n$p")
    }
    // ngramJaccardPairs legitimately joins per-doc |A|/|B| sizes back in,
    // but the df-cap pre-pass semi-join and the bucket self-join are gone
    val nj = Dedup.ngramJaccardPairs(d, "doc_id", "text", k = 3,
      threshold = 0.0, maxDf = 3).queryExecution.executedPlan.toString
    assert(!nj.contains("LeftSemi"),
      s"df cap must be a size() filter on the bucket array, not a semi-join:\n$nj")
    assert(nj.split("Join", -1).length - 1 <= 2,
      s"only the two size joins may remain:\n$nj")
  }

  test("simhash: near-dups land within small hamming distance, unrelated far") {
    val h = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(5L)) == 0)
    assert(ham(h(1L), h(2L)) < ham(h(1L), h(4L)),
      s"near-dup ${ham(h(1L), h(2L))} should beat unrelated ${ham(h(1L), h(4L))}")
  }

  test("containment catches a doc embedded in a larger one that jaccard misses") {
    import spark.implicits._
    val small = "alpha beta gamma delta epsilon"
    val big = small + " zeta eta theta iota kappa lambda mu nu xi omicron pi rho"
    val df2 = Seq((1L, small), (2L, big), (3L, "unrelated tokens entirely right here"))
      .toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(df2, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cont((1L, 2L)) == 1.0, "every shingle of the small doc appears in the big one")
    assert(cont.size == 1, "unrelated doc never pairs")
    val jac = Dedup.ngramJaccardPairs(df2, "doc_id", "text", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac((1L, 2L)) < 0.25, "jaccard under-scores the embedded doc")
  }

  test("signature-estimated jaccard: 1.0 for identical docs; ≡ long-format signatures") {
    val cands = Dedup.lshCandidates(docs, "doc_id", "text")
    val est = Dedup.estimateJaccardBySignature(docs, "doc_id", "text", cands)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est((1L, 5L)) == 1.0, "identical docs share every minhash component")
    assert(est.keySet == cands.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet, "minEstimate=0 keeps all candidates")
    // independent recomputation from the long-format signature path
    val sig = Dedup.minhash(docs, "doc_id", "text").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(r => r.getInt(1) -> r.getLong(2)).toMap }
    est.foreach { case ((a, b), e) =>
      val frac = (0 until 16).count(i => sig(a)(i) == sig(b)(i)) / 16.0
      assert(e == BigDecimal(frac).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"estimate for ($a,$b) must equal the component-agreement fraction")
    }
  }

  test("commonShingleFilter drops high-df shingles") {
    val sh = Dedup.wordShingles(docs, "doc_id", "text", 3)
    val filtered = Dedup.commonShingleFilter(sh, maxDf = 2)
    val maxDf = filtered.groupBy("shingle").count().agg(max("count")).head().getLong(0)
    assert(maxDf <= 2)
    assert(filtered.count() < sh.count())
  }

  test("scrubRepeatedNgrams drops hot-gram spans, keeps order, keeps empty docs") {
    import spark.implicits._
    // "x y" (n=2) appears in docs 1, 2, 3 -> hot at minDf=3; "p q" only in
    // docs 1 and 4 -> cold. Doc 3 is exactly the hot gram -> scrubbed empty.
    val df = Seq(
      (1L, "a x y b p q"),
      (2L, "x y c x y"),
      (3L, "x y"),
      (4L, "p q r s t")).toDF("doc_id", "text")
    val got = Dedup.scrubRepeatedNgrams(df, "doc_id", "text", n = 2, minDf = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((6L, 2L, "a b p q")), "hot span removed, order kept")
    assert(got(2L) == ((5L, 4L, "c")), "both hot occurrences covered, middle token survives")
    assert(got(3L) == ((2L, 2L, "")), "fully-scrubbed doc still returns a row")
    assert(got(4L) == ((5L, 0L, "p q r s t")), "cold grams untouched")
  }

  test("embedding dup pairs within blocks only") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.99f, 0.05f), 0),
      (3L, Array(0.0f, 1.0f), 0), (4L, Array(1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingDupPairs(vecs, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), "only the near-identical same-block pair")
  }

  test("LSH-blocked embedding dedup recalls labeled-block dups without labels") {
    import spark.implicits._
    // near-identical pairs land in one hyperplane bucket with no label column
    val vecs = Seq(
      (1L, Array(1.00f, 0.02f, 0.01f)), (2L, Array(0.99f, 0.03f, 0.02f)),
      (3L, Array(0.01f, 1.00f, 0.02f)), (4L, Array(0.02f, 0.99f, 0.01f)),
      (5L, Array(0.01f, 0.02f, 1.00f)))
      .toDF("vec_id", "embedding")
    val labeled = Dedup.embeddingDupPairs(
      vecs.withColumn("label", when(col("vec_id") <= 2, 0).when(col("vec_id") <= 4, 1).otherwise(2)),
      "vec_id", "embedding", "label", 0.98)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingDupPairsLsh(vecs, "vec_id", "embedding", 0.98, bits = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labeled == Set((1L, 2L), (3L, 4L)))
    assert(labeled.subsetOf(lsh), s"LSH blocking must recall the labeled dups, got $lsh")
  }

  test("simhashDupPairs: identical docs at hamming 0, unrelated docs absent") {
    val pairs = Dedup.simhashDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 5L)) == 0, "identical docs share the exact simhash")
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)),
      "unrelated doc must not pair within hamming 3")
    // recall-completeness guard: the pigeonhole bound is enforced
    intercept[IllegalArgumentException] {
      Dedup.simhashDupPairs(docs, "doc_id", "text", maxHamming = 4, bands = 4)
    }
  }

  test("hammingBandPairs radius probing: exact recall vs brute force above the bands-1 bound (r11)") {
    import spark.implicits._
    // random 64-bit hashes + planted near-dups at hamming 1..10: the
    // radius-2 probe over 4 x 16-bit bands must find EXACTLY the brute-force
    // pair set for maxHamming = 10 (generalized pigeonhole: some band
    // differs by <= floor(10/4) = 2 bits)
    val rnd = new scala.util.Random(77)
    val base = (0L until 40L).map(i => (i, rnd.nextLong()))
    val planted = (1 to 10).map { d =>
      val (srcId, h) = base(rnd.nextInt(base.size))
      var flipped = h
      val bits = rnd.shuffle((0 until 64).toList).take(d)
      bits.foreach(b => flipped ^= (1L << b))
      (100L + d, flipped)
    }
    val all = base ++ planted
    val hashes = all.toDF("id", "hash")
    val got = Dedup.hammingBandPairs(hashes, bits = 64, maxHamming = 10,
        bands = 4, probeRadius = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val want = (for {
      (ia, ha) <- all; (ib, hb) <- all
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 10
    } yield (ia, ib) -> java.lang.Long.bitCount(ha ^ hb)).toMap
    assert(got == want, s"radius-probed pairs must equal brute force: " +
      s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
    assert(want.nonEmpty, "fixture must plant at least one in-threshold pair")
    // the loosened pigeonhole bound is enforced too
    intercept[IllegalArgumentException] {
      Dedup.hammingBandPairs(hashes, bits = 64, maxHamming = 12, bands = 4, probeRadius = 2)
    }
    // plan audit: the radius path pins shuffle-hash (exploded-side size
    // estimates lie — the unhinted plan broadcast 110M rows and OOM'd)
    val plan = Dedup.hammingBandPairs(hashes, bits = 64, maxHamming = 10,
      bands = 4, probeRadius = 2).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"radius-probed band join must be shuffle-hash:\n$plan")
  }

  test("embeddingDupPairsLshProbed: probing recovers plane-straddled pairs, precision stays exact (r11)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 30 clusters x 3 near-identical members (dim 16, sigma 0.15): at
    // bits=8 most true pairs straddle >= 1 hyperplane, the multi-probe
    // recovery target
    val rows = (0 until 30).flatMap { c =>
      val base = Array.fill(16)(rnd.nextGaussian().toFloat)
      (0 until 3).map { m =>
        (c * 10L + m, base.map(x => x + 0.15f * rnd.nextGaussian().toFloat))
      }
    }
    val df = rows.toDF("vec_id", "embedding")
    def pairSet(r: Int) = Dedup.embeddingDupPairsLshProbed(
        df, "vec_id", "embedding", threshold = 0.8, bits = 8, probeRadius = r)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    val brute = Dedup.embeddingDupPairs(df.withColumn("b0", lit(1)),
        "vec_id", "embedding", "b0", threshold = 0.8)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    val (p0, p1, p2) = (pairSet(0), pairSet(1), pairSet(2))
    assert(p0.keySet.subsetOf(p1.keySet) && p1.keySet.subsetOf(p2.keySet),
      "probing can only add pairs")
    assert(p2.keySet.subsetOf(brute.keySet), "cosine verify keeps precision exact")
    assert(p1.size > p0.size,
      s"radius-1 must recover straddled pairs: r0=${p0.size} r1=${p1.size} of ${brute.size}")
    // recovered pairs carry the same exact cosine as the brute-force path
    p2.foreach { case (k, c) => assert(brute(k) == c) }
    // plan audit: the probe join is the pinned shuffle-hash — the exploded
    // side's size estimate lies, so an unhinted plan would broadcast it
    val plan = Dedup.embeddingDupPairsLshProbed(
        df, "vec_id", "embedding", 0.8, bits = 8, probeRadius = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"probed candidate join must be shuffle-hash, not broadcast:\n$plan")
  }

  test("semanticDedup: one survivor per semantic cluster, cells bound the pair search (r11)") {
    import spark.implicits._
    // three orthogonal directions = three codebook cells; near-identical
    // vectors within a cell cluster transitively, lone members survive
    val rows = Seq(
      (1L, Array(1.0f, 0.01f, 0.0f)), (2L, Array(0.99f, 0.02f, 0.0f)),
      (3L, Array(0.97f, -0.03f, 0.0f)),
      (10L, Array(0.0f, 1.0f, 0.01f)), (11L, Array(0.01f, 0.99f, 0.0f)),
      (20L, Array(0.0f, 0.02f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cb = Seq((0, Seq(1.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0)), (2, Seq(0.0, 0.0, 1.0)))
    val surv = Dedup.semanticDedup(spark, rows, "vec_id", "embedding", cb, threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(surv == Set(1L, 10L, 20L),
      s"min-id per cluster {1,2,3} and {10,11}, singleton 20 survives: $surv")
  }

  test("dupClusters closes pairs transitively; dedupByClusters keeps min per group") {
    import spark.implicits._
    // pairs a-b, b-c but NOT a-c (the borderline-dup shape); separate pair 5-6
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val clusters = Dedup.dupClusters(spark, pairs)
    val byId = clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == 1L && byId(2L) == 1L && byId(3L) == 1L,
      "a-b + b-c must merge into one cluster without an a-c pair")
    assert(byId(5L) == 5L && byId(6L) == 5L)
    assert(!byId.contains(4L), "never-paired ids stay out of the cluster map")
    val docs6 = (1L to 6L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val kept = Dedup.dedupByClusters(docs6, "doc_id", clusters)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L), "one representative per cluster + untouched singletons")
  }

  test("dupClusters: driver union-find (gated) ≡ distributed GraphX CC on real pairs") {
    // the cardinality gate must be a pure plan choice, never a semantics
    // choice: both paths over the REAL corpus' LSH candidates produce the
    // identical (id → min-member-id) map. driverPairLimit = 0 forces the
    // GraphX path; the default takes the union-find path at this scale.
    val pairs = Dedup.lshCandidates(docs, "doc_id", "text")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gated = toMap(Dedup.dupClusters(spark, pairs))
    val graphx = toMap(Dedup.dupClusters(spark, pairs, driverPairLimit = 0L))
    assert(gated.nonEmpty && gated == graphx,
      "gated union-find and GraphX CC must agree exactly")
  }

  test("LSH bucket cap: degenerate bucket is dropped, other candidates unchanged") {
    import spark.implicits._
    // 30 identical short docs form one degenerate bucket per band
    val degenerate = (100L until 130L).map(i => (i, "x x x"))
    val all = docs.union(degenerate.toDF("doc_id", "text"))
    val uncapped = Dedup.lshCandidates(all, "doc_id", "text", maxBucket = Long.MaxValue)
    val capped = Dedup.lshCandidates(all, "doc_id", "text", maxBucket = 10L)
    val cappedPairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val keptOfOriginal = cappedPairs.filter { case (a, b) => a < 100L && b < 100L }
    val originalPairs = Dedup.lshCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keptOfOriginal == originalPairs,
      "capping a degenerate bucket must not change candidates for the rest of the corpus")
    assert(!cappedPairs.exists { case (a, b) => a >= 100L && b >= 100L },
      "the 30-doc degenerate bucket must be dropped by the cap")
    assert(uncapped.count() > capped.count(), "uncapped run pays the bucket² pairs")
    // the drop is auditable, not silent
    val overflow = Dedup.lshOverflowBuckets(all, "doc_id", "text", maxBucket = 10L).collect()
    assert(overflow.nonEmpty && overflow.forall(_.getAs[Long]("bcount") == 30L))
  }

  test("embedding block cap: degenerate block dropped, other pairs unchanged") {
    import spark.implicits._
    // block "big": 20 near-identical vectors; block "ok": one dup pair
    val big = (100L until 120L).map(i => (i, "big", Array(1.0f, 0.01f * i)))
    val ok = Seq((1L, "ok", Array(0.0f, 1.0f)), (2L, "ok", Array(0.0f, 2.0f)))
    val df = (big ++ ok).toDF("vec_id", "label", "embedding")
    val uncapped = Dedup.embeddingDupPairs(df, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.embeddingDupPairs(df, "vec_id", "embedding", "label", 0.9,
      maxBlock = 10L).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)), "only the small block's pair survives the cap")
    assert(uncapped.contains((1L, 2L)) && uncapped.size > capped.size,
      "uncapped run pays the block² pairs")
    val overflow = Dedup.overflowBlocks(df.select(col("vec_id"), col("label").as("blk")),
      "blk", maxBlock = 10L).collect()
    assert(overflow.length == 1 && overflow.head.getAs[Long]("bcount") == 20L)
  }

  test("contamination: verbatim eval copy scores 1.0, novel eval scores 0.0") {
    import spark.implicits._
    val trainText = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, trainText),
      (2L, "some other training text with many different words in this row"),
      (100L, trainText), // eval doc that copies train doc 1 verbatim
      (150L, "entirely novel unseen holdout sentence sharing nothing at all"))
      .toDF("doc_id", "text")
    val got = Dedup.contamination(df, "doc_id", "text", col("doc_id") >= 100L, k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(100L, 150L), "only eval docs are scored")
    assert(got(100L)._3 == 1.0, "all shingles of a verbatim copy are in train")
    assert(got(150L)._2 == 0L && got(150L)._3 == 0.0)
    assert(got(100L)._1 == 10L, "12 tokens → 10 distinct 3-gram shingles")
  }

  // ------------------------------------------------ incremental corpus dedup

  private val baseText = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val nearDupText = baseText.replace("today", "tonight")
  private val halfText = "the quick brown fox sleeps all day long under a warm summer sun here"
  private val otherText = "completely different words about spark engines and parquet columnar files"

  test("incremental dedup: increment finds cross-batch dups WITHOUT re-scanning batch-1 text") {
    import spark.implicits._
    // batch 1 goes through parquet so "batch-1 text scanned" would be a real,
    // assertable FileScan of this path in the increment's physical plan
    val b1Path = java.nio.file.Files.createTempDirectory("graft_inc_b1").toString
    Seq((1L, baseText), (3L, halfText), (4L, otherText)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(b1Path)
    val batch1 = spark.read.parquet(b1Path)
    Dedup.writeSignatureStore(spark, batch1, "doc_id", "text", "graft_spec_store")

    val batch2 = Seq((2L, nearDupText), (5L, baseText),
      (6L, "totally fresh content with no overlap whatsoever to anything stored"))
      .toDF("doc_id", "text")
    val inc = Dedup.dedupIncrement(spark, batch2, "doc_id", "text",
      "graft_spec_store", minEstimate = 0.5)

    // THE plan pin: batch-1 text is never re-read — the store side of the
    // plan scans only signature tables (no FileScan of the batch-1 parquet)
    val plan = inc.queryExecution.executedPlan.toString
    assert(!plan.contains(b1Path), s"increment plan must not re-scan batch-1 text:\n$plan")
    assert(plan.contains("graft_spec_store_bands") && plan.contains("graft_spec_store_sigs"),
      "candidates and verify must come from the persisted store tables")
    // and the store is never RE-SHUFFLED: no shuffle exchange sits above
    // the bucketed _bands scan (the new batch broadcasts/shuffles TO the
    // store's layout, never the store to the batch's)
    inc.collect() // materialize so AQE finalizes the executed plan
    def hasBandsScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectWithSubqueries {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.tableIdentifier.exists(_.table.endsWith("_bands")) => f
      }.nonEmpty
    val reshuffled = inc.queryExecution.executedPlan.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if hasBandsScan(e) => e
    }
    assert(reshuffled.isEmpty,
      s"the store-side bands table must never re-shuffle:\n${inc.queryExecution.executedPlan}")

    val got = inc.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 5L)) == 1.0, "exact copy of stored doc: every minhash matches")
    assert(got.contains((1L, 2L)) && got((1L, 2L)) >= 0.5, "near-dup of stored doc found")
    assert(!got.keySet.exists { case (a, b) => a == 6L || b == 6L }, "fresh doc pairs with nothing")

    // ≡ the full-recompute twin restricted to cross-batch pairs: the store
    // path must lose nothing vs re-shingling everything from scratch
    val union = batch1.unionByName(batch2)
    val fullCands = Dedup.lshCandidates(union, "doc_id", "text")
    val full = Dedup.estimateJaccardBySignature(union, "doc_id", "text",
      fullCands, minEstimate = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val b1Ids = Set(1L, 3L, 4L); val b2Ids = Set(2L, 5L, 6L)
    val fullCross = full.filter { case ((a, b), _) =>
      (b1Ids(a) && b2Ids(b)) || (b2Ids(a) && b1Ids(b)) }
    assert(got == fullCross, s"incremental ≠ full recompute: $got vs $fullCross")
  }

  test("incremental simhash: hamming pairs vs store ≡ full recompute, no text re-scan") {
    import spark.implicits._
    val batch1 = Seq((1L, baseText), (3L, halfText), (4L, otherText)).toDF("doc_id", "text")
    Dedup.writeSignatureStore(spark, batch1, "doc_id", "text", "graft_spec_store2")
    val batch2 = Seq((2L, nearDupText), (5L, baseText)).toDF("doc_id", "text")
    val inc = Dedup.dedupIncrementSimhash(spark, batch2, "doc_id", "text",
      "graft_spec_store2", maxHamming = 3)
    assert(inc.queryExecution.executedPlan.toString.contains("graft_spec_store2_simhash"))
    val got = inc.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

    val full = Dedup.simhashDupPairs(batch1.unionByName(batch2), "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val b1Ids = Set(1L, 3L, 4L); val b2Ids = Set(2L, 5L)
    val fullCross = full.filter { case ((a, b), _) =>
      (b1Ids(a) && b2Ids(b)) || (b2Ids(a) && b1Ids(b)) }
    assert(got == fullCross, s"incremental ≠ full recompute: $got vs $fullCross")
    assert(got((1L, 5L)) == 0, "identical docs: identical simhash")
  }

  test("row-local minhashSignature ≡ the aggregate minhashWide, on fixtures and real docs") {
    import spark.implicits._
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val local = df.select(col("doc_id"),
          Dedup.minhashSignature(col("text"), k = 3, numHashes = 16).as("sig"))
        .filter(col("sig").isNotNull)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val wide = Dedup.minhashWide(df, "doc_id", "text", k = 3, numHashes = 16)
        .collect().map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i)).toSeq).toMap
      assert(local == wide, "the stateless per-row form must produce identical signatures")
    }
    check(docs)
    check(spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50))
    // no k-shingle → NULL signature (the streaming filter contract)
    val short = Seq((9L, "two words")).toDF("doc_id", "text")
    assert(short.select(Dedup.minhashSignature(col("text"), 3, 16)).head().isNullAt(0))
  }

  test("store maxBucket cap drops degenerate probe buckets, audited, never silent") {
    import spark.implicits._
    // three identical docs share every band signature → every bucket has
    // size 3; one unrelated doc sits alone. maxBucket=2 must exclude the
    // clones' buckets from the probe table while keeping their signatures.
    val clones = Seq((1L, baseText), (2L, baseText), (3L, baseText),
      (4L, otherText)).toDF("doc_id", "text")
    Dedup.writeSignatureStore(spark, clones, "doc_id", "text",
      "graft_spec_capped", maxBucket = 2)
    // the probe table kept only the singleton buckets
    val bandIds = spark.table("graft_spec_capped_bands")
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(bandIds == Set(4L), s"capped buckets must leave the probe table: $bandIds")
    // signatures are intact (the verify table is never capped)
    assert(spark.table("graft_spec_capped_sigs").count() == 4)
    // an increment with another clone finds nothing via the capped buckets
    val inc = Dedup.dedupIncrement(spark, Seq((9L, baseText)).toDF("doc_id", "text"),
      "doc_id", "text", "graft_spec_capped", minEstimate = 0.5)
    assert(inc.collect().isEmpty, "capped buckets must not generate candidates")
    // and the audit names exactly the dropped buckets (count 3 > 2, all 4 bands)
    val overflow = Dedup.storeOverflowBuckets(spark, "graft_spec_capped", maxBucket = 2)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(overflow.length == 4 && overflow.forall(_._2 == 3L),
      s"audit must name the 4 dropped per-band buckets: ${overflow.toSeq}")
  }

  /** Job counter (same discipline as BucketingSpec.withJobCount): drain the
    * listener bus before attaching and before reading. */
  private def withJobCount[A](body: => A): (A, Int) = {
    import org.apache.spark.grafttest.ListenerDrain.drain
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    drain(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      val result = body
      drain(spark.sparkContext)
      (result, jobs.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("ensureSignatureStore: valid stores survive reopen AND process restart; stale fingerprints rebuild") {
    import spark.implicits._
    val b1 = Seq((1L, baseText), (4L, otherText)).toDF("doc_id", "text")
    val name = "graft_spec_store_ensure"
    val fp = "fp-round9-test-1"
    val built = Dedup.ensureSignatureStore(spark, b1, "doc_id", "text", name, fp)
    assert(built, "first ensure builds")

    // same catalog, matching fingerprint: metadata-only, zero Spark jobs
    val (rebuilt, jobs) = withJobCount(
      Dedup.ensureSignatureStore(spark, b1, "doc_id", "text", name, fp))
    assert(!rebuilt && jobs == 0,
      s"matching-fingerprint reopen must run zero jobs (ran $jobs)")

    // process restart: in-memory catalog loses the tables, files + sidecar
    // survive — re-registration is metadata-only and the store still works
    for (t <- Seq(s"${name}_bands", s"${name}_sigs", s"${name}_simhash"))
      spark.sql(s"DROP TABLE $t")
    val (rereg, jobs2) = withJobCount(
      Dedup.ensureSignatureStore(spark, b1, "doc_id", "text", name, fp))
    assert(!rereg && jobs2 == 0,
      s"fresh-JVM re-registration must run zero jobs (ran $jobs2)")
    val inc = Dedup.dedupIncrement(spark,
      Seq((5L, baseText)).toDF("doc_id", "text"), "doc_id", "text", name,
      minEstimate = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(inc((1L, 5L)) == 1.0, "re-registered store must serve increments")

    // corpus changed → new fingerprint → rebuild (and the new content wins)
    val b1v2 = Seq((1L, baseText), (4L, otherText), (8L, halfText)).toDF("doc_id", "text")
    val (rebuilt2, jobs3) = withJobCount(
      Dedup.ensureSignatureStore(spark, b1v2, "doc_id", "text", name, "fp-round9-test-2"))
    assert(rebuilt2 && jobs3 > 0, "a stale fingerprint must trigger a rebuild")
    val inc2 = Dedup.dedupIncrement(spark,
      Seq((9L, halfText)).toDF("doc_id", "text"), "doc_id", "text", name,
      minEstimate = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(inc2((8L, 9L)) == 1.0, "rebuilt store carries the new batch")

    // restart path with a SAME-fingerprint ensure but different signing
    // params: must fail loudly, never stamp the caller's geometry over the
    // store's (a 4x4 store probed as 8x2 silently finds zero candidates)
    for (t <- Seq(s"${name}_bands", s"${name}_sigs", s"${name}_simhash"))
      spark.sql(s"DROP TABLE $t")
    val boom = intercept[IllegalArgumentException] {
      Dedup.ensureSignatureStore(spark, b1v2, "doc_id", "text", name,
        "fp-round9-test-2", bands = 8, rowsPerBand = 2)
    }
    assert(boom.getMessage.contains("signing parameters"), boom.getMessage)
    // matching params still re-register fine after the failed attempt
    assert(!Dedup.ensureSignatureStore(spark, b1v2, "doc_id", "text", name,
      "fp-round9-test-2"))
  }

  test("appendSignatureStore: later increments see appended batches; params are pinned") {
    import spark.implicits._
    val batch1 = Seq((1L, baseText), (4L, otherText)).toDF("doc_id", "text")
    Dedup.writeSignatureStore(spark, batch1, "doc_id", "text", "graft_spec_store3")
    val batch2 = Seq((2L, nearDupText)).toDF("doc_id", "text")
    Dedup.appendSignatureStore(spark, batch2, "doc_id", "text", "graft_spec_store3")
    // batch 3 dups a batch-2 doc: only visible if the append landed
    val batch3 = Seq((7L, nearDupText)).toDF("doc_id", "text")
    val got = Dedup.dedupIncrement(spark, batch3, "doc_id", "text",
      "graft_spec_store3", minEstimate = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((2L, 7L)) == 1.0, "appended batch-2 signatures must be probed")
    assert(got.contains((1L, 7L)), "original batch-1 signatures still probed")
    // mismatched parameters fail loudly, not with silent zero candidates
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupIncrement(spark, batch3, "doc_id", "text",
        "graft_spec_store3", bands = 8, rowsPerBand = 2)
    }
    assert(e.getMessage.contains("graft.bands"))
  }

  test("removeFromSignatureStore: forgotten docs vanish from increments at once, survive restart, compact physically") {
    import spark.implicits._
    import graft.engine.WarehouseMeta
    val name = "graft_spec_forget"
    // both corpus docs duplicate the probe text, so the increment sees both
    val corpus = Seq((1L, baseText), (2L, nearDupText), (4L, otherText))
      .toDF("doc_id", "text")
    Dedup.writeSignatureStore(spark, corpus, "doc_id", "text", name)
    val probe = Seq((9L, baseText)).toDF("doc_id", "text")
    def hits() = Dedup.dedupIncrement(spark, probe, "doc_id", "text", name,
      minEstimate = 0.5).collect().map(_.getLong(0)).toSet
    assert(hits() == Set(1L, 2L))

    // takedown of doc 1: no rewrite, but every read drops it immediately
    Dedup.removeFromSignatureStore(spark, name, Seq(1L))
    assert(hits() == Set(2L), "forgotten doc must stop matching at once")

    // restart: catalog loses the tombstone table, its files survive — a
    // fresh JVM must NOT resurrect the forgotten doc
    spark.sql(s"DROP TABLE ${name}_tomb")
    assert(hits() == Set(2L), "tombstones survive process restart")

    // compact folds tombstones in: tables shrink, params stay pinned,
    // increments unchanged, tombstone table gone
    assert(Dedup.compactSignatureStore(spark, name))
    assert(!spark.catalog.tableExists(s"${name}_tomb"))
    assert(!java.nio.file.Files.isDirectory(
      WarehouseMeta.tableLocation(spark, s"${name}_tomb")))
    assert(spark.table(s"${name}_sigs").collect().map(_.getLong(0)).toSet ==
      Set(2L, 4L), "compaction removes the rows physically")
    val p = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${name}_sigs")).properties
    assert(p.get("graft.bands").contains("4"), "params survive the swap")
    assert(hits() == Set(2L), "compaction changes files, never answers")
    assert(!Dedup.compactSignatureStore(spark, name), "no tombstones → no-op")

    // a rebuild (new corpus state) must clear any pending tombstones
    Dedup.removeFromSignatureStore(spark, name, Seq(2L))
    assert(hits() == Set.empty[Long])
    Dedup.writeSignatureStore(spark, corpus, "doc_id", "text", name)
    assert(hits() == Set(1L, 2L), "stale tombstones must not outlive a rebuild")
  }

  test("dedupByClustersBest: highest score survives, ties break to min id, unclustered rows untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"),   // cluster 1: scores 5, 9, 9 → 2 wins (tie 2<3)
      (10L, "d"), (11L, "e"),            // cluster 10: scores 1, 7 → 11 wins (not min id!)
      (42L, "f"))                        // never paired → survives
      .toDF("doc_id", "text")
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)).toDF("id", "cluster")
    val scored = Seq(
      (1L, 5), (2L, 9), (3L, 9), (10L, 1), (11L, 7), (42L, 0)).toDF("doc_id", "q")
    val kept = Dedup.dedupByClustersBest(docs, "doc_id", clusters, scored, "q")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 11L, 42L))
    // contrast with the blind min-id rule: cluster 10 would keep 10, not 11
    val blind = Dedup.dedupByClusters(docs, "doc_id", clusters)
      .collect().map(_.getLong(0)).toSet
    assert(blind == Set(1L, 10L, 42L))
  }

  // ------------------------------------ exact-substring dedup (Lee 2021)

  /** Word-start anchor positions (1-based) by split-on-space prefix sums —
    * the exact positions [[Dedup.anchoredWindows]] derives, empty tokens
    * included. */
  private def anchors(t: String, L: Int): Seq[Int] =
    t.split(" ", -1).scanLeft(1)((p, tk) => p + tk.length + 1).init
      .filter(p => p + L - 1 <= t.length)

  /** Single-threaded reference of the exact semantics: L-char windows at
    * word-start anchors, duplicated = window text seen >= 2 times
    * corpus-wide, all but the min-(id, pos) occurrence cut, overlapping
    * cuts merged. */
  private def naiveScrub(docs: Seq[(Long, String)], L: Int): Map[Long, String] = {
    val occ = for {
      (id, t) <- docs; if t.length >= L
      p <- anchors(t, L)
    } yield (id, p, t.substring(p - 1, p - 1 + L))
    val removals = occ.groupBy(_._3).values.filter(_.size > 1)
      .flatMap(_.sortBy(o => (o._1, o._2)).drop(1))
      .toSeq.groupBy(_._1).map { case (id, os) => id -> os.map(_._2).sorted }
    docs.map { case (id, t) =>
      val sb = new StringBuilder
      var cur = 1
      for (s <- removals.getOrElse(id, Seq.empty)) {
        if (s > cur) sb.append(t.substring(cur - 1, s - 1))
        cur = math.max(cur, s + L)
      }
      if (cur <= t.length) sb.append(t.substring(cur - 1))
      id -> sb.toString
    }.toMap
  }

  private def scrubbedMap(docs: Seq[(Long, String)], L: Int,
      hashWindows: Boolean = false): Map[Long, String] = {
    import spark.implicits._
    Dedup.scrubDuplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        L, hashWindows = hashWindows)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("exact-substring scrub: first occurrence survives verbatim, later copies cut at UNALIGNED offsets, overlaps merge") {
    val clone = "subscribe to our newsletter for more content and offers today"
    val docs = Seq(
      // clone offsets differ by a non-round amount — a fixed position grid
      // would never align; word anchors are content-defined so they must
      (1L, s"unique preamble one $clone trailing text alpha"),
      (2L, s"a different lead-in here $clone other tail words"),
      (3L, "no duplicated content in this document at all, it stays whole"))
    val L = 30
    val out = scrubbedMap(docs, L)
    val naive = naiveScrub(docs, L)
    assert(out == naive)
    assert(out(3L) == docs(2)._2, "untouched doc passes through verbatim")
    assert(out(1L) == docs(0)._2,
      "doc 1 holds every elected first occurrence — nothing cut")
    assert(out(2L).length < docs(1)._2.length, "doc 2 lost its cloned span")
    assert(out(2L).startsWith("a different lead-in here "),
      "text outside the cut spans survives")
    assert(!out(2L).contains("subscribe to our newsletter"),
      "the cloned run is gone from doc 2")
    // detection view agrees with the naive occurrence count
    import spark.implicits._
    val det = Dedup.duplicatedWindows(docs.toDF("doc_id", "text"),
      "doc_id", "text", L).count()
    val naiveDet = (for {
      (id, t) <- docs; if t.length >= L
      p <- anchors(t, L)
    } yield (id, p, t.substring(p - 1, p - 1 + L)))
      .groupBy(_._3).values.filter(_.size > 1).map(_.size).sum
    assert(det == naiveDet.toLong)
  }

  test("exact-substring scrub: within-doc repeats dedup; every cross-doc clone carrier loses chars (randomized vs naive)") {
    val rnd = new scala.util.Random(4213)
    val words = Vector("alpha", "bravo", "code", "delta", "echo", "fox",
      "golf", "hotel", "india", "jazz", "kilo", "lima")
    def prose(n: Int) = Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
    val L = 24
    val clone = prose(10) // ~50 chars, several interior word anchors
    val docs = (1L to 12L).map { id =>
      val body =
        if (id % 3 == 0) prose(8) + " " + clone + " " + prose(8) // cross-doc clone
        else if (id == 7L) clone + " " + prose(3) + " " + clone  // within-doc repeat
        else prose(20)
      (id, body)
    }
    val out = scrubbedMap(docs, L)
    val naive = naiveScrub(docs, L)
    assert(out == naive)
    // identical runs select identical interior anchors: every carrier but
    // the elected first loses chars
    val carriers = docs.filter(d => d._2.contains(clone)).map(_._1)
    assert(carriers.size >= 4, "fixture sanity: clone planted in several docs")
    val untouched = carriers.filter(id => out(id) == docs.find(_._1 == id).get._2)
    assert(untouched.size <= 1,
      s"at most the elected first carrier stays whole, got $untouched")
    // doc 7's second within-doc copy is cut even though doc 7 holds winners
    assert(out(7L).length < docs.find(_._1 == 7L).get._2.length)
    // content-correlated subsampling: anchorEvery=3 removals ⊆ exhaustive
    // removals per doc (kept-or-not is decided by window content, so a
    // subsampled run can only cut less, never differently)
    import spark.implicits._
    val sub = Dedup.scrubDuplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", L, anchorEvery = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, t) =>
      assert(sub(id).length >= out(id).length,
        s"doc $id: subsampled scrub must cut no more than exhaustive")
      assert(sub(id).length <= t.length)
    }
  }

  test("exact-substring: hashWindows=true ≡ exact string grouping (detection and scrub), on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "text")
    val L = 40
    val exactDet = Dedup.duplicatedWindows(docs, "doc_id", "text", L)
      .groupBy("id").count()
    val hashDet = Dedup.duplicatedWindows(docs, "doc_id", "text", L,
      hashWindows = true).groupBy("id").count()
    assert(exactDet.exceptAll(hashDet).isEmpty && hashDet.exceptAll(exactDet).isEmpty)
    assert(exactDet.count() > 0, "fixture sanity: the corpus holds duplicated windows")
    val a = Dedup.scrubDuplicatedSpans(docs, "doc_id", "text", L)
    val b = Dedup.scrubDuplicatedSpans(docs, "doc_id", "text", L,
      hashWindows = true)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() == docs.count(), "scrub never drops or duplicates documents")
  }
}
