package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN surface: brute-force is the exactness oracle (s01 covers it cross-
  * engine); these pin the LSH path — bucket determinism, the precomputed
  * corpus reusing stored buckets/norms, and recall against brute force. */
class SimilaritySpec extends AnyFunSuite with SparkSpec {

  private def vecs = {
    import spark.implicits._
    // three tight clusters around axes, plus an in-between vector
    Seq(
      (0L, Array(1.00f, 0.02f, 0.01f)), (1L, Array(0.98f, 0.05f, 0.03f)),
      (2L, Array(0.96f, 0.01f, 0.08f)), (3L, Array(0.02f, 1.00f, 0.02f)),
      (4L, Array(0.05f, 0.97f, 0.01f)), (5L, Array(0.01f, 0.03f, 1.00f)),
      (6L, Array(0.60f, 0.58f, 0.02f)))
      .toDF("vec_id", "embedding")
  }

  test("bucketize: precomputed path returns exactly the one-shot LSH top-k") {
    val pre = Similarity.bucketize(vecs, "embedding", bits = 4).cache()
    try {
      val a = Similarity.cosineLshTopKPre(pre, "vec_id", "embedding", queryId = 0, k = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = Similarity.cosineLshTopK(vecs, "vec_id", "embedding", queryId = 0, k = 3, bits = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a == b, s"precomputed $a must equal one-shot $b")
      assert(a.nonEmpty, "query 0's cluster-mates share its bucket")
    } finally pre.unpersist()
  }

  test("bruteForceTopKBatch ≡ per-query bruteForceTopK; recallAtK scores overlap") {
    val qs = vecs.filter(col("vec_id").isin(0, 3))
    val batch = Similarity.bruteForceTopKBatch(vecs, qs, "vec_id", "embedding", k = 3)
    val got = batch.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val single = Seq(0L, 3L).flatMap(q =>
      Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, k = 3)
        .collect().map(r => (q, r.getLong(0), r.getDouble(1)))).toSet
    assert(got == single, "batch must equal the per-query baseline")
    // self-recall is 1.0 per query; an empty approx frame scores 0.0
    val self = Similarity.recallAtK(batch, batch)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(self == Map(0L -> 1.0, 3L -> 1.0))
    val none = Similarity.recallAtK(batch.filter(lit(false)), batch)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(none == Map(0L -> 0.0, 3L -> 0.0))
    // LSH recall against the exact baseline is a valid [0,1] score per query
    val bucketed = Similarity.bucketize(vecs, "embedding", bits = 2)
    val approx = Similarity.cosineLshTopKBatch(bucketed,
      bucketed.filter(col("vec_id").isin(0, 3)), "vec_id", "embedding", k = 3)
    val rec = Similarity.recallAtK(approx, batch)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rec.keySet == Set(0L, 3L) && rec.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("clustered corpus: recall ≥ 0.8 at a SMALL probe fraction (r10 — the s13 caveat demonstrated)") {
    // s13's shipped operating point needs 26/32 of the buckets because the
    // oracle fixture's embeddings are near-uniform (no cluster structure for
    // the hyperplanes to exploit — PLANS.md §Round-9). REAL embedding
    // corpora are clustered; this mixture-of-Gaussians fixture shows the
    // SAME (bits, radius) dial reaching recall@5 ≥ 0.8 while probing a few
    // percent of the buckets: cluster members share hyperplane signs, so a
    // query's neighbors co-bucket and radius 1 forgives the borderline
    // planes.
    import org.apache.spark.sql.DataFrame
    val rnd = new scala.util.Random(42)
    val dim = 32; val nClusters = 16; val perCluster = 64
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = for {
      c <- 0 until nClusters; i <- 0 until perCluster
    } yield (c.toLong * perCluster + i,
      centers(c).map(v => v + 0.15f * rnd.nextGaussian().toFloat))
    import spark.implicits._
    val corpus = rows.toDF("vec_id", "embedding")
    val bits = 8; val radius = 1; val k = 5
    val bucketed = Similarity.bucketize(corpus, "embedding", bits).cache()
    try {
      val qids = (0 until nClusters).map(c => c.toLong * perCluster + 7)
      val queries = bucketed.filter(col("vec_id").isin(qids: _*))
      val approx = Similarity.cosineLshTopKBatchMultiProbe(bucketed, queries,
        "vec_id", "embedding", k, bits, radius)
      val exact = Similarity.bruteForceTopKBatch(corpus, queries,
        "vec_id", "embedding", k)
      val recalls = Similarity.recallAtK(approx, exact)
        .collect().map(_.getDouble(1))
      val meanRecall = recalls.sum / recalls.length
      assert(meanRecall >= 0.8, s"clustered-corpus recall@5 = $meanRecall < 0.8")

      // probe cost: candidate rows actually scanned per query, as a corpus
      // fraction — must be a small minority (vs s13's 26/32 probe fraction
      // on uniform data). Derived from the real bucket histogram + the same
      // probe masks the operator plans.
      val hist = bucketed.groupBy("_bucket").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val qb = queries.select("vec_id", "_bucket")
        .collect().map(r => r.getLong(1))
      val masks = (0 to radius).flatMap(r =>
        (0 until bits).combinations(r).map(_.foldLeft(0L)((m, i) => m | (1L << i))).toSeq)
      val scanned = qb.map(b => masks.map(m => hist.getOrElse(b ^ m, 0L)).sum).sum
      val frac = scanned.toDouble / (qids.size.toLong * nClusters * perCluster)
      assert(frac <= 0.25, s"clustered probe fraction $frac should be a small minority")
      info(f"clustered corpus: recall@5 = $meanRecall%.3f at probe fraction $frac%.3f " +
        f"(${masks.size} of ${1 << bits} buckets probed per query)")
    } finally bucketed.unpersist()
  }

  test("multi-probe recall dominates single-bucket recall (recallAtK as the judge)") {
    import org.apache.spark.sql.DataFrame
    val bucketed = Similarity.bucketize(vecs, "embedding", bits = 4).cache()
    try {
      val qids = Seq(0L, 3L, 6L)
      def tagged(f: Long => DataFrame): DataFrame =
        qids.map(q => f(q).withColumn("query_id", lit(q))).reduce(_ unionByName _)
      val exact = tagged(q =>
        Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, k = 3))
      val single = tagged(q =>
        Similarity.cosineLshTopKPre(bucketed, "vec_id", "embedding", q, k = 3))
      val multi = tagged(q =>
        Similarity.cosineLshTopKMultiProbe(bucketed, "vec_id", "embedding", q, k = 3, bits = 4))
      val rs = Similarity.recallAtK(single, exact)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val rm = Similarity.recallAtK(multi, exact)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      qids.foreach { q =>
        assert(rm(q) >= rs(q),
          s"query $q: multi-probe recall ${rm(q)} must dominate single-bucket ${rs(q)}")
      }
    } finally bucketed.unpersist()
  }

  test("batched multi-probe: radius-1 ≡ per-query multi-probe; recall monotone in radius") {
    import org.apache.spark.sql.DataFrame
    val bucketed = Similarity.bucketize(vecs, "embedding", bits = 4).cache()
    try {
      val qids = Seq(0L, 3L, 6L)
      val queries = bucketed.filter(col("vec_id").isin(qids: _*))
      // radius 1 batch is exactly the per-query multi-probe (same probe set:
      // own bucket + one flipped plane), fused into one corpus pass
      val batch1 = Similarity.cosineLshTopKBatchMultiProbe(bucketed, queries,
        "vec_id", "embedding", k = 3, bits = 4, radius = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      def tagged(f: Long => DataFrame): DataFrame =
        qids.map(q => f(q).withColumn("query_id", lit(q))).reduce(_ unionByName _)
      val perQuery = tagged(q => Similarity.cosineLshTopKMultiProbe(
        bucketed, "vec_id", "embedding", q, k = 3, bits = 4))
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("id"),
          r.getAs[Double]("cosine"))).toSet
      assert(batch1 == perQuery, "one-pass batch must equal the per-query loop")
      // radius=bits probes every bucket: recall vs exact is 1.0 everywhere,
      // and each radius's recall dominates the one below it
      val exact = Similarity.bruteForceTopKBatch(vecs, queries.drop("_bucket"),
        "vec_id", "embedding", k = 3)
      val recallsByRadius = (0 to 4).map { r =>
        val approx = Similarity.cosineLshTopKBatchMultiProbe(bucketed, queries,
          "vec_id", "embedding", k = 3, bits = 4, radius = r)
        Similarity.recallAtK(approx, exact)
          .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      }
      qids.foreach { q =>
        (1 to 4).foreach { r =>
          assert(recallsByRadius(r)(q) >= recallsByRadius(r - 1)(q),
            s"query $q: radius $r recall must dominate radius ${r - 1}")
        }
        assert(recallsByRadius(4)(q) == 1.0, "probing every bucket is exact")
      }
    } finally bucketed.unpersist()
  }

  test("lsh buckets are deterministic and cluster-correlated") {
    val b = Similarity.bucketize(vecs, "embedding", bits = 4)
      .select(col("vec_id"), col("_bucket")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Similarity.bucketize(vecs, "embedding", bits = 4)
      .select(col("vec_id"), col("_bucket")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b == b2, "md5-seeded planes must give identical buckets across runs")
    assert(b(0L) == b(1L) && b(1L) == b(2L), "a tight cluster shares one bucket")
  }

  test("multi-probe recovers at least the single-bucket candidates, cosines exact") {
    val pre = Similarity.bucketize(vecs, "embedding", bits = 4).cache()
    try {
      val single = Similarity.cosineLshTopKPre(pre, "vec_id", "embedding", queryId = 0, k = 6)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val multi = Similarity.cosineLshTopKMultiProbe(pre, "vec_id", "embedding",
        queryId = 0, k = 6, bits = 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(single.keySet.subsetOf(multi.keySet),
        "the query's own bucket is among the probes")
      assert(multi.size >= single.size)
      val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", queryId = 0, k = 6)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      multi.foreach { case (id, c) => assert(brute(id) == c, s"cosine for $id must be exact") }
    } finally pre.unpersist()
  }

  test("batched top-k equals the per-query loop (r4: one pass per query SET)") {
    val pre = Similarity.bucketize(vecs, "embedding", bits = 4).cache()
    try {
      val ids = Seq(0L, 3L, 6L)
      val batched = Similarity.cosineLshTopKBatch(pre,
        pre.filter(col("vec_id").isin(ids: _*)), "vec_id", "embedding", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val looped = ids.flatMap { q =>
        Similarity.cosineLshTopKPre(pre, "vec_id", "embedding", queryId = q, k = 3)
          .collect().map(r => (q, r.getLong(0), r.getDouble(1)))
      }.toSet
      assert(batched == looped, s"batched $batched must equal per-query loop $looped")
      assert(batched.nonEmpty)
    } finally pre.unpersist()
  }

  test("assignByCodebook: nearest centroid wins, ties break to lowest cid, no shuffle") {
    import spark.implicits._
    val cb = Seq(
      (0, Seq(1.0, 0.0, 0.0)),   // x axis
      (1, Seq(0.0, 1.0, 0.0)),   // y axis
      (2, Seq(1.0, 0.0, 0.0)))   // duplicate of cid 0: tie-break target
    val assigned = Similarity.assignByCodebook(vecs, "embedding", cb)
      .select(col("vec_id"), col("_cid")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // x-cluster rows pick cid 0 (tie with identical cid 2 resolves low)
    assert(Seq(0L, 1L, 2L).forall(assigned(_) == 0))
    // y-cluster rows pick cid 1
    assert(Seq(3L, 4L).forall(assigned(_) == 1))
    // pure map work: the assignment plan contains no exchange at all
    val plan = Similarity.assignByCodebook(vecs, "embedding", cb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must be shuffle-free:\n$plan")
  }

  test("persisted vector index: ≡ ad-hoc bucketize; survives restart; stale fingerprint rebuilds") {
    val built = Similarity.ensureVectorIndex(spark, vecs, "vec_id", "embedding",
      "graft_spec_vidx", "vfp-1", bits = 4)
    assert(built)
    // reopen with matching fingerprint: no rebuild
    assert(!Similarity.ensureVectorIndex(spark, vecs, "vec_id", "embedding",
      "graft_spec_vidx", "vfp-1", bits = 4))
    val (indexed, bits) = Similarity.vectorIndex(spark, "graft_spec_vidx",
      "vec_id", "embedding")
    assert(bits == 4, "stored bits travel with the table")
    val queries = indexed.filter(col("vec_id").isin(0, 3))
    val viaIndex = Similarity.cosineLshTopKBatch(indexed, queries,
      "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val adhoc = Similarity.bucketize(vecs, "embedding", bits = 4)
    val direct = Similarity.cosineLshTopKBatch(adhoc,
      adhoc.filter(col("vec_id").isin(0, 3)), "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaIndex == direct, "the index changes the layout, never the answer")
    // restart simulation: catalog entry dropped, files + sidecar survive
    spark.sql("DROP TABLE graft_spec_vidx_vlsh")
    assert(!Similarity.ensureVectorIndex(spark, vecs, "vec_id", "embedding",
      "graft_spec_vidx", "vfp-1", bits = 4), "fresh JVM re-registers, never rebuilds")
    assert(Similarity.vectorIndex(spark, "graft_spec_vidx", "vec_id", "embedding")
      ._1.count() == vecs.count())
    // corpus changed: rebuild
    assert(Similarity.ensureVectorIndex(spark, vecs.limit(5), "vec_id", "embedding",
      "graft_spec_vidx", "vfp-2", bits = 4), "stale fingerprint rebuilds")
    assert(Similarity.vectorIndex(spark, "graft_spec_vidx", "vec_id", "embedding")
      ._1.count() == 5)
  }

  test("ivfTopKNprobe: probeCells[0] = assignment; nprobe=nlist = brute force; recall monotone") {
    val cb = Seq(
      (0, Seq(1.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0)), (2, Seq(0.0, 0.0, 1.0)))
    // probe ranking head is exactly the assignByCodebook argmax (same
    // rounding + lowest-cid tie rule)
    val both = Similarity.assignByCodebook(vecs, "embedding", cb)
      .select(col("vec_id"), col("_cid"),
        Similarity.probeCells(col("embedding"), cb, nprobe = 3).as("cells"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Int](2).head == r.getInt(1),
        s"probeCells[0] must equal the assignment for vec ${r.getLong(0)}")
    }
    // query 6 sits between the x and y cells: nprobe=2 must reach members
    // of BOTH clusters, which the single-cell probe cannot
    val n1 = Similarity.ivfTopKNprobe(vecs, "vec_id", "embedding", cb,
      queryId = 6, k = 5, nprobe = 1)
      .collect().map(_.getLong(0)).toSet
    val n2 = Similarity.ivfTopKNprobe(vecs, "vec_id", "embedding", cb,
      queryId = 6, k = 5, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(n1.subsetOf(Set(0L, 1L, 2L)) || n1.subsetOf(Set(3L, 4L)),
      "single-cell probe sees one cluster only")
    assert(n2.intersect(Set(0L, 1L, 2L)).nonEmpty && n2.intersect(Set(3L, 4L)).nonEmpty,
      "nprobe=2 reaches both adjacent clusters")
    // nprobe = nlist degenerates to the exact brute-force ranking
    val all = Similarity.ivfTopKNprobe(vecs, "vec_id", "embedding", cb,
      queryId = 6, k = 6, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", queryId = 6, k = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(all.toSeq == brute.toSeq, "probing every cell must equal brute force")
  }

  test("lsh top-k cosines agree with brute force on the shared ids") {
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", queryId = 0, k = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.cosineLshTopK(vecs, "vec_id", "embedding", queryId = 0, k = 3, bits = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(lsh.nonEmpty)
    lsh.foreach { case (id, c) =>
      assert(brute(id) == c, s"cosine for $id must match brute force")
    }
  }

  // 4-dim vectors, 2 subspaces of 2: clusters on each half
  private def pqVecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Array(0.9f, 0.1f, 0.1f, 0.9f)),  // near 0 in both halves
      (2L, Array(0.0f, 1.0f, 1.0f, 0.0f)),  // opposite in both halves
      (3L, Array(1.0f, 0.0f, 1.0f, 0.0f)),  // half like 0, half like 2
      (4L, Array(1.0f, 0.0f, 0.0f, 1.0f)))  // duplicate of 0
      .toDF("vec_id", "embedding")
  }

  private val pqBooks: Similarity.PqCodebooks = Seq(
    Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0)),  // subspace 0 centroids
    Seq(0 -> Seq(0.0, 1.0), 1 -> Seq(1.0, 0.0)))  // subspace 1 centroids

  test("encodePq assigns each subvector to its nearest centroid, shuffle-free") {
    val coded = Similarity.encodePq(pqVecs, "embedding", pqBooks)
    val codes = coded.select(col("vec_id"), col("_code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codes(0L) == Seq(0, 0) && codes(1L) == Seq(0, 0) && codes(4L) == Seq(0, 0))
    assert(codes(2L) == Seq(1, 1))
    assert(codes(3L) == Seq(0, 1), "halves quantize independently")
    val plan = coded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PQ encode must be shuffle-free:\n$plan")
  }

  test("pqTopK: ADC ranks by true subspace structure; query duplicate at distance 0") {
    val coded = Similarity.encodePq(pqVecs, "embedding", pqBooks)
    val top = Similarity.pqTopK(coded, "vec_id", Seq(1.0, 0.0, 0.0, 1.0),
      pqBooks, k = 5).collect().map(r => (r.getLong(0), r.getDouble(1)))
    // rows 0/1/4 share the query's cells → approx 0; row 3 one cell off;
    // row 2 both cells off (tie at each level breaks to the lowest id)
    assert(top.map(_._1).toSeq == Seq(0L, 1L, 4L, 3L, 2L))
    assert(top.take(3).forall(_._2 == 0.0), "same-cell rows collapse to table distance 0")
    assert(top(3)._2 > 0 && top(4)._2 > top(3)._2)
    // plan shape on a distributed (non-LocalRelation) corpus: the tiny Seq
    // fixture constant-folds to a LocalTableScan, so force real partitions —
    // and k < corpus size, else EliminateLimits drops the provably-
    // redundant limit and the physical top-k with it
    val dist = Similarity.encodePq(pqVecs.repartition(2), "embedding", pqBooks)
    val plan = Similarity.pqTopK(dist, "vec_id", Seq(1.0, 0.0, 0.0, 1.0), pqBooks, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"physical top-k expected:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"ADC scan must not shuffle the corpus:\n$plan")
  }

  test("pqTopKRerank: exact order over the shortlist; refine joins by broadcast") {
    val coded = Similarity.encodePq(pqVecs, "embedding", pqBooks)
    val q = Seq(1.0, 0.0, 0.0, 1.0)
    // shortlist = whole corpus → the result IS the exact cosine ranking
    val full = Similarity.pqTopKRerank(coded, pqVecs, "vec_id", "embedding",
      q, pqBooks, shortlist = 5, k = 3)
    val rows = full.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((0L, 1.0), (4L, 1.0), (1L, 0.9939)),
      s"exact ranking expected, got $rows")
    // a 3-wide shortlist keeps the same-cell rows {0,1,4}; the refine
    // re-orders them exactly (4's true duplicate outranks 1)
    val short = Similarity.pqTopKRerank(coded, pqVecs, "vec_id", "embedding",
      q, pqBooks, shortlist = 3, k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(short == Seq((0L, 1.0), (4L, 1.0)))
    val plan = full.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the k'-row shortlist must broadcast into the refine join:\n$plan")
    intercept[IllegalArgumentException] {
      Similarity.pqTopKRerank(coded, pqVecs, "vec_id", "embedding",
        q, pqBooks, shortlist = 1, k = 2)
    }
  }

  test("ivfAdcTopK: lossless residual codebooks + full probe ≡ exact L2 ranking; corpus side shuffle-free") {
    import spark.implicits._
    val coarse: Seq[(Int, Seq[Double])] =
      Seq(0 -> Seq(1.0, 0.0, 0.0, 1.0), 1 -> Seq(0.0, 1.0, 1.0, 0.0))
    val vecs = pqVecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq).toMap
    // residual codebooks holding EVERY corpus residual slice make PQ
    // lossless: each row's code reconstructs its own residual exactly, so
    // ADC distance = true squared L2 — the strongest possible oracle
    val cells = Similarity.assignByCodebook(pqVecs, "embedding", coarse)
      .select(col("vec_id"), col("_cid")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val centroidOf = coarse.toMap
    val residuals = vecs.toSeq.sortBy(_._1).map { case (id, v) =>
      (id.toInt, v.zip(centroidOf(cells(id))).map { case (x, c) => x - c })
    }
    val books: Similarity.PqCodebooks =
      (0 until 2).map(j => residuals.map { case (cid, r) => (cid, r.slice(j * 2, (j + 1) * 2)) })
    val q = Seq(1.0, 0.2, 0.1, 0.8)
    val got = Similarity.ivfAdcTopK(pqVecs.repartition(2), "vec_id", "embedding",
      coarse, books, q, nprobe = 2, k = 5)
    val rows = got.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = vecs.toSeq.map { case (id, v) =>
      (id, BigDecimal(v.zip(q).map { case (x, y) => (x - y) * (x - y) }.sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, d) => (d, id) }
    assert(rows == exact, s"lossless IVFADC must rank by exact L2: got $rows vs $exact")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"cell assignment, residual encode and ADC must not shuffle the corpus:\n$plan")
  }

  test("trainPqCodebooks: Lloyd converges to per-cluster subvector means") {
    import spark.implicits._
    // two clean clusters per half; k=2, m=2 must recover the half-means
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 8.0f, 8.0f)),
      (1L, Array(1.2f, 0.2f, 8.2f, 8.2f)),
      (2L, Array(5.0f, 5.0f, 0.0f, 1.0f)),
      (3L, Array(5.2f, 5.2f, 0.2f, 1.2f)))
      .toDF("vec_id", "embedding")
    val books = Similarity.trainPqCodebooks(df, "vec_id", "embedding", m = 2, k = 2, iters = 4)
    assert(books.size == 2 && books.forall(_.size == 2))
    // subspace 0 centroids ≈ {(1.1, 0.1), (5.1, 5.1)} in some cid order
    def close(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-5 }
    assert(books(0).map(_._2).exists(close(_, Seq(1.1, 0.1))))
    assert(books(0).map(_._2).exists(close(_, Seq(5.1, 5.1))))
    assert(books(1).map(_._2).exists(close(_, Seq(8.1, 8.1))))
    assert(books(1).map(_._2).exists(close(_, Seq(0.1, 1.1))))
    // encoding with the trained books separates the clusters
    val codes = Similarity.encodePq(df, "embedding", books)
      .select(col("vec_id"), col("_code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codes(0L) == codes(1L) && codes(2L) == codes(3L) && codes(0L) != codes(2L))
  }

  test("index lifecycle: bucket-correct append, shuffle-free tombstone reads, compaction ≡ rebuild") {
    import graft.engine.WarehouseMeta
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val name = "graft_spec_vlife"
    // clean slate in the shared warehouse (re-runs of this suite)
    Seq(s"${name}_vlsh", s"${name}_vtomb").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      WarehouseMeta.deleteRecursively(WarehouseMeta.tableLocation(spark, t))
    }
    val base = vecs.filter(col("vec_id") % 2 === 0)  // 0, 2, 4, 6
    val extra = vecs.filter(col("vec_id") % 2 === 1) // 1, 3, 5
    assert(Similarity.ensureVectorIndex(spark, base, "vec_id", "embedding",
      name, "lfp-1", bits = 4))

    // APPEND: rows land with the STORED planes' bucket, no rewrite of base
    Similarity.appendVectorIndex(spark, extra, "vec_id", "embedding", name)
    val raw = spark.table(s"${name}_vlsh")
    assert(raw.count() == 7)
    assert(raw.filter(Similarity.lshBucket(col("vec"), 4, 3) =!= col("bucket"))
      .count() == 0, "appended rows carry the bucket the stored planes assign")

    // DELETE: tombstones drop rows from reads via a broadcast anti-join
    Similarity.deleteFromVectorIndex(spark, name, Seq(2L, 3L))
    val (live, _) = Similarity.vectorIndex(spark, name, "vec_id", "embedding")
    assert(live.select("vec_id").collect().map(_.getLong(0)).toSet ==
      Set(0L, 1L, 4L, 5L, 6L))
    val shuffles = live.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"tombstone filtering must never reshuffle the index:\n${live.queryExecution.executedPlan}")

    // answers ≡ an ad-hoc bucketize over the surviving vectors
    def topk(bucketed: org.apache.spark.sql.DataFrame) =
      Similarity.cosineLshTopKBatch(bucketed,
        bucketed.filter(col("vec_id").isin(0, 5)), "vec_id", "embedding", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val adhoc = Similarity.bucketize(
      vecs.filter(!col("vec_id").isin(2, 3)), "embedding", bits = 4)
    val direct = topk(adhoc)
    assert(topk(live) == direct, "mutations change the layout, never the answer")

    // COMPACT: tombstones fold in physically; bucket layout + props survive
    assert(Similarity.compactVectorIndex(spark, name))
    assert(!spark.catalog.tableExists(s"${name}_vtomb"))
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${name}_vlsh"))
    assert(meta.bucketSpec.exists(_.numBuckets == 16), "bucket spec survives the swap")
    assert(meta.properties.get("graft.bits").contains("4"), "props survive the swap")
    assert(spark.table(s"${name}_vlsh").count() == 5)
    val (live2, _) = Similarity.vectorIndex(spark, name, "vec_id", "embedding")
    assert(topk(live2) == direct, "compaction changes the files, never the answer")
    assert(!Similarity.compactVectorIndex(spark, name), "no tombstones → no-op")
  }

  test("SQ8: binary vectors round-trip losslessly; ADC ranks match exact L2; clamp guards foreign vectors") {
    import spark.implicits._
    // binary components: code ∈ {0,255}, reconstruction EXACT → the ADC
    // distance is the true squared L2 and the ranking must equal it
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 1.0f, 1.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(1.0f, 1.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val p = Similarity.trainSq(df, "embedding")
    assert(p.mins == Seq(0.0, 0.0, 0.0, 0.0) && p.maxs == Seq(1.0, 1.0, 1.0, 1.0))
    val enc = Similarity.encodeSq(df, "embedding", p)
    assert(enc.select(col("_sq")).collect()
      .forall(_.getSeq[Int](0).forall(c => c == 0 || c == 255)))
    val got = Similarity.sqTopK(enc.filter(col("vec_id") =!= 0L), "vec_id",
        Seq(1.0, 0.0, 1.0, 0.0), p, k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // exact squared L2 from id 0's vector: 1→1, 3→1, 2→3, 4→3 (ties → id)
    assert(got == Seq((1L, 1.0), (3L, 1.0), (2L, 3.0), (4L, 3.0)))
    // a vector OUTSIDE the trained range clamps instead of overflowing
    val foreign = Seq((9L, Array(2.0f, -1.0f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val fc = Similarity.encodeSq(foreign, "embedding", p)
      .select(col("_sq")).head().getSeq[Int](0)
    assert(fc(0) == 255 && fc(1) == 0, s"clamped codes, got $fc")
    // degenerate dimension (min = max) codes 0 and reconstructs the constant
    val flat = Seq((0L, Array(5.0f, 1.0f)), (1L, Array(5.0f, 3.0f))).toDF("vec_id", "embedding")
    val fp2 = Similarity.trainSq(flat, "embedding")
    val r = Similarity.sqTopK(Similarity.encodeSq(flat, "embedding", fp2),
        "vec_id", Seq(5.0, 1.0), fp2, k = 2)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(r == Seq((0L, 0.0), (1L, 4.0)), "constant dim contributes 0 error")
  }

  test("BQ: sign bits pack 64-per-long; Hamming ranking ≡ naive differing-dim count past one word") {
    import spark.implicits._
    // 70 dims forces TWO packed words; values are 0/1 with mean 0.5-ish
    val dim = 70
    def vec(bits: Set[Int]) = Array.tabulate(dim)(i => if (bits(i)) 1.0f else 0.0f)
    val rows = Seq(
      0L -> Set(0, 1, 65),          // query
      1L -> Set(0, 1, 65, 69),      // 1 differing dim
      2L -> Set(0, 1),              // 1 differing dim (65)
      3L -> Set(2, 64, 66),         // 6 differing dims
      4L -> (0 until dim).toSet)    // 67 differing dims
    val df = rows.map { case (id, b) => (id, vec(b)) }.toDF("vec_id", "embedding")
    val means = Similarity.trainBq(df, "embedding")
    assert(means.length == dim && means.forall(m => m > 0.0 && m < 1.0))
    val enc = Similarity.encodeBq(df, "embedding", means)
    assert(enc.select(org.apache.spark.sql.functions.size(col("_bq")))
      .collect().forall(_.getInt(0) == 2), "70 dims pack into 2 longs")
    val q = vec(Set(0, 1, 65)).map(_.toDouble).toSeq
    val got = Similarity.bqTopK(enc.filter(col("vec_id") =!= 0L), "vec_id", q, means, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // naive count of dims where (x > mean) differs from (q > mean)
    def bitsOf(b: Set[Int]) = (0 until dim).map(i => (if (b(i)) 1.0 else 0.0) > means(i))
    val naive = rows.tail.map { case (id, b) =>
      (id, bitsOf(b).zip(bitsOf(Set(0, 1, 65))).count { case (x, y) => x != y }.toLong)
    }.sortBy(t => (t._2, t._1))
    assert(got == naive, s"packed Hamming must equal the naive dim count: $got vs $naive")
  }

  test("mipsTopK ranks by inner product where cosine would rank differently") {
    import spark.implicits._
    // id 1 points EXACTLY at the query but is short (cosine 1, ip 0.5);
    // id 2 is off-axis but long (cosine ~0.89, ip 4.0) — MIPS must prefer 2
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),           // query
      (1L, Array(0.5f, 0.0f)),
      (2L, Array(4.0f, 2.0f)),
      (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val mips = Similarity.mipsTopK(df, "vec_id", "embedding", queryId = 0, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(mips.toSeq == Seq((2L, 4.0), (1L, 0.5), (3L, -1.0)))
    val cos = Similarity.bruteForceTopK(df, "vec_id", "embedding", queryId = 0, k = 1)
      .collect().head.getLong(0)
    assert(cos == 1L, "cosine prefers the aligned short vector — the orders differ")
  }

  test("mipsAugment: every augmented norm equals the max norm; reduction preserves IP order") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.5f, 0.0f)),
      (2L, Array(4.0f, 2.0f)), (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val aug = Similarity.mipsAugment(df, "vec_id", "embedding")
    val rows = aug.select(col("vec_id"),
        Similarity.norm(col("embedding")).as("n"), col("max_norm"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val m = rows.head._3
    assert(rows.forall { case (_, n, mn) => mn == m && math.abs(n - m) < 1e-6 },
      "the augmentation equalizes every corpus norm to M")
    assert(aug.select(org.apache.spark.sql.functions.size(col("embedding")))
      .collect().forall(_.getInt(0) == 3), "one appended component")
    // cosine rank over augmented corpus vs [q;0] == inner-product rank
    val q = Seq((99L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val viaCos = Similarity.bruteForceTopKBatch(
        aug.select(col("vec_id"), col("embedding")), q, "vec_id", "embedding", k = 4)
      .orderBy(col("cosine").desc).collect().map(_.getLong(1)).toSeq
    assert(viaCos == Seq(2L, 0L, 1L, 3L), "augmented-cosine order = IP order")
  }

  test("mipsTopKLsh: full probe ≡ exact; narrow probe returns exactly-scored subset") {
    import spark.implicits._
    val df = (0L until 24L).map(i =>
      (i, Array((math.cos(i * 0.7) * (1 + i % 5)).toFloat,
        (math.sin(i * 0.7) * (1 + (i / 2) % 3)).toFloat))).toDF("vec_id", "embedding")
    val exact = Similarity.mipsTopK(df, "vec_id", "embedding", queryId = 5, k = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Similarity.mipsTopKLsh(df, "vec_id", "embedding", queryId = 5,
        k = 6, bits = 4, probeRadius = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact, "probing every bucket reproduces the exact MIPS answer")
    val narrow = Similarity.mipsTopKLsh(df, "vec_id", "embedding", queryId = 5,
        k = 6, bits = 4, probeRadius = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exactScores = exact.toMap
    assert(narrow.nonEmpty && narrow.forall { case (id, ip) =>
      !exactScores.contains(id) || exactScores(id) == ip },
      "shortlist re-scores are the EXACT inner products, never bucket artifacts")
  }
}
