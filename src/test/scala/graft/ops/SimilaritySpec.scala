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
}
