package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end training-data pipeline over the REAL sf0.001 documents table:
  * quality features → language id → exact dedup → LSH candidates → jaccard
  * confirm → transitive clusters → representative selection → token stats.
  * Pins that the ops COMPOSE (column contracts line up) and that the
  * pipeline's invariants hold on real data, not just fixtures. */
class PipelineSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("full dedup pipeline composes over real documents") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val total = docs.count()
    assert(total > 0, "fixture documents present")

    // 1. quality + language features join back onto the corpus by id
    val withQuality = docs
      .join(TextAnalysis.qualityFeatures(docs, "doc_id", "text"), "doc_id")
      .join(TextAnalysis.langId(docs, "doc_id", "text").select(col("doc_id"), col("pred_lang")), "doc_id")
    assert(withQuality.count() == total, "feature joins are 1:1")

    // 2. exact dedup first (cheap hash-groupBy)
    val exact = Dedup.exactDedup(withQuality, "doc_id", Seq("text"))
    val nExact = exact.count()
    assert(nExact <= total)

    // 3. LSH candidates → confirm with exact jaccard ≥ 0.5 → clusters
    val cands = Dedup.lshCandidates(exact, "doc_id", "text")
    val confirmed = Dedup.ngramJaccardPairs(exact, "doc_id", "text", k = 3, threshold = 0.5)
      .join(cands, Seq("id_a", "id_b"), "left_semi")
    val clusters = Dedup.dupClusters(spark, confirmed)
    val kept = Dedup.dedupByClusters(exact, "doc_id", clusters)
    val nKept = kept.count()
    assert(nKept <= nExact && nKept > 0)

    // invariants: every kept id was an input id; cluster representatives
    // survive; dropped = non-representative cluster members exactly
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val reps = clusters.filter(col("id") === col("cluster"))
      .collect().map(_.getLong(0)).toSet
    val members = clusters.collect().map(_.getLong(0)).toSet
    assert(reps.subsetOf(keptIds), "cluster representatives must be kept")
    assert((members -- reps).forall(!keptIds.contains(_)),
      "every non-representative member must be dropped")
    assert(nExact - nKept == (members -- reps).size)

    // 4. near-dup-free: no two kept docs share a fingerprint
    val fps = kept.select(TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(fps.count() == fps.distinct().count(), "kept set has no exact dups")

    // 5. downstream stats still run over the cleaned corpus
    val stats = kept.groupBy("pred_lang")
      .agg(count(lit(1)).as("docs"),
        sum(TextAnalysis.tokenCount(col("text"))).as("tokens"))
      .collect()
    assert(stats.nonEmpty && stats.map(_.getAs[Long]("docs")).sum == nKept)
  }
}
