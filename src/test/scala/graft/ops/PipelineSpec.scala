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

  test("p01: composed lazy plan ≡ stage-by-stage materialization; plan audit") {
    // the oracle proves p01's VALUES; this pins its two structural claims:
    // (1) running the chain as one composed plan loses nothing vs
    //     materializing every stage boundary to parquet and re-reading;
    // (2) the executed plan materializes nothing to the driver beyond the
    //     two documented bounded sites (CC's distributed supersteps reach
    //     the plan as ONE RDD scan — the cluster manifest — and
    //     temperatureMix's |strata| size aggregate runs as its own job
    //     before the plan executes).
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val gateRules = Seq(
      Quality.Expect("min_tokens", TextAnalysis.tokenCount(col("text")) >= 20),
      Quality.Expect("chars_max", col("n_chars") <= 520),
      Quality.Expect("chars_consistent", col("n_chars") === length(col("text"))))

    val composed = graft.SparkEntry.queries("p01_ingest_pipeline")(spark, dir)

    val tmp = java.nio.file.Files.createTempDirectory("p01_stage").toString
    def roundtrip(df: org.apache.spark.sql.DataFrame, name: String) = {
      df.write.mode("overwrite").parquet(s"$tmp/$name")
      spark.read.parquet(s"$tmp/$name")
    }
    val gated = roundtrip(Quality.gate(docs, gateRules), "gated")
    val clusters = roundtrip(
      Dedup.dupClusters(spark, Dedup.lshCandidates(gated, "doc_id", "text")), "clusters")
    val surv = roundtrip(Dedup.dedupByClusters(gated, "doc_id", clusters), "surv")
    val mixed = roundtrip(
      Sampling.temperatureMix(surv, "lang", "doc_id", alpha = 0.5, targetRows = 800),
      "mixed")
    val staged = TextAnalysis.packBins(
        mixed.withColumn("pack_id", col("doc_id") * 1024 + col("copy_idx")),
        "lang", "pack_id", "text", budget = 256)
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_tokens")).cast("long").as("bin_tokens"))

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val composedRows = rows(composed)
    assert(composedRows.nonEmpty && composedRows == rows(staged),
      "composed chain must equal stage-by-stage materialization")

    // plan audit on the composed frame: exactly one RDD scan (the CC
    // cluster manifest), no driver-side collect/limit nodes, no cartesian
    // AQE's toString prints the final AND initial plans — audit the final
    val plan = composed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the CC manifest enters EITHER as a LocalTableScan (the cardinality-
    // gated driver union-find — bounded by an exact pair count) or, above
    // the gate, as ONE external-RDD scan (`Scan[obj#N]`) whose lineage
    // holds the distributed GraphX run; never anything else
    val rddScans = "Scan\\[obj".r.findAllIn(plan).size
    assert(rddScans <= 1, s"at most the CC manifest as RDD scan, got $rddScans:\n$plan")
    assert(rddScans == 1 || plan.contains("LocalTableScan"),
      s"the cluster manifest must appear as RDD scan or local relation:\n$plan")
    assert(!plan.contains("CollectLimit") && !plan.contains("Cartesian"),
      s"no driver materialization or cartesian in the composed plan:\n$plan")

    // the mix genuinely upsampled: some survivor carries copy_idx >= 1
    // (low-resource langs get fractional copies at target 800 > corpus)
    assert(mixed.filter(col("copy_idx") >= 1).count() > 0,
      "temperature mix at target 800 must upsample low-resource strata")
    graft.engine.WarehouseMeta.deleteRecursively(java.nio.file.Paths.get(tmp))
  }

  test("p02: composed curation plan ≡ stage-by-stage materialization; plan audit") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val composed = graft.SparkEntry.queries("p02_curation_pipeline")(spark, dir)

    val tmp = java.nio.file.Files.createTempDirectory("p02_stage").toString
    def roundtrip(df: org.apache.spark.sql.DataFrame, name: String) = {
      df.write.mode("overwrite").parquet(s"$tmp/$name")
      spark.read.parquet(s"$tmp/$name")
    }
    val scrubbed = roundtrip(
      TextAnalysis.paragraphDedup(docs, "doc_id", "text", window = 8)
        .filter(col("kept_segments") > 0)
        .join(docs.select("doc_id", "lang"), "doc_id"), "scrubbed")
    val scores = roundtrip(
      TextAnalysis.unigramLogProb(scrubbed, "doc_id", "clean_text"), "scores")
    val mean = scores.agg(round(avg(col("avg_neg_logp")), 6)).head().getDouble(0)
    val kept = roundtrip(
      scores.filter(col("avg_neg_logp") <= mean).select("doc_id"), "kept")
    val staged = TextAnalysis.packBins(scrubbed.join(kept, "doc_id"),
        "lang", "doc_id", "clean_text", budget = 128)
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_tokens")).cast("long").as("bin_tokens"))

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows(composed) == rows(staged),
      "composing the curation chain must lose nothing vs stage materialization")

    // both gates bit: the scrub dropped segments somewhere and the
    // surprisal gate dropped some docs (mean splits a non-degenerate
    // distribution), so the pipeline exercised every stage
    assert(scores.count() > kept.count(), "the surprisal gate dropped outliers")

    val plan = composed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CollectLimit") && !plan.contains("Cartesian"),
      s"no driver materialization or cartesian in the composed plan:\n$plan")
    graft.engine.WarehouseMeta.deleteRecursively(java.nio.file.Paths.get(tmp))
  }

  test("p03: composed curation-v2 plan ≡ stage-by-stage materialization; every gate bites") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val composed = graft.SparkEntry.queries("p03_curation_v2")(spark, dir)

    val tmp = java.nio.file.Files.createTempDirectory("p03_stage").toString
    def roundtrip(df: org.apache.spark.sql.DataFrame, name: String) = {
      df.write.mode("overwrite").parquet(s"$tmp/$name")
      spark.read.parquet(s"$tmp/$name")
    }
    val gateIds = roundtrip(
      TextAnalysis.gopherRules(docs, "doc_id", "text",
          minWords = 30, maxWords = 90,
          minMeanWordLen = 4.0, maxMeanWordLen = 4.9,
          minAlphaFrac = 0.8, minStopwords = 2,
          stopwords = Seq("the", "a", "of", "and", "is"))
        .filter(col("pass_gopher")).select("doc_id"), "gate")
    val gated = roundtrip(docs.join(gateIds, "doc_id"), "gated")
    val clusters = roundtrip(Dedup.dupClusters(spark,
      Dedup.lshCandidates(gated, "doc_id", "text")), "clusters")
    val scored = gated.select(col("doc_id"),
      TextAnalysis.distinctTokenCount(col("text")).as("q"))
    val kept = roundtrip(
      Dedup.dedupByClustersBest(gated, "doc_id", clusters, scored, "q"), "kept")
    val staged = TextAnalysis.packBins(kept, "lang", "doc_id", "text", budget = 128)
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_tokens")).cast("long").as("bin_tokens"))

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows(composed) == rows(staged),
      "composing curation v2 must lose nothing vs stage materialization")

    // every stage bites on the real corpus: the gate rejects some docs,
    // clustering finds dup groups among the gated, the keep-rule drops the
    // losers
    val nDocs = docs.count(); val nGated = gated.count(); val nKept = kept.count()
    assert(nGated < nDocs, "the Gopher gate rejected documents")
    assert(clusters.count() > 0, "near-dup clusters exist among gated docs")
    assert(nKept < nGated, "the cluster keep-rule dropped losers")
    graft.engine.WarehouseMeta.deleteRecursively(java.nio.file.Paths.get(tmp))
  }

  test("incremental ingestion round composes: store → increment → cluster → accept → append") {
    // the maintained-index workflow a training-data platform actually runs,
    // over REAL documents: an existing corpus owns a signature store; a new
    // shard is deduped against it (one text pass over the shard only),
    // survivors are accepted and their signatures appended, and the NEXT
    // shard sees them — all without ever re-reading accepted corpus text
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 3 === 0)
    val shard1 = docs.filter(col("doc_id") % 3 === 1)
    val shard2 = docs.filter(col("doc_id") % 3 === 2)
    Dedup.writeSignatureStore(spark, corpus, "doc_id", "text", "graft_pipe_store")

    // shard 1 vs corpus: any shard doc paired with accepted content is a
    // dup — the CORPUS side always wins (it is already accepted), so the
    // keep-rule is an anti-join on the shard-side pair ids, not min-id
    // cluster representatives
    val pairs1 = Dedup.dedupIncrement(spark, shard1, "doc_id", "text",
      "graft_pipe_store", minEstimate = 0.5)
    val corpusIds = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    val accepted1 = shard1.join(
      pairs1.select(col("id_a").as("doc_id"))
        .union(pairs1.select(col("id_b").as("doc_id")))
        .filter(!col("doc_id").isin(corpusIds.toSeq: _*)).distinct(),
      Seq("doc_id"), "left_anti")
    val n1 = accepted1.count()
    assert(n1 > 0 && n1 <= shard1.count())
    Dedup.appendSignatureStore(spark, accepted1, "doc_id", "text", "graft_pipe_store")

    // shard 2 now collides with BOTH original corpus and accepted shard-1
    // docs; every pair's non-shard side must be a store member
    val pairs2 = Dedup.dedupIncrement(spark, shard2, "doc_id", "text",
      "graft_pipe_store", minEstimate = 0.5)
    val storeIds = corpusIds ++ accepted1.select("doc_id").collect().map(_.getLong(0))
    val shard2Ids = shard2.select("doc_id").collect().map(_.getLong(0)).toSet
    val got = pairs2.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty, "real corpus has cross-shard dups at threshold 0.5")
    got.foreach { case (a, b) =>
      assert((storeIds(a) && shard2Ids(b)) || (shard2Ids(a) && storeIds(b)),
        s"pair ($a,$b) must span store × shard2")
    }
    // and the appended shard-1 signatures are actually probed: at least one
    // pair anchors on an accepted shard-1 doc unless shard1 contributed no
    // near-dup content (verified against a direct cross check)
    val s1Ids = accepted1.select("doc_id").collect().map(_.getLong(0)).toSet
    val direct = Dedup.estimateJaccardBySignature(
      accepted1.unionByName(shard2), "doc_id", "text",
      Dedup.lshCandidates(accepted1.unionByName(shard2), "doc_id", "text"),
      minEstimate = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (s1Ids(a) && shard2Ids(b)) || (shard2Ids(a) && s1Ids(b)) }
    val viaStore = got.filter { case (a, b) => s1Ids(a) || s1Ids(b) }
    assert(viaStore.toSet == direct.toSet,
      "increment vs appended shard-1 signatures ≡ direct recompute")
  }
}
