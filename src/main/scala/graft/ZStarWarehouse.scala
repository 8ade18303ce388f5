package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.ViewGraph
import graft.ops.{Layout, ManifestFileIndex, ZTable}

/** The star graph stored as MAINTAINED Z-TABLES — the unification of the
  * repo's two halves: chain/traversal queries (the graph side) running
  * over the manifest-backed planner layer (FileIndex span pruning, bloom
  * sidecars, persisted schema, DV/CDC lifecycle) instead of plain
  * bucketed parquet.
  *
  * Layout: edges z-cluster on (`_start_key`, `_end_key`) — the numeric
  * suffixes of startuid/enduid — with BLOOM sidecars over both, nodes on
  * (`_key`, `_key`) with a bloom over `_key`. The reference's hot access
  * pattern is the point traversal (`getuid`, `node.outE/inE` —
  * graphydb.py:1025-1044, 1335-1357, where SQLite answers through its
  * uid/startuid/enduid indexes); here the same pattern is a literal
  * equality predicate on the key column of a [[ZTable.dataFrame]], so the
  * planner's `listFiles` prunes to the handful of files whose z spans AND
  * bloom bitsets admit the key — at 100k files that is a driver-side
  * manifest walk plus bitset probes, zero data-file opens for pruned
  * files (LayoutProbe measures the 100k-file shape; the w49 driver row
  * requires pruning engaged on real data).
  *
  * Different trade than [[StarWarehouse]]'s bucketed tables: buckets give
  * SHUFFLE-FREE whole-graph joins (bulk chains), z-tables give
  * PLANNER-PRUNED point access plus the whole maintained-table lifecycle
  * (append/maintain/delete/CDC/time travel) — a mutable graph warehouse
  * at scale wants exactly that second set. Both are ViewGraphs, so every
  * Fetch/Traversals operator runs unchanged over either.
  *
  * Build is memoized per (session, dir) and reused across JVMs via the
  * same fingerprint sidecar discipline as StarWarehouse: a matching
  * signature + committed generations on disk reopen with zero writes.
  */
object ZStarWarehouse {

  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (String, String)]()

  private def keyOf(uidCol: String) =
    substring_index(col(uidCol), ":", -1).cast("long")

  /** (nodesTablePath, edgesTablePath) — built (or reused) maintained
    * z-tables for the star projection of `dir`. */
  def tables(spark: SparkSession, dir: String): (String, String) =
    memo.computeIfAbsent((spark, dir), { case (s, d) => build(s, d) })

  /** Drop the per-session memo (tables stay on disk and re-open by
    * fingerprint). */
  def invalidate(): Unit = memo.clear()

  private def ftsPathOf(spark: SparkSession, dir: String): String = {
    import graft.engine.WarehouseMeta
    val name = "graft_zstar_" + WarehouseMeta.md5Hex(dir).take(12)
    WarehouseMeta.tableLocation(spark, s"${name}_fts").toString
  }

  private def build(spark: SparkSession, dir: String): (String, String) = {
    import graft.engine.WarehouseMeta
    val name = "graft_zstar_" + WarehouseMeta.md5Hex(dir).take(12)
    val nPath = WarehouseMeta.tableLocation(spark, s"${name}_nodes").toString
    val ePath = WarehouseMeta.tableLocation(spark, s"${name}_edges").toString
    val fPath = ftsPathOf(spark, dir)
    val fp = WarehouseMeta.md5Hex(WarehouseMeta.sourceSignature(dir) + "#zstar2")
    WarehouseMeta.withBuildLock(spark, name) {
      val ok = WarehouseMeta.readSidecar(spark, s"${name}_meta.tsv")
        .exists(_.get("sig").contains(fp)) &&
        Layout.currentGen(nPath).isDefined &&
        Layout.currentGen(ePath).isDefined &&
        Layout.currentGen(fPath).isDefined
      if (!ok) {
        WarehouseMeta.deleteRecursively(java.nio.file.Paths.get(nPath))
        WarehouseMeta.deleteRecursively(java.nio.file.Paths.get(ePath))
        WarehouseMeta.deleteRecursively(java.nio.file.Paths.get(fPath))
        val g = StarGraph.build(spark, dir)
        Layout.zorderInit(spark,
          g.nodes.withColumn("_key", keyOf("uid")),
          nPath, "_key", "_key", nFiles = 16)
        Layout.zorderInit(spark,
          g.edges.withColumn("_start_key", keyOf("startuid"))
            .withColumn("_end_key", keyOf("enduid")),
          ePath, "_start_key", "_end_key", nFiles = 24)
        // bloom sidecars over every traversal key: z spans alone admit
        // every file whose key RANGE covers a probe; the bitsets cut that
        // to files that may actually CONTAIN it (the getuid/outE shape).
        // 2^18 bits keeps the per-file load low enough to prune at sf0.1
        // (~30k keys/file → ~0.6 bits/key load at 5 hashes)
        Layout.zorderBloomBuild(spark, nPath, "_key", bits = 1 << 18,
          shards = Layout.zorderBloomAutoShards(nPath, "_key"))
        Layout.zorderBloomBuild(spark, ePath, "_start_key", bits = 1 << 18,
          shards = Layout.zorderBloomAutoShards(ePath, "_start_key"))
        Layout.zorderBloomBuild(spark, ePath, "_end_key", bits = 1 << 18,
          shards = Layout.zorderBloomAutoShards(ePath, "_end_key"))
        // the star FTS (part names, field "name") as a MAINTAINED
        // postings z-table (r16): same tokenizer as StarGraph's cached
        // postings (plain lower — the star projection predates the
        // unicode61 default and its oracles pin that), so FTS chains
        // answer identically over all three storage layouts
        graft.ops.ZFts.init(spark,
          spark.read.parquet(s"$dir/part.parquet").select(
            concat(lit("part:"), col("p_partkey")).as("uid"),
            col("p_name")),
          fPath, "uid", Map("name" -> "p_name"))
        WarehouseMeta.writeSidecar(spark, s"${name}_meta.tsv", Map("sig" -> fp))
      }
    }
    (nPath, ePath)
  }

  /** The star graph as a [[ViewGraph]] whose node/edge frames are
    * planner-integrated [[ZTable.dataFrame]] reads (helper key columns
    * dropped) — every Fetch chain and Traversals operator runs over the
    * maintained tables unchanged, and literal key predicates prune at
    * planning time. */
  def apply(spark: SparkSession, dir: String): ViewGraph = {
    val (nPath, ePath) = tables(spark, dir)
    new ViewGraph(spark,
      ZTable.dataFrame(spark, nPath).drop("_key"),
      ZTable.dataFrame(spark, ePath).drop("_start_key", "_end_key"),
      // maintained part-name postings: `p_fts` MATCH params in chains
      // run over the z-layout too, term atoms pruning via the term bloom
      nodeFtsDf = Some(graft.ops.ZFts.postings(spark,
        ftsPathOf(spark, dir))))
  }

  /** The edge z-table plus its [[ManifestFileIndex]] (pruning audit). */
  def edgesWithIndex(spark: SparkSession,
      dir: String): (DataFrame, ManifestFileIndex) =
    ZTable.dataFrameWithIndex(spark, tables(spark, dir)._2)

  /** The node z-table plus its [[ManifestFileIndex]]. */
  def nodesWithIndex(spark: SparkSession,
      dir: String): (DataFrame, ManifestFileIndex) =
    ZTable.dataFrameWithIndex(spark, tables(spark, dir)._1)

  private def uidKey(uid: String): Long = {
    val i = uid.lastIndexOf(':')
    require(i >= 0 && i < uid.length - 1, s"star uid without a key: $uid")
    uid.substring(i + 1).toLong
  }

  /** Point node lookup (the reference's `getuid`): a literal `_key`
    * equality on the node z-table — bloom + span pruned inside the
    * planner — with the uid residual filter on top. */
  def getuid(spark: SparkSession, dir: String, uid: String): DataFrame = {
    val (df, _) = nodesWithIndex(spark, dir)
    df.filter(col("_key") === uidKey(uid) && col("uid") === uid).drop("_key")
  }

  /** Out-edges of one node (the reference's `node.outE`): literal
    * `_start_key` equality, planner-pruned, uid residual. */
  def outEdges(spark: SparkSession, dir: String, uid: String): DataFrame = {
    val (df, _) = edgesWithIndex(spark, dir)
    df.filter(col("_start_key") === uidKey(uid) && col("startuid") === uid)
      .drop("_start_key", "_end_key")
  }

  /** In-edges of one node (`node.inE`): literal `_end_key` equality. */
  def inEdges(spark: SparkSession, dir: String, uid: String): DataFrame = {
    val (df, _) = edgesWithIndex(spark, dir)
    df.filter(col("_end_key") === uidKey(uid) && col("enduid") === uid)
      .drop("_start_key", "_end_key")
  }
}
