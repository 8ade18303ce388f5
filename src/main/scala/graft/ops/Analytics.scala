package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.GraphSource

/** Whole-graph analytics beyond the reference's operator set (it has none —
  * SURVEY §2.12 ends at motif chains): degree distributions as plain
  * aggregations, PageRank / connected components via the GraphX bridge.
  * These are the "iterative analytics" escape hatch where per-hop DataFrame
  * joins would re-shuffle the full graph every step. */
object Analytics {

  /** In/out/total degree per node — two aggregations + one outer join;
    * nodes with no edges appear with zero degrees. */
  def degrees(g: GraphSource): DataFrame = {
    val out = g.edges.groupBy(col("startuid").as("uid")).agg(count(lit(1)).as("out_degree"))
    val in = g.edges.groupBy(col("enduid").as("uid")).agg(count(lit(1)).as("in_degree"))
    g.nodes.select("uid")
      .join(out, Seq("uid"), "left_outer")
      .join(in, Seq("uid"), "left_outer")
      .select(col("uid"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .withColumn("degree", col("out_degree") + col("in_degree"))
  }

  /** Per-kind counts at scale with approximate distinct-uid counting — the
    * 100 TB default for dedup-counting (SURVEY §2.4); exact mode for parity. */
  def kindStats(g: GraphSource, exact: Boolean = true): DataFrame = {
    val agg = if (exact) countDistinct(col("uid")) else approx_count_distinct(col("uid"))
    g.nodes.groupBy("kind").agg(agg.as("nodes"))
  }

  def pageRank(spark: SparkSession, g: GraphSource, tol: Double = 0.001): DataFrame = {
    val (dict, gx) = Traversals.graphXOf(g)
    val ranks = gx.pageRank(tol).vertices
    import spark.implicits._
    val ranksDf = ranks.toDF("vid", "rank")
    dict.join(ranksDf, "vid").select(col("uid"), col("rank"))
  }

  /** Fixed-iteration PageRank: predictable cost (tol-based convergence can
    * iterate arbitrarily long on graphs with many dangling vertices). */
  def staticPageRank(spark: SparkSession, g: GraphSource, numIter: Int): DataFrame = {
    val (dict, gx) = Traversals.graphXOf(g)
    val ranks = gx.staticPageRank(numIter).vertices
    import spark.implicits._
    val ranksDf = ranks.toDF("vid", "rank")
    dict.join(ranksDf, "vid").select(col("uid"), col("rank"))
  }

  /** Single-source BFS hop distances (undirected) via GraphX Pregel — the
    * whole-graph generalization of [[Traversals.kHop]]: one superstep per
    * BFS level instead of one DataFrame join per hop, so a diameter-D graph
    * costs D Pregel rounds over the partitioned edge RDD with no
    * re-planning between rounds. Returns (uid, dist) for every REACHABLE
    * node, seed included at dist 0. Distances are exact minima (messages
    * merge with min), so results are deterministic regardless of
    * partitioning or edge multiplicity. */
  def hopDistances(spark: SparkSession, g: GraphSource, seedUid: String): DataFrame = {
    val (dict, gx) = Traversals.graphXOf(g)
    val seedVid = dict.filter(col("uid") === seedUid).head().getAs[Long]("vid")
    val init = gx.mapVertices((vid, _) => if (vid == seedVid) 0 else Int.MaxValue)
    val res = init.pregel(Int.MaxValue)(
      (_, attr, msg) => math.min(attr, msg),
      t => {
        val out = List.newBuilder[(org.apache.spark.graphx.VertexId, Int)]
        if (t.srcAttr != Int.MaxValue && t.srcAttr + 1 < t.dstAttr)
          out += ((t.dstId, t.srcAttr + 1))
        if (t.dstAttr != Int.MaxValue && t.dstAttr + 1 < t.srcAttr)
          out += ((t.srcId, t.dstAttr + 1))
        out.result().iterator
      },
      math.min)
    import spark.implicits._
    val distDf = res.vertices.filter(_._2 != Int.MaxValue).toDF("vid", "dist")
    dict.join(distDf, "vid").select(col("uid"), col("dist"))
  }

  /** Canonical simple-graph edges: id-ordered endpoints, self-loops and
    * duplicate/reversed edges removed. */
  private def canonEdges(edges: DataFrame): DataFrame =
    edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()

  /** Simple-graph degrees off [[canonEdges]] output. */
  private def canonDegrees(canon: DataFrame): DataFrame =
    canon.select(col("a").as("v")).unionAll(canon.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree"))

  /** Per-node triangle counts over an undirected edge list (`src`/`dst` in
    * any orientation; duplicates and self-loops tolerated) — compact-forward
    * with degree ordering (Latapy 2008, the standard distributed recipe):
    * every canonical edge orients from its (degree, id)-smaller endpoint to
    * the larger, making the graph a DAG in which each triangle has exactly
    * ONE vertex holding both of its other corners as out-neighbors. Wedges
    * are out-neighbor pairs of that vertex, closed by one join against the
    * canonical edge set; each closed wedge explodes to its three corners for
    * the per-node count. Only vertices in ≥ 1 triangle appear.
    *
    * Scale shape: the orientation caps out-degree at O(√m) on ANY degree
    * distribution, so the wedge set — the sole super-linear intermediate —
    * is O(m^1.5) worst-case instead of the Σdeg² a hub vertex costs under
    * raw id ordering; a social-graph celebrity node stops being a planner
    * emergency. Everything is vertex-keyed joins + aggregations: no driver
    * state, no iteration. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val canon = canonEdges(edges)
    triangleCountsFromCanon(canon, canonDegrees(canon))
  }

  private def triangleCountsFromCanon(canon: DataFrame, deg: DataFrame): DataFrame = {
    val fwd = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val oriented = canon
      .join(deg.select(col("v").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("degree").as("db")), "b")
      .select(when(fwd, col("a")).otherwise(col("b")).as("u"),
        when(fwd, col("b")).otherwise(col("a")).as("w"))
    // out-neighbor pairs (id-ordered: each unordered pair once), closed by
    // the canonical edge — id order IS the canonical key, no re-sort needed
    val wedges = oriented.select(col("u"), col("w").as("v1"))
      .join(oriented.select(col("u"), col("w").as("v2")), "u")
      .filter(col("v1") < col("v2"))
    wedges.join(canon, col("v1") === col("a") && col("v2") === col("b"))
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("triangles"))
  }

  /** Local clustering coefficient per node — 2·T(v) / (deg(v)·(deg(v)−1))
    * over the canonicalized simple graph, the standard
    * community-tightness signal on top of [[triangleCounts]]. Nodes of
    * degree < 2 are excluded (coefficient undefined); triangle-free nodes
    * score 0. Canonicalization and degrees are computed ONCE and shared
    * with the triangle pass — the edge list's own lineage (often an
    * expensive self-join) is not re-evaluated per stage. */
  def clusteringCoefficients(edges: DataFrame, roundTo: Int = 6): DataFrame = {
    val canon = canonEdges(edges)
    val deg = canonDegrees(canon)
    deg.filter(col("degree") >= 2)
      .join(triangleCountsFromCanon(canon, deg), Seq("v"), "left")
      .select(col("v"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        round(coalesce(col("triangles"), lit(0L)) * 2.0
          / (col("degree") * (col("degree") - 1)), roundTo).as("coeff"))
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003 — public): for each
    * NON-edge pair sharing ≥1 neighbor, score = Σ_{z∈N(a)∩N(b)} 1/ln(deg z)
    * — the classic "which items/users will connect next" signal. Common
    * neighbors enumerate through each shared vertex z (one adjacency
    * self-join on z), so the intermediate is Σ deg(z)² — the hub blow-up
    * every neighborhood method hits at scale. `maxDegree` caps it:
    * vertices above the cap are excluded as INTERMEDIARIES (a hub adjacent
    * to millions says little about any one pair — the standard practical
    * mitigation), and the drop is auditable via [[hubIntermediaries]], the
    * no-silent-caps rule. deg(z) ≥ 2 for any common neighbor, so
    * 1/ln(deg z) never divides by zero. Returns (a, b, aa_score),
    * candidate pairs only (existing edges anti-joined away). */
  def adamicAdar(edges: DataFrame, maxDegree: Long = Long.MaxValue,
      roundTo: Int = 6): DataFrame = {
    val canon = canonEdges(edges)
    val deg = canonDegrees(canon)
    val und = canon.select(col("a").as("z"), col("b").as("n"))
      .unionAll(canon.select(col("b").as("z"), col("a").as("n")))
    // degree ≥ 2: a degree-1 vertex has no wedge anyway, and its weight
    // would divide by ln(1) = 0 under ANSI mode BEFORE the wedge join
    // could drop it
    val weighted = und.join(
      deg.filter(col("degree") >= 2 && col("degree") <= maxDegree)
        .select(col("v").as("z"), (lit(1.0) / log(col("degree"))).as("wt")), "z")
    val scored = weighted.select(col("z"), col("n").as("n1"), col("wt"))
      .join(weighted.select(col("z"), col("n").as("n2")), "z")
      .filter(col("n1") < col("n2"))
      .groupBy(col("n1").as("a"), col("n2").as("b"))
      .agg(round(sum(col("wt")), roundTo).as("aa_score"))
    scored.join(canon, Seq("a", "b"), "left_anti")
  }

  /** The [[adamicAdar]] cap's audit: exactly which vertices a `maxDegree`
    * cap refused to route scores through, with their degrees. */
  def hubIntermediaries(edges: DataFrame, maxDegree: Long): DataFrame =
    canonDegrees(canonEdges(edges)).filter(col("degree") > maxDegree)

  def connectedComponents(spark: SparkSession, g: GraphSource): DataFrame = {
    val (dict, gx) = Traversals.graphXOf(g)
    val cc = gx.connectedComponents().vertices
    import spark.implicits._
    val ccDf = cc.toDF("vid", "component_vid")
    dict.join(ccDf, "vid").select(col("uid"), col("component_vid").as("component"))
  }
}
