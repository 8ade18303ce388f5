package graft.ops

import graft.SparkSpec
import graft.engine.MemGraph
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite with SparkSpec {

  // two components: triangle a→b→c→a, pair d→e; isolated f
  private def fixture(): (MemGraph, Map[String, String]) = {
    val g = MemGraph(spark)
    val ns = Seq("a", "b", "c", "d", "e", "f").map(n => n -> g.node("P", "name" -> n).save()).toMap
    g.edge(ns("a"), "E", ns("b")).save(); g.edge(ns("b"), "E", ns("c")).save()
    g.edge(ns("c"), "E", ns("a")).save(); g.edge(ns("d"), "E", ns("e")).save()
    (g, ns.map { case (k, v) => k -> v.uid })
  }

  test("degrees include zero-degree nodes") {
    val (g, ids) = fixture()
    val d = Analytics.degrees(g).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d(ids("a")) == ((1L, 1L)) && d(ids("d")) == ((1L, 0L)) && d(ids("f")) == ((0L, 0L)))
  }

  test("connected components split the triangle, the pair, and the isolate") {
    val (g, ids) = fixture()
    val cc = Analytics.connectedComponents(spark, g).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cc(ids("a")) == cc(ids("b")) && cc(ids("b")) == cc(ids("c")))
    assert(cc(ids("d")) == cc(ids("e")))
    assert(Set(cc(ids("a")), cc(ids("d")), cc(ids("f"))).size == 3)
  }

  test("pagerank: cycle members tie, sinks lower") {
    val (g, ids) = fixture()
    val pr = Analytics.pageRank(spark, g, tol = 0.0001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr(ids("a")) - pr(ids("b"))) < 1e-6, "symmetric cycle ranks equal")
    assert(pr(ids("e")) > pr(ids("d")), "e receives d's rank")
  }

  test("hopDistances: exact undirected BFS levels; unreachable absent") {
    val (g, ids) = fixture()
    // chain the pair onto the triangle: c→d makes a..e one component at
    // known distances from a; f stays unreachable
    g.edge(ids("c"), "E", ids("d")).save()
    val d = Analytics.hopDistances(spark, g, ids("a")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(d(ids("a")) == 0 && d(ids("b")) == 1 && d(ids("c")) == 1)
    assert(d(ids("d")) == 2, "via c, not the long way")
    assert(d(ids("e")) == 3)
    assert(!d.contains(ids("f")), "unreachable nodes are absent, not MaxValue")
  }

  test("triangleCounts: K4 counts, canonicalization eats dups/loops, skew-safe orientation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // K4 on 1..4 (+ dangling edge to 5, a reversed duplicate, a self-loop):
    // each K4 vertex sits in C(3,2)=3 triangles; 5 is in none and absent
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (2L, 1L), (3L, 3L)).toDF("src", "dst")
    val got = Analytics.triangleCounts(k4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // hub star with one closing edge: exactly the {0,1,2} triangle — the
    // degree orientation points the closing wedge AWAY from the hub
    val star = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
      .unionAll(Seq((1L, 2L)).toDF("src", "dst"))
    val got2 = Analytics.triangleCounts(star)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
    // triangle-free bipartite-ish graph → empty result
    val none = Analytics.triangleCounts(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"))
    assert(none.filter(col("triangles") > 0).count() == 0 && none.count() == 0)
  }

  test("clusteringCoefficients: 2T/(d(d−1)); degree<2 excluded; triangle-free nodes score 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // K4 on 1..4 plus a dangling edge 4–5: 1..3 have d=3,T=3 → 1.0;
    // 4 has d=4,T=3 → 0.5; 5 has d=1 → excluded
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Analytics.clusteringCoefficients(k4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(1L -> ((3L, 3L, 1.0)), 2L -> ((3L, 3L, 1.0)),
      3L -> ((3L, 3L, 1.0)), 4L -> ((4L, 3L, 0.5))))
    // path graph: middle node has degree 2 but no triangle → 0.0 row kept
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val mid = Analytics.clusteringCoefficients(path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(mid.toSeq == Seq((2L, 2L, 0L, 0.0)))
  }

  test("kindStats exact vs approx within HLL tolerance") {
    val (g, _) = fixture()
    val exact = Analytics.kindStats(g, exact = true).head().getLong(1)
    val approx = Analytics.kindStats(g, exact = false).head().getLong(1)
    assert(exact == 6L && math.abs(approx - exact) <= 1)
  }

  test("adamicAdar: hand-computed scores, existing edges excluded, hub cap engages with audit") {
    import spark.implicits._
    // path 1-2-3 plus 2-4: pairs via z=2 (deg 3): (1,3), (1,4), (3,4),
    // each scored 1/ln(3); pair (1,2) is an EDGE — never a candidate
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L), (2L, 1L)) // dup/reversed tolerated
      .toDF("src", "dst")
    val got = Analytics.adamicAdar(edges)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val w = math.rint(1.0 / math.log(3.0) * 1e6) / 1e6
    assert(got == Map((1L, 3L) -> w, (1L, 4L) -> w, (3L, 4L) -> w))
    // two shared neighbors sum their weights: square 1-2-3-4 + diagonal-free
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val gotSq = Analytics.adamicAdar(sq)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val w2 = math.rint(2.0 / math.log(2.0) * 1e6) / 1e6
    assert(gotSq == Map((1L, 3L) -> w2, (2L, 4L) -> w2),
      "opposite corners share TWO degree-2 neighbors")
    // cap: maxDegree=2 excludes vertex 2 (deg 3) as an intermediary
    val capped = Analytics.adamicAdar(edges, maxDegree = 2)
    assert(capped.count() == 0, "the only intermediary is over the cap")
    val audit = Analytics.hubIntermediaries(edges, maxDegree = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(audit.toSeq == Seq((2L, 3L)), "the cap's drop is auditable")
  }
}
