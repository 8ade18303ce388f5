package graft.ops

import graft.SparkSpec
import graft.engine.MemGraph
import org.scalatest.funsuite.AnyFunSuite

/** Distributed traversal forms vs the driver-side reference semantics
  * (SURVEY §2.12): frontier joins, k-hop with visited pruning, GraphX BFS. */
class TraversalsSpec extends AnyFunSuite with SparkSpec {

  // path graph a→b→c→d plus isolated e
  private def pathGraph(): (MemGraph, Seq[graft.engine.Node]) = {
    val g = MemGraph(spark)
    val ns = Seq("a", "b", "c", "d", "e").map(n => g.node("P", "name" -> n).save())
    g.edge(ns(0), "E", ns(1)).save()
    g.edge(ns(1), "E", ns(2)).save()
    g.edge(ns(2), "E", ns(3)).save()
    (g, ns)
  }

  private def names(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(r => graft.core.Json.parse(r.getAs[String]("props"))("name").toString).toSet

  test("outN/inN/bothN frontier joins") {
    val (g, ns) = pathGraph()
    val seed = g.nodes.filter(org.apache.spark.sql.functions.col("uid") === ns(1).uid)
    assert(names(Traversals.outN(g, seed)) == Set("c"))
    assert(names(Traversals.inN(g, seed)) == Set("a"))
    assert(names(Traversals.bothN(g, seed)) == Set("a", "c"))
  }

  test("kHop with visited pruning matches chained bothN") {
    val (g, ns) = pathGraph()
    val seed = g.nodes.filter(org.apache.spark.sql.functions.col("uid") === ns(0).uid)
    assert(names(Traversals.kHop(g, seed, 2)) == Set("b", "c"))
    assert(names(Traversals.kHop(g, seed, 10)) == Set("b", "c", "d"), "converges, e unreachable")
  }

  test("GraphX Pregel reach equals iterative closure") {
    val (g, ns) = pathGraph()
    val reach = Traversals.connectedReach(spark, g, ns(0).uid)
    val uids = reach.collect().map(_.getString(0)).toSet
    assert(uids == Set(ns(0), ns(1), ns(2), ns(3)).map(_.uid))
  }

  test("distributed set ops: left bias and equality") {
    val g = MemGraph(spark)
    Seq("x", "y").foreach(n => g.node("P", "name" -> n).save())
    val all = g.nodes
    val x = all.filter(org.apache.spark.sql.functions.get_json_object(
      org.apache.spark.sql.functions.col("props"), "$.name") === "x")
    assert(SetOps.union(all, x).count() == 2)
    assert(SetOps.intersection(all, x).count() == 1)
    assert(SetOps.difference(all, x).count() == 1)
    assert(SetOps.symmetricDifference(all, x).count() == 1)
    assert(SetOps.setEquals(all, all) && !SetOps.setEquals(all, x))
  }
}
