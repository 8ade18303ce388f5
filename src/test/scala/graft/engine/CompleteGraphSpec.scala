package graft.engine

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterEach

/** Port of tests/test_graphdb.py CompleteGraphTests (163-208): K10 complete
  * digraph including self-loops. */
class CompleteGraphSpec extends AnyFunSuite with SparkSpec with BeforeAndAfterEach {

  var g: MemGraph = _
  var nodes: NSet = _

  override def beforeEach(): Unit = {
    g = MemGraph(spark)
    val ns = (1 to 10).map(_ => g.node("Person").save())
    nodes = new NSet(ns)
    for (n1 <- ns; n2 <- ns) g.edge(n1, "E", n2).save()
  }

  test("stats (test_graphdb.py:176-182)") {
    val s = g.stats
    assert(s("Edge kinds") == Map("E" -> 100L) && s("Node kinds") == Map("Person" -> 10L))
    assert(s("Total edges") == 100L && s("Total nodes") == 10L)
  }

  test("outN/inN/bothN closure (test_graphdb.py:184-191)") {
    assert(nodes.outN() == nodes)
    assert(nodes.inN() == nodes)
    assert(nodes.bothN() == nodes)
  }

  test("self-loops via two-alias motif (test_graphdb.py:193-196)") {
    val loops = g.fetchE("(n1) -[e]> (n2)", Seq("n1.uid == n2.uid"))
    assert(loops.end == nodes)
  }

  test("self-loops via edge predicate (test_graphdb.py:198-203)") {
    val loops = g.fetchE("-[e]>", Seq("e.startuid == e.enduid"))
    assert(loops.end == nodes)
    assert(loops.end == loops.start)
  }

  test("4-link chain reachability (test_graphdb.py:205-208)") {
    val got = g.fetchN("(n1) -(e)> (n2) -(e2)> (n3) -(e3)> (n4)",
      Seq("n1.uid == :n1uid"), params = Map("n1uid" -> nodes(0).uid))
    assert(got == nodes)
  }
}
