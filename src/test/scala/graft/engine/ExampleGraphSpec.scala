package graft.engine

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterEach

/** Port of tests/test_graphdb.py SimpleTests (11-25) + ExampleGraphTests
  * (210-281): the docstring example graph, journal counting, connected-delete
  * refusal, and undo of delete/modify/add-node/add-edge. */
class ExampleGraphSpec extends AnyFunSuite with SparkSpec with BeforeAndAfterEach {

  var g: MemGraph = _

  override def beforeEach(): Unit = {
    g = MemGraph(spark)
    val anne = g.node("Person", "name" -> "Anne", "age" -> 22).save()
    val bob = g.node("Person", "name" -> "Bob", "nickname" -> "Bobby", "age" -> 19).save()
    val charlie = g.node("Person", "name" -> "Charlie", "age" -> 31).save()
    val coffee = g.nodeFromData(Map("kind" -> "Drink", "sort" -> "Coffee")).save()
    val tea = g.nodeFromData(Map("kind" -> "Drink", "sort" -> "Coffee")).save()
    g.edge(anne, "Likes", bob).save()
    g.edge(charlie.uid, "Likes", bob.uid).save()
    g.edgeFromData(Map("startuid" -> anne.uid, "kind" -> "Drinks",
      "enduid" -> coffee.uid, "strength" -> "strong")).save()
    g.edgeFromData(Map("startuid" -> charlie.uid, "kind" -> "Drinks",
      "enduid" -> tea.uid)).save()
    g.edge(bob, "Drinks", tea, "strength" -> "strong", "preference" -> 1).save()
    g.edge(bob, "Drinks", coffee, "strength" -> "weak", "preference" -> 0).save()
  }

  def bob: Node = g.fetchN("(n)", Seq("""n.data.name = "Bob"""")).one.get

  test("settings round-trip (test_graphdb.py:17-20)") {
    val hello = Seq(1, 2, 3, 4, "hello")
    g.saveSetting("test", hello)
    assert(g.getSetting("test") == Seq(1L, 2L, 3L, 4L, "hello"))
  }

  test("cache round-trip (test_graphdb.py:22-25)") {
    val hello = Seq(1, 2, 3, 4, "hello")
    g.cachePut("test", hello)
    assert(g.cacheGet("test") == Seq(1L, 2L, 3L, 4L, "hello"))
  }

  test("11 journal rows after creation (test_graphdb.py:242-244)") {
    assert(g.countChanges == 11L)
  }

  test("connected delete refused (test_graphdb.py:246-248)") {
    assertThrows[GraphyDBException](bob.delete())
  }

  test("undo delete (test_graphdb.py:250-256)") {
    val b = bob
    b.delete(disconnect = true)
    val before = b.exists
    g.undo()
    val after = b.exists
    assert(after && !before)
  }

  test("undo modify (test_graphdb.py:258-265)") {
    val b = bob
    b("nickname") = "Bobs The Impaler"
    b.save()
    val before = b.original().get.apply("nickname")
    g.undo()
    val after = b.original().get.apply("nickname")
    assert(before == "Bobs The Impaler" && after == "Bobby")
  }

  test("undo add node (test_graphdb.py:267-272)") {
    val n = g.node("Test").save()
    val before = n.exists
    g.undo()
    assert(before && !n.exists)
  }

  test("undo add edge (test_graphdb.py:274-281)") {
    val b = bob
    val anne = g.fetchN("(n)", Seq("""n.data.name = "Anne"""")).one.get
    val e = g.edge(b, "Test", anne).save()
    val before = e.exists
    g.undo()
    assert(before && !e.exists)
  }

  test("flagship docstring query (graphydb.py:53-64)") {
    val drinkers = g.fetchN("[p:Person,strength] -(e:Drinks)> (d:Drink)",
      Seq("""d.data.sort = "Coffee""""), params = Map("strength" -> "e.data.strength"))
    // 4 Drinks edges, but Bob drinks twice — NSet collapses by uid
    assert(drinkers.size == 3)
    assert(drinkers.get("name").map(_.toString).toSet == Set("Anne", "Bob", "Charlie"))
    // lazy DataFrame form keeps all 4 distinct (person × strength) rows
    val df = g.fetchDf(graft.query.Fetch.Args(
      chain = "[p:Person,strength] -(e:Drinks)> (d:Drink)",
      where = Seq("""d.data.sort = "Coffee""""),
      params = Map("strength" -> "e.data.strength")))
    assert(df.count() == 4)
  }
}
