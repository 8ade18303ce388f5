package graft.engine

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterEach

/** Port of tests/test_graphdb.py FriendGraphTests (27-161): 6 Person nodes,
  * 6 Likes + 4 Follows edges, FTS on node `name`. */
class FriendGraphSpec extends AnyFunSuite with SparkSpec with BeforeAndAfterEach {

  var g: MemGraph = _
  var p: IndexedSeq[Node] = _

  def names(s: NSet): Set[String] = s.toSeq.map(_.apply("name").toString).toSet

  override def beforeEach(): Unit = {
    g = MemGraph(spark)
    val ns = Seq("Anne", "Bob", "Charlotte", "Dirk", "Eugene", "Fred")
    p = ns.map(n => g.node("Person", "name" -> n).save()).toIndexedSeq
    val Seq(p1, p2, p3, p4, p5, p6) = p.toSeq
    g.edge(p1, "Likes", p2).save(); g.edge(p2, "Likes", p3).save()
    g.edge(p2, "Likes", p1).save(); g.edge(p4, "Likes", p5).save()
    g.edge(p4, "Likes", p6).save(); g.edge(p1, "Follows", p5).save()
    g.edge(p2, "Follows", p6).save(); g.edge(p6, "Follows", p3).save()
    g.edge(p3, "Likes", p5).save(); g.edge(p1, "Follows", p2).save()
    g.resetFts(nodeFields = Seq("name"))
    p.foreach(n => n.updatefts("name" -> n("name").toString))
  }

  test("bothN 3-hop closure (test_graphdb.py:58-62)") {
    assert(names(p(1).bothN().bothN().bothN()) ==
      Set("Fred", "Charlotte", "Anne", "Bob", "Dirk", "Eugene"))
  }

  test("FTS default tokenizer is unicode61 (reference FTS5 default, graphydb.py:652-658): accents fold both ways; opt-out restores exact matching (r15)") {
    val g2 = MemGraph(spark)
    val rene = g2.node("Person", "name" -> "René Café").save()
    val plain = g2.node("Person", "name" -> "Plain Cafe").save()
    def index(): Unit = Seq(rene, plain)
      .foreach(n => n.updatefts("name" -> n("name").toString))
    def hits(q: String): Set[String] =
      names(g2.fetchN("(n:Person)", params = Map("n_fts" -> q)))
    // DEFAULT: unicode61 remove_diacritics — postings and query terms
    // both fold, so accented and plain spellings match each other
    g2.resetFts(nodeFields = Seq("name")); index()
    assert(hits("cafe") == Set("René Café", "Plain Cafe"))
    assert(hits("café") == Set("René Café", "Plain Cafe"))
    assert(hits("rené") == Set("René Café"))
    // OPT-OUT: the pre-r15 ASCII-exact lower+split tokenizer
    g2.resetFts(nodeFields = Seq("name"), unicode61 = false); index()
    assert(hits("cafe") == Set("Plain Cafe"))
    assert(hits("café") == Set("René Café"))
  }

  test("GLOB prefix on uid (test_graphdb.py:64-67)") {
    val got = g.fetchN("(n)", Seq("n.uid GLOB :a"),
      params = Map("a" -> (p(0).uid.take(5) + "*")))
    assert(got.one.get.apply("name") == "Anne")
  }

  test("bothE.end (test_graphdb.py:69-72)") {
    assert(names(p(0).bothE().end) == Set("Anne", "Bob", "Eugene"))
  }

  test("group-by aggregate extra column (test_graphdb.py:74-77)") {
    val people = g.fetchN("[p:Person,likecount] -(e:Likes)->",
      group = Some("p.uid"), params = Map("likecount" -> "COUNT(e.uid)"))
    assert(people.get("_likecount").map(_.asInstanceOf[Long]).sorted == Seq(1L, 1L, 2L, 2L))
  }

  test("inE.start (test_graphdb.py:79-82)") {
    assert(names(p(4).inE().start) == Set("Anne", "Dirk", "Charlotte"))
  }

  test("one (test_graphdb.py:84-87)") {
    assert(p(1).outE(Seq("""e.kind = "Follows"""")).end.one.get.apply("name") == "Fred")
  }

  test("in/out degree via set sizes (test_graphdb.py:89-94)") {
    val bob = g.fetchN("(n)", Seq("""n.data.name = "Bob"""")).one.get
    assert(Seq(bob.inE().size, bob.outE().size, bob.inN().size,
      bob.outN().size, bob.bothE().size, bob.bothN().size) == Seq(2, 3, 1, 3, 5, 3))
  }

  test("in/out degree via COUNT (test_graphdb.py:96-105)") {
    val bob = g.fetchN("(n)", Seq("""n.data.name = "Bob"""")).one.get
    assert(Seq(bob.inECount, bob.outECount, bob.inNCount,
      bob.outNCount, bob.bothECount, bob.bothNCount) == Seq(2L, 3L, 1L, 3L, 5L, 3L))
  }

  test("FTS prefix match (test_graphdb.py:107-110)") {
    val got = g.fetchN("(n)", params = Map("n_fts" -> "An*"))
    assert(got.one.get.apply("name") == "Anne")
  }

  test("chain-vs-start equivalence (test_graphdb.py:112-115)") {
    assert(g.fetchN("[n1] -(e:Likes)>") == g.fetchE("-(e:Likes)>").start)
  }

  test("save and read back (test_graphdb.py:117-123)") {
    val a = g.fetchN("(n)")(0)
    a("extra") = "hello"
    a.save()
    assert(g.getuid(a.uid).get.apply("extra") == "hello")
  }

  test("disconnect-delete + set-difference isolation (test_graphdb.py:125-132)") {
    p(0).delete(disconnect = true)
    p(0).save()
    val isolated = g.fetchN("(n)") - g.fetchN("-(e)> [n]") - g.fetchN("[n] -(e)>")
    assert(isolated.one.get.uid == p(0).uid)
  }

  test("LIMIT (test_graphdb.py:134-136)") {
    assert(g.fetchN("(n)", limit = Some(3)).size == 3)
  }

  test("client-side filter (test_graphdb.py:138-141)") {
    assert(g.fetchN("(n)").filter(n => n("name") == "Anne").one.get.apply("name") == "Anne")
  }

  test("stable sort (test_graphdb.py:143-149)") {
    val vs = g.fetchN("(n)").sortInPlace(_.apply("name").toString)
    assert(vs.toSeq.map(_.apply("name")) ==
      Seq("Anne", "Bob", "Charlotte", "Dirk", "Eugene", "Fred"))
  }

  test("computed extra column (test_graphdb.py:151-153)") {
    val got = g.fetchN("[n,nn]", params = Map("nn" -> "n.data.name"))
    assert(got.get("_nn").map(_.toString).toSet ==
      Set("Dirk", "Bob", "Eugene", "Charlotte", "Anne", "Fred"))
  }

  test("stats (test_graphdb.py:155-161)") {
    val s = g.stats
    assert(s("Edge kinds") == Map("Follows" -> 4L, "Likes" -> 6L))
    assert(s("Node kinds") == Map("Person" -> 6L))
    assert(s("Total edges") == 10L && s("Total nodes") == 6L)
  }
}
