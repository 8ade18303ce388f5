package graft.engine

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Port of tests/test_indexedset.py: randomized equivalence of the uid-keyed
  * set algebra against native Set[String] ops (24-95), plus list-behavior
  * invariants (97-171). Uids drawn from a small keyspace so collisions are
  * common, as in the reference fixture; seeded for reproducibility. */
class IndexedSetSpec extends AnyFunSuite with SparkSpec {

  lazy val g = MemGraph(spark)

  def mk(uids: Seq[String]): NSet =
    new NSet(uids.map(u => g.nodeFromData(Map("kind" -> "T", "uid" -> u))))

  def randUids(rng: Random): List[String] = List.fill(30)(s"U${rng.nextInt(20)}")

  test("set ops ≡ native Set ops on uids (test_indexedset.py:24-95)") {
    val rng = new Random(42)
    for (_ <- 1 to 100) {
      val (a, b) = (randUids(rng), randUids(rng))
      val (sa, sb) = (mk(a), mk(b))
      val (na, nb) = (a.toSet, b.toSet)
      assert((sa | sb).uids == (na | nb))
      assert((sa & sb).uids == (na & nb))
      assert((sa - sb).uids == (na -- nb))
      assert((sa ^ sb).uids == ((na | nb) -- (na & nb)))
    }
  }

  test("chained multi-arg compositions") {
    val rng = new Random(7)
    for (_ <- 1 to 100) {
      val (a, b, c) = (randUids(rng), randUids(rng), randUids(rng))
      val (sa, sb, sc) = (mk(a), mk(b), mk(c))
      assert(sa.union(sb, sc).uids == (a.toSet | b.toSet | c.toSet))
      assert(sa.intersection(sb, sc).uids == (a.toSet & b.toSet & c.toSet))
      assert(sa.difference(sb, sc).uids == (a.toSet -- b.toSet -- c.toSet))
    }
  }

  test("dedup on construction, first occurrence keeps position (graphydb.py:283-287, 344-354)") {
    val s = mk(Seq("U1", "U2", "U1", "U3"))
    assert(s.size == 3 && s(0).uid == "U1" && s(1).uid == "U2" && s(2).uid == "U3")
  }

  test("left-bias: union element from left when present (graphydb.py:189-194)") {
    val left = new NSet(Seq(g.nodeFromData(Map("kind" -> "T", "uid" -> "U1", "tag" -> "L"))))
    val right = new NSet(Seq(g.nodeFromData(Map("kind" -> "T", "uid" -> "U1", "tag" -> "R"))))
    assert((left | right).one.get.apply("tag") == "L")
    assert((left & right).one.get.apply("tag") == "L")
  }

  test("add keeps position, append moves to end (graphydb.py:344-354, 368-377)") {
    val s = mk(Seq("U1", "U2", "U3"))
    s.add(g.nodeFromData(Map("kind" -> "T", "uid" -> "U1", "v" -> 9)))
    assert(s(0).apply("v") == 9 && s(0).uid == "U1")
    s.append(g.nodeFromData(Map("kind" -> "T", "uid" -> "U1", "v" -> 10)))
    assert(s(2).uid == "U1" && s(2).apply("v") == 10)
  }

  test("pop/slice/remove/discard/copy invariants (test_indexedset.py:97-171)") {
    val s = mk(Seq("U1", "U2", "U3", "U4"))
    assert(s.pop().uid == "U4" && s.size == 3)
    assert(s.slice(0, 2).uids == Set("U1", "U2"))
    assertThrows[NoSuchElementException](s.remove("U9"))
    s.discard("U9") // no-op
    val c = s.copy
    c.discard("U1")
    assert(s.contains("U1") && !c.contains("U1"))
  }

  test("stable sort preserves identity order on ties (test_indexedset.py:119-123)") {
    val items = Seq("U5", "U3", "U1", "U2").map(u =>
      g.nodeFromData(Map("kind" -> "T", "uid" -> u, "k" -> 1)))
    val s = new NSet(items)
    s.sortInPlace(_.apply("k").asInstanceOf[Int])
    assert(s.toSeq.map(_.uid) == Seq("U5", "U3", "U1", "U2"))
  }
}
