package graft.query

import org.scalatest.funsuite.AnyFunSuite

class ChainSpec extends AnyFunSuite {

  test("single node link, default collect") {
    val (p, consumed) = Chain.parse("(n)")
    assert(p.links.length == 1 && p.collect.alias == "n" && !p.collect.isEdge)
    assert(p.collect.collected && consumed.isEmpty)
  }

  test("directed edge links (graphydb.py:753-758)") {
    val (r, _) = Chain.parse("-(e)>")
    assert(r.collect.isEdge && r.collect.leftuid == "startuid" && r.collect.rightuid == "enduid")
    val (l, _) = Chain.parse("<(e)-")
    assert(l.collect.isEdge && l.collect.leftuid == "enduid" && l.collect.rightuid == "startuid")
  }

  test("kinds, collect marker, extras (docstring graphydb.py:53)") {
    val (p, consumed) =
      Chain.parse("[p:Person,strength] -(e:Drinks)> (d:Drink)", Map("strength" -> "e.data.strength"))
    assert(p.collectIdx == 0)
    assert(p.collect.kind.contains("Person") && p.collect.extras == Vector("strength"))
    assert(p.links(1).kind.contains("Drinks") && p.links(1).isEdge)
    assert(p.links(2).kind.contains("Drink") && !p.links(2).isEdge)
    assert(consumed == Set("strength"))
  }

  test("right-most link collected by default (graphydb.py:804-805)") {
    val (p, _) = Chain.parse("(n1) -(e)> (n2)")
    assert(p.collectIdx == 2 && p.collect.alias == "n2")
  }

  test("duplicate aliases rejected (graphydb.py:790-791)") {
    assertThrows[Chain.ChainParseException](Chain.parse("(n) -(n)>"))
  }

  test("missing extra expansion rejected (graphydb.py:776-781)") {
    assertThrows[Chain.ChainParseException](Chain.parse("[n,missing]"))
  }
}
