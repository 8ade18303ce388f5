package graft.query

import graft.SparkSpec
import graft.engine.MemGraph
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized equivalence (SURVEY §5.2): for random small graphs and random
  * chain patterns, the compiled fetch must return the same collected uid set
  * as a naive in-driver evaluator of the chain semantics
  * (graphydb.py:741-807, 919-938). */
class FetchPropertySpec extends AnyFunSuite with SparkSpec {

  private val nodeKinds = Vector("A", "B")
  private val edgeKinds = Vector("X", "Y")

  /** Naive evaluator: enumerate all bindings of the chain links over the
    * driver-side maps (binding = per link the chosen (uid, leftKey, rightKey)). */
  private def bindings(g: MemGraph, links: Vector[Chain.Link]): Seq[Vector[(String, String, String)]] = {
    val nodes = g.nodes.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val edges = g.edges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    def candidates(l: Chain.Link): Seq[(String, String, String)] =
      if (!l.isEdge)
        nodes.filter(n => l.kind.forall(_ == n._2)).map(n => (n._1, n._1, n._1))
      else edges.filter(e => l.kind.forall(_ == e._2)).map { e =>
        val (_, _, s, t) = e
        if (l.leftuid == "startuid") (e._1, s, t) else (e._1, t, s)
      }
    var partials: Seq[Vector[(String, String, String)]] =
      candidates(links.head).map(Vector(_))
    links.sliding(2).foreach {
      case Seq(_, r) =>
        partials = partials.flatMap { p =>
          candidates(r).filter(c => c._2 == p.last._3).map(p :+ _)
        }
      case _ => ()
    }
    partials
  }

  private def naive(g: MemGraph, links: Vector[Chain.Link], collectIdx: Int): Set[String] =
    bindings(g, links).map(p => p(collectIdx)._1).toSet

  test("random chains ≡ naive evaluator on random graphs") {
    val rng = new Random(2024)
    for (round <- 1 to 6) {
      val g = MemGraph(spark)
      val ns = (1 to (4 + rng.nextInt(4)))
        .map(_ => g.node(nodeKinds(rng.nextInt(2))).save())
      for (_ <- 1 to (ns.size * 2))
        g.edge(ns(rng.nextInt(ns.size)), edgeKinds(rng.nextInt(2)), ns(rng.nextInt(ns.size))).save()

      for (q <- 1 to 6) {
        val nLinks = 1 + 2 * rng.nextInt(3) // 1, 3, or 5 links (node/edge alternating)
        val parts = (0 until nLinks).map { i =>
          val kind =
            if (i % 2 == 0) (if (rng.nextBoolean()) s":${nodeKinds(rng.nextInt(2))}" else "")
            else (if (rng.nextBoolean()) s":${edgeKinds(rng.nextInt(2))}" else "")
          if (i % 2 == 0) s"(n$i$kind)"
          else if (rng.nextBoolean()) s"-(e$i$kind)>" else s"<(e$i$kind)-"
        }
        val collectIdx = rng.nextInt(nLinks)
        val chain = parts.zipWithIndex.map { case (p, i) =>
          if (i == collectIdx) p.replace("(", "[").replace(")", "]") else p
        }.mkString(" ")

        val (parsed, _) = Chain.parse(chain)
        val got = Fetch.df(g, Fetch.Args(chain = chain))
          .select("uid").collect().map(_.getString(0)).toSet
        val want = naive(g, parsed.links, parsed.collectIdx)
        assert(got == want, s"round $round chain '$chain': got $got want $want")
        // COUNT path = distinct-uid count of the same result
        assert(Fetch.count(g, Fetch.Args(chain = chain)) == want.size,
          s"round $round chain '$chain': COUNT mismatch")
      }
    }
  }

  test("DISTINCT + ORDER BY non-collected alias ≡ min/max rank over naive bindings") {
    val rng = new Random(77)
    for (round <- 1 to 4) {
      val g = MemGraph(spark)
      val ns = (1 to (4 + rng.nextInt(4)))
        .map(_ => g.node(nodeKinds(rng.nextInt(2))).save())
      for (_ <- 1 to (ns.size * 2))
        g.edge(ns(rng.nextInt(ns.size)), edgeKinds(rng.nextInt(2)), ns(rng.nextInt(ns.size))).save()

      for (_ <- 1 to 4) {
        val nLinks = 3 + 2 * rng.nextInt(2) // 3 or 5 links
        val parts = (0 until nLinks).map { i =>
          if (i % 2 == 0) s"(n$i)"
          else if (rng.nextBoolean()) s"-(e$i)>" else s"<(e$i)-"
        }
        val collectIdx = rng.nextInt(nLinks)
        var orderIdx = rng.nextInt(nLinks)
        while (orderIdx == collectIdx) orderIdx = rng.nextInt(nLinks)
        val chain = parts.zipWithIndex.map { case (p, i) =>
          if (i == collectIdx) p.replace("(", "[").replace(")", "]") else p
        }.mkString(" ")
        val orderAlias = if (orderIdx % 2 == 0) s"n$orderIdx" else s"e$orderIdx"
        val desc = rng.nextBoolean()
        val order = s"$orderAlias.uid ${if (desc) "DESC" else "ASC"}"

        val gotSeq = Fetch.df(g, Fetch.Args(chain = chain, order = Some(order)))
          .select("uid").collect().map(_.getString(0)).toSeq
        val bs = bindings(g, Chain.parse(chain)._1.links)
        val ranks: Map[String, String] = bs.groupBy(_(collectIdx)._1).map {
          case (uid, ps) =>
            val keys = ps.map(_(orderIdx)._1)
            uid -> (if (desc) keys.max else keys.min)
        }
        assert(gotSeq.toSet == ranks.keySet,
          s"round $round '$chain' ORDER $order: set mismatch ${gotSeq.toSet} vs ${ranks.keySet}")
        assert(gotSeq.size == gotSeq.distinct.size, "DISTINCT must survive the rewrite")
        val seq = gotSeq.map(ranks)
        val monotone = seq.sliding(2).forall {
          case Seq(a, b) => if (desc) a >= b else a <= b
          case _ => true
        }
        assert(monotone, s"round $round '$chain' ORDER $order: ranks $seq not monotone")
      }
    }
  }
}
