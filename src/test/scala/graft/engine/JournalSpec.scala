package graft.engine

import graft.SparkSpec
import graft.ops.SetOps
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The scale-path storage contract (SURVEY §7.2): the distributed journal
  * fold must reconstruct exactly the state the driver-side MemGraph holds,
  * for any mutation sequence; plus time travel and warehouse round-trip. */
class JournalSpec extends AnyFunSuite with SparkSpec {

  private def randomMutations(g: MemGraph, rng: Random, steps: Int): Unit = {
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
    for (_ <- 1 to steps) {
      rng.nextInt(5) match {
        case 0 | 1 =>
          nodes += g.node(s"K${rng.nextInt(3)}", "v" -> rng.nextInt(100)).save()
        case 2 if nodes.size >= 2 =>
          val a = nodes(rng.nextInt(nodes.size)); val b = nodes(rng.nextInt(nodes.size))
          if (a.exists && b.exists) g.edge(a, "E", b).save()
        case 3 if nodes.nonEmpty =>
          val n = nodes(rng.nextInt(nodes.size))
          if (n.exists) { n("v") = rng.nextInt(100); n.save() }
        case _ if nodes.nonEmpty =>
          val n = nodes(rng.nextInt(nodes.size))
          if (n.exists) n.delete(disconnect = true)
        case _ => ()
      }
    }
  }

  test("distributed snapshot fold ≡ driver-side state after random mutations") {
    val g = MemGraph(spark)
    randomMutations(g, new Random(42), 60)
    val (nodes, edges) = Journal.snapshot(spark, g.changesDf)
    assert(SetOps.setEquals(nodes, g.nodes), "node uid sets differ")
    assert(SetOps.setEquals(edges, g.edges), "edge uid sets differ")
    // full content equality, not just uids
    val gotN = nodes.collect().map(r => (r.getString(0), r.getString(1), r.getString(4))).toSet
    val wantN = g.nodes.collect().map(r => (r.getString(0), r.getString(1), r.getString(4))).toSet
    assert(gotN == wantN)
  }

  test("time travel: snapshotAt(seq) replays a prefix") {
    val g = MemGraph(spark)
    val a = g.node("P", "name" -> "a").save()
    val seqAfterCreate = g.countChanges
    a("name") = "a2"; a.save()
    a.delete()
    val (n0, _) = Journal.snapshotAt(spark, g.changesDf, seqAfterCreate)
    assert(n0.count() == 1)
    val props = n0.head().getAs[String]("props")
    assert(props.contains("\"a\""))
    val (nFinal, _) = Journal.snapshot(spark, g.changesDf)
    assert(nFinal.count() == 0)
  }

  test("warehouse append → snapshot → compact → reopen round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val g = MemGraph(spark)
    val p1 = g.node("Person", "name" -> "Anne").save()
    val p2 = g.node("Person", "name" -> "Bob").save()
    g.edge(p1, "Likes", p2).save()

    val wh = new WarehouseGraph(spark, dir)
    wh.append(g.changesDf)
    assert(wh.nodes.count() == 2 && wh.edges.count() == 1)
    assert(wh.maxSeq == 3)

    wh.compact()
    assert(wh.journal.count() == 0, "compaction truncates the journal")
    assert(wh.nodes.count() == 2 && wh.edges.count() == 1)

    // post-compaction appends replay over the compacted base
    val g2 = MemGraph(spark)
    val p3 = g2.node("Person", "name" -> "Cate").save()
    wh.append(g2.changesDf)
    assert(wh.nodes.count() == 3)

    val reopened = new WarehouseGraph(spark, dir)
    assert(reopened.nodes.count() == 3 && reopened.edges.count() == 1)
  }

  test("compaction rewrite plans without a single-partition exchange") {
    val g = MemGraph(spark)
    randomMutations(g, new Random(7), 40)
    val (nodes, edges) = Journal.snapshot(spark, g.changesDf)
    val docs = Journal.snapshotAsChanges(nodes, edges, startSeq = 1L)
    val plan = docs.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"seq assignment funnels through one task:\n$plan")
    assert(!plan.contains("Window"), s"seq assignment still uses a global window:\n$plan")
    // the rewrite is still a valid journal: folding it reproduces the state
    val (n2, e2) = Journal.snapshot(spark, docs)
    assert(SetOps.setEquals(n2, nodes) && SetOps.setEquals(e2, edges))
    // seqs are distinct and at/above startSeq
    import org.apache.spark.sql.functions.{col, countDistinct, min => smin}
    val row = docs.agg(countDistinct(col("seq")), smin(col("seq")), org.apache.spark.sql.functions.count(col("seq"))).head()
    assert(row.getLong(0) == row.getLong(2), "seq values must be distinct")
    assert(row.getLong(1) >= 1L, "seq values must be at/above startSeq")
  }

  test("merge rebases working-set seqs so later merges fold after earlier ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rebase").toString
    val w = GraphSession.open(spark, dir)
    val g1 = MemGraph(spark)
    val n = g1.node("P", "v" -> 1).save()
    w.merge(g1)
    // second, independent working set modifies the same uid — its local seq
    // also starts at 1 and would collide without the rebase
    val g2 = MemGraph(spark)
    val handle = g2.nodeFromData(Map("uid" -> n.uid, "kind" -> "P", "v" -> 1))
    g2.saveItem(handle, None, journal = false) // seed silently
    g2.clearChanges()
    val fresh = g2.getuid(n.uid).get
    fresh("v") = 2
    fresh.save()
    w.merge(g2)
    val props = w.nodes.filter(org.apache.spark.sql.functions.col("uid") === n.uid)
      .head().getAs[String]("props")
    assert(props.contains("\"v\":2"), s"modify must fold after create, got $props")
  }

  test("warehouse undo: inverse docs restore pre-batch snapshot; journal append-only") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_undo").toString
    val w = GraphSession.open(spark, dir)
    val g1 = MemGraph(spark)
    val n = g1.node("P", "name" -> "Anne", "v" -> 1).save()
    w.merge(g1)
    val len0 = w.journal.count()

    // independent working set modifies the node, merged as the last batch
    val g2 = MemGraph(spark)
    g2.saveItem(g2.nodeFromData(
      Map("uid" -> n.uid, "kind" -> "P", "name" -> "Anne", "v" -> 1)), None, journal = false)
    g2.clearChanges()
    val h = g2.getuid(n.uid).get
    h("v") = 2; h.save()
    w.merge(g2)
    def props(): String =
      w.nodes.filter(col("uid") === n.uid).head().getAs[String]("props")
    assert(props().contains("\"v\":2"))

    val ops = w.undo().collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(ops == Seq(("*", n.uid)), s"expected one reverse-patch op, got $ops")
    assert(props().contains("\"v\":1"), "undo must reverse-patch the modify")
    assert(w.journal.count() == len0 + 2, "undo appends inverse docs, never consumes")

    // undo of the undo = redo (history survives in the append-only journal)
    w.undo()
    assert(props().contains("\"v\":2"))
  }

  test("warehouse undo reverts a whole bulk batch; parity with driver-side undo") {
    val dir = java.nio.file.Files.createTempDirectory("graft_undo2").toString
    val w = GraphSession.open(spark, dir)
    val g = MemGraph(spark)
    Seq("a", "b", "c").foreach(x => g.node("D", "name" -> x).save())
    g.fetchN("(n)").setAll("flag" -> true).save() // one shared batch
    w.merge(g)
    assert(w.fetchCount(graft.query.Fetch.Args(
      chain = "(n)", where = Seq("n.data.flag = true"))) == 3)

    val ops = w.undo().collect()
    assert(ops.length == 3 && ops.forall(_.getString(0) == "*"))
    assert(w.fetchCount(graft.query.Fetch.Args(
      chain = "(n)", where = Seq("n.data.flag = true"))) == 0)

    // parity: the driver-side MemGraph undo lands in the same state
    g.undo()
    val want = g.nodes.collect().map(r => (r.getString(0), r.getString(4))).toSet
    val got = w.nodes.collect().map(r => (r.getString(0), r.getString(4))).toSet
    assert(got == want, "warehouse undo state must equal driver undo state")

    // undoing a create batch deletes the created items
    val g2 = MemGraph(spark)
    g2.node("E", "name" -> "x").save()
    w.merge(g2)
    assert(w.nodes.count() == 4)
    val ops2 = w.undo().collect()
    assert(ops2.map(_.getString(0)).toSeq == Seq("-"))
    assert(w.nodes.count() == 3)
  }

  test("no-op delete journals nothing (no phantom undo target)") {
    val g = MemGraph(spark)
    val a = g.node("P").save()
    val b = g.node("P").save()
    val h1 = g.getuid(a.uid).get
    val h2 = g.getuid(a.uid).get
    h1.delete()
    val afterFirst = g.countChanges
    h2.delete() // already gone: state no-op must not journal
    assert(g.countChanges == afterFirst)
    g.undo() // undoes the REAL delete, not a phantom
    assert(g.existsUid(a.uid, isEdge = false) && g.existsUid(b.uid, isEdge = false))
  }

  test("stale handle save journals removed keys (journal replay ≡ state)") {
    val g = MemGraph(spark)
    val n = g.node("P").save()
    val h2 = g.getuid(n.uid).get  // copied before "a" exists
    val h1 = g.getuid(n.uid).get
    h1("a") = 1; h1.save()
    h2("b") = 2; h2.save()        // full-replace drops "a" from state
    assert(g.getuid(n.uid).get.get("a").isEmpty)
    val (nodes, _) = Journal.snapshot(spark, g.changesDf)
    val props = nodes.head().getAs[String]("props")
    assert(!props.contains("\"a\""), s"journal replay resurrected 'a': $props")
    assert(props.contains("\"b\":2"))
  }

  test("fetch runs against a warehouse graph (same query path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh2").toString
    val g = MemGraph(spark)
    val a = g.node("Person", "name" -> "Anne").save()
    val b = g.node("Person", "name" -> "Bob").save()
    g.edge(a, "Likes", b).save()
    val wh = new WarehouseGraph(spark, dir)
    wh.append(g.changesDf)
    val df = graft.query.Fetch.df(wh, graft.query.Fetch.Args(
      chain = "[p:Person] -(e:Likes)> (q:Person)"))
    assert(df.count() == 1)
    assert(df.head().getAs[String]("uid") == a.uid)
  }
}
