package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.query.Fetch

/** Round-15 warehouse unification (VERDICT r14 "Next round" #1): the star
  * graph stored as maintained z-tables must answer every chain exactly
  * like the parquet projection AND prune point traversals inside the
  * planner (bloom + span pruning through the ManifestFileIndex). */
class ZStarWarehouseSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("Fetch chains over the z-table warehouse ≡ the parquet star graph") {
    val zg = ZStarWarehouse(spark, dir)
    val sg = StarGraph(spark, dir)
    val chains = Seq(
      Fetch.Args(chain = "[o:orders] -(e:PlacedBy)> (c:customer)",
        where = Seq("c.uid = 'customer:42'")), // g08's point traversal
      Fetch.Args(
        chain = "[c:customer,ordercount] <(e:PlacedBy)- (o:orders)",
        group = Some("c.uid"),
        params = Map("ordercount" -> "COUNT(o.uid)")), // g01's shape
      Fetch.Args(chain = "(n:nation) <(e:InNation)- [c:customer]",
        where = Seq("n.uid = 'nation:3'")),
      // FTS MATCH params over the MAINTAINED postings z-table (r16):
      // g07's and g10's shapes must answer identically on the z-layout
      Fetch.Args(chain = "(p:part)", params = Map("p_fts" -> "red")),
      Fetch.Args(chain = "[p:part,score]",
        params = Map("score" -> "p_fts.score",
          "p_fts" -> "red OR widget OR \"red widget\""),
        order = Some("score DESC, p.uid ASC"), limit = Some(100)))
    chains.foreach { args =>
      assert(rows(Fetch.df(zg, args)) == rows(Fetch.df(sg, args)),
        s"z-table fetch diverged on ${args.chain}")
    }
  }

  test("point traversals prune the planner's file listing (getuid / outE / inE)") {
    // getuid: bloom + span pruning on the node table's _key
    val (ndf, nfi) = ZStarWarehouse.nodesWithIndex(spark, dir)
    val got = ndf.filter(col("_key") === 42L && col("uid") === "customer:42")
    assert(got.count() == 1L)
    assert(nfi.lastListed > 0 && nfi.lastListed < nfi.inputFiles.length,
      s"getuid must prune: ${nfi.lastListed}/${nfi.inputFiles.length}")
    assert(rows(ZStarWarehouse.getuid(spark, dir, "customer:42").select("uid"))
      == Set(Seq("customer:42")))
    // outE of customer:42 = its InNation edge (the star projection's only
    // out-kind from customer nodes)
    val out = ZStarWarehouse.outEdges(spark, dir, "customer:42")
    assert(rows(out.select("kind", "startuid")) ==
      Set(Seq("InNation", "customer:42")))
    // inE of customer:42 = its PlacedBy edges — one per order, and the
    // planner must have pruned the edge listing for the point probe
    val (edf, efi) = ZStarWarehouse.edgesWithIndex(spark, dir)
    val in = edf.filter(col("_end_key") === 42L && col("enduid") === "customer:42")
    val inKinds = in.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(inKinds.contains("PlacedBy"))
    assert(efi.lastListed > 0 && efi.lastListed < efi.inputFiles.length,
      s"inE must prune: ${efi.lastListed}/${efi.inputFiles.length}")
    val expected = StarGraph(spark, dir).edges
      .filter(col("enduid") === "customer:42")
    assert(rows(ZStarWarehouse.inEdges(spark, dir, "customer:42")
        .select("uid", "kind", "startuid", "enduid")) ==
      rows(expected.select("uid", "kind", "startuid", "enduid")))
  }

  test("the build reuses existing tables by fingerprint (no rewrite on re-open)") {
    val (nPath, ePath) = ZStarWarehouse.tables(spark, dir)
    val before = graft.ops.Layout.currentGen(nPath)
    ZStarWarehouse.invalidate() // new session-memo miss, same disk state
    val (nPath2, ePath2) = ZStarWarehouse.tables(spark, dir)
    assert(nPath2 == nPath && ePath2 == ePath)
    assert(graft.ops.Layout.currentGen(nPath) == before,
      "a fingerprint-matched reopen must not re-init the table")
  }

  test("w54: streamed journal→z compaction lands the oracle's per-kind counts (r16)") {
    // the driver row end to end at sf0.001 (its builder REQUIREs the
    // replay no-op and z≡fold equality internally); here the surviving
    // counts are pinned against the raw parquet tables — the same
    // arithmetic the DuckDB twin runs
    val got = SparkEntry.queries("w54_journal_z_stream")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    def cnt(t: String): Long = spark.read.parquet(s"$dir/$t.parquet").count()
    val keptSuppliers = spark.read.parquet(s"$dir/supplier.parquet")
      .filter(col("s_suppkey") % 7 =!= 0).count()
    val expected = Map(
      ("node", "customer") -> cnt("customer"),
      ("node", "supplier") -> keptSuppliers,
      ("node", "nation") -> cnt("nation"),
      ("node", "region") -> cnt("region"),
      ("node", "part") -> cnt("part"),
      ("node", "orders") -> cnt("orders"),
      ("edge", "InNation") -> cnt("customer"),
      ("edge", "SuppNation") -> keptSuppliers,
      ("edge", "InRegion") -> cnt("nation"),
      ("edge", "PlacedBy") -> cnt("orders"))
    assert(got == expected, s"w54 counts diverged: $got vs $expected")
  }

  test("g22: Fetch MATCH through the warehouse's maintained postings ≡ a regex word scan of raw part names (r16)") {
    val got = SparkEntry.queries("g22_wh_fts_fetch")(spark, dir)
      .collect().map(_.getString(0)).toSet
    val expected = spark.read.parquet(s"$dir/part.parquet")
      .filter(lower(col("p_name")).rlike("\\bred\\b") ||
        lower(col("p_name")).rlike("\\banvil\\b"))
      .select(concat(lit("part:"), col("p_partkey")))
      .collect().map(_.getString(0)).toSet
    assert(got == expected && got.nonEmpty,
      s"g22 diverged: ${got.size} vs ${expected.size}")
  }
}
