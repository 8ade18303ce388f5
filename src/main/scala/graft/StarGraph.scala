package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.ViewGraph
import graft.query.Fts

/** Graph projection of the driver's TPC-H-ish star schema (FIXTURES.md §3):
  * every entity table becomes a node kind (`uid = "<kind>:<key>"`), every FK
  * becomes an edge kind. This gives each chain-DSL query an exactly
  * equivalent join SQL for the DuckDB oracle, and exercises the graph engine
  * on referentially-rich data at bench scale.
  *
  * Edge kinds: customer -InNation> nation, supplier -SuppNation> nation,
  * nation -InRegion> region, orders -PlacedBy> customer,
  * orders -Contains> part (one edge per lineitem row, qty/price as props).
  *
  * The projection is lazy (pure DataFrame DAG over the parquet scans), so
  * Catalyst prunes unused node/edge kinds per query: a chain touching only
  * customer/nation/region never reads lineitem.
  */
object StarGraph {

  private def uidOf(kind: String, key: org.apache.spark.sql.Column) =
    concat(lit(kind + ":"), key)

  // one cached projection per (session, dir): a query battery over the same
  // scale factor reuses materialized node/edge/posting DataFrames instead of
  // recomputing the to_json/concat projection per query. Bounded by use-case
  // (a handful of scale factors per process); `invalidate()` releases the
  // cached blocks when the underlying parquet changes or a session retires.
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), ViewGraph]()

  def apply(spark: SparkSession, dir: String): ViewGraph =
    memo.computeIfAbsent((spark, dir), { case (s, d) =>
      val g = build(s, d)
      new ViewGraph(s, g.nodes.cache(), g.edges.cache(),
        nodeFtsDf = Some(g.nodeFts.cache()))
    })

  /** Unpersist and drop every memoized projection (all sessions/dirs). */
  def invalidate(): Unit = {
    import scala.jdk.CollectionConverters._
    memo.values().asScala.foreach { g =>
      g.nodes.unpersist(); g.edges.unpersist(); g.nodeFts.unpersist()
    }
    memo.clear()
  }

  def build(spark: SparkSession, dir: String): ViewGraph = {
    def t(n: String): DataFrame = spark.read.parquet(s"$dir/$n.parquet")

    def nodeDf(df: DataFrame, kind: String, key: String, propCols: Seq[String]): DataFrame =
      df.select(
        uidOf(kind, col(key)).as("uid"), lit(kind).as("kind"),
        lit(0.0).as("ctime"), lit(0.0).as("mtime"),
        to_json(struct(propCols.map(col): _*)).as("props"))

    val customer = t("customer"); val supplier = t("supplier")
    val nation = t("nation"); val region = t("region")
    val part = t("part"); val orders = t("orders"); val lineitem = t("lineitem")

    val nodes = Seq(
      nodeDf(customer, "customer", "c_custkey", Seq("c_name", "c_acctbal", "c_mktsegment")),
      nodeDf(supplier, "supplier", "s_suppkey", Seq("s_name", "s_acctbal")),
      nodeDf(nation, "nation", "n_nationkey", Seq("n_name")),
      nodeDf(region, "region", "r_regionkey", Seq("r_name")),
      nodeDf(part, "part", "p_partkey", Seq("p_name", "p_brand", "p_type", "p_size")),
      nodeDf(orders, "orders", "o_orderkey", Seq("o_orderstatus", "o_totalprice", "o_orderpriority"))
    ).reduce(_ unionByName _)

    def edgeDf(df: DataFrame, kind: String, uidExpr: org.apache.spark.sql.Column,
        startKind: String, startKey: String, endKind: String, endKey: String,
        props: org.apache.spark.sql.Column = lit("{}")): DataFrame =
      df.select(uidExpr.as("uid"), lit(kind).as("kind"),
        uidOf(startKind, col(startKey)).as("startuid"),
        uidOf(endKind, col(endKey)).as("enduid"),
        lit(0.0).as("ctime"), lit(0.0).as("mtime"), props.as("props"))

    val edges = Seq(
      edgeDf(customer, "InNation", uidOf("cn", col("c_custkey")),
        "customer", "c_custkey", "nation", "c_nationkey"),
      edgeDf(supplier, "SuppNation", uidOf("sn", col("s_suppkey")),
        "supplier", "s_suppkey", "nation", "s_nationkey"),
      edgeDf(nation, "InRegion", uidOf("nr", col("n_nationkey")),
        "nation", "n_nationkey", "region", "n_regionkey"),
      edgeDf(orders, "PlacedBy", uidOf("oc", col("o_orderkey")),
        "orders", "o_orderkey", "customer", "o_custkey"),
      edgeDf(lineitem, "Contains",
        concat(lit("li:"), col("l_orderkey"), lit(":"), col("l_linenumber")),
        "orders", "l_orderkey", "part", "l_partkey",
        to_json(struct(col("l_quantity"), col("l_extendedprice"))))
    ).reduce(_ unionByName _)

    // FTS over part names (field "name") — the reference's resetfts analogue
    val postings = Fts.postings(
      part.select(uidOf("part", col("p_partkey")).as("uid"), col("p_name")),
      "uid", Map("name" -> "p_name"))

    new ViewGraph(spark, nodes, edges, nodeFtsDf = Some(postings))
  }
}
