package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.query.Fetch

/** The public facade — the analogue of `Graph(path)` (graphydb.py:489-506):
  * one entry point that opens either an in-memory working-set graph or a
  * Parquet warehouse, with the fetch/traversal surface attached.
  *
  * {{{
  *   val g = GraphSession.inMemory(spark)          // ':memory:' analogue
  *   val w = GraphSession.open(spark, "/wh/path")  // durable warehouse
  *   g.fetchN("[p:Person] -(e:Likes)> (q:Person)")
  *   w.fetchDf(Fetch.Args(chain = "(n:Person)"))   // lazy, scale path
  * }}}
  */
object GraphSession {

  /** In-memory mutable graph (reference `Graph(':memory:')`). */
  def inMemory(spark: SparkSession): MemGraph = {
    graft.functions.GraftExtensions.register(spark)
    MemGraph(spark)
  }

  /** Open (or initialize) a Parquet warehouse directory. */
  def open(spark: SparkSession, path: String): WarehouseSession = {
    graft.functions.GraftExtensions.register(spark)
    new WarehouseSession(new WarehouseGraph(spark, path))
  }

  /** Wrap existing node/edge DataFrames (projections, lakehouse tables). */
  def fromViews(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      nodeFts: Option[DataFrame] = None): ViewGraph = {
    graft.functions.GraftExtensions.register(spark)
    new ViewGraph(spark, nodes, edges, nodeFts)
  }

  /** Open node/edge datasets in any Spark source format (parquet, csv with
    * header, json, orc, ...) laid out as `<path>/nodes` + `<path>/edges` in
    * the fixed schemas. The format reader enforces the schema, so csv/json
    * ingest exports from other systems directly. */
  def fromFiles(spark: SparkSession, path: String, format: String = "parquet"): ViewGraph = {
    graft.functions.GraftExtensions.register(spark)
    def rd(sub: String, schema: org.apache.spark.sql.types.StructType) = {
      val r = spark.read.format(format).schema(schema)
      (if (format == "csv") r.option("header", "true") else r).load(s"$path/$sub")
    }
    new ViewGraph(spark,
      rd("nodes", graft.core.Rows.nodeSchema),
      rd("edges", graft.core.Rows.edgeSchema))
  }
}

/** Query surface over a warehouse: lazy DataFrames only (the driver-side
  * item/NSet materialization of MemGraph is deliberately absent here — a
  * warehouse is assumed to exceed driver memory). */
final class WarehouseSession(val graph: WarehouseGraph) {
  def fetchDf(args: Fetch.Args): DataFrame = Fetch.df(graph, args)
  def fetchSql(args: Fetch.Args): String = Fetch.sql(graph, args)
  def fetchCount(args: Fetch.Args): Long = Fetch.count(graph, args)
  def nodes: DataFrame = graph.nodes
  def edges: DataFrame = graph.edges
  def journal: DataFrame = graph.journal
  def append(changes: DataFrame): Unit = graph.append(changes)
  def compact(): Unit = graph.compact()
  /** Apply a MemGraph working set's accumulated changes to the warehouse.
    * Local seq numbers are rebased above the warehouse journal's current
    * maximum so independent working sets never interleave out of order
    * (each MemGraph counts from 1). Merge each working set once. */
  def merge(working: MemGraph): Unit = {
    val offset = graph.maxSeq
    graph.append(working.changesDf
      .withColumn("seq", org.apache.spark.sql.functions.col("seq") + offset))
  }
}
