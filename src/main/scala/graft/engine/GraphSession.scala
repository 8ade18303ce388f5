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

  /** Open a reference graphydb SQLite `.gdb` file directly — the migration
    * path for existing databases: a zero-dependency SQLite b-tree reader
    * ([[graft.sources.SqliteFile]]) loads nodes/edges/settings/cache and
    * the full change journal, so fetch, traversals AND undo keep working
    * against imported history. Rebuild FTS with `resetfts` (the reference's
    * FTS5 shadow tables are tokenizer-bound and not imported).
    *
    * Scope: returns a driver-side [[MemGraph]], deliberately. The reference
    * targets "moderate sized problems" (graphydb.py:19-21) and its `.gdb`
    * files are megabytes, so the whole-file read is the right cost; a
    * durable deployment migrates ONCE by merging the imported graph into a
    * parquet warehouse — `open(spark, dir).merge(fromSqlite(spark, path))`
    * carries items AND journal history across — after which sessions open
    * the warehouse directly and the SQLite file is out of the serving
    * path. */
  def fromSqlite(spark: SparkSession, path: String): MemGraph = {
    graft.functions.GraftExtensions.register(spark)
    MemGraph.fromSqlite(spark, path)
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

  /** Totals + per-kind counts + durable-store fields (graphydb.py:704-739:
    * 'File size' appears only for on-disk graphs; 'Spark version' mirrors
    * 'SQLite version'). */
  def stats: Map[String, Any] = {
    def kindCounts(df: DataFrame): Map[String, Long] =
      df.groupBy("kind").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(Paths.get(graph.path))
    val size =
      try walk.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
      finally walk.close()
    val sizeStr =
      if (size < 1000L) s"${size}B"
      else if (size < 1000000L) s"${size / 1000}K"
      else s"${size / 1000000}M"
    Map(
      "Total nodes" -> nodes.count(),
      "Total edges" -> edges.count(),
      "Node kinds" -> kindCounts(nodes),
      "Edge kinds" -> kindCounts(edges),
      "File size" -> sizeStr,
      "Spark version" -> graph.spark.version,
      "Changes" -> journal.count())
  }

  /** The last change batch as journal rows (reference `lastchanges`,
    * graphydb.py:545-566): the max-seq doc, widened to its whole batch when
    * the doc carries a batch uid. Empty journal → empty frame. */
  def lastChanges(): DataFrame = {
    import org.apache.spark.sql.functions.col
    val j = graph.journal
    j.orderBy(col("seq").desc).limit(1).collect().headOption match {
      case None => j.limit(0)
      case Some(r) => Option(r.getAs[String]("batch")) match {
        case None    => j.filter(col("seq") === r.getAs[Long]("seq"))
        case Some(b) => j.filter(col("batch") === b)
      }
    }
  }

  /** Undo the last change batch (reference semantics, graphydb.py:605-636)
    * re-architected for an append-only journal: instead of consuming rows,
    * append each doc's INVERSE (add/remove swapped — the fold rule
    * `payload ← (payload − remove) ∪ add` makes the swap an exact reverse
    * patch) with fresh seqs in reverse batch order. History survives, so
    * undoing an undo is redo; compaction still truncates history.
    *
    * Fully distributed — the batch is never collected; new seqs come from
    * the shuffle-free arithmetic `2·maxSeq + 1 − seq` (distinct, above
    * maxSeq, reverse order). Returns the undone ops as (op, uid) rows in
    * undo order: `-` deleted a create, `+` restored a delete, `*` reverse-
    * patched a modify. */
  def undo(): DataFrame = {
    import org.apache.spark.sql.functions._
    val batch = lastChanges()
    val maxSeq = graph.maxSeq
    val ops = batch.orderBy(col("seq").desc).select(
      when(col("add").isNotNull && col("remove").isNull, lit("-"))
        .when(col("add").isNull && col("remove").isNotNull, lit("+"))
        .otherwise(lit("*")).as("op"),
      col("uid"))
    if (maxSeq == 0L) return ops
    val newBatch = graft.core.Uid.random()
    val inverse = batch.select(
      (lit(2L * maxSeq + 1L) - col("seq")).cast("long").as("seq"),
      col("uid"),
      col("remove").as("add"),
      col("add").as("remove"),
      lit(System.currentTimeMillis() / 1000.0).as("time"),
      md5(concat_ws(":", col("uid"), col("seq"), lit(newBatch))).as("rev"),
      lit(newBatch).as("batch"))
    graph.append(inverse)
    // `ops` stays correct after the append: its batch/seq filters can only
    // match the pre-append rows (the inverse docs carry a fresh batch uid
    // and higher seqs). Evaluate before compact() — compaction truncates.
    ops
  }
}
