package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import graft.engine.ViewGraph

import java.nio.file.{Files, Paths}

/** The star projection compacted into BUCKETED warehouse tables — the
  * co-location story for chain queries at warehouse scale, measured (not
  * just plan-asserted) by the `w*` bench queries.
  *
  * Nodes bucket on `uid`, edges on `startuid`, same bucket count, so every
  * `node.uid = edge.startuid` join in a chain reads pre-clustered buckets
  * with NO exchange on either base table: at 100 TB the graph itself is
  * never re-shuffled — only derived intermediates (frontiers, end-side
  * lookups) move, and those are post-filter small. This is the same layout
  * [[graft.engine.WarehouseGraph.compactBucketed]] produces for journal
  * warehouses, applied to the driver's star schema so the `g*` chains have
  * directly comparable `w*` twins over identical data.
  *
  * The build (projection + two bucketed writes) runs once per
  * (session, dir) and is memoized; bench reps after the first hit only the
  * catalog tables.
  */
object StarWarehouse {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), ViewGraph]()

  def apply(spark: SparkSession, dir: String, buckets: Int = 16): ViewGraph =
    memo.computeIfAbsent((spark, dir), { case (s, d) => build(s, d, buckets) })

  /** Drop memoized graphs (tables stay in the catalog until replaced). */
  def invalidate(): Unit = memo.clear()

  private def tablePrefix(dir: String): String =
    s"graft_wstar_${Integer.toHexString(dir.hashCode)}"

  /** DROP + clear any orphaned table dir (in-memory catalog, durable
    * warehouse dir — same hazard as WarehouseGraph.compactBucketed). */
  private def replaceTable(spark: SparkSession, name: String)(write: => Unit): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      Files.walk(loc).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    write
  }

  private def build(spark: SparkSession, dir: String, buckets: Int): ViewGraph = {
    val g = StarGraph.build(spark, dir)
    val p = tablePrefix(dir)
    replaceTable(spark, s"${p}_nodes") {
      g.nodes.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "uid").sortBy("uid")
        .saveAsTable(s"${p}_nodes")
    }
    replaceTable(spark, s"${p}_edges") {
      g.edges.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "startuid").sortBy("startuid")
        .saveAsTable(s"${p}_edges")
    }
    new ViewGraph(spark, spark.table(s"${p}_nodes"), spark.table(s"${p}_edges"))
  }
}
