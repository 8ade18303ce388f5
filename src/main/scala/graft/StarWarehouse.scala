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
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Int), ViewGraph]()

  def apply(spark: SparkSession, dir: String, buckets: Int = 16): ViewGraph =
    memo.computeIfAbsent((spark, dir, buckets),
      { case (s, d, b) => build(s, d, b) })

  /** Drop memoized graphs (tables stay in the catalog until replaced). */
  def invalidate(): Unit = memo.clear()

  /** md5-derived so distinct (dir, buckets) configurations can't collide on
    * a 32-bit hashCode and silently overwrite each other's tables. */
  private def tablePrefix(dir: String, buckets: Int): String =
    s"graft_wstar_" + java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir#$buckets".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString

  /** DROP + clear any orphaned table dir (in-memory catalog, durable
    * warehouse dir — same hazard as WarehouseGraph.compactBucketed). */
  private def replaceTable(spark: SparkSession, name: String)(write: => Unit): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(loc)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }
    write
  }

  private def build(spark: SparkSession, dir: String, buckets: Int): ViewGraph = {
    val g = StarGraph.build(spark, dir)
    val p = tablePrefix(dir, buckets)
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
