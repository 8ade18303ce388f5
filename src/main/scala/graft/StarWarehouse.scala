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
  *
  * ACROSS sessions the tables are reused, not rewritten (r5): the build
  * stamps a source fingerprint — an md5 over the source dir's file listing
  * (relative path, size, mtime); no data scan — into the nodes table's
  * TBLPROPERTIES, and a later session whose catalog still has both tables
  * with a matching fingerprint opens them with ZERO Spark jobs. A 100 TB
  * deployment must never rewrite a valid bucketed warehouse just because
  * the process restarted; the fingerprint invalidates it exactly when the
  * source data changed.
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

  /** Cheap change detector for the source dir: file listing only (relative
    * path, size, mtime), never a data scan — listing 100 TB is O(files). */
  private def sourceSignature(dir: String): String = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir)
    val walk = Files.walk(root)
    val entries =
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .map(p => s"${root.relativize(p)}|${Files.size(p)}|${Files.getLastModifiedTime(p).toMillis}")
        .toSeq.sorted
      finally walk.close()
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private def storedFingerprint(spark: SparkSession, table: String): Option[String] =
    try spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .properties.get("graft.fingerprint")
    catch { case _: Exception => None }

  private def build(spark: SparkSession, dir: String, buckets: Int): ViewGraph = {
    val p = tablePrefix(dir, buckets)
    val sig = sourceSignature(dir)
    val reusable = spark.catalog.tableExists(s"${p}_nodes") &&
      spark.catalog.tableExists(s"${p}_edges") &&
      storedFingerprint(spark, s"${p}_nodes").contains(sig)
    if (!reusable) {
      val g = StarGraph.build(spark, dir)
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
      spark.sql(s"ALTER TABLE ${p}_nodes SET TBLPROPERTIES ('graft.fingerprint' = '$sig')")
    }
    new ViewGraph(spark, spark.table(s"${p}_nodes"), spark.table(s"${p}_edges"))
  }
}
