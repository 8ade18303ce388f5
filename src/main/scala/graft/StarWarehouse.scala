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
  * (relative path, size, mtime); no data scan — into the tables'
  * TBLPROPERTIES and a sidecar metadata file next to the table dirs. A
  * later session whose catalog still has both tables with a matching
  * fingerprint opens them with ZERO Spark jobs; a FRESH JVM (this repo runs
  * the in-memory catalog — no Hive metastore — so catalog entries die with
  * the process) finds the sidecar + table dirs and re-registers the
  * existing files with a metadata-only `CREATE TABLE ... LOCATION` — no
  * write, no scan. The tables are EXTERNAL (explicit path) so a catalog
  * drop never deletes the data that makes this possible. A 100 TB
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

  // fingerprint / sidecar / lock primitives shared with the dedup
  // signature store live in engine.WarehouseMeta (r9 extraction)
  import graft.engine.WarehouseMeta.{md5Hex, sourceSignature, storedFingerprint,
    tableLocation => metaLocation, deleteRecursively, withBuildLock}

  /** md5-derived so distinct (dir, buckets) configurations can't collide on
    * a 32-bit hashCode and silently overwrite each other's tables. */
  private def tablePrefix(dir: String, buckets: Int): String =
    "graft_wstar_" + md5Hex(s"$dir#$buckets").take(16)

  /** DROP + clear any orphaned table dir (in-memory catalog, durable
    * warehouse dir — same hazard as WarehouseGraph.compactBucketed). */
  private def replaceTable(spark: SparkSession, name: String)(write: => Unit): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    deleteRecursively(metaLocation(spark, name))
    write
  }

  private[graft] def tableNames(dir: String, buckets: Int = 16): (String, String) = {
    val p = tablePrefix(dir, buckets)
    (s"${p}_nodes", s"${p}_edges")
  }

  private def tableLocation(spark: SparkSession, table: String): java.nio.file.Path =
    metaLocation(spark, table)

  // ------------------------------------------- cross-JVM sidecar metadata
  // Sidecar keys: sig, buckets, and the two schema DDLs (none can contain
  // tabs/newlines). Lives next to the table dirs so warehouse data + its
  // registration recipe travel together. Readers are NOT serialized against
  // a concurrent rebuild — this is a plain-parquet layout, not a
  // transactional table format; a deployment that rebuilds while serving
  // queries needs a snapshot/transactional format (or single-writer
  // discipline), which is out of scope here.

  private def writeSidecar(spark: SparkSession, p: String, sig: String,
      buckets: Int, nodesDdl: String, edgesDdl: String): Unit =
    graft.engine.WarehouseMeta.writeSidecar(spark, s"${p}_meta.tsv", Map(
      "sig" -> sig, "buckets" -> buckets.toString,
      "nodes_schema" -> nodesDdl, "edges_schema" -> edgesDdl))

  private def readSidecar(spark: SparkSession, p: String): Option[Map[String, String]] =
    graft.engine.WarehouseMeta.readSidecar(spark, s"${p}_meta.tsv")

  /** Fresh-JVM path: the in-memory catalog lost the tables but the bucketed
    * files + sidecar survive — re-CREATE the table entries over the existing
    * LOCATIONs. Pure metadata: no write job, no data scan. Bucket ids are
    * encoded in the datasource file names, so the re-registered tables keep
    * their shuffle-free join layout. */
  private def reRegister(spark: SparkSession, p: String, buckets: Int, sig: String): Boolean = {
    def create(table: String, ddl: String, bucketCol: String): Unit =
      spark.sql(
        s"""CREATE TABLE $table ($ddl) USING PARQUET
           |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO $buckets BUCKETS
           |LOCATION '${tableLocation(spark, table).toUri}'
           |TBLPROPERTIES ('graft.fingerprint' = '$sig')""".stripMargin)
    readSidecar(spark, p).exists { m =>
      m.get("sig").contains(sig) && m.get("buckets").contains(buckets.toString) &&
        m.contains("nodes_schema") && m.contains("edges_schema") &&
        Files.isDirectory(tableLocation(spark, s"${p}_nodes")) &&
        Files.isDirectory(tableLocation(spark, s"${p}_edges")) &&
        !spark.catalog.tableExists(s"${p}_nodes") &&
        !spark.catalog.tableExists(s"${p}_edges") && {
          create(s"${p}_nodes", m("nodes_schema"), "uid")
          create(s"${p}_edges", m("edges_schema"), "startuid")
          true
        }
    }
  }

  private def build(spark: SparkSession, dir: String, buckets: Int): ViewGraph = {
    val p = tablePrefix(dir, buckets)
    val sig = sourceSignature(dir)
    withBuildLock(spark, p) { buildLocked(spark, dir, buckets, p, sig) }
  }

  /** The check-then-act below runs entirely under the build lock, so the
    * existence/fingerprint checks can't race another builder's delete. */
  private def buildLocked(spark: SparkSession, dir: String, buckets: Int,
      p: String, sig: String): ViewGraph = {
    val inCatalog = spark.catalog.tableExists(s"${p}_nodes") &&
      spark.catalog.tableExists(s"${p}_edges") &&
      storedFingerprint(spark, s"${p}_nodes").contains(sig)
    if (!inCatalog && !reRegister(spark, p, buckets, sig)) {
      val g = StarGraph.build(spark, dir)
      replaceTable(spark, s"${p}_nodes") {
        g.nodes.write.mode(SaveMode.Overwrite)
          .option("path", tableLocation(spark, s"${p}_nodes").toString)
          .bucketBy(buckets, "uid").sortBy("uid")
          .saveAsTable(s"${p}_nodes")
      }
      replaceTable(spark, s"${p}_edges") {
        g.edges.write.mode(SaveMode.Overwrite)
          .option("path", tableLocation(spark, s"${p}_edges").toString)
          .bucketBy(buckets, "startuid").sortBy("startuid")
          .saveAsTable(s"${p}_edges")
      }
      spark.sql(s"ALTER TABLE ${p}_nodes SET TBLPROPERTIES ('graft.fingerprint' = '$sig')")
      spark.sql(s"ALTER TABLE ${p}_edges SET TBLPROPERTIES ('graft.fingerprint' = '$sig')")
      writeSidecar(spark, p, sig, buckets, g.nodes.schema.toDDL, g.edges.schema.toDDL)
    }
    new ViewGraph(spark, spark.table(s"${p}_nodes"), spark.table(s"${p}_edges"))
  }
}
