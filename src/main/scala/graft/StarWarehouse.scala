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

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** md5-derived so distinct (dir, buckets) configurations can't collide on
    * a 32-bit hashCode and silently overwrite each other's tables. */
  private def tablePrefix(dir: String, buckets: Int): String =
    "graft_wstar_" + md5Hex(s"$dir#$buckets").take(16)

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
    * path, size, mtime), never a data scan — listing 100 TB is O(files).
    * Full FileTime precision (this host stamps nanoseconds): truncating to
    * millis would make a same-size same-millisecond rewrite invisible and
    * silently serve a stale warehouse. */
  private def sourceSignature(dir: String): String = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir)
    val walk = Files.walk(root)
    val entries =
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .map(p => s"${root.relativize(p)}|${Files.size(p)}|" +
          Files.getLastModifiedTime(p).to(java.util.concurrent.TimeUnit.NANOSECONDS))
        .toSeq.sorted
      finally walk.close()
    md5Hex(entries.mkString("\n"))
  }

  private def storedFingerprint(spark: SparkSession, table: String): Option[String] =
    try spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .properties.get("graft.fingerprint")
    catch { case _: Exception => None }

  private[graft] def tableNames(dir: String, buckets: Int = 16): (String, String) = {
    val p = tablePrefix(dir, buckets)
    (s"${p}_nodes", s"${p}_edges")
  }

  private def tableLocation(spark: SparkSession, table: String): java.nio.file.Path =
    Paths.get(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)

  // ------------------------------------------- cross-JVM sidecar metadata

  /** Tab-separated key/value lines: sig, buckets, and the two schema DDLs
    * (none of which can contain tabs or newlines). Lives next to the table
    * dirs so warehouse data + its registration recipe travel together. */
  private def sidecarPath(spark: SparkSession, p: String): java.nio.file.Path =
    tableLocation(spark, s"${p}_meta.tsv")

  private def writeSidecar(spark: SparkSession, p: String, sig: String,
      buckets: Int, nodesDdl: String, edgesDdl: String): Unit = {
    val body = Seq(
      s"sig\t$sig", s"buckets\t$buckets",
      s"nodes_schema\t$nodesDdl", s"edges_schema\t$edgesDdl").mkString("\n")
    // temp + atomic rename: a concurrent reader never sees a torn sidecar
    val target = sidecarPath(spark, p)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Cross-PROCESS build exclusion: an advisory file lock on
    * `<prefix>.lock` in the warehouse dir (plus a JVM-global monitor, since
    * OS file locks are per-process). Two JVMs racing an initial build would
    * otherwise interleave replaceTable's recursive delete with the other
    * writer's bucket files and then fingerprint the mixed result as valid.
    * Readers are NOT serialized against a concurrent rebuild — this is a
    * plain-parquet layout, not a transactional table format; a deployment
    * that rebuilds while serving queries needs a snapshot/transactional
    * format (or single-writer discipline), which is out of scope here. */
  private val jvmBuildLock = new Object
  private def withBuildLock[A](spark: SparkSession, p: String)(body: => A): A =
    jvmBuildLock.synchronized {
      val lockPath = tableLocation(spark, s"$p.lock")
      Files.createDirectories(lockPath.getParent)
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock() // blocks until any other process's build ends
        try body finally lock.release()
      } finally ch.close()
    }

  private def readSidecar(spark: SparkSession, p: String): Option[Map[String, String]] = {
    val f = sidecarPath(spark, p)
    if (!Files.isRegularFile(f)) None
    else try {
      import scala.jdk.CollectionConverters._
      Some(Files.readAllLines(f).asScala
        .filter(_.contains('\t'))
        .map { l => val i = l.indexOf('\t'); l.substring(0, i) -> l.substring(i + 1) }
        .toMap)
    } catch { case _: java.io.IOException => None }
  }

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
