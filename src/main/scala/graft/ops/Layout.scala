package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering, the
  * lakehouse OPTIMIZE ZORDER effect (public: Morton 1966; Delta/Iceberg docs).
  *
  * Why it matters at 100 TB: a table laid out by ONE sort key prunes scans
  * only on that key — range predicates on the second key touch every file.
  * Interleaving the key bits makes file min/max spans tight on BOTH columns,
  * so either predicate skips ~all non-matching files using nothing but the
  * footer statistics Spark and every lakehouse reader already consult. The
  * curve computation is pure codegen'd bit arithmetic (no UDF), and the
  * rewrite is one `repartitionByRange` — sampled range boundaries, fully
  * parallel, no global sort barrier.
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions (bit i → bit 2i) —
    * the classic shift-or-mask ladder, entirely codegen'd built-ins. Values
    * are masked to 16 bits first, so foreign inputs wrap rather than
    * colliding the interleave. */
  def spread16(x: Column): Column = {
    val x0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z-order value of two 16-bit keys: bits of `a` at even positions,
    * bits of `b` at odd. Nearby (a, b) points land near each other on the
    * curve, which is exactly what makes per-file min/max spans tight on both
    * columns after a z-sorted write. Raw form — callers with keys outside
    * [0, 65535] must bucketize first ([[scale16]]); [[zorderWrite]] does so
    * automatically. */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Linear bucketization of `[lo, hi]` onto the 16-bit z domain: monotone,
    * endpoints pinned (lo → 0, hi → 65535), degenerate range → 0. Pure
    * codegen'd arithmetic; double math so arbitrary long ranges can't
    * overflow. Linear (not rank) bucketing keeps this one cheap map — for
    * heavily skewed keys compose with an explicit rank/ntile first; for
    * clustering locality the buckets only need to be monotone, which linear
    * always is. */
  def scale16(x: Column, lo: Long, hi: Long): Column =
    if (hi <= lo) lit(0L)
    else least(lit(65535L), greatest(lit(0L),
      // range in double space: hi - lo overflows Long for the full domain
      floor((x.cast("double") - lo.toDouble) / (hi.toDouble - lo.toDouble) * 65535.0)
        .cast("long")))

  /** Rewrite `df` into `nFiles` files clustered by z(a, b). Both keys first
    * bucketize to the 16-bit z domain from their observed min/max (ONE
    * 1-row aggregate — the only driver materialization), so arbitrary and
    * negative key domains are safe; then one `repartitionByRange` on the z
    * value (sampled boundaries — no global sort barrier) + a
    * within-partition sort, so every written file covers a contiguous,
    * disjoint z range. LayoutSpec pins the resulting spans and the
    * two-sided pruning win over a single-key linear layout. */
  def zorderWrite(df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int): Unit = {
    require(nFiles >= 1, "need nFiles >= 1")
    val bounds = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).collect()(0)
    if (bounds.isNullAt(0)) { // empty input still writes an empty table
      df.write.mode("overwrite").parquet(path); return
    }
    val (aLo, aHi, bLo, bHi) =
      (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2), bounds.getLong(3))
    df.withColumn("_z", zValue(
        scale16(col(colA), aLo, aHi), scale16(col(colB), bLo, bHi)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Spread the low 16 bits of `x` to every-third bit positions
    * (bit i → bit 3i) — the canonical Morton3D shift-or-mask ladder
    * (public 21-bit masks, fed 16-bit inputs), entirely codegen'd. */
  def spread3(x: Column): Column = {
    val x0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    x4.bitwiseOR(shiftleft(x4, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** 48-bit Morton value of THREE 16-bit keys — (time, user, item)-style
    * layouts where range predicates arrive on any of three columns. Same
    * contract as [[zValue]]: inputs pre-bucketized by [[scale16]]. Bit
    * significance rises with argument position (c holds the top bit of
    * each triple), so the LAST key prunes hardest — put the
    * most-selective key third. With three keys sharing the tile budget,
    * run file counts well above the per-key fan-out (LayoutSpec measures
    * 0.50/0.38/0.30 touched at 64 files on a 32³ grid). */
  def zValue3(a: Column, b: Column, c: Column): Column =
    spread3(a).bitwiseOR(shiftleft(spread3(b), 1))
      .bitwiseOR(shiftleft(spread3(c), 2))

  /** Three-key [[zorderWrite]]: one bounds aggregate, one range
    * repartition on z3, per-file spans tight on ALL THREE columns. */
  def zorderWrite3(df: DataFrame, path: String, colA: String, colB: String,
      colC: String, nFiles: Int): Unit = {
    require(nFiles >= 1, "need nFiles >= 1")
    val bounds = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long")),
      min(col(colC).cast("long")), max(col(colC).cast("long"))).collect()(0)
    if (bounds.isNullAt(0)) {
      df.write.mode("overwrite").parquet(path); return
    }
    df.withColumn("_z", zValue3(
        scale16(col(colA), bounds.getLong(0), bounds.getLong(1)),
        scale16(col(colB), bounds.getLong(2), bounds.getLong(3)),
        scale16(col(colC), bounds.getLong(4), bounds.getLong(5))))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert-curve variant of [[zorderWrite]] — same scaling, same single
    * `repartitionByRange`, but clustering on the Hilbert index (the
    * codegen'd [[graft.functions.HilbertIndex]] expression) instead of the
    * Morton interleave. The Hilbert walk has no Morton "jumps" (consecutive
    * indices are always grid-adjacent), so per-file spans come out as tight
    * or tighter on both keys; Morton stays the default because its value is
    * pure bit arithmetic with no lookup state, but for span-pruned scans
    * over hot two-sided predicates the Hilbert layout is the quality
    * option. LayoutSpec measures both on the same grid. */
  def hilbertWrite(df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int): Unit = {
    require(nFiles >= 1, "need nFiles >= 1")
    graft.functions.GraftExtensions.register(df.sparkSession)
    val bounds = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).collect()(0)
    if (bounds.isNullAt(0)) {
      df.write.mode("overwrite").parquet(path); return
    }
    val (aLo, aHi, bLo, bHi) =
      (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2), bounds.getLong(3))
    df.withColumn("_h", call_function("hilbert_index",
        scale16(col(colA), aLo, aHi), scale16(col(colB), bLo, bHi)))
      .repartitionByRange(nFiles, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) spans of the two layout columns — the statistics a
    * footer-pruning scan consults. Used to measure what fraction of files a
    * range predicate on either column would touch. */
  def fileSpans(spark: SparkSession, path: String, colA: String,
      colB: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n"),
        min(colA).as("a_min"), max(colA).as("a_max"),
        min(colB).as("b_min"), max(colB).as("b_max"))

  /** Fraction of files whose [lo, hi] span on `boundCol` intersects
    * [qLo, qHi] — the files a stats-pruning reader must open. */
  def touchedFraction(spans: DataFrame, loCol: String, hiCol: String,
      qLo: Long, qHi: Long): Double = {
    val Array(total, touched) = spans.agg(
      count(lit(1)).cast("double"),
      sum(when(col(loCol) <= qHi && col(hiCol) >= qLo, 1).otherwise(0))
        .cast("double")).collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    if (total == 0) 0.0 else touched / total
  }

  // ------------------------------------------- incremental maintenance
  //
  // The lakehouse OPTIMIZE lifecycle on top of zorderWrite: appends land
  // BLIND (no clustering cost on the write path), and maintenance folds
  // them into the curve INCREMENTALLY — only the files whose z-range the
  // new rows fall into rewrite; every other file carries over by hard
  // link, byte-for-byte. Readers get snapshot isolation through
  // generation directories: `gen=N` is immutable once built, a one-line
  // CURRENT pointer flips atomically, and a crash anywhere leaves CURRENT
  // on the old generation with partial debris healed by the next
  // maintain. The z scaling bounds are FROZEN at init (stored in the
  // table's meta sidecar) so every generation shares one curve; appended
  // keys outside the initial domain clamp to the curve's edge — their
  // files' spans widen, pruning elsewhere keeps working, and a domain
  // drift big enough to matter is a re-init, not a maintain.

  private def currentPtr(path: String) = java.nio.file.Paths.get(path, "CURRENT")
  private def genDir(path: String, gen: Long) = java.nio.file.Paths.get(path, s"gen=$gen")
  private def landingDir(path: String) = java.nio.file.Paths.get(path, "landing")

  private def writeAtomic(target: java.nio.file.Path, body: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** The committed generation number, or None before init. */
  def currentGen(path: String): Option[Long] =
    if (!java.nio.file.Files.isRegularFile(currentPtr(path))) None
    else Some(new String(java.nio.file.Files.readAllBytes(currentPtr(path)),
      "UTF-8").trim.toLong)

  /** Initialize a maintained z-ordered table at `path`: gen=0 holds the
    * zorderWrite layout, the meta sidecar freezes the scaling bounds and
    * layout columns, the spans sidecar records each file's z-range (what
    * maintenance routes against), and CURRENT commits the generation. */
  def zorderInit(spark: SparkSession, df: DataFrame, path: String,
      colA: String, colB: String, nFiles: Int): Unit = {
    import java.nio.file.Files
    require(nFiles >= 1, "need nFiles >= 1")
    val bounds = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).collect()(0)
    require(!bounds.isNullAt(0), "zorderInit needs a non-empty table")
    val (aLo, aHi, bLo, bHi) =
      (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2), bounds.getLong(3))
    val g0 = genDir(path, 0L)
    Files.createDirectories(java.nio.file.Paths.get(path))
    df.withColumn("_z", zValue(
        scale16(col(colA), aLo, aHi), scale16(col(colB), bLo, bHi)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(g0.toString)
    writeMeta(g0, colA, colB, aLo, aHi, bLo, bHi)
    writeZSpans(spark, g0, colA, colB, aLo, aHi, bLo, bHi)
    Files.createDirectories(landingDir(path))
    writeAtomic(currentPtr(path), "0")
  }

  /** Curve metadata travels INSIDE each generation dir, so a compaction
    * that re-freezes the scaling bounds commits them atomically with the
    * pointer flip — a crashed compact can never leave new bounds visible
    * against an old generation's spans. */
  private def writeMeta(gen: java.nio.file.Path, colA: String, colB: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): Unit =
    writeAtomic(gen.resolve("_zmeta.tsv"),
      s"colA\t$colA\ncolB\t$colB\naLo\t$aLo\naHi\t$aHi\nbLo\t$bLo\nbHi\t$bHi")

  private def readMeta(gen: java.nio.file.Path): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(gen.resolve("_zmeta.tsv"))
      .asScala.filter(_.contains('\t'))
      .map { l => val i = l.indexOf('\t'); l.substring(0, i) -> l.substring(i + 1) }
      .toMap
  }

  /** Scan `gen`'s data files ONCE and record each file's (z_min, z_max)
    * into its `_zspans.tsv` (underscore prefix: invisible to parquet
    * readers). Maintenance routes new rows against these ranges without
    * touching data. */
  /** One span row per data file: z range (what maintenance routes on)
    * plus the raw key ranges (what [[zorderScan]] prunes on). */
  private[ops] final case class Span(file: String, zLo: Long, zHi: Long,
      aMin: Long, aMax: Long, bMin: Long, bMax: Long)

  private def spanStats(spark: SparkSession, paths: Seq[String],
      colA: String, colB: String, aLo: Long, aHi: Long, bLo: Long,
      bHi: Long): Seq[Span] = {
    val z = zValue(scale16(col(colA), aLo, aHi), scale16(col(colB), bLo, bHi))
    spark.read.parquet(paths: _*)
      .select(input_file_name().as("f"), z.as("_z"),
        col(colA).cast("long").as("_a"), col(colB).cast("long").as("_b"))
      .groupBy("f").agg(min("_z"), max("_z"), min("_a"), max("_a"),
        min("_b"), max("_b"))
      .collect()
      .map(r => Span(
        java.nio.file.Paths.get(new java.net.URI(r.getString(0)).getPath)
          .getFileName.toString,
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
      .sortBy(_.zLo).toSeq
  }

  private def writeSpanRows(gen: java.nio.file.Path, rows: Seq[Span]): Unit =
    writeAtomic(gen.resolve("_zspans.tsv"),
      rows.map(s => s"${s.file}\t${s.zLo}\t${s.zHi}\t${s.aMin}\t${s.aMax}\t${s.bMin}\t${s.bMax}")
        .mkString("\n"))

  private def writeZSpans(spark: SparkSession, gen: java.nio.file.Path,
      colA: String, colB: String, aLo: Long, aHi: Long, bLo: Long,
      bHi: Long): Unit =
    writeSpanRows(gen, spanStats(spark, Seq(gen.toString), colA, colB,
      aLo, aHi, bLo, bHi))

  private def readZSpans(gen: java.nio.file.Path): Seq[Span] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(gen.resolve("_zspans.tsv")).asScala
      .filter(_.nonEmpty).map { l =>
        val p = l.split("\t")
        Span(p(0), p(1).toLong, p(2).toLong, p(3).toLong, p(4).toLong,
          p(5).toLong, p(6).toLong)
      }.toSeq
  }

  /** Blind append: rows land as plain parquet in `landing/` — no
    * clustering work on the hot write path (unique part names make
    * concurrent appends safe); [[zorderMaintain]] folds them in. */
  def zorderAppend(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(landingDir(path).toString)

  /** Read the CURRENT committed generation (landing rows are invisible
    * until maintained — snapshot semantics; use [[zorderReadWithLanding]]
    * for read-your-appends). */
  def zorderRead(spark: SparkSession, path: String): DataFrame = {
    val gen = currentGen(path).getOrElse(
      throw new IllegalStateException(s"no zorderInit at $path"))
    spark.read.parquet(genDir(path, gen).toString)
  }

  /** Span-pruned scan of the CURRENT generation: the reader-side payoff
    * of the layout — the file list is cut DRIVER-SIDE from the committed
    * spans sidecar before Spark opens a single footer, so a two-sided
    * band query on a 100k-file table plans against only the files whose
    * key ranges intersect BOTH bands (conjunctive necessary condition);
    * the residual filter still applies (spans admit false positives,
    * never false negatives) and parquet row-group pruning stacks on top.
    * Returns an empty frame of the right schema when nothing matches. */
  def zorderScan(spark: SparkSession, path: String,
      aRange: (Long, Long), bRange: (Long, Long)): DataFrame = {
    val gen = currentGen(path).getOrElse(
      throw new IllegalStateException(s"no zorderInit at $path"))
    val gDir = genDir(path, gen)
    val meta = readMeta(gDir)
    val (colA, colB) = (meta("colA"), meta("colB"))
    val spans = readZSpans(gDir)
    val hit = spans.filter(s =>
      s.aMin <= aRange._2 && s.aMax >= aRange._1 &&
      s.bMin <= bRange._2 && s.bMax >= bRange._1)
    val base =
      if (hit.isEmpty) spark.read.parquet(gDir.toString).limit(0)
      else spark.read.parquet(hit.map(s => gDir.resolve(s.file).toString): _*)
    base.filter(col(colA).between(aRange._1, aRange._2) &&
      col(colB).between(bRange._1, bRange._2))
  }

  /** How many of the CURRENT generation's files [[zorderScan]] would open
    * for the given bands — the audit twin of the scan itself. */
  def zorderScanFiles(path: String, aRange: (Long, Long),
      bRange: (Long, Long)): (Int, Int) = {
    val gen = currentGen(path).getOrElse(
      throw new IllegalStateException(s"no zorderInit at $path"))
    val spans = readZSpans(genDir(path, gen))
    (spans.count(s =>
      s.aMin <= aRange._2 && s.aMax >= aRange._1 &&
      s.bMin <= bRange._2 && s.bMax >= bRange._1), spans.size)
  }

  /** CURRENT generation plus any unmaintained landing rows — the
    * read-your-appends view (landing files are unclustered, so scans over
    * this view prune only the maintained part). */
  def zorderReadWithLanding(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val base = zorderRead(spark, path)
    val landing = landingFiles(path)
    if (landing.isEmpty) base
    else base.unionByName(spark.read.parquet(landing.map(_.toString): _*))
  }

  private def landingFiles(path: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val d = landingDir(path)
    if (!java.nio.file.Files.isDirectory(d)) Seq.empty
    else java.nio.file.Files.list(d).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString)
  }

  /** Fold landed appends into the curve. Incremental: new rows route to
    * the existing file whose committed z-range contains them (cutpoint
    * arithmetic on the spans sidecar — codegen'd, no shuffle of the base
    * table), ONLY those files rewrite (merged + re-sorted), and every
    * untouched file carries into the next generation by HARD LINK —
    * byte-for-byte, no data copied. Generation commit discipline:
    *
    *   1. heal debris (generations above CURRENT, stagings, landing files
    *      already consumed by the committed generation's manifest),
    *   2. build `gen=N+1` complete (links + merged files + spans +
    *      consumed-landing manifest),
    *   3. flip CURRENT atomically,
    *   4. delete consumed landing files and `gen=N`.
    *
    * A crash before (3) leaves CURRENT on N and step (1) removes the
    * partial build; a crash after (3) leaves consumed landing files whose
    * re-merge step (1) suppresses via the manifest — appends are folded
    * exactly once. Returns (rowsMerged, filesRewritten, filesLinked);
    * (0, 0, 0) when there is nothing to do. */
  def zorderMaintain(spark: SparkSession, path: String): (Long, Int, Int) = {
    import java.nio.file.{Files, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val cur = currentGen(path).getOrElse(
      throw new IllegalStateException(s"no zorderInit at $path"))
    healGenerations(path, cur)
    val landing = landingFiles(path)
    if (landing.isEmpty) return (0L, 0, 0)
    val meta = readMeta(genDir(path, cur))
    val (colA, colB) = (meta("colA"), meta("colB"))
    val (aLo, aHi, bLo, bHi) = (meta("aLo").toLong, meta("aHi").toLong,
      meta("bLo").toLong, meta("bHi").toLong)
    val z = zValue(scale16(col(colA), aLo, aHi), scale16(col(colB), bLo, bHi))
    val curDir = genDir(path, cur)
    val spans = readZSpans(curDir) // sorted by zLo
    // cutpoint routing on a MATERIALIZED z column: fid = index of the last
    // span start <= z, as a codegen'd CASE chain over the one `_zm` read.
    // (An array-fold HOF here re-inlines the ~50-node z tree per element
    // and runs interpreted — measured 59 s for 600k rows at sf1 before
    // this shape; the CASE chain is <1 s.) File counts are a layout
    // parameter (16-1024), so the chain stays small; for 100k-file tables
    // swap this for a broadcast range join.
    val cuts = spans.map(_.zLo)
    val fid = cuts.zipWithIndex.drop(1)
      .foldRight(lit(cuts.length - 1): Column) { case ((c, i), acc) =>
        when(col("_zm") < c, i - 1).otherwise(acc)
      }
    val newRows = spark.read.parquet(landing.map(_.toString): _*)
      .withColumn("_zm", z)
      .withColumn("_fid", fid)
    val affectedFids = newRows.select("_fid").distinct()
      .collect().map(_.getInt(0)).sorted // bounded by the file count
    val nextDir = genDir(path, cur + 1)
    val staging = java.nio.file.Paths.get(path, s"gen=${cur + 1}.staging")
    graft.engine.WarehouseMeta.deleteRecursively(staging)
    // affected old files re-read WITH their fid (tiny broadcast name->fid
    // map), unioned with the routed new rows, one file per fid
    val affectedNames = affectedFids.map(i => spans(i).file)
    import spark.implicits._
    val nameToFid = affectedFids.map(i => (spans(i).file, i)).toSeq
      .toDF("fname", "_fid")
    val oldRows = if (affectedNames.isEmpty) None
      else Some(spark.read
        .parquet(affectedNames.map(n => curDir.resolve(n).toString): _*)
        .withColumn("_zm", z)
        .withColumn("fname", element_at(
          split(input_file_name(), "/"), -1))
        .join(broadcast(nameToFid), "fname")
        .drop("fname"))
    val merged = oldRows.map(_.unionByName(newRows)).getOrElse(newRows)
    merged
      .repartition(math.max(1, affectedFids.length), col("_fid"))
      .sortWithinPartitions("_fid", "_zm")
      .drop("_zm")
      .write.partitionBy("_fid").mode("overwrite").parquet(staging.toString)
    val nMerged = newRows.count()
    // assemble gen N+1: links for untouched files, staged merges for the rest
    Files.createDirectories(nextDir)
    var linked = 0
    val affectedSet = affectedFids.toSet
    for ((s, i) <- spans.zipWithIndex) {
      val fname = s.file
      if (!affectedSet.contains(i)) {
        try Files.createLink(nextDir.resolve(fname), curDir.resolve(fname))
        catch { case _: UnsupportedOperationException =>
          Files.copy(curDir.resolve(fname), nextDir.resolve(fname))
        }
        linked += 1
      } else {
        val partDir = staging.resolve(s"_fid=$i")
        val part = Files.list(partDir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        require(part.size == 1, s"expected one merged file for fid $i, got ${part.size}")
        Files.move(part.head, nextDir.resolve(s"merged-$cur-$i.parquet"),
          StandardCopyOption.ATOMIC_MOVE)
      }
    }
    graft.engine.WarehouseMeta.deleteRecursively(staging)
    // spans update is INCREMENTAL too: linked files keep their committed
    // ranges; only the merged files scan (they were just written)
    val mergedSpans = if (affectedFids.isEmpty) Seq.empty
      else spanStats(spark,
        affectedFids.map(i => nextDir.resolve(s"merged-$cur-$i.parquet").toString).toSeq,
        colA, colB, aLo, aHi, bLo, bHi)
    val keptSpans = spans.zipWithIndex.collect {
      case (s, i) if !affectedSet.contains(i) => s
    }
    writeSpanRows(nextDir, (keptSpans ++ mergedSpans).sortBy(_.zLo))
    writeMeta(nextDir, colA, colB, aLo, aHi, bLo, bHi) // bounds stay frozen
    writeAtomic(nextDir.resolve("_consumed.tsv"),
      landing.map(_.getFileName.toString).mkString("\n"))
    // COMMIT, then clean up — both cleanups replay safely after a crash
    writeAtomic(currentPtr(path), (cur + 1).toString)
    landing.foreach(Files.deleteIfExists(_))
    graft.engine.WarehouseMeta.deleteRecursively(curDir)
    (nMerged, affectedFids.length, linked)
  }

  /** Full re-layout into a fresh generation — the periodic OPTIMIZE that
    * heals what incremental maintenance accumulates: edge tiles bloated
    * by clamped out-of-domain appends, file-count drift, and scaling
    * bounds that no longer match the data (bounds RE-FREEZE here from the
    * observed min/max — the one place they may change, committed
    * atomically with the generation flip because the meta travels inside
    * the gen dir). Folds any unmaintained landing rows too. Same commit
    * discipline as maintain: build complete, flip CURRENT, clean up;
    * crash-safe at every point. */
  def zorderCompact(spark: SparkSession, path: String, nFiles: Int): Unit = {
    import java.nio.file.Files
    require(nFiles >= 1, "need nFiles >= 1")
    val cur = currentGen(path).getOrElse(
      throw new IllegalStateException(s"no zorderInit at $path"))
    healGenerations(path, cur)
    val meta = readMeta(genDir(path, cur))
    val (colA, colB) = (meta("colA"), meta("colB"))
    val landing = landingFiles(path)
    val all = {
      val base = spark.read.parquet(genDir(path, cur).toString)
      if (landing.isEmpty) base
      else base.unionByName(spark.read.parquet(landing.map(_.toString): _*))
    }
    val bounds = all.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).collect()(0)
    val (aLo, aHi, bLo, bHi) =
      (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2), bounds.getLong(3))
    val nextDir = genDir(path, cur + 1)
    all.withColumn("_z", zValue(
        scale16(col(colA), aLo, aHi), scale16(col(colB), bLo, bHi)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(nextDir.toString)
    writeMeta(nextDir, colA, colB, aLo, aHi, bLo, bHi) // RE-frozen bounds
    writeZSpans(spark, nextDir, colA, colB, aLo, aHi, bLo, bHi)
    writeAtomic(nextDir.resolve("_consumed.tsv"),
      landing.map(_.getFileName.toString).mkString("\n"))
    writeAtomic(currentPtr(path), (cur + 1).toString)
    landing.foreach(Files.deleteIfExists(_))
    graft.engine.WarehouseMeta.deleteRecursively(genDir(path, cur))
    ()
  }

  /** Remove debris a crashed [[zorderMaintain]] left: generation dirs and
    * stagings ABOVE the committed pointer (the build never finished), the
    * previous generation if its deletion was interrupted, and landing
    * files the COMMITTED generation already consumed (the manifest is the
    * exactly-once guard for the crash window between pointer flip and
    * landing cleanup). */
  private def healGenerations(path: String, cur: Long): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(path)
    for (p <- Files.list(root).iterator().asScala.toList) {
      val n = p.getFileName.toString
      if (n.startsWith("gen=")) {
        val gen = n.stripPrefix("gen=").stripSuffix(".staging")
        val stale = n.endsWith(".staging") ||
          (gen.forall(_.isDigit) && gen.toLong != cur)
        if (stale) graft.engine.WarehouseMeta.deleteRecursively(p)
      }
    }
    val consumed = genDir(path, cur).resolve("_consumed.tsv")
    if (Files.isRegularFile(consumed))
      Files.readAllLines(consumed).asScala.filter(_.nonEmpty).foreach { f =>
        Files.deleteIfExists(landingDir(path).resolve(f)); ()
      }
  }

}
