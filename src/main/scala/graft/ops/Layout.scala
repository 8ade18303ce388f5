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
}
