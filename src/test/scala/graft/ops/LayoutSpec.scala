package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the Z-order layout module: exact bit interleaves, the 16-bit
  * bucketization contract, and the claim the module exists for — a z-sorted
  * write yields per-file min/max spans tight on BOTH columns, so footer
  * pruning skips files for range predicates on either key, where a
  * single-key layout prunes on that key only. */
class LayoutSpec extends AnyFunSuite with SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Long =
    spark.range(1).select(c.cast("long")).head().getLong(0)

  test("zValue: exact bit interleave (a even bits, b odd); 16-bit mask wraps") {
    // 3 = 0b011 spreads to 0b101 = 5; 5 = 0b101 spreads to 0b10001 = 17
    assert(one(Layout.spread16(lit(3))) == 5L)
    assert(one(Layout.spread16(lit(5))) == 17L)
    // z(3, 5): a bits at even positions, b bits at odd → 0b100111 = 39
    assert(one(Layout.zValue(lit(3), lit(5))) == 39L)
    assert(one(Layout.zValue(lit(1), lit(0))) == 1L)
    assert(one(Layout.zValue(lit(0), lit(1))) == 2L)
    // full 16-bit keys fill all 32 bits
    assert(one(Layout.zValue(lit(0xFFFF), lit(0xFFFF))) == 0xFFFFFFFFL)
    // inputs mask to 16 bits: bit 16 wraps rather than corrupting the curve
    assert(one(Layout.zValue(lit(0x10003L), lit(0))) ==
      one(Layout.zValue(lit(3), lit(0))))
  }

  test("scale16: monotone map of [lo, hi] onto [0, 65535]; endpoints pinned; degenerate and negative ranges safe") {
    assert(one(Layout.scale16(lit(-5L), -5L, 94L)) == 0L, "lo → 0")
    assert(one(Layout.scale16(lit(94L), -5L, 94L)) == 65535L, "hi → 65535")
    assert(one(Layout.scale16(lit(7L), 7L, 7L)) == 0L, "degenerate range → 0")
    // a domain wider than 16 bits buckets monotonically without overflow
    val wide = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue)
    val got = wide.map(v => one(Layout.scale16(lit(v), Long.MinValue, Long.MaxValue)))
    assert(got == got.sorted, s"monotone, got $got")
    assert(got.head == 0L && got.last == 65535L)
    assert(got.forall(v => v >= 0L && v <= 65535L))
    // a domain narrower than 16 bits spreads across the full range evenly
    assert(one(Layout.scale16(lit(1L), 0L, 3L)) == 21845L, "1/3 of the way → 65535/3")
  }

  test("zorderWrite: two-sided file pruning beats a single-key layout; answers unchanged") {
    import spark.implicits._
    // 256×256 grid — both keys uniform so per-file spans are predictable
    val df = spark.range(256L * 256L)
      .select((col("id") / 256).cast("long").as("a"),
        (col("id") % 256).cast("long").as("b"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_zord").toString + "/t"
    val linDir = java.nio.file.Files.createTempDirectory("graft_lin").toString + "/t"
    Layout.zorderWrite(df, zDir, "a", "b", nFiles = 16)
    // the single-key control: same file count, clustered on `a` only
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(linDir)

    val zSpans = Layout.fileSpans(spark, zDir, "a", "b").cache()
    val linSpans = Layout.fileSpans(spark, linDir, "a", "b").cache()
    assert(zSpans.count() == 16 && linSpans.count() == 16)

    // range predicate on the SECOND key: the single-key layout must open
    // every file; the z layout's 16 files tile the plane in ~64-wide bands
    // on both axes, so a 16-wide b-slice touches only the tiles it crosses
    val zOnB = Layout.touchedFraction(zSpans, "b_min", "b_max", 96, 111)
    val linOnB = Layout.touchedFraction(linSpans, "b_min", "b_max", 96, 111)
    assert(linOnB >= 0.99, s"single-key layout cannot prune on b: $linOnB")
    assert(zOnB <= 0.5, s"z layout must prune most files on b: $zOnB")

    // range predicate on the FIRST key: both layouts prune; single-key is
    // perfect there, z still skips most files
    val zOnA = Layout.touchedFraction(zSpans, "a_min", "a_max", 96, 111)
    val linOnA = Layout.touchedFraction(linSpans, "a_min", "a_max", 96, 111)
    assert(linOnA <= 0.3, s"single-key prunes its own key hard: $linOnA")
    assert(zOnA <= 0.5, s"z layout prunes on a too: $zOnA")

    // layout never changes answers: same rows, exactly once
    val back = spark.read.parquet(zDir)
    assert(back.count() == 256L * 256L)
    assert(back.except(df).count() == 0 && df.except(back).count() == 0)
    zSpans.unpersist(); linSpans.unpersist()
  }

  test("zorderWrite: arbitrary key domains (beyond 16 bits, negative) keep locality via scaling") {
    import spark.implicits._
    // keys far outside [0, 65535]: pre-scaling these would collide/misorder
    val df = spark.range(4096)
      .select(((col("id") / 64).cast("long") * 1000000L - 2000000L).as("a"),
        (col("id") % 64 * 3000000L).as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zwide").toString + "/t"
    Layout.zorderWrite(df, dir, "a", "b", nFiles = 4)
    val spans = Layout.fileSpans(spark, dir, "a", "b").cache()
    assert(spans.count() == 4)
    // each of the 4 tiles should span about half of each axis, not all of it
    val zOnA = Layout.touchedFraction(spans, "a_min", "a_max", -2000000L, -1000000L)
    val zOnB = Layout.touchedFraction(spans, "b_min", "b_max", 0L, 20000000L)
    assert(zOnA <= 0.75, s"pruning on a survives the wide domain: $zOnA")
    assert(zOnB <= 0.75, s"pruning on b survives the wide domain: $zOnB")
    assert(spark.read.parquet(dir).except(df).count() == 0)
    spans.unpersist()
  }
}
