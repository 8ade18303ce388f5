package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite with SparkSpec {

  private lazy val init: Unit = GraftExtensions.register(spark)

  test("cosine_similarity expression ≡ column-fold form, through codegen") {
    init
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f), Array(1.0f, 0.0f, 2.0f)),
      (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (3L, Array(0.5f, -0.5f, 0.25f), Array(0.125f, 0.75f, -1.0f))
    ).toDF("id", "a", "b")
    val e = df.select(col("id"), expr("cosine_similarity(a, b)").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val f = df.select(col("id"),
      (graft.ops.Similarity.dot(col("a"), col("b")) /
        (graft.ops.Similarity.norm(col("a")) * graft.ops.Similarity.norm(col("b")))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(e.keySet == f.keySet)
    e.foreach { case (k, v) => assert(v == f(k), s"id $k: $v != ${f(k)}") }
    assert(math.abs(e(1L) - 1.0) < 1e-12 && math.abs(e(2L)) < 1e-12)
  }

  test("cosine_similarity null/zero-norm handling") {
    init
    import spark.implicits._
    val df = Seq((1L, Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("id", "a", "b")
    val out = df.select(expr("cosine_similarity(a, b)").as("c")).head()
    assert(out.isNullAt(0), "zero-norm vector yields NULL, not NaN")
  }

  test("dot_product expression ≡ column-fold form, through codegen; null on mismatch") {
    init
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f), Array(3.0f, 5.0f, 0.5f)),
      (2L, Array(-1.5f, 0.25f), Array(4.0f, 8.0f)),
      (3L, Array(0.0f, 0.0f), Array(1.0f, 1.0f))   // zero vector: ip 0, NOT null
    ).toDF("id", "a", "b")
    val e = df.select(col("id"), expr("dot_product(a, b)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val f = df.select(col("id"),
        graft.ops.Similarity.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    e.foreach { case (k, v) => assert(v == f(k), s"id $k: $v != ${f(k)}") }
    assert(e(1L) == 4.0 && e(2L) == -4.0 && e(3L) == 0.0)
    val mismatch = Seq((1L, Array(1.0f), Array(1.0f, 2.0f))).toDF("id", "a", "b")
      .select(expr("dot_product(a, b)").as("d")).head()
    assert(mismatch.isNullAt(0), "length mismatch yields NULL")
  }

  test("str_prefix8: codegen ≡ driver core; order-preserving on byte order; strict ties collapse (r15)") {
    init
    import spark.implicits._
    val samples = Seq("", "a", "A", "ab", "abc", "zzzzzzzz", "zzzzzzzzz",
      "aaaaaaaa", "aaaaaaaaX", "aaaaaaaaY", "00001234", "00001235",
      "café", "caf", "ÿ", "😀" /* 4-byte emoji */)
    val viaExpr = samples.toDF("s")
      .select(col("s"), expr("str_prefix8(s)").as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the distributed expression and the driver-side planner helper are
    // the SAME static core — byte-for-byte equal on every input
    samples.foreach { s =>
      assert(viaExpr(s) == graft.functions.Prefix8.of(s),
        s"expr vs driver core diverge on '$s'")
    }
    // monotone w.r.t. UTF8_BINARY (byte-lexicographic) order: the
    // property that makes [of(min), of(max)] a sound covering interval
    def bytes(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def byteLe(x: String, y: String): Boolean = {
      val (a, b) = (bytes(x), bytes(y))
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      a.length <= b.length
    }
    for (x <- samples; y <- samples if byteLe(x, y))
      assert(graft.functions.Prefix8.of(x) <= graft.functions.Prefix8.of(y),
        s"prefix order must follow byte order: '$x' vs '$y'")
    // distinct strings sharing 8 leading bytes EMBED EQUAL — the lossy
    // tie the planner's relaxed strict comparisons exist for
    assert(graft.functions.Prefix8.of("aaaaaaaaX") ==
      graft.functions.Prefix8.of("aaaaaaaaY"))
    // null propagates
    assert(Seq(Option.empty[String]).toDF("s")
      .select(expr("str_prefix8(s)")).head().isNullAt(0))
  }

  test("normalize_text: accent strip + ROOT lowercase + NFC, form-insensitive, through codegen") {
    init
    import spark.implicits._
    val precomposed = "Café"            // é as one codepoint
    val decomposed = "Cafe\u0301"      // e + combining acute (NFD form)
    val df = Seq(
      (1L, s"$precomposed RÉSUMÉ Zürich FAÇADE"),
      (2L, decomposed),
      (3L, "naïve SEÑOR ß ø"), // ß and ø don't decompose — pass through
      (4L, null.asInstanceOf[String])).toDF("id", "s")
    val got = df.select(col("id"), expr("normalize_text(s)").as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "cafe resume zurich facade")
    assert(got(2L) == "cafe", "NFD input normalizes identically to NFC input")
    assert(got(3L) == "naive senor ß ø")
    assert(got(4L) == null, "null propagates")
    // interpreted path (TextNorm directly) ≡ the codegen'd expression
    assert(graft.functions.TextNorm.normalize(
      org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)).toString == "cafe")
  }

  test("uid_base36 generates well-formed distinct ids per row") {
    init
    val df = spark.range(1000).select(expr("uid_base36()").as("uid"))
    val uids = df.collect().map(_.getString(0))
    assert(uids.forall(graft.core.Uid.isUid))
    assert(uids.distinct.length == uids.length, "no collisions in 1000 draws")
  }

  test("hilbert_index: first-order quadrant walk exact; the full curve is a bijective adjacent walk") {
    init
    // order-1 square: (0,0)→0 (0,1)→1 (1,1)→2 (1,0)→3 — the U shape
    assert(HilbertIndex.xy2d(1, 0, 0) == 0L)
    assert(HilbertIndex.xy2d(1, 0, 1) == 1L)
    assert(HilbertIndex.xy2d(1, 1, 1) == 2L)
    assert(HilbertIndex.xy2d(1, 1, 0) == 3L)
    // order-4 (16×16): bijection onto [0, 256) and EVERY consecutive pair
    // of indices is grid-adjacent — the no-jumps property Morton lacks
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield HilbertIndex.xy2d(4, x, y) -> ((x, y))
    val byD = cells.toMap
    assert(byD.size == 256 && byD.keySet == (0 until 256).map(_.toLong).toSet)
    for (d <- 0L until 255L) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $d→${d + 1} jumps: ($x1,$y1)→($x2,$y2)")
    }
    // SQL/codegen path agrees with the static core, and nulls propagate
    import spark.implicits._
    val df = (0 until 64).map(i => (i.toLong % 16, i.toLong / 16)).toDF("x", "y")
    val got = df.selectExpr("hilbert_index(x, y) AS h", "x", "y").collect()
    assert(got.forall(r => r.getLong(0) ==
      HilbertIndex.xy2d(16, r.getLong(1), r.getLong(2))))
    assert(spark.sql("SELECT hilbert_index(CAST(NULL AS BIGINT), 3)")
      .head().isNullAt(0))
  }

  test("hilbert3_index: bijective adjacent walk on the cube; codegen ≡ static core; nulls propagate") {
    init
    // order-4 cube (16³ = 4096 cells): bijection onto [0, 4096) and EVERY
    // consecutive pair of indices is grid-adjacent (Manhattan distance 1,
    // one axis) — the property that makes per-file spans tight on ALL
    // THREE keys with no Morton jumps. This is self-verifying: any error
    // in the Skilling transpose breaks adjacency immediately.
    val cells = for (x <- 0 until 16; y <- 0 until 16; z <- 0 until 16)
      yield Hilbert3Index.xyz2d(4, x, y, z) -> ((x, y, z))
    val byD = cells.toMap
    assert(byD.size == 4096 && byD.keySet == (0 until 4096).map(_.toLong).toSet,
      "bijection onto the cube")
    for (d <- 0L until 4095L) {
      val (x1, y1, z1) = byD(d); val (x2, y2, z2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1,
        s"step $d→${d + 1} jumps: ($x1,$y1,$z1)→($x2,$y2,$z2)")
    }
    // SQL/codegen path agrees with the static core; 16-bit mask; nulls
    import spark.implicits._
    val df = (0 until 512).map(i =>
      (i.toLong % 8, (i / 8).toLong % 8, (i / 64).toLong)).toDF("x", "y", "z")
    val got = df.selectExpr("hilbert3_index(x, y, z) AS h", "x", "y", "z").collect()
    assert(got.forall(r => r.getLong(0) ==
      Hilbert3Index.xyz2d(16, r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(Hilbert3Index.xyz2d(16, 0x10003L & 0xFFFFL, 0, 0) ==
      Hilbert3Index.xyz2d(16, 3, 0, 0))
    assert(spark.sql("SELECT hilbert3_index(1, CAST(NULL AS BIGINT), 2)")
      .head().isNullAt(0))
  }

  test("searchsorted: last index <= v clamped to 0, codegen ≡ static core, nulls propagate, non-literal cuts rejected") {
    init
    // static core pins: exact hit, between, below-all (clamp), above-all
    val cuts = Array(-3L, 10L, 10000L)
    assert(SearchSorted.lastLE(cuts, -100L) == 0, "below all cuts clamps to 0")
    assert(SearchSorted.lastLE(cuts, -3L) == 0)
    assert(SearchSorted.lastLE(cuts, 9L) == 0)
    assert(SearchSorted.lastLE(cuts, 10L) == 1)
    assert(SearchSorted.lastLE(cuts, 9999L) == 1)
    assert(SearchSorted.lastLE(cuts, Long.MaxValue) == 2)
    // DUPLICATE cuts resolve to the LAST equal index — binarySearch's
    // pick among duplicates is unspecified, and Layout's CASE chain
    // deterministically lands on the last duplicate; the two routing
    // shapes must agree (duplicate zLo spans are reachable via
    // repartitionByRange splitting equal z values across a boundary)
    val dup = Array(0L, 5L, 5L, 5L, 10L)
    assert(SearchSorted.lastLE(dup, 5L) == 3, "last duplicate wins")
    assert(SearchSorted.lastLE(dup, 4L) == 0)
    assert(SearchSorted.lastLE(dup, 6L) == 3)
    assert(SearchSorted.lastLE(Array(5L, 5L), 5L) == 1)
    // SQL/codegen path agrees with the static core over a dense sweep
    import spark.implicits._
    val got = spark.range(-20L, 10030L)
      .selectExpr("searchsorted(array(-3L, 10L, 10000L), id) AS f", "id").collect()
    assert(got.forall(r => r.getInt(0) == SearchSorted.lastLE(cuts, r.getLong(1))))
    assert(spark.sql("SELECT searchsorted(array(1L, 2L), CAST(NULL AS BIGINT))")
      .head().isNullAt(0))
    // cuts must be a plan-time literal — a per-row array is a contract bug
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(3).selectExpr("searchsorted(array(id), id)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"))
  }

  test("expression survives whole-stage codegen in a filter+project pipeline") {
    init
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, Array.fill(8)(i.toFloat), Array.fill(8)(1.0f)))
      .toDF("id", "a", "b")
    val n = df.filter(expr("cosine_similarity(a, b) > 0.99")).count()
    assert(n == 100L, "constant-direction vectors all cosine≈1")
  }
}
