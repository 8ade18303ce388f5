package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY §7.6 ledger): used where a Scala UDF
  * would break whole-stage codegen in hot paths.
  *
  *   - [[CosineSimilarity]]: ordered-fold cosine over two float arrays —
  *     numerically identical to the `aggregate(zip_with(...))` column form in
  *     [[graft.ops.Similarity]] (same left-to-right double accumulation), but
  *     one fused loop in generated code instead of three array traversals and
  *     no per-element lambda closures.
  *   - [[Base36Uid]]: the reference's 25-char base-36 random id
  *     (graphydb.py:137-167) as a non-deterministic leaf, so id generation
  *     can run inside codegen'd projections during distributed ingest.
  *
  * Registered on a session via [[GraftExtensions]] (SQL names
  * `cosine_similarity`, `dot_product`, `uid_base36`).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects float/double arrays, got ${left.dataType} / ${right.dataType}")
  }
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  private def isDoubleArr(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    // mismatched lengths or null elements yield NULL — same as the
    // aggregate(zip_with(...)) column form this expression mirrors
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    val xd = isDoubleArr(left); val yd = isDoubleArr(right)
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) null else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val getX = if (isDoubleArr(left)) s"$x.getDouble($i)" else s"(double)$x.getFloat($i)"
      val getY = if (isDoubleArr(right)) s"$y.getDouble($i)" else s"(double)$y.getFloat($i)"
      s"""
         |if ($x.numElements() != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $x.numElements();
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $getX; double $yi = $getY;
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($nx == 0.0 || $ny == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny)); }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static normalization core shared by [[NormalizeText]]'s interpreted and
  * generated paths: NFD-decompose, drop combining marks (accent strip),
  * lowercase with the ROOT locale (no Turkish-i surprises), NFC-recompose.
  * Matches DuckDB's `lower(strip_accents(nfc_normalize(x)))` on
  * decomposable accents (é à ü ñ ç …) — both strip via canonical
  * decomposition; non-decomposable letters (ø, ß) pass through in both. */
object TextNorm {
  def normalize(s: UTF8String): UTF8String = {
    import java.text.Normalizer
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(Normalizer.normalize(
      sb.toString.toLowerCase(java.util.Locale.ROOT), Normalizer.Form.NFC))
  }
}

/** Unicode text normalization for corpus canonicalization (dedup keys,
  * match keys, vocabulary folding): NFD → strip combining marks →
  * ROOT-locale lowercase → NFC, as ONE codegen-friendly expression — the
  * generated code calls the static [[TextNorm]] core, so the projection
  * stays inside whole-stage codegen where a Scala UDF would break it. */
case class NormalizeText(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects a string, got ${child.dataType}")
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    TextNorm.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd Σ aᵢ·bᵢ — [[CosineSimilarity]]'s unnormalized sibling, for
  * inner-product scoring (MIPS). Same contracts: float/double arrays,
  * double accumulation in array order, NULL on length mismatch or null
  * elements (matching `aggregate(zip_with(...))`, which this replaces in
  * the hot path — HOF lambdas evaluate expression trees per ELEMENT). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects float/double arrays, got ${left.dataType} / ${right.dataType}")
  }
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private def isDoubleArr(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var i = 0
    val xd = isDoubleArr(left); val yd = isDoubleArr(right)
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val getX = if (isDoubleArr(left)) s"$x.getDouble($i)" else s"(double)$x.getFloat($i)"
      val getY = if (isDoubleArr(right)) s"$y.getDouble($i)" else s"(double)$y.getFloat($i)"
      s"""
         |if ($x.numElements() != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $x.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $getX * $getY;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 3-D Hilbert index of three 16-bit cells (48-bit output) — the
  * three-key twin of [[HilbertIndex]], via Skilling's transpose algorithm
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — the
  * public n-dimensional form): undo the excess rotations high-bit-first,
  * Gray-decode across axes, then interleave the transposed words. Same
  * contracts as the 2-D form: inputs mask to 16 bits, nulls propagate,
  * the walk is bijective and every consecutive index step moves exactly
  * one grid unit (spec-pinned), and the loop is a shared static core so
  * interpreted and codegen paths cannot drift. */
case class Hilbert3Index(first: Expression, second: Expression,
    third: Expression) extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t == LongType || t == IntegerType
    if (children.forall(c => ok(c.dataType)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert3_index needs integral inputs, got ${children.map(_.dataType)}")
  }
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "hilbert3_index"

  private def asLong(e: Expression, v: Any): Long =
    if (e.dataType == LongType) v.asInstanceOf[Long]
    else v.asInstanceOf[Int].toLong

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    Hilbert3Index.xyz2d(16, asLong(first, a) & 0xFFFFL,
      asLong(second, b) & 0xFFFFL, asLong(third, c) & 0xFFFFL)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, z) =>
      s"${ev.value} = graft.functions.Hilbert3Index.xyz2d(16, ((long)$x) & 0xFFFFL, ((long)$y) & 0xFFFFL, ((long)$z) & 0xFFFFL);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

object Hilbert3Index {
  /** Skilling's AxesToTranspose for n=3 + bit interleave: coordinates →
    * Hilbert distance on a 2^order cube. */
  def xyz2d(order: Int, x: Long, y: Long, z: Long): Long = {
    val X = Array(x, y, z)
    val M = 1L << (order - 1)
    // inverse undo of the rotations, high plane to low
    var q = M
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < 3) {
        if ((X(i) & q) != 0) X(0) ^= p // invert low bits of axis 0
        else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t } // exchange
        i += 1
      }
      q >>= 1
    }
    // Gray encode across axes
    X(1) ^= X(0); X(2) ^= X(1)
    var t2 = 0L
    q = M
    while (q > 1) { if ((X(2) & q) != 0) t2 ^= q - 1; q >>= 1 }
    X(0) ^= t2; X(1) ^= t2; X(2) ^= t2
    // interleave the transposed words, axis 0 most significant per plane
    var d = 0L
    var b = order - 1
    while (b >= 0) {
      d = (d << 1) | ((X(0) >> b) & 1L)
      d = (d << 1) | ((X(1) >> b) & 1L)
      d = (d << 1) | ((X(2) >> b) & 1L)
      b -= 1
    }
    d
  }
}

/** `searchsorted(cuts, v)`: index of the LAST element of `cuts` that is
  * <= `v`, clamped to 0 — numpy's `searchsorted(..., side='right') - 1`
  * with a floor. `cuts` must be a FOLDABLE sorted long array (a literal):
  * it is evaluated once at plan time and referenced from generated code as
  * a plain `long[]`, so each row pays one `Arrays.binarySearch` — O(log n)
  * against 100k+ cutpoints where a CASE chain (O(n) per row, and a
  * 100k-branch codegen method) stops being viable. Built for
  * [[graft.ops.Layout.zorderMaintain]]'s file routing (new rows → the
  * committed file whose z-range owns them) but generic: any
  * sorted-boundary bucketization (histogramming, range routing) fits.
  * Binary search is the shared static core ([[SearchSorted.lastLE]]) so
  * interpreted and codegen paths cannot drift. */
case class SearchSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def intish(t: DataType) = t == LongType || t == IntegerType
    if (left.dataType == ArrayType(LongType, false) ||
        left.dataType == ArrayType(LongType, true))
      if (!left.foldable)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "searchsorted needs a literal (foldable) cuts array")
      else if (intish(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"searchsorted needs an integral value, got ${right.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"searchsorted needs array<bigint> cuts, got ${left.dataType}")
  }
  override def nullable: Boolean = right.nullable
  override def prettyName: String = "searchsorted"

  // evaluated ONCE per plan (the foldable contract), shared by both paths
  @transient private lazy val cutsArr: Array[Long] =
    left.eval().asInstanceOf[ArrayData].toLongArray()

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = right.eval(input)
    if (v == null) null else SearchSorted.lastLE(cutsArr, asLong(v))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrRef = ctx.addReferenceObj("cuts", cutsArr, "long[]")
    val rightGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${rightGen.code}
      boolean ${ev.isNull} = ${rightGen.isNull};
      int ${ev.value} = 0;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.SearchSorted.lastLE($arrRef, (long)${rightGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SearchSorted {
  /** Index of the last `cuts(i) <= v`, clamped to 0 (v below every cut
    * routes to bucket 0 — Layout's "first file owns everything below its
    * start" clamp). `cuts` must be sorted ascending; DUPLICATE values are
    * allowed and resolve to the LAST equal index — binarySearch's pick
    * among duplicates is unspecified, and Layout's CASE-chain routing
    * deterministically lands on the last duplicate, so the forward walk
    * keeps the two routing shapes identical (duplicate zLo cuts are
    * reachable: repartitionByRange can split equal z values across a
    * file boundary). */
  def lastLE(cuts: Array[Long], v: Long): Int = {
    var i = java.util.Arrays.binarySearch(cuts, v)
    if (i >= 0) {
      while (i + 1 < cuts.length && cuts(i + 1) == v) i += 1
      i
    } else math.max(0, -i - 2)
  }
}

/** 25-char base-36 random uid (uppercase, 36^25 ≈ 8.1e38 space). Marked
  * non-deterministic: never folded, re-evaluated per row. CodegenFallback is
  * deliberate — id generation is not a hot inner loop, and fallback keeps the
  * per-partition RNG initialization contract simple. */
case class Base36Uid() extends LeafExpression with Nondeterministic
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "uid_base36"

  @transient private[this] var rng: java.util.Random = _
  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.Random(java.security.SecureRandom.getInstance("SHA1PRNG").nextLong()
      + partitionIndex)

  private val Alphabet = graft.core.Uid.Alphabet

  override protected def evalInternal(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val sb = new java.lang.StringBuilder(25)
    var i = 0
    while (i < 25) { sb.append(Alphabet.charAt(rng.nextInt(36))); i += 1 }
    UTF8String.fromString(sb.toString)
  }
}

/** Hilbert-curve index of a 2^16 × 2^16 grid cell (Hilbert 1891; the
  * iterative xy→d form is the public textbook algorithm): like the Morton
  * z-value, nearby (x, y) cells get nearby indices — but the Hilbert curve
  * has no Morton "jumps" (consecutive indices are always grid-adjacent), so
  * per-file key spans come out as tight or tighter when a table is
  * range-partitioned on it. Inputs mask to 16 bits (the [[graft.ops.Layout]]
  * scaling contract); nulls propagate. The loop is a shared static core —
  * the generated code calls it directly, so interpreted and codegen paths
  * cannot drift. */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t == LongType || t == IntegerType
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_index needs integral inputs, got ${left.dataType}, ${right.dataType}")
  }
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "hilbert_index"

  private def asLong(e: Expression, v: Any): Long =
    if (e.dataType == LongType) v.asInstanceOf[Long]
    else v.asInstanceOf[Int].toLong

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(16, asLong(left, a) & 0xFFFFL, asLong(right, b) & 0xFFFFL)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.HilbertIndex.xy2d(16, ((long)$x) & 0xFFFFL, ((long)$y) & 0xFFFFL);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HilbertIndex {
  /** Iterative xy→d on a 2^order square: walk bit planes high→low,
    * accumulate the quadrant's offset, rotate/reflect the frame. */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s: Long = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // rotate the lower quadrants so the walk stays adjacent
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Order-preserving 8-byte prefix embedding of UTF-8 strings into the
  * signed Long domain — the trick that lets STRING column statistics ride
  * the manifest's existing (Long, Long) span intervals (the Iceberg
  * truncate(N)-bounds idea, re-expressed as a numeric embedding): take the
  * first 8 bytes, zero-pad, read big-endian, flip the sign bit so
  * unsigned byte order maps to signed Long order. Monotone w.r.t.
  * UTF8_BINARY (byte-lexicographic) string ordering — `a <= b` implies
  * `of(a) <= of(b)` — so `[of(min), of(max)]` is a sound covering
  * interval for every value's embedding, and a range/equality predicate
  * on the string prunes through interval logic (with strict comparisons
  * RELAXED to non-strict by the consumer: distinct strings longer than
  * the prefix can share an embedding). Lossy by construction: never used
  * to answer min/max, only to prune. */
object Prefix8 {
  def of(bytes: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
      i += 1
    }
    v ^ Long.MinValue // map unsigned order onto signed Long order
  }
  def of(s: UTF8String): Long = of(s.getBytes)
  def of(s: String): Long =
    of(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

/** [[Prefix8]] as a codegen'd expression (`str_prefix8`) — what
  * [[graft.ops.Layout]]'s manifest stat scan records for string stat
  * columns; the planner-side literal conversion calls the SAME static
  * core, so write-time spans and query-time probes can never drift. */
case class StrPrefix8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"str_prefix8 expects a string, got ${child.dataType}")
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "str_prefix8"

  override protected def nullSafeEval(input: Any): Any =
    Prefix8.of(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Prefix8.of($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SparkSessionExtensions hook: register the functions (and the
  * metadata-aggregate optimizer rule — it only ever matches
  * manifest-backed relations, so it is inert elsewhere) on any session
  * with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`; for an already
  * built session use [[GraftExtensions.register]] (functions) and
  * [[graft.plans.ManifestAggs.enable]] (the rule). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.ManifestAggs)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[functions] val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    (FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (children: Seq[Expression]) => NormalizeText(children(0))),
    (FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
      (children: Seq[Expression]) => HilbertIndex(children(0), children(1))),
    (FunctionIdentifier("uid_base36"),
      new ExpressionInfo(classOf[Base36Uid].getName, "uid_base36"),
      (_: Seq[Expression]) => Base36Uid()),
    (FunctionIdentifier("searchsorted"),
      new ExpressionInfo(classOf[SearchSorted].getName, "searchsorted"),
      (children: Seq[Expression]) => SearchSorted(children(0), children(1))),
    (FunctionIdentifier("hilbert3_index"),
      new ExpressionInfo(classOf[Hilbert3Index].getName, "hilbert3_index"),
      (children: Seq[Expression]) =>
        Hilbert3Index(children(0), children(1), children(2))),
    (FunctionIdentifier("str_prefix8"),
      new ExpressionInfo(classOf[StrPrefix8].getName, "str_prefix8"),
      (children: Seq[Expression]) => StrPrefix8(children(0))))

  /** Runtime registration into an existing session's function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
