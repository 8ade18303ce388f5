package graft.ops

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull,
  LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation,
  PartitionDirectory}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CATALYST-INTEGRATED reads of a maintained z-order table: a manifest-backed
  * [[FileIndex]] plugged into Spark's own scan planning (the shape Delta
  * Lake's TahoeFileIndex uses, public source), so span pruning happens
  * INSIDE the optimizer — `ZTable.dataFrame(spark, path).filter(band)` plans
  * a FileSourceScanExec over only the files whose manifest spans intersect
  * the filter, with parquet footer pruning, column pruning, and predicate
  * pushdown all stacking on top for free. Unlike [[Layout.zorderScan]]
  * (an explicit band API), this read composes with EVERYTHING Spark can
  * express — joins, aggregates, SQL over a registered view — and still
  * prunes, because pruning rides the planner's `listFiles(dataFilters)`
  * call rather than a pre-computed file list.
  *
  * Why it matters at 100 TB: the query author doesn't call a special scan
  * entry point; the table IS a DataFrame, every ad-hoc predicate on the
  * layout keys prunes at planning time, and the manifest read is one
  * driver-side TSV parse (no namenode LIST, no footer fetches for pruned
  * files — the object-store planning budget the manifest design exists for).
  */
object ZTable {

  /** The maintained table as a plain DataFrame whose scan prunes via the
    * manifest. Deletion-vector tombstones apply transparently: one
    * broadcast anti-join over the scan, with the DV filtered to the
    * TOMBSTONED files' basenames (per-span dvRows counters), so the
    * broadcast never carries stale rows a rewrite already materialized;
    * every row pays one broadcast-hash probe (the single-relation price —
    * [[Layout.zorderRead]] splits clean files onto a join-free plan when
    * that matters more than SQL composability). Filters on data columns
    * still push into the scan through the join's streamed side. Snapshot
    * semantics: the CURRENT generation at call time. */
  def dataFrame(spark: SparkSession, path: String): DataFrame =
    dataFrameWithIndex(spark, path)._1

  /** [[dataFrame]] against a RETAINED generation — planner-integrated
    * TIME TRAVEL: the same FileIndex pruning, DV application, and SQL
    * composability, planned from that generation's manifest. */
  def dataFrameAsOf(spark: SparkSession, path: String, gen: Long): DataFrame = {
    require(Layout.retainedGens(path).contains(gen),
      s"generation $gen of $path is not retained (window: " +
        s"${Layout.retainedGens(path).mkString(", ")})")
    fromManifest(spark, path, Layout.readManifest(path, gen), gen)._1
  }

  /** [[dataFrame]] plus its [[ManifestFileIndex]], for callers auditing
    * what a predicate prunes ([[ManifestFileIndex.prunedCount]]). */
  def dataFrameWithIndex(spark: SparkSession,
      path: String): (DataFrame, ManifestFileIndex) = {
    val (gen, man) = Layout.currentManifest(path)
    fromManifest(spark, path, man, gen)
  }

  private def fromManifest(spark: SparkSession, path: String,
      man: Layout.Manifest, gen: Long): (DataFrame, ManifestFileIndex) = {
    val fi = new ManifestFileIndex(path, man, gen)
    // v2+ manifests persist the homogeneous generation's schema at commit
    // time — the read schema builds DRIVER-SIDE with zero parquet footer
    // fetches (at 100k files on object storage, footer HEAD+GETs are the
    // planning budget). Mixed generations and pre-schema manifests fall
    // back to footer reads.
    val dataSchema = man.schemaJson.filter(_ => !man.mixedSchema)
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType])
      .getOrElse {
        if (man.mixedSchema)
          spark.read.option("mergeSchema", "true").parquet(fi.inputFiles: _*).schema
        else spark.read.parquet(fi.inputFiles.head).schema
      }
    val relation = HadoopFsRelation(
      location = fi,
      partitionSchema = new StructType(),
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat =
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
      options =
        if (man.mixedSchema) Map("mergeSchema" -> "true") else Map.empty
    )(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    val base = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(relation)
    val tomb = man.spans.filter(_.dvRows > 0)
    val df = if (tomb.isEmpty || man.dv.isEmpty) base
    else {
      // deletion-vector anti-join over the scan: same live contract as
      // Layout.spanFilesLive, expressed against the single relation.
      // The DV is FILTERED to tombstoned basenames — carried DV files
      // accumulate rows for rewritten (renamed) files until a
      // materialize, and those must not bloat the broadcast
      val root = java.nio.file.Paths.get(path).toAbsolutePath
      val tombNames = tomb.map(s =>
        java.nio.file.Paths.get(s.file).getFileName.toString)
      val dv = spark.read.parquet(root.resolve(man.dv.get).toString)
        .filter(col("fname").isin(tombNames: _*))
        .withColumnRenamed("fname", "_dv_fname")
        .withColumnRenamed("pos", "_dv_pos")
      base
        .withColumn("_fname", element_at(split(input_file_name(), "/"), -1))
        .withColumn("_pos", col("_metadata.row_index"))
        .join(broadcast(dv),
          col("_fname") === col("_dv_fname") && col("_pos") === col("_dv_pos"),
          "left_anti")
        .drop("_fname", "_pos")
    }
    (df, fi)
  }
}

/** Shared value-domain helpers for span pruning and metadata folds —
  * the ONE place to widen admitted literal/attribute types (prune and
  * fold paths must never diverge). */
private[graft] object SpanDomains {
  def anyLong(v: Any): Option[Long] = v match {
    case i: java.lang.Integer => Some(i.longValue)
    case i: java.lang.Long => Some(i.longValue)
    case i: java.lang.Short => Some(i.longValue)
    case i: java.lang.Byte => Some(i.longValue)
    case _ => None
  }
  def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType => true
    case _ => false
  }
  def isString(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == org.apache.spark.sql.types.StringType
  /** A Catalyst-internal literal value rendered into the column's span
    * domain: integral/micros/days arrive as boxed integrals (anyLong);
    * a STRING literal (UTF8String) embeds via [[graft.functions.Prefix8]]
    * — the same static core the manifest stat scan recorded, so spans
    * and probes agree byte-for-byte. The embedding is LOSSY (an 8-byte
    * prefix): consumers must relax strict string comparisons to
    * non-strict ([[relaxStrict]]), or risk false pruning on prefix ties. */
  def domainLong(dt: org.apache.spark.sql.types.DataType,
      v: Any): Option[Long] = v match {
    case null => None
    case u: org.apache.spark.unsafe.types.UTF8String if isString(dt) =>
      Some(graft.functions.Prefix8.of(u))
    case other => anyLong(other)
  }
  /** Strict comparisons stay strict only where the span domain is exact
    * — the prefix embedding maps distinct strings to equal longs, so
    * `a > v` on a string can only prune as `a >= v`. */
  def relaxStrict(dt: org.apache.spark.sql.types.DataType): Boolean =
    isString(dt)
}

/** [[FileIndex]] over one committed generation's manifest: `listFiles`
  * extracts [lo, hi] bounds for the two layout columns AND every declared
  * stat column from the planner's data filters (conjunctions of >, >=, <,
  * <=, = against literals — the shapes Catalyst normalizes range
  * predicates into) and returns only the files whose spans intersect all
  * of them. Stat spans live in Catalyst's internal literal domains
  * (micros for timestamps, days for dates), so the comparison is direct.
  * Unrecognized conjuncts simply don't narrow the bounds — never false
  * pruning, spans admit false positives and the planner applies every
  * filter residually. File statuses come from the manifest too (length
  * from the filesystem once, at index construction — zero per-query LIST
  * calls). */
final class ManifestFileIndex private[ops] (path: String,
    man: Layout.Manifest, gen: Long) extends FileIndex {

  private val root = java.nio.file.Paths.get(path).toAbsolutePath

  // bloom sidecars, parsed + file-resolved lazily ONCE per column for
  // the index's lifetime (the index is pinned to one generation, and
  // sidecars are generation-addressed, so the cache can never serve a
  // stale bitset); admission is INDEX-ALIGNED with `statuses`, so each
  // query pays probe ANDs over an array instead of a string-keyed map
  // lookup per file (84 → 45 ms/query at 100k files, see LayoutProbe)
  private val bloomCache = new java.util.concurrent.ConcurrentHashMap[
    String, Option[Seq[Any] => Array[Boolean]]]()
  private def bloomFor(colName: String): Option[Seq[Any] => Array[Boolean]] =
    bloomCache.computeIfAbsent(colName,
      c => Layout.bloomSpanAdmission(path, gen, c, man.spans.map(_.file)))

  private val statuses: Seq[(Layout.Span, FileStatus)] = man.spans.map { s =>
    val p = root.resolve(s.file)
    // v2 manifests carry byte lengths (the Iceberg file_size_in_bytes
    // idea): index construction makes ZERO filesystem calls per file —
    // at 100k files on an object store that's 100k HEADs saved per query.
    // Pre-v2 spans (bytes = -1) fall back to one stat each.
    val len = if (s.bytes >= 0) s.bytes else java.nio.file.Files.size(p)
    s -> new FileStatus(len, false, 1, 0L, 0L, new HPath(p.toUri))
  }

  /** The generation's total physical row count and tombstone presence —
    * the facts [[graft.plans.ManifestAggs]] folds `count(*)` from. */
  def manifestRowCount: Long = man.spans.map(_.rows).sum
  def hasTombstones: Boolean = man.spans.exists(_.dvRows > 0)

  /** Generation-wide [min, max] for a span-covered column
    * ([[graft.plans.ManifestAggs]]'s min/max source — spans record EXACT
    * per-file extremes, so this is the scan's answer, not an estimate):
    * `Some((Some(lo), Some(hi)))` normally; `Some((None, None))` when
    * every file's interval is EMPTY (an all-null column: the scan would
    * answer NULL); `None` when the column isn't covered — unknown name, a
    * layout key whose type isn't integral (cast-long seconds vs micros),
    * or any file predating the stat column's declaration (its values are
    * unknown, so no metadata answer exists). */
  def spanExtremes(colName: String,
      integralOk: Boolean): Option[(Option[Long], Option[Long])] =
    if (man.spans.isEmpty) // zero-file generation: the scan answers NULL
      Some((None, None))
    else if (colName == man.colA && integralOk)
      Some((Some(man.spans.map(_.aMin).min), Some(man.spans.map(_.aMax).max)))
    else if (colName == man.colB && integralOk)
      Some((Some(man.spans.map(_.bMin).min), Some(man.spans.map(_.bMax).max)))
    else {
      val i = man.statCols.indexOf(colName)
      if (i < 0) None
      else {
        val entries = man.spans.map(_.stats.lift(i))
        if (entries.exists(_.isEmpty)) None // pre-column files: unknown
        else {
          val nonEmpty = entries.flatten.filter { case (lo, hi) => lo <= hi }
          if (nonEmpty.isEmpty) Some((None, None))
          else Some((Some(nonEmpty.map(_._1).min), Some(nonEmpty.map(_._2).max)))
        }
      }
    }

  /** Generation-wide NON-NULL row count for a declared stat column —
    * what [[graft.plans.ManifestAggs]] folds `count(col)` from (v3
    * manifests record per-file null counts; Iceberg's
    * null_value_counts): `Some(Σ(rows − nulls))` when EVERY span's
    * counter is known, `None` when the column isn't declared or any file
    * predates the counter (pre-v3 manifest rows: honest unknown). Callers
    * must separately require a tombstone-free generation — counts here
    * are physical. */
  def spanNonNullCount(colName: String): Option[Long] = {
    val i = man.statCols.indexOf(colName)
    if (i < 0) None
    else {
      val entries = man.spans.map(s => s.nulls.lift(i).filter(_ >= 0))
      if (entries.exists(_.isEmpty)) None
      else Some(man.spans.map(_.rows).sum - entries.flatten.sum)
    }
  }

  /** How many listFiles calls pruned at least one file — a test/audit
    * hook (metrics on FileSourceScanExec need an executed plan; this is
    * readable right after planning). */
  @volatile var prunedCount: Int = 0
  @volatile var lastListed: Int = -1

  override def rootPaths: Seq[HPath] = Seq(new HPath(root.toUri))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // LAYOUT-key spans are recorded in the `cast("long")` domain
    // (Layout.zorderInit) — for an integral column that IS the value, but a
    // timestamp casts to SECONDS while the planner's filter literal arrives
    // in Catalyst-internal MICROS. Narrowing across that domain mismatch
    // would silently false-prune nearly every file, so layout bounds only
    // narrow when the filtered attribute's type is integral
    // (integralOnly = true); a timestamp/date layout key still scans
    // correctly — just unpruned here (parquet footer stats still apply).
    val (aLo, aHi) = boundsFor(man.colA, dataFilters, integralOnly = true)
    val (bLo, bHi) = boundsFor(man.colB, dataFilters, integralOnly = true)
    // declared STAT columns prune too (the Iceberg column-stats shape):
    // timestamp/date literals arrive in Catalyst's internal micros/days —
    // exactly the domain the manifest stat spans were computed in
    // (statLongExpr uses unix_micros/unix_date; types validated at init)
    val statBounds =
      man.statCols.map(c => boundsFor(c, dataFilters, integralOnly = false))
    // BLOOM point pruning inside the planner (r14): equality/IN
    // predicates on a column with a generation-addressed bloom sidecar
    // keep only the files whose bitset may contain one of the values —
    // `dataFrame(path).filter(k === 42)` plans the same ~1-file scan as
    // the explicit zorderPointLookup API. One admission predicate per
    // (column, values) conjunct, all conjunctive; may-contain semantics
    // and the planner's residual filter keep the result exact.
    val bloomConjuncts: Seq[Array[Boolean]] =
      pointValues(dataFilters).flatMap { case (colName, values) =>
        bloomFor(colName).map(mk => mk(values))
      }
    // disjunctive trees (r14): Catalyst hands a top-level OR to listFiles
    // as one expression, which the conjunctive boundsFor path can't use —
    // evaluate those per span with may-match interval logic, so
    // `a < 5 OR a > 1000` (two-window time ranges, id-set unions) prunes
    // instead of listing everything. IsNull/IsNotNull conjuncts (r15)
    // ride the same per-span walk, pruning through v3 null counters.
    val orFilters = dataFilters.collect {
      case o: Or => (o: Expression)
      case n: IsNull => (n: Expression)
      case n: IsNotNull => (n: Expression)
    }
    val hit = statuses.zipWithIndex.filter { case ((s, _), idx) =>
      s.aMin <= aHi && s.aMax >= aLo && s.bMin <= bHi && s.bMax >= bLo &&
      statBounds.zipWithIndex.forall { case ((lo, hi), i) =>
        // a column the filters did NOT narrow never prunes — an
        // unconstrained query must return all-null-stat files too
        (lo == Long.MinValue && hi == Long.MaxValue) ||
        s.stats.lift(i) // generations predating the column: never prune
          .map { case (sLo, sHi) => // sLo > sHi = the EMPTY interval (all-null)
            sLo <= sHi && sLo <= hi && sHi >= lo }
          .getOrElse(true)
      } &&
      bloomConjuncts.forall(_(idx)) &&
      orFilters.forall(o => mayMatch(o, s))
    }
    if (hit.size < statuses.size) prunedCount += 1
    lastListed = hit.size
    Seq(PartitionDirectory(InternalRow.empty, hit.map(_._1._2).toArray))
  }

  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean =
    SpanDomains.isIntegral(dt)

  /** The span's [lo, hi] for an attribute, when the manifest knows it:
    * `None` = unknown column (or a layout key whose type isn't integral —
    * the cast("long") domain mismatch, see boundsFor); `Some(None)` = a
    * KNOWN stat column whose interval is EMPTY (all-null file);
    * `Some(Some(interval))` otherwise. */
  private def spanInterval(aName: String,
      aType: org.apache.spark.sql.types.DataType,
      s: Layout.Span): Option[Option[(Long, Long)]] =
    if (aName == man.colA && isIntegral(aType)) Some(Some((s.aMin, s.aMax)))
    else if (aName == man.colB && isIntegral(aType)) Some(Some((s.bMin, s.bMax)))
    else {
      val i = man.statCols.indexOf(aName)
      if (i < 0) None
      else s.stats.lift(i) match {
        case None => None // generation predates the column: unknown
        case Some((lo, hi)) =>
          if (lo > hi) Some(None) else Some(Some((lo, hi)))
      }
    }

  /** The span's recorded NULL count for `aName`, when known: a declared
    * stat column whose manifest row carries a v3 null counter (−1 and
    * pre-v3 rows are honest unknowns — no pruning). Counts are PHYSICAL
    * rows, which is sound under tombstones in both directions: all
    * physical rows null ⇒ all live rows null, zero physical nulls ⇒ zero
    * live nulls. */
  private def spanNulls(aName: String, s: Layout.Span): Option[Long] = {
    val i = man.statCols.indexOf(aName)
    if (i < 0) None else s.nulls.lift(i).filter(_ >= 0)
  }

  /** May `e` match any row of span `s`? Evaluates OR/AND trees of literal
    * comparisons against the span's intervals; every unrecognized node or
    * leaf answers TRUE (may match — never false pruning). A comparison
    * leaf on a known all-null column answers FALSE (NULL fails every
    * comparison); IsNull/IsNotNull leaves prune through the v3 null
    * counters when recorded. STRING columns compare in the lossy
    * [[graft.functions.Prefix8]] domain, so their strict comparisons
    * relax to non-strict ([[SpanDomains.relaxStrict]]). */
  private def mayMatch(e: Expression, s: Layout.Span): Boolean = {
    def leaf(a: Attribute, l: Literal,
        test: (Long, Long, Long) => Boolean,
        relaxed: (Long, Long, Long) => Boolean): Boolean =
      leafV(a, SpanDomains.domainLong(a.dataType, l.value),
        if (SpanDomains.relaxStrict(a.dataType)) relaxed else test)
    def leafV(a: Attribute, lv: Option[Long],
        test: (Long, Long, Long) => Boolean): Boolean =
      (spanInterval(a.name, a.dataType, s), lv) match {
        case (Some(None), _) => false
        case (Some(Some((lo, hi))), Some(v)) => test(lo, hi, v)
        case _ => true
      }
    e match {
      case Or(l, r) => mayMatch(l, s) || mayMatch(r, s)
      case And(l, r) => mayMatch(l, s) && mayMatch(r, s)
      case EqualTo(a: Attribute, l: Literal) =>
        leaf(a, l, (lo, hi, v) => lo <= v && v <= hi,
          (lo, hi, v) => lo <= v && v <= hi)
      case EqualTo(l: Literal, a: Attribute) =>
        leaf(a, l, (lo, hi, v) => lo <= v && v <= hi,
          (lo, hi, v) => lo <= v && v <= hi)
      case GreaterThan(a: Attribute, l: Literal) =>
        leaf(a, l, (_, hi, v) => hi > v, (_, hi, v) => hi >= v)
      case GreaterThan(l: Literal, a: Attribute) =>
        leaf(a, l, (lo, _, v) => lo < v, (lo, _, v) => lo <= v)
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        leaf(a, l, (_, hi, v) => hi >= v, (_, hi, v) => hi >= v)
      case GreaterThanOrEqual(l: Literal, a: Attribute) =>
        leaf(a, l, (lo, _, v) => lo <= v, (lo, _, v) => lo <= v)
      case LessThan(a: Attribute, l: Literal) =>
        leaf(a, l, (lo, _, v) => lo < v, (lo, _, v) => lo <= v)
      case LessThan(l: Literal, a: Attribute) =>
        leaf(a, l, (_, hi, v) => hi > v, (_, hi, v) => hi >= v)
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        leaf(a, l, (lo, _, v) => lo <= v, (lo, _, v) => lo <= v)
      case LessThanOrEqual(l: Literal, a: Attribute) =>
        leaf(a, l, (_, hi, v) => hi >= v, (_, hi, v) => hi >= v)
      case IsNotNull(a: Attribute) =>
        // a file whose every physical row is null provably holds no
        // IsNotNull match; unknown counters admit
        spanNulls(a.name, s).forall(_ < s.rows)
      case IsNull(a: Attribute) =>
        spanNulls(a.name, s).forall(_ > 0)
      case In(a: Attribute, list) if list.nonEmpty &&
          list.forall(_.isInstanceOf[Literal]) =>
        val vs = list.map(l =>
          SpanDomains.domainLong(a.dataType, l.asInstanceOf[Literal].value))
        if (vs.forall(_.isDefined))
          vs.flatten.exists(v =>
            leafV(a, Some(v), (lo, hi, x) => lo <= x && x <= hi))
        else true
      case InSet(a: Attribute, set) if set.nonEmpty =>
        val vs = set.toSeq.map(SpanDomains.domainLong(a.dataType, _))
        if (vs.forall(_.isDefined))
          vs.flatten.exists(v =>
            leafV(a, Some(v), (lo, hi, x) => lo <= x && x <= hi))
        else true
      case _ => true
    }
  }

  /** Top-level-conjunct point predicates on INTEGRAL or STRING columns —
    * the shapes a bloom sidecar can prune on: `k = v`, `v = k`,
    * `k IN (…)`, and the optimizer's `InSet` form. Values pass RAW
    * (boxed integrals / UTF8String) — [[Layout.bloomSpanAdmission]]
    * converts them in the sidecar's recorded hash domain and admits
    * everything on any mismatch. One entry per predicate (conjunctive);
    * a predicate with any non-literal piece contributes nothing (no
    * pruning, never wrong). */
  private def pointValues(
      filters: Seq[Expression]): Seq[(String, Seq[Any])] = {
    def ok(a: Attribute): Boolean =
      isIntegral(a.dataType) || SpanDomains.isString(a.dataType)
    val out = Seq.newBuilder[(String, Seq[Any])]
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(a: Attribute, l: Literal) if ok(a) && l.value != null =>
        out += (a.name -> Seq(l.value))
      case EqualTo(l: Literal, a: Attribute) if ok(a) && l.value != null =>
        out += (a.name -> Seq(l.value))
      case In(a: Attribute, list) if ok(a) &&
          list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        val vs = list.map(_.asInstanceOf[Literal].value)
        if (vs.forall(_ != null)) out += (a.name -> vs)
      case InSet(a: Attribute, set) if ok(a) && set.nonEmpty =>
        val vs = set.toSeq
        if (vs.forall(_ != null)) out += (a.name -> vs)
      case _ => ()
    }
    filters.foreach(walk)
    out.result()
  }

  /** Conjunctive [lo, hi] bounds the filters imply for `colName`;
    * unbounded sides stay at Long.Min/MaxValue. Only literal comparisons
    * on a bare attribute narrow — casts, arithmetic, OR trees don't
    * (conservative: no false pruning). With `integralOnly` the attribute's
    * own type must be integral too (layout-key spans live in the
    * `cast("long")` domain, which only coincides with Catalyst's literal
    * domain for integral columns). */
  private def boundsFor(colName: String, filters: Seq[Expression],
      integralOnly: Boolean): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def attrOf(e: Expression): Option[Attribute] = e match {
      case a: Attribute if a.name == colName &&
        (!integralOnly || SpanDomains.isIntegral(a.dataType)) => Some(a)
      case _ => None
    }
    def conv(a: Attribute, l: Literal): Option[Long] =
      SpanDomains.domainLong(a.dataType, l.value)
    // STRICT bounds bump by one only in exact domains; the lossy string
    // prefix domain relaxes `>`/`<` to `>=`/`<=` (prefix ties)
    def bumpUp(a: Attribute, v: Long): Long =
      if (SpanDomains.relaxStrict(a.dataType) || v == Long.MaxValue) v else v + 1
    def bumpDown(a: Attribute, v: Long): Long =
      if (SpanDomains.relaxStrict(a.dataType) || v == Long.MinValue) v else v - 1
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case GreaterThanOrEqual(ae, l: Literal) => attrOf(ae).foreach(a =>
        conv(a, l).foreach(v => lo = math.max(lo, v)))
      case GreaterThan(ae, l: Literal) => attrOf(ae).foreach(a =>
        conv(a, l).foreach(v => lo = math.max(lo, bumpUp(a, v))))
      case LessThanOrEqual(ae, l: Literal) => attrOf(ae).foreach(a =>
        conv(a, l).foreach(v => hi = math.min(hi, v)))
      case LessThan(ae, l: Literal) => attrOf(ae).foreach(a =>
        conv(a, l).foreach(v => hi = math.min(hi, bumpDown(a, v))))
      case EqualTo(ae, l: Literal) => attrOf(ae).foreach(a =>
        conv(a, l).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v) })
      // literal-on-the-left mirrors
      case GreaterThanOrEqual(l: Literal, ae) => attrOf(ae).foreach(a =>
        conv(a, l).foreach(v => hi = math.min(hi, v)))
      case GreaterThan(l: Literal, ae) => attrOf(ae).foreach(a =>
        conv(a, l).foreach(v => hi = math.min(hi, bumpDown(a, v))))
      case LessThanOrEqual(l: Literal, ae) => attrOf(ae).foreach(a =>
        conv(a, l).foreach(v => lo = math.max(lo, v)))
      case LessThan(l: Literal, ae) => attrOf(ae).foreach(a =>
        conv(a, l).foreach(v => lo = math.max(lo, bumpUp(a, v))))
      case EqualTo(l: Literal, ae) => attrOf(ae).foreach(a =>
        conv(a, l).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v) })
      // IN-lists narrow to the values' envelope [min, max] — coarser than
      // the exact set, but sound, and tight enough to prune when the list
      // is clustered (the common point-lookup batch shape)
      case In(ae, list) if list.nonEmpty &&
          list.forall(_.isInstanceOf[Literal]) => attrOf(ae).foreach { a =>
        val vs = list.map(l => conv(a, l.asInstanceOf[Literal]))
        if (vs.forall(_.isDefined)) {
          lo = math.max(lo, vs.map(_.get).min)
          hi = math.min(hi, vs.map(_.get).max)
        }
      }
      case InSet(ae, set) if set.nonEmpty => attrOf(ae).foreach { a =>
        val vs = set.toSeq.map(SpanDomains.domainLong(a.dataType, _))
        if (vs.forall(_.isDefined)) {
          lo = math.max(lo, vs.map(_.get).min)
          hi = math.min(hi, vs.map(_.get).max)
        }
      }
      case _ => () // unknown conjunct: no narrowing, never false pruning
    }
    filters.foreach(walk)
    (lo, hi)
  }

  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum

  override def partitionSchema: StructType = new StructType()
}
