package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Event-log analytics over the `events` table shape (event_id, ts, user_id,
  * event_type, value, props JSON). Batch forms here; the streaming twins live
  * in [[graft.streaming.EventStreams]]. */
object Events {

  /** Sessionize by inactivity gap: a new session starts when the previous
    * event of the same user is more than `gapSeconds` older. One window
    * function pass — single shuffle on user_id. */
  def sessionized(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        // fractional-second cast on both engines (DuckDB twin: epoch(ts)) —
        // integer truncation would disagree on gaps within 1s of the cutoff
        when(col("prev_ts").isNull ||
          (col("ts").cast("double") - col("prev_ts").cast("double")) > gapSeconds.toDouble, 1)
          .otherwise(0))
      .withColumn("session_idx", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Sessions per user + events per session summary. */
  def sessionStats(events: DataFrame, gapSeconds: Long): DataFrame =
    sessionized(events, gapSeconds)
      .groupBy("user_id")
      .agg(max("session_idx").cast("long").as("sessions"),
        count(lit(1)).as("events"))

  /** Cohort retention: users grouped by first-seen day; for each
    * (cohort_day, day_offset) the distinct users still active. Two shuffles
    * (first-seen agg on user_id, retention agg on the cohort cell) — the
    * first-seen side is user-cardinality, broadcast-able when small, and the
    * join key is user_id so no row ever carries event payloads. */
  def retention(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    events.select(col("user_id"), to_date(col("ts")).as("day"))
      .join(firstSeen, "user_id")
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
  }

  /** As-of join (point-in-time join), composed from built-in operators: for
    * each `leftType` event, the id of the most recent strictly-prior
    * `rightType` event of the same user, "prior" in the total order
    * (ts, event_id). One window pass over the filtered union — a single
    * shuffle on user_id — instead of a range join whose per-user candidate
    * set is quadratic. This is the 100 TB shape for point-in-time feature
    * lookups (training-example enrichment without label leakage). */
  def asofJoin(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events.filter(col("event_type").isin(leftType, rightType))
      .withColumn("asof_id",
        last(when(col("event_type") === rightType, col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === leftType)
      .select(col("event_id"), col("user_id"), col("asof_id"))
  }

  /** Land events in the DATE-PARTITIONED lake layout (Hive-style
    * `dt=YYYY-MM-DD/` directories) every time-range workload at 100 TB
    * depends on: the reader prunes whole day directories at PLANNING time
    * (PartitionFilters, before any file is opened), so a 3-day query over
    * a 10-year lake touches 3/3650 of the directories. The pre-write
    * `repartition(dt)` routes each day to the tasks owning it — without
    * it every task writes every day it saw and a T-task job over D days
    * explodes into T×D small files (the classic small-files failure). For
    * days too big for one task, add a salt to the repartition keys; the
    * layout is unchanged. */
  def writeDateLake(events: DataFrame, path: String): Unit =
    events.withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(col("dt"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("dt").parquet(path)

  /** Read a day range from a [[writeDateLake]] layout. `dt` comes back as
    * a STRING (partition-type inference would make it a DATE, changing the
    * result schema by layout choice — a layout must never change answers).
    * The between-filter lands in PartitionFilters: directory pruning, not
    * row filtering (EventsSpec pins partitionCount == days in range). */
  def readDateLake(spark: org.apache.spark.sql.SparkSession, path: String,
      fromDt: String, toDt: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("dt", col("dt").cast("string"))
      .filter(col("dt").between(fromDt, toDt))

  private def requireBatchLake(path: String): Unit =
    require(!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(path.stripPrefix("file:"), "_spark_metadata")),
      s"$path was landed by a streaming file sink (_spark_metadata present): " +
        "batch readers of such a lake trust only the sink log, so a batch " +
        "rewrite would produce invisible files — retire the sink (drop the " +
        "log) before batch maintenance")

  /** Day-preserving split: every task owns whole (day, shard) groups, so a
    * day writes at most `filesPerDay` files (exactly one unsalted). The salt
    * is a deterministic row hash — days bigger than one task's memory
    * split without any key ever straddling a restatement boundary. */
  private def daySplit(df: DataFrame, filesPerDay: Int): DataFrame =
    if (filesPerDay <= 1) df.repartition(col("dt"))
    else df.withColumn("_shard", pmod(hash(col("event_id")), lit(filesPerDay)))
      .repartition(col("dt"), col("_shard")).drop("_shard")

  /** Restate (backfill) exactly the days present in `events` — the
    * reprocess-one-day operation every lake needs: DYNAMIC partition
    * overwrite replaces only the `dt=` directories the frame contains and
    * never touches their neighbors, so a bad upstream day is repaired in
    * place while every other day's files (and any reader's pruning) stay
    * byte-identical.
    *
    * INTEROP CAVEAT (here and [[compactDateLake]]): a lake landed via
    * `EventStreams.streamToDateLake` carries a `_spark_metadata` file-sink
    * commit log, and batch readers of such a lake trust ONLY the log —
    * files written by a batch restatement would be invisible (and files it
    * replaced would still be listed). Batch maintenance belongs to
    * batch-landed lakes; for a streamed lake, retire the sink (drop the
    * log) first — both operators REFUSE a logged lake rather than write
    * invisible files. */
  def restateDays(events: DataFrame, path: String): Unit = {
    requireBatchLake(path)
    withMaintenanceLock(path) {
      // per-WRITE option, never the session-global conf: a concurrent
      // Overwrite writer on the same session must not silently inherit
      // dynamic semantics
      events.withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
        .repartition(col("dt"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("dt").parquet(path)
    }
  }

  /** Fold a day range's accumulated small files (streaming micro-batches,
    * repeated restatements) into `filesPerDay` per directory — the lake's
    * compaction, same deferred-maintenance posture as the signature-store
    * and vector-index compactors. Reads only the range's directories
    * (partition pruning), rewrites only those days (dynamic overwrite):
    * a 3-day compaction over a 10-year lake is a 3-day job. */
  def compactDateLake(spark: org.apache.spark.sql.SparkSession, path: String,
      fromDt: String, toDt: String, filesPerDay: Int = 1): Unit = {
    // STAGE first (the swapRewrite discipline): the compacted range
    // materializes fully before any live file is replaced, so the rewrite
    // never reads directories it is deleting — read-while-overwrite of
    // the same path is exactly the hazard dynamic overwrite alone leaves.
    requireBatchLake(path)
    withMaintenanceLock(path) {
      // no data in the range → nothing to compact: short-circuit instead of
      // writing an empty stage dir that the read-back would fail to infer
      val range = readDateLake(spark, path, fromDt, toDt)
      if (!range.isEmpty) {
        val stage = s"$path/_compact_stage"
        daySplit(range, filesPerDay)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("dt").parquet(stage)
        try
          daySplit(spark.read.parquet(stage)
              .withColumn("dt", col("dt").cast("string")), filesPerDay)
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic") // per-write, never session conf
            .partitionBy("dt").parquet(path)
        finally
          graft.engine.WarehouseMeta.deleteRecursively(
            java.nio.file.Paths.get(stage.stripPrefix("file:")))
      }
    }
  }

  /** Day directories present under a date-lake/rollup path. Pure metadata —
    * a directory listing, no data files open. */
  private def listDays(path: String): Set[String] = {
    val p = java.nio.file.Paths.get(path.stripPrefix("file:"))
    if (!java.nio.file.Files.isDirectory(p)) Set.empty
    else {
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("dt=")).map(_.stripPrefix("dt=")).toSet
      finally s.close()
    }
  }

  /** Aggregate exactly `days` of the lake into the rollup layout — reads
    * ONLY those day directories (explicit paths + basePath = planning-time
    * pruning), lands via dynamic partition overwrite (day-grain
    * idempotent: re-running a day rewrites the same rows). */
  private def rollDays(spark: org.apache.spark.sql.SparkSession,
      lakePath: String, rollupPath: String, days: Seq[String]): Unit =
    spark.read.option("basePath", lakePath)
      .parquet(days.map(dt => s"$lakePath/dt=$dt"): _*)
      .withColumn("dt", col("dt").cast("string"))
      .groupBy("dt", "event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .repartition(col("dt"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dt").parquet(rollupPath)

  /** Incrementally maintain a per-(day, event_type) rollup over a
    * [[writeDateLake]] layout — day-grain incremental view maintenance:
    * each call diffs the lake's day directories against the rollup's (two
    * listings, no data read), reads ONLY the missing days, and lands their
    * aggregate rows by dynamic partition overwrite. Steady-state cost is
    * O(new days), never a rescan of the lake; a crash mid-maintain just
    * re-runs (day-grain idempotence); a restated lake day re-rolls via
    * [[restateRollupDays]]. The rollup is itself a date-partitioned layout
    * (dt stays a STRING, same discipline as the lake). Returns the days
    * this call computed. */
  def maintainDailyRollup(spark: org.apache.spark.sql.SparkSession,
      lakePath: String, rollupPath: String): Seq[String] = {
    requireBatchLake(lakePath)
    withMaintenanceLock(rollupPath) {
      val missing = (listDays(lakePath) -- listDays(rollupPath)).toSeq.sorted
      if (missing.nonEmpty) rollDays(spark, lakePath, rollupPath, missing)
      missing
    }
  }

  /** Recompute exactly `days` of the rollup from the lake — the repair
    * companion: after [[restateDays]] fixes a lake day, this re-rolls it
    * without touching any neighbor. */
  def restateRollupDays(spark: org.apache.spark.sql.SparkSession,
      lakePath: String, rollupPath: String, days: Seq[String]): Unit = {
    require(days.nonEmpty, "no days to restate")
    requireBatchLake(lakePath)
    withMaintenanceLock(rollupPath) {
      rollDays(spark, lakePath, rollupPath, days)
    }
  }

  /** Read the maintained rollup (dt as STRING, like [[readDateLake]]). */
  def readDailyRollup(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path).withColumn("dt", col("dt").cast("string"))

  /** Advisory exclusion for lake maintenance (restatement, compaction): a
    * file lock inside the lake dir plus a JVM monitor, the WarehouseMeta
    * lock recipe applied to a path. Serializes maintenance against
    * maintenance; concurrent APPENDS during a compaction are the
    * operator's scheduling call — a plain parquet lake has no transaction
    * log, so a writer that does not take this lock can land a file in a
    * day the compaction is about to replace. Schedule compaction when the
    * range's days are closed (they are, by definition, for date ranges in
    * the past). */
  private val jvmLakeLock = new Object
  private def withMaintenanceLock[A](path: String)(body: => A): A =
    jvmLakeLock.synchronized {
      val p = java.nio.file.Paths.get(path.stripPrefix("file:"), "_maintenance.lock")
      java.nio.file.Files.createDirectories(p.getParent)
      val ch = java.nio.channels.FileChannel.open(p,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try body finally lock.release()
      } finally ch.close()
    }

  /** Strict ordered funnel: users whose earliest occurrences of the steps are
    * strictly increasing in time. Returns a single-row count. */
  def funnelCount(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val firsts = events
      .filter(col("event_type").isin(steps.map(lit): _*))
      .groupBy("user_id")
      .pivot("event_type", steps)
      .agg(min("ts"))
    val ordered =
      if (steps.size < 2) lit(true)
      else steps.sliding(2).map { case Seq(a, b) => col(a) < col(b) }.reduce(_ && _)
    firsts.filter(steps.map(col(_).isNotNull).reduce(_ && _) && ordered)
      .agg(count(lit(1)).as("users"))
  }

  /** Trailing-window rate anomaly detection — the ops-side monitor over an
    * event stream: events bucket to the hour, and each bucket's count
    * z-scores against the `trailing` PRECEDING buckets' mean/sample-stddev
    * (the bucket itself excluded, so a spike can't mask itself). Buckets
    * with < 2 trailing observations, or a zero trailing stddev, get a NULL
    * z and are never anomalous — explicit, not engine-dependent
    * divide-by-zero behavior. Rounded 4 dp for cross-engine equality.
    *
    * Scale shape: one bucket aggregation (map-side partials) then a window
    * over the tiny bucket series — the windowed data is |hours|, not
    * |events|, so the single-partition window is a non-issue at any event
    * volume; shard by a tenant/source column upstream if the bucket series
    * itself ever needs distributing. */
  def rateAnomalies(events: DataFrame, tsCol: String, trailing: Int = 6,
      zThreshold: Double = 3.0): DataFrame = {
    require(trailing >= 2, s"need >= 2 trailing buckets, got $trailing")
    val byHour = events
      .select(date_trunc("hour", col(tsCol)).as("bucket_ts"))
      .groupBy("bucket_ts").agg(count(lit(1)).as("n"))
    val w = Window.orderBy("bucket_ts").rowsBetween(-trailing, -1)
    byHour
      .withColumn("trail_n", count(col("n")).over(w))
      .withColumn("mean", avg(col("n")).over(w))
      .withColumn("std", stddev_samp(col("n")).over(w))
      .withColumn("z",
        when(col("trail_n") >= 2 && col("std") > 0,
          round((col("n") - col("mean")) / col("std"), 4)))
      .select(col("bucket_ts"), col("n"),
        round(col("mean"), 4).as("trailing_mean"),
        col("z"),
        coalesce(col("z").isNotNull && abs(col("z")) > zThreshold, lit(false))
          .as("anomalous"))
  }
}
