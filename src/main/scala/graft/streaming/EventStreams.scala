package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface over the events shape (SURVEY §2.9 — absent
  * in the reference; part of the engine's extension contract).
  *
  * Every transform takes/returns a streaming DataFrame so sources and sinks
  * stay caller-chosen (`readStream` file/kafka → transforms → `writeStream`);
  * batch DataFrames run through the same code paths (the transforms are
  * source-agnostic), which is how the specs pin semantics against their
  * batch twins in [[graft.ops.Events]].
  */
object EventStreams {

  /** Normalize an events frame's `ts` to session-TZ TimestampType across
    * the generator's historical physical types — parquet TIMESTAMP(NANOS)
    * read as raw nanos, TIMESTAMP(MICROS, noUTC) read as TIMESTAMP_NTZ, or
    * already-normal — the SINGLE schema-adaptive branch shared by the batch
    * loader (SparkEntry.events) and [[eventFileStream]], so batch and
    * stream can never drift apart on the same file (the r7 events-loader
    * regression class). */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as raw nanos
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast("timestamp"))
    case _ => df
  }

  /** File-source stream over a DRIVER events parquet: one metadata-only
    * batch read pins the on-disk schema (streaming sources cannot infer),
    * then the stream tails the file through the SAME [[normalizeEventTs]]
    * branch as the batch loader. At scale this is the tail-the-landing-dir
    * ingestion shape: new event files appear under `path` and flow through
    * identical semantics to the batch backfill. */
  def eventFileStream(spark: SparkSession, path: String): DataFrame = {
    // harmless for non-NANOS files; required before the read for NANOS ones
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    // the driver ships events as a single FILE, which trips the file
    // source's partition inference: for a non-glob path FileStreamSource
    // force-injects basePath = the path itself, and a file basePath is
    // rejected ("must be a directory"). A SELF-MATCHING GLOB (last char
    // bracketed) suppresses that injection, so partition inference anchors
    // at the glob's parent directory as intended. Directory paths pass
    // through untouched — the production tail-a-landing-dir shape.
    val f = new java.io.File(path)
    val globbed =
      if (f.isFile) path.dropRight(1) + "[" + path.last + "]" else path
    normalizeEventTs(spark.readStream.schema(schema).parquet(globbed))
  }

  /** Tumbling-window counts/sums per event_type with a watermark: the
    * streaming twin of the q22 daily-window batch query. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"), col("value_sum"))

  /** Sliding windows (length/slide), same aggregate shape. */
  def slidingCounts(events: DataFrame, length: String, slide: String,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), length, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("event_type"), col("cnt"))

  /** Session windows by inactivity gap — built-in `session_window`, the
    * streaming twin of [[graft.ops.Events.sessionized]]. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("events"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("events"))

  final case class UserRunning(events: Long, valueSum: Double)
  final case class UserUpdate(user_id: Long, events: Long, value_sum: Double)

  /** Custom stateful aggregation via mapGroupsWithState: running per-user
    * totals across micro-batches (the `KeyValueGroupedDataset` custom-state
    * surface the brief calls for). */
  def runningUserTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      // value is nullable in the events shape; a null deserialized into the
      // primitive Double field would kill the whole streaming query
      .selectExpr("user_id", "coalesce(cast(value as double), 0.0) as value")
      .filter(col("user_id").isNotNull)
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserRunning, UserUpdate](GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(0L, 0.0))
          var n = prev.events; var v = prev.valueSum
          rows.foreach { case (_, value) => n += 1; v += value }
          val next = UserRunning(n, v)
          state.update(next)
          UserUpdate(user, next.events, next.valueSum)
      }
      .toDF()
  }

  /** Streaming exact dedup of a document feed: the first-arriving row per
    * content key is emitted, later copies dropped, with dedup state BOUNDED
    * by the watermark (`dropDuplicatesWithinWatermark`) — a copy arriving
    * more than `watermark` after its original may re-emit; that is the
    * standard bounded-state tradeoff at ingest scale. Streaming twin of
    * [[graft.ops.Dedup.exactDedup]] for the continuous-ingest pipeline. */
  def dedupStream(docs: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: each purchase joined to the same user's
    * view events inside the preceding `interval` — the continuous-ingest
    * candidate set behind [[graft.ops.Events.asofJoin]]. Both sides carry
    * watermarks and the join predicate bounds event-time range, which is
    * Spark's contract for evicting stream-stream join state (without it the
    * join buffers forever). Works identically on batch frames, which is how
    * the spec pins stream ≡ batch. */
  def viewPurchaseJoin(events: DataFrame, interval: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    purchases.join(views,
        col("v_user") === col("p_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr(s"INTERVAL $interval"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("view_id"))
  }

  /** Change-stream tailing of a graph journal directory (the reference's
    * `changes` table as a live feed): file-source stream over the warehouse
    * journal in change-doc schema. */
  def journalStream(spark: SparkSession, journalDir: String): DataFrame =
    spark.readStream
      .schema(graft.core.Rows.changeSchema)
      .parquet(journalDir)

  /** Stream events INTO the date-partitioned lake layout
    * ([[graft.ops.Events.writeDateLake]]'s `dt=YYYY-MM-DD/` directories) —
    * the production landing path: micro-batches append day-partitioned
    * parquet exactly-once (checkpointed file-sink log), and every
    * downstream range read prunes day directories the moment a batch
    * commits. Late events land in their OWN day's directory (dt derives
    * from event time, not arrival time), so a restated day is re-readable
    * without touching its neighbors. Returns the started query; the
    * caller owns its lifecycle. */
  def streamToDateLake(events: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("dt")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** The landing log of a [[streamToDateLake]]-landed lake: one row per
    * RETAINED sink-log entry — (batch_id, is_compact, n_files,
    * committed_at) parsed from the `_spark_metadata` commit log.
    * Driver-side listing of the TINY log only (one small file per batch),
    * never a data scan; the map from wall-clock time to batch id every
    * time-travel read starts from. After the sink's periodic compaction
    * the oldest row IS the compact (is_compact = true, n_files =
    * CUMULATIVE through that batch) and earlier per-batch rows exist only
    * while the log cleaner retains them — the same horizon
    * [[readDateLakeAsOf]] enforces loudly. */
  def lakeLandings(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    sinkLogBatches(path).map { case (id, p) =>
      (id, p.getFileName.toString.endsWith(".compact"), sinkLogPaths(p).size,
        new Timestamp(java.nio.file.Files.getLastModifiedTime(p).toMillis))
    }.toDF("batch_id", "is_compact", "n_files", "committed_at")
  }

  /** TIME TRAVEL over a streamed date lake: the lake exactly as of landing
    * batch `maxBatchId` — only files committed by batches ≤ maxBatchId are
    * read, so a restated/appended lake answers "what did this range look
    * like when batch N landed" — the journal's `snapshotAt`
    * ([[graft.engine.Journal]]) applied to the lake through the sink log
    * it already writes. Day-range filtering and the STRING `dt` contract
    * match [[graft.ops.Events.readDateLake]]; partition values are
    * recovered via basePath, so pruning still applies within the listed
    * files. */
  def readDateLakeAsOf(spark: SparkSession, path: String, maxBatchId: Long,
      fromDt: String, toDt: String): DataFrame = {
    val (compacts, plains) = sinkLogEntries(path)
    val newestCompact = compacts.map(_._1).filter(_ <= maxBatchId).maxOption
    // the newest compact ≤ maxBatchId (cumulative listing) + plain files
    // above it — and EVERY id in (compact, maxBatchId] must still be
    // retained, else the snapshot would silently miss batches (Spark's log
    // cleaner deletes compacted-away plain files eventually — time travel
    // reaches only as far back as the retained log, loudly)
    val floor = newestCompact.getOrElse(-1L)
    val keptAbove = plains.filter(p => p._1 > floor && p._1 <= maxBatchId)
    // distinguish "not landed yet" from "compacted away": a maxBatchId
    // above the newest retained id has simply never been committed — the
    // retention message would mislead on a fresh, never-compacted log
    val newestRetained = (compacts.map(_._1) ++ plains.map(_._1)).maxOption.getOrElse(-1L)
    require(maxBatchId <= newestRetained,
      s"sink log under $path has no batch $maxBatchId (newest committed " +
        s"batch is $newestRetained) — the requested snapshot does not exist yet")
    require((floor + 1 to maxBatchId).forall(keptAbove.map(_._1).toSet.contains),
      s"sink log under $path no longer retains batches ${floor + 1}..$maxBatchId " +
        "individually (compacted away) — time travel reaches only as far " +
        "back as the retained log")
    val files = (newestCompact.map(c => compacts.filter(_._1 == c)).getOrElse(Nil)
        ++ keptAbove)
      .flatMap { case (_, p) => sinkLogPaths(p) }
      .distinct
    require(files.nonEmpty, s"no sink-log batches ≤ $maxBatchId under $path")
    spark.read.option("basePath", path).parquet(files: _*)
      .withColumn("dt", col("dt").cast("string"))
      .filter(col("dt").between(fromDt, toDt))
  }

  /** Sink-log batch files under `_spark_metadata`, (batchId, path), sorted:
    * the newest `.compact` (cumulative listing) + every plain file above
    * it — the view [[lakeLandings]] reports. */
  private def sinkLogBatches(path: String): Seq[(Long, java.nio.file.Path)] = {
    val (compacts, plains) = sinkLogEntries(path)
    val newestCompact = compacts.map(_._1).maxOption.getOrElse(-1L)
    (compacts.filter(_._1 == newestCompact) ++
      plains.filter(_._1 > newestCompact)).sortBy(_._1)
  }

  /** All retained sink-log files: (compacts, plains), each (batchId, path). */
  private def sinkLogEntries(path: String)
      : (Seq[(Long, java.nio.file.Path)], Seq[(Long, java.nio.file.Path)]) = {
    import scala.jdk.CollectionConverters._
    val logDir = java.nio.file.Paths.get(path.stripPrefix("file:"), "_spark_metadata")
    require(java.nio.file.Files.isDirectory(logDir),
      s"$path carries no _spark_metadata sink log — time travel needs a " +
        "stream-landed lake (batch lakes version through restateDays)")
    val ls = java.nio.file.Files.list(logDir)
    val all = try ls.iterator().asScala
        .map(p => p.getFileName.toString -> p)
        .filter { case (n, _) => n.takeWhile(_ != '.').forall(_.isDigit) && n.nonEmpty }
        .toList
      finally ls.close()
    (all.collect { case (n, p) if n.endsWith(".compact") =>
        (n.stripSuffix(".compact").toLong, p) },
      all.collect { case (n, p) if !n.contains('.') => (n.toLong, p) })
  }

  /** Added-file paths out of one sink-log file (v1 line format: a version
    * header then one JSON `SinkFileStatus` per line). */
  private def sinkLogPaths(log: java.nio.file.Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val re = """"path":"((?:[^"\\]|\\.)*)"""".r
    java.nio.file.Files.readAllLines(log).asScala.iterator
      .flatMap(l => re.findFirstMatchIn(l).map(_.group(1)))
      .map(_.replace("\\/", "/").replace("\\\\", "\\")) // JSON unescape (paths)
      .toList
  }

  /** Stream rows INTO a maintained z-ordered table
    * ([[graft.ops.Layout.zorderInit]] must have run): each micro-batch
    * blind-appends to the landing dir EXACTLY ONCE
    * ([[graft.ops.Layout.zorderAppendBatch]] — intent/commit log, crash
    * rollback, committed-replay no-op), and every `maintainEvery` batches
    * one incremental [[graft.ops.Layout.zorderMaintain]] folds the landing
    * into the curve (crash-safe by the generation protocol; a crashed
    * maintain simply re-folds on the next cadence hit). This closes the
    * lakehouse story the way the gate/block loops closed curation: the
    * write path stays O(batch) — clustering cost is paid only by the
    * maintenance cadence, never by arrival. Returns the started query;
    * the caller owns its lifecycle. */
  def streamToZorder(rows: DataFrame, path: String, checkpoint: String,
      maintainEvery: Int = 4): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        graft.ops.Layout.zorderAppendBatch(s, batch, path, id)
        if (maintainEvery > 0 && (id + 1) % maintainEvery == 0) {
          graft.ops.Layout.zorderMaintain(s, path); ()
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** STREAMING TAKEDOWN loop over a maintained z-table: each micro-batch
    * of the `keys` stream (one integral column) is applied as a
    * MERGE-ON-READ delete (`zorderDeleteVectoredByKey` — tombstones only,
    * zero data files touched), so takedown latency is one tiny DV commit
    * regardless of table size; physical erasure runs on the operator's
    * cadence via `materializeEvery` (a [[graft.ops.Layout
    * .zorderDvMaterialize]] every N batches — rewrites only tombstoned
    * files). Exactly-once comes FREE here, no intent log needed: a
    * replayed batch re-deletes keys whose live rows are already
    * tombstoned, and a repeat vectored delete is an exact no-op by
    * construction — the idempotence the DV design buys the streaming
    * seam. */
  def takedownStream(keys: DataFrame, path: String, keyCol: String,
      checkpoint: String,
      materializeEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    keys.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        // NULL keys (or values that cast to null) never match a delete —
        // the same contract as the engine's delete paths; without the
        // filter, getLong(0) on a null row would kill the whole stream
        val kc = org.apache.spark.sql.functions.col(keyCol).cast("long")
        val vs = batch.select(kc).filter(kc.isNotNull).distinct()
          .collect().map(_.getLong(0)).toSeq // one takedown batch: bounded
        if (vs.nonEmpty) {
          graft.ops.Layout.zorderDeleteVectoredByKey(s, path, keyCol, vs); ()
        }
        if (materializeEvery > 0 && (id + 1) % materializeEvery == 0) {
          graft.ops.Layout.zorderDvMaterialize(s, path); ()
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** STREAMING CDC FOLLOWER loop over a maintained z-table pair: each
    * micro-batch of `ticks` (its CONTENT is ignored — the stream is only
    * the polling cadence; a rate source, a file stream over the primary's
    * landing dir, or any other ticker works) runs ONE
    * [[graft.ops.Layout.zorderCdcApply]] poll, pulling the primary's
    * committed net changes past the follower's cursor and applying them
    * delete-then-insert. Exactly-once rides the follower's CURSOR +
    * POLL-INTENT protocol, not the stream checkpoint: a replayed tick
    * merely re-polls (no new commits → cursor stasis, zero mutations),
    * and a poll killed mid-apply replays pinned to its intent generation
    * — so kill/restart at ANY point converges to the primary's committed
    * state with net exactly one copy per row (EventStreamsSpec pins the
    * kill/restart and replay-no-op paths, same discipline as the other
    * exactly-once loops here). Keys stay distributed above
    * `collectThreshold` feed rows, so a bulk restatement on the primary
    * never materializes on the follower's driver. */
  def cdcFollowStream(ticks: DataFrame, primaryPath: String,
      followerPath: String, keyCol: String, checkpoint: String,
      collectThreshold: Long = 100000L): org.apache.spark.sql.streaming.StreamingQuery =
    ticks.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        graft.ops.Layout.zorderCdcApply(s, primaryPath, followerPath,
          keyCol, collectThreshold)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** STREAMING JOURNAL→Z COMPACTION loop over a mutable graph warehouse
    * (r16 — the maintenance cadence the reference runs implicitly on
    * every write, graphydb.py:1325-1326, as an exactly-once stream):
    * each micro-batch of `ticks` (content ignored — a file stream over
    * `<path>/journal` makes arrival itself the trigger; any ticker
    * works) runs ONE [[graft.engine.WarehouseGraph
    * .compactZorderIncremental]], folding the journal tail past the
    * `zseq` marker into the maintained z-tables in O(churn). Exactly-
    * once rides the MARKER, not the stream checkpoint: a replayed tick
    * re-polls (caught-up marker → zero mutations), and a tick killed
    * mid-increment replays the same tail — the re-delete tombstones the
    * crashed copies, the re-insert lands once (the increment's own
    * idempotence argument; EventStreamsSpec pins kill/restart and
    * replay-no-op, same discipline as the other exactly-once loops
    * here). Uids stay DISTRIBUTED above `collectThreshold` — a bulk
    * journal restatement never materializes on the driver.
    *
    * `optimizeEvery` > 0 adds the advisor AUTO-PILOT to the cadence:
    * every N batches, [[graft.ops.Layout.zorderOptimize]] drains the
    * census on BOTH z-tables (bin-pack after churny increments,
    * tombstone materialize, bloom refresh — bounded steps), so the
    * mutable graph warehouse self-maintains; maintenance never changes
    * answers (EventStreamsSpec pins chain equality across it). */
  def journalCompactStream(ticks: DataFrame, warehousePath: String,
      checkpoint: String, collectThreshold: Long = 10000L,
      optimizeEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    ticks.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        val wh = new graft.engine.WarehouseGraph(s, warehousePath)
        wh.compactZorderIncremental(collectThreshold)
        if (optimizeEvery > 0 && (id + 1) % optimizeEvery == 0) {
          val zfts = Seq(s"$warehousePath/zfts", s"$warehousePath/zftse")
            .filter(p => graft.ops.Layout.currentGen(p).isDefined)
          (Seq(s"$warehousePath/znodes", s"$warehousePath/zedges") ++ zfts)
            .foreach { p =>
              var guard = 0
              var step = graft.ops.Layout.zorderOptimize(s, p)
              while (step.isDefined && guard < 16) {
                guard += 1
                step = graft.ops.Layout.zorderOptimize(s, p)
              }
              require(step.isEmpty,
                s"z-table auto-pilot did not converge at $p")
            }
          // the drain's maintains/materializes advanced generations
          // OUTSIDE the increment — re-pin the snapshot pointer so the
          // pinned cut tracks the restated (logically identical) state
          // and the superseded generations can age out
          wh.refreshZsnap()
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Convenience memory-sink runner for tests/demos: processes all available
    * input and returns the in-memory result table. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Update()): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
