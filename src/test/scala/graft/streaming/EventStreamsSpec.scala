package graft.streaming

import graft.SparkSpec
import graft.ops.Events
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

// top-level so Spark can derive an Encoder without an outer-instance scope
final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)
final case class Doc(doc_id: Long, ts: Timestamp, text: String)
final case class Vec(vec_id: Long, embedding: Array[Float])

/** Streaming surface semantics pinned against batch twins using
  * MemoryStream micro-batches (SURVEY §2.9). */
class EventStreamsSpec extends AnyFunSuite with SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val sample = Seq(
    Ev(1, ts(0), 1, "view", 1.0), Ev(2, ts(5), 1, "click", 2.0),
    Ev(3, ts(10), 2, "view", 3.0), Ev(4, ts(40), 1, "purchase", 4.0),
    Ev(5, ts(59), 2, "view", 5.0))

  test("windowed counts: stream (AvailableNow) ≡ batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(sample: _*)
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.windowedCounts(mem.toDF(), "1 hour"), "win_counts",
      org.apache.spark.sql.streaming.OutputMode.Update())
    val batch = EventStreams.windowedCounts(sample.toDF(), "1 hour")
    val got = streamed.select("window_start", "event_type", "cnt").collect().toSet
    val want = batch.select("window_start", "event_type", "cnt").collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("deterministic sampling works unchanged on streams (stateless filters)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // hash-threshold sampling and fractional replication are pure row-wise
    // transforms: applied to a stream they select/replicate EXACTLY the
    // rows the batch twin does — reproducible curation over a live feed
    val docs = (1L to 200L).map(i => Doc(i, ts((i % 60).toInt), s"text $i"))
    val mem = MemoryStream[Doc]
    mem.addData(docs: _*)
    val streamed = EventStreams.runToMemory(spark,
      graft.ops.Sampling.hashSample(mem.toDF(), "doc_id", 0.3), "stream_sample",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batch = graft.ops.Sampling.hashSample(docs.toDF(), "doc_id", 0.3)
    assert(streamed.select("doc_id").collect().map(_.getLong(0)).toSet ==
      batch.select("doc_id").collect().map(_.getLong(0)).toSet)
    val streamedFrac = EventStreams.runToMemory(spark,
      graft.ops.Sampling.weightedMixFractional(
        mem.toDF().withColumn("shard", col("doc_id") % 2), "shard", "doc_id",
        Map("0" -> 1.5, "1" -> 0.5)),
      "stream_frac", org.apache.spark.sql.streaming.OutputMode.Append())
    val batchFrac = graft.ops.Sampling.weightedMixFractional(
      docs.toDF().withColumn("shard", col("doc_id") % 2), "shard", "doc_id",
      Map("0" -> 1.5, "1" -> 0.5))
    assert(streamedFrac.select("doc_id", "copy_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      batchFrac.select("doc_id", "copy_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(streamedFrac.count() > 0)
  }

  test("session windows produce gap-separated sessions") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(sample: _*)
    // session-window aggregation only supports Append/Complete; Complete
    // emits all sessions regardless of watermark progress
    val sess = EventStreams.runToMemory(spark,
      EventStreams.sessionWindows(mem.toDF(), gap = "30 minutes"), "sessions",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    // user 1: events at 0,5 then 40 → 2 sessions; user 2: 10 then 59 → 2
    val perUser = sess.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUser == Map(1L -> 2L, 2L -> 2L))
    // agrees with the batch sessionizer
    val batch = Events.sessionStats(sample.toDF(), gapSeconds = 1800)
    val batchSessions = batch.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batchSessions == Map(1L -> 2L, 2L -> 2L))
  }

  test("file stream over the REAL driver events parquet ≡ batch (schema-adaptive loader)") {
    // the streaming twin of TestdataSmokeSpec: the synthetic MemoryStream
    // cases pin semantics, but only tailing the driver's actual file proves
    // the streaming surface survives the generator's physical-type drift
    // (the r7 events-loader regression class — ts as NANOS/NTZ/timestamp)
    val path = "/root/testdata/sf0.001/events.parquet"
    assume(new java.io.File(path).exists, s"driver testdata missing at $path")
    val stream = EventStreams.eventFileStream(spark, path)
    val batch = EventStreams.normalizeEventTs(spark.read.parquet(path))
    assert(stream.isStreaming && !batch.isStreaming)
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType, "normalized through the shared branch")

    val streamedWin = EventStreams.runToMemory(spark,
      EventStreams.windowedCounts(stream, "1 hour"), "real_events_win",
      org.apache.spark.sql.streaming.OutputMode.Update())
      .select("window_start", "event_type", "cnt", "value_sum").collect().toSet
    val batchWin = EventStreams.windowedCounts(batch, "1 hour")
      .select("window_start", "event_type", "cnt", "value_sum").collect().toSet
    assert(streamedWin.nonEmpty && streamedWin == batchWin,
      s"stream/batch windowed counts diverged on the real file (${streamedWin.size}/${batchWin.size} rows)")

    val streamedSess = EventStreams.runToMemory(spark,
      EventStreams.sessionWindows(stream, gap = "30 minutes"), "real_events_sess",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .select("session_start", "session_end", "user_id", "events").collect().toSet
    val batchSess = EventStreams.sessionWindows(batch, gap = "30 minutes")
      .select("session_start", "session_end", "user_id", "events").collect().toSet
    assert(streamedSess.nonEmpty && streamedSess == batchSess,
      s"stream/batch sessions diverged on the real file (${streamedSess.size}/${batchSess.size} rows)")
  }

  test("sliding windows emit one row per covering window") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(sample: _*)
    val slid = EventStreams.runToMemory(spark,
      EventStreams.slidingCounts(mem.toDF(), length = "1 hour", slide = "30 minutes"),
      "sliding", org.apache.spark.sql.streaming.OutputMode.Update())
    // event at 10:05 belongs to windows starting 09:30 and 10:00
    val viewWindows = slid.filter(col("event_type") === "view")
      .select("window_start").collect().map(_.getTimestamp(0).toString).toSet
    assert(viewWindows.size >= 2, s"expected overlapping windows, got $viewWindows")
    val total = slid.filter(col("event_type") === "view")
      .agg(org.apache.spark.sql.functions.sum("cnt")).head().getLong(0)
    assert(total == 6L, "3 view events x 2 covering windows each")
  }

  test("mapGroupsWithState running totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.runningUserTotals(spark, mem.toDF())
      .writeStream.format("memory").queryName("running")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    mem.addData(sample.take(3): _*); q.processAllAvailable()
    mem.addData(sample.drop(3): _*); q.processAllAvailable()
    q.stop()
    val last = spark.table("running")
      .groupBy("user_id").agg(max("events").as("events"), max("value_sum").as("value_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(last == Set((1L, 3L, 7.0), (2L, 2L, 8.0)))
  }

  test("streaming dedup emits first copy per content key across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = EventStreams.dedupStream(mem.toDF(), "ts", Seq("text"), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    mem.addData(
      Doc(1, ts(0), "alpha body"), Doc(2, ts(1), "beta body"),
      Doc(3, ts(2), "alpha body")) // dup of doc 1 in the same batch
    q.processAllAvailable()
    mem.addData(
      Doc(4, ts(3), "alpha body"), // dup of doc 1 across batches
      Doc(5, ts(4), "gamma body"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup_stream").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(rows.map(_._2) == Set("alpha body", "beta body", "gamma body"),
      "one row per distinct text")
    assert(rows == Set((1L, "alpha body"), (2L, "beta body"), (5L, "gamma body")),
      "the FIRST-arriving copy is the one emitted")
  }

  test("stream-stream interval join ≡ batch (views before purchase, bounded)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(sample: _*)
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.viewPurchaseJoin(mem.toDF(), interval = "45 minutes"), "vp_join",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = streamed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // purchase 4 (user 1, 10:40): only view 1 (10:00) is within 45 minutes
    assert(got == Set((4L, 1L, 1L)))
    // the same transform on a batch frame (watermarks eliminated) agrees
    val batch = EventStreams.viewPurchaseJoin(sample.toDF(), interval = "45 minutes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == got)
  }

  test("streaming ingest dedups against the persisted signature store (stream ≡ batch)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // corpus owns a store; new docs ARRIVE as a stream split across two
    // micro-batches — every row is checked on arrival via stateless
    // signatures + stream-static joins against the bucketed store tables
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val corpus = Seq((1L, base),
      (3L, "the quick brown fox sleeps all day long under a warm summer sun here"),
      (4L, "completely different words about spark engines and parquet columnar files"))
      .toDF("doc_id", "text")
    graft.ops.Dedup.writeSignatureStore(spark, corpus, "doc_id", "text", "graft_stream_store")
    val incoming = Seq(
      Doc(2L, ts(1), base.replace("today", "tonight")),
      Doc(5L, ts(2), base),
      Doc(6L, ts(3), "totally fresh content with no overlap whatsoever to anything stored"),
      Doc(7L, ts(4), "too short")) // no 3-shingle signature → filtered, not crashed
    val mem = MemoryStream[Doc]
    mem.addData(incoming.take(2): _*)
    mem.addData(incoming.drop(2): _*)
    val streamed = EventStreams.runToMemory(spark,
      graft.ops.Dedup.dedupIncrementStream(spark, mem.toDF(), "doc_id", "text",
        "graft_stream_store", minEstimate = 0.5),
      "stream_dedup_inc", org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val batch = graft.ops.Dedup.dedupIncrement(spark,
      incoming.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
      "doc_id", "text", "graft_stream_store", minEstimate = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(streamed.nonEmpty && streamed == batch,
      s"dedup-on-arrival must equal the batch increment: $streamed vs $batch")
    assert(streamed((1L, 5L)) == 1.0)
  }

  test("dedupIngestStream: exactly-once store maintenance — kill/restart, crash rollback, replay no-op") {
    import scala.jdk.CollectionConverters._
    import graft.ops.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 3 === 0)
    val shard1 = docs.filter(col("doc_id") % 3 === 1)
    val shard2 = docs.filter(col("doc_id") % 3 === 2)
    val name = "graft_ingest_loop"
    Dedup.writeSignatureStore(spark, corpus, "doc_id", "text", name)

    val tmp = java.nio.file.Files.createTempDirectory("ingest_loop")
    val src = tmp.resolve("src")
    val pairsDir = s"$tmp/pairs"; val ckpt = s"$tmp/ckpt"
    java.nio.file.Files.createDirectories(src)
    def land(df: org.apache.spark.sql.DataFrame, fname: String): Unit = {
      val stage = tmp.resolve(s"stage_$fname")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .next()
      java.nio.file.Files.move(part, src.resolve(fname))
    }
    def runStream(): Unit = Dedup.dedupIngestStream(spark,
        spark.readStream.schema(docs.schema).parquet(src.toString),
        "doc_id", "text", name, pairsDir, ckpt, minEstimate = 0.5)
      .awaitTermination()
    def sigRows(t: String) = spark.table(t).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet

    // run 1 drains shard1, then the query STOPS (kill at a batch boundary);
    // run 2 restarts from the checkpoint and processes ONLY the new file
    land(shard1, "f1.parquet")
    runStream()
    val afterRun1 = sigRows(s"${name}_sigs")
    land(shard2, "f2.parquet")
    runStream()

    // batch twin: the same corpus → shard1 → shard2 sequence through the
    // documented batch workflow (increment + within-batch pairs → accept →
    // append): banned = every batch member of a corpus pair PLUS the
    // greater side of each within-batch pair (min id survives) — the
    // applyIngestBatch acceptance rule re-derived from public primitives
    val twin = "graft_ingest_twin"
    Dedup.writeSignatureStore(spark, corpus, "doc_id", "text", twin)
    def acceptAppend(shard: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val cross = Dedup.dedupIncrement(spark, shard, "doc_id", "text", twin,
          minEstimate = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val inner = Dedup.estimateJaccardBySignature(shard, "doc_id", "text",
          Dedup.lshCandidates(shard, "doc_id", "text"), minEstimate = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val banned = cross.flatMap(t => Seq(t._1, t._2)) ++ inner.map(_._2)
      val acc = if (banned.isEmpty) shard
        else shard.filter(!col("doc_id").isin(banned.toSeq: _*))
      if (acc.count() > 0) Dedup.appendSignatureStore(spark, acc, "doc_id", "text", twin)
      cross ++ inner
    }
    val twinPairs = acceptAppend(shard1) ++ acceptAppend(shard2)
    assert(sigRows(s"${name}_sigs") == sigRows(s"${twin}_sigs"),
      "streamed store must equal the batch pipeline's store — no row lost or doubled")
    assert(sigRows(s"${name}_sigs").size > afterRun1.size,
      "run 2 actually appended shard2 content")
    val landedPairs = spark.read.parquet(pairsDir)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(landedPairs == twinPairs, "landed per-batch pair dirs ≡ batch pairs")

    // crash injection at the exactly-once seam: restore batch 1 to the
    // "append ran, commit marker didn't land" state (the commit file IS the
    // renamed intent, so the rename reproduces it bit-for-bit), then replay
    // — rollback removes the orphaned append, the re-apply restores it
    val logDir = graft.engine.WarehouseMeta.tableLocation(spark, s"${name}_ingest_log")
    val commits = java.nio.file.Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".commit")).toList
    val last = commits.maxBy(_.getFileName.toString.stripSuffix(".commit").toLong)
    val bid = last.getFileName.toString.stripSuffix(".commit").toLong
    java.nio.file.Files.move(last, logDir.resolve(s"$bid.intent"))
    val before = sigRows(s"${name}_sigs")
    Dedup.applyIngestBatch(spark, shard2, bid, "doc_id", "text", name,
      pairsDir, minEstimate = 0.5)
    assert(sigRows(s"${name}_sigs") == before,
      "crashed-append replay must roll back then restore the exact rows")
    // replaying a COMMITTED batch is a no-op
    val again = Dedup.applyIngestBatch(spark, shard2, bid, "doc_id", "text",
      name, pairsDir, minEstimate = 0.5)
    assert(again == -1L && sigRows(s"${name}_sigs") == before,
      "committed batch replays must skip")
    graft.engine.WarehouseMeta.deleteRecursively(tmp)
  }

  test("annIngestStream: exactly-once vector-index maintenance — kill/restart, crash rollback, replay no-op") {
    import scala.jdk.CollectionConverters._
    import graft.ops.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") % 3 === 0)
    val shard1 = emb.filter(col("vec_id") % 3 === 1)
    val shard2 = emb.filter(col("vec_id") % 3 === 2)
    val name = "graft_vingest_loop"
    val minCos = 0.3; val radius = 1
    Similarity.ensureVectorIndex(spark, corpus, "vec_id", "embedding", name,
      fingerprint = s"vloop-${System.nanoTime()}", bits = 4)

    val tmp = java.nio.file.Files.createTempDirectory("vingest_loop")
    val src = tmp.resolve("src")
    val cands = s"$tmp/cands"; val ckpt = s"$tmp/ckpt"
    java.nio.file.Files.createDirectories(src)
    def land(df: org.apache.spark.sql.DataFrame, fname: String): Unit = {
      val stage = tmp.resolve(s"stage_$fname")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      java.nio.file.Files.move(part, src.resolve(fname))
    }
    def runStream(): Unit = Similarity.annIngestStream(spark,
        spark.readStream.schema(emb.schema).parquet(src.toString),
        "vec_id", "embedding", name, cands, ckpt, minCos, radius)
      .awaitTermination()
    def indexIds(t: String) = spark.table(t).select("id")
      .collect().map(_.getLong(0)).toSet

    // two runs over one checkpoint = kill at a batch boundary + restart
    land(shard1, "f1.parquet"); runStream()
    val afterRun1 = indexIds(s"${name}_vlsh")
    land(shard2, "f2.parquet"); runStream()

    // twin: the same shard sequence applied DIRECTLY (no stream) against a
    // fresh index — the stream must add exactly the same ids
    val twin = "graft_vingest_twin"
    Similarity.ensureVectorIndex(spark, corpus, "vec_id", "embedding", twin,
      fingerprint = s"vtwin-${System.nanoTime()}", bits = 4)
    val twinCands = s"$tmp/twin_cands"
    Similarity.applyVectorIngestBatch(spark, shard1, 0L, "vec_id", "embedding",
      twin, twinCands, minCos, radius)
    Similarity.applyVectorIngestBatch(spark, shard2, 1L, "vec_id", "embedding",
      twin, twinCands, minCos, radius)
    assert(indexIds(s"${name}_vlsh") == indexIds(s"${twin}_vlsh"),
      "streamed index must equal the directly-applied twin — no row lost or doubled")
    assert(indexIds(s"${name}_vlsh").size > afterRun1.size,
      "run 2 actually indexed shard2 vectors")
    def candRows(p: String) = spark.read.parquet(p)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamedCands = candRows(cands)
    assert(streamedCands.nonEmpty && streamedCands == candRows(twinCands),
      "landed candidate dirs ≡ twin candidates (threshold actually fired)")

    // crash injection at the exactly-once seam (same recipe as the dedup
    // loop): batch 1 back to intent state, replay restores the exact rows
    val logDir = graft.engine.WarehouseMeta.tableLocation(spark, s"${name}_vingest_log")
    val last = java.nio.file.Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".commit")).toList
      .maxBy(_.getFileName.toString.stripSuffix(".commit").toLong)
    val bid = last.getFileName.toString.stripSuffix(".commit").toLong
    java.nio.file.Files.move(last, logDir.resolve(s"$bid.intent"))
    val before = indexIds(s"${name}_vlsh")
    Similarity.applyVectorIngestBatch(spark, shard2, bid, "vec_id", "embedding",
      name, cands, minCos, radius)
    assert(indexIds(s"${name}_vlsh") == before,
      "crashed-append replay must roll back then restore the exact ids")
    val again = Similarity.applyVectorIngestBatch(spark, shard2, bid,
      "vec_id", "embedding", name, cands, minCos, radius)
    assert(again == -1L && indexIds(s"${name}_vlsh") == before,
      "committed batch replays must skip")
    graft.engine.WarehouseMeta.deleteRecursively(tmp)
  }

  test("streaming ANN candidates against the persisted vector index ≡ batch scored set") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val corpus = Seq(
      (10L, Array(1.00f, 0.02f, 0.01f)), (11L, Array(0.98f, 0.05f, 0.03f)),
      (12L, Array(0.02f, 1.00f, 0.02f)), (13L, Array(0.01f, 0.03f, 1.00f)))
      .toDF("vec_id", "embedding")
    graft.ops.Similarity.ensureVectorIndex(spark, corpus, "vec_id", "embedding",
      "graft_stream_vidx", "svfp-1", bits = 3)
    // queries arrive across two micro-batches (ids distinct from the corpus)
    val mem = MemoryStream[Vec]
    mem.addData(Vec(100L, Array(0.99f, 0.03f, 0.02f)))
    mem.addData(Vec(101L, Array(0.03f, 0.98f, 0.01f)))
    val streamed = EventStreams.runToMemory(spark,
      graft.ops.Similarity.annCandidatesStream(spark, mem.toDF(), "vec_id", "embedding",
        "graft_stream_vidx"),
      "stream_ann", org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // batch twin: same queries through the same index, pre-top-k scored set
    val queries = Seq((100L, Array(0.99f, 0.03f, 0.02f)), (101L, Array(0.03f, 0.98f, 0.01f)))
      .toDF("vec_id", "embedding")
    val batch = graft.ops.Similarity.annCandidatesStream(spark, queries,
      "vec_id", "embedding", "graft_stream_vidx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"stream candidates must equal batch: $streamed vs $batch")
    // each query found its cluster's corpus members with exact cosines
    assert(streamed.exists { case (q, id, c) => q == 100L && Set(10L, 11L)(id) && c > 0.99 })

    // multi-probe on the ingest path: radius grows the candidate set
    // monotonically and radius=bits probes every bucket = full scored scan
    val mem2 = MemoryStream[Vec]
    mem2.addData(Vec(102L, Array(0.60f, 0.58f, 0.02f)))
    val r1 = EventStreams.runToMemory(spark,
      graft.ops.Similarity.annCandidatesStream(spark, mem2.toDF(), "vec_id",
        "embedding", "graft_stream_vidx", radius = 1),
      "stream_ann_mp1", org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    val mem3 = MemoryStream[Vec]
    mem3.addData(Vec(102L, Array(0.60f, 0.58f, 0.02f)))
    val rFull = EventStreams.runToMemory(spark,
      graft.ops.Similarity.annCandidatesStream(spark, mem3.toDF(), "vec_id",
        "embedding", "graft_stream_vidx", radius = 3),
      "stream_ann_mp3", org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(r1.subsetOf(rFull), "bigger radius only adds candidates")
    assert(rFull.map(_._1) == Set(10L, 11L, 12L, 13L),
      s"radius = bits must score the whole corpus, got $rFull")
  }

  test("streamToDateLake: micro-batches land day-partitioned; range reads prune; ≡ batch lake") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def ev(id: Long, ts: String, u: Long) =
      Ev(id, Timestamp.valueOf(ts), u, "view", 1.0)
    val rows = Seq(
      ev(1L, "2026-03-01 10:00:00", 1), ev(2L, "2026-03-02 10:00:00", 2),
      ev(3L, "2026-03-02 11:00:00", 1), ev(4L, "2026-03-03 10:00:00", 3))
    val mem = MemoryStream[Ev]
    val dir = java.nio.file.Files.createTempDirectory("graft_slake")
    // two separate AvailableNow runs over one checkpoint → two REAL
    // committed micro-batches (0 and 1) in the sink log; the late 03-02
    // event lands in the later batch
    mem.addData(rows.take(2): _*)
    EventStreams.streamToDateLake(mem.toDF(), s"$dir/lake", s"$dir/ckpt")
      .awaitTermination()
    mem.addData(rows.drop(2): _*)
    EventStreams.streamToDateLake(mem.toDF(), s"$dir/lake", s"$dir/ckpt")
      .awaitTermination()
    // same day directories a batch writeDateLake produces
    val dirs = new java.io.File(s"$dir/lake").listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filterNot(_ == "_spark_metadata").toSet // the file-sink's commit log
    assert(dirs == Set("dt=2026-03-01", "dt=2026-03-02", "dt=2026-03-03"))
    // a range read prunes to the one day, and the late event is IN it
    val read = graft.ops.Events.readDateLake(spark, s"$dir/lake",
      "2026-03-02", "2026-03-02")
    val scan = read.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.selectedPartitions.partitionCount == 1)
    assert(read.select("event_id").collect().map(_.getLong(0)).toSet == Set(2L, 3L),
      "late events land in their event-time day, not their arrival batch")
    // batch maintenance must REFUSE a sink-logged lake: readers trust only
    // the commit log, so a batch rewrite would produce invisible files
    val e = intercept[IllegalArgumentException] {
      graft.ops.Events.compactDateLake(spark, s"$dir/lake", "2026-03-02", "2026-03-02")
    }
    assert(e.getMessage.contains("_spark_metadata"))

    // TIME TRAVEL via the sink log the stream already wrote: as of batch 0
    // the late 03-02 event (landed by batch 1) does not exist yet; as of
    // batch 1 the lake equals the full read. The landing log names both.
    val landings = EventStreams.lakeLandings(spark, s"$dir/lake")
      .collect().map(r => r.getLong(0)).sorted
    assert(landings.toSeq == Seq(0L, 1L), "one landing row per micro-batch")
    val asOf0 = EventStreams.readDateLakeAsOf(spark, s"$dir/lake", 0L,
      "2026-03-01", "2026-03-03")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(asOf0 == Set(1L, 2L), "as-of batch 0: only batch 0's events exist")
    val asOf1 = EventStreams.readDateLakeAsOf(spark, s"$dir/lake", 1L,
      "2026-03-01", "2026-03-03")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(asOf1 == Set(1L, 2L, 3L, 4L), "as-of the last batch ≡ the full lake")
    // the dt day-range contract holds under time travel too
    val asOf1Day = EventStreams.readDateLakeAsOf(spark, s"$dir/lake", 1L,
      "2026-03-02", "2026-03-02")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(asOf1Day == Set(2L, 3L))
  }

  test("quality quarantine channel runs unchanged on a stream (source-agnostic, stateless)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rules = Seq(
      graft.ops.Quality.inSet("type_known", col("event_type"),
        Seq("view", "click", "purchase")),
      graft.ops.Quality.inRange("value_0_100", col("value"), 0.0, 100.0))
    val mem = MemoryStream[Ev]
    mem.addData(Ev(1L, Timestamp.valueOf("2026-04-01 10:00:00"), 1, "view", 5.0))
    mem.addData(
      Ev(2L, Timestamp.valueOf("2026-04-01 10:01:00"), 2, "bogus", 5.0),
      Ev(3L, Timestamp.valueOf("2026-04-01 10:02:00"), 3, "click", 500.0))
    val streamed = EventStreams.runToMemory(spark,
      graft.ops.Quality.violations(mem.toDF(), rules), "stream_quality",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("broken_rules"))
      .toMap
    assert(streamed == Map(2L -> "type_known", 3L -> "value_0_100"),
      "per-row quarantine is pure map work, so it streams as-is")
  }

  test("segmentIngestStream: exactly-once segment store — stream ≡ batch paragraphDedup, crash rollback, replay no-op") {
    import scala.jdk.CollectionConverters._
    import graft.ops.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // ids ascend across batches, so (batch, doc, idx) order == (doc, idx)
    // order and the stream must reproduce batch paragraphDedup exactly
    val cut = docs.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0).toLong
    val shard1 = docs.filter(col("doc_id") < cut)
    val shard2 = docs.filter(col("doc_id") >= cut)
    val name = "graft_seg_loop"
    TextAnalysis.resetSegmentStore(spark, name)

    val tmp = java.nio.file.Files.createTempDirectory("seg_loop")
    val src = tmp.resolve("src"); java.nio.file.Files.createDirectories(src)
    val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    def land(df: org.apache.spark.sql.DataFrame, fname: String): Unit = {
      val stage = tmp.resolve(s"stage_$fname")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      java.nio.file.Files.move(part, src.resolve(fname))
    }
    def runStream(): Unit = TextAnalysis.segmentIngestStream(spark,
        spark.readStream.schema(docs.schema).parquet(src.toString),
        "doc_id", "text", name, outDir, ckpt, window = 4)
      .awaitTermination()
    def keys() = spark.table(s"${name}_segs").collect().map(_.getString(0)).toSet

    // run 1 drains shard1, stops at the batch boundary; run 2 restarts from
    // the checkpoint and processes only the new file
    land(shard1, "f1.parquet"); runStream()
    val keysAfter1 = keys()
    land(shard2, "f2.parquet"); runStream()
    assert(keys().size > keysAfter1.size, "run 2 appended shard2's new segments")

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "total_segments", "kept_segments", "clean_text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val streamed = rows(spark.read.parquet(outDir))
    val batch = rows(TextAnalysis.paragraphDedup(docs, "doc_id", "text", window = 4))
    assert(streamed == batch,
      "streamed per-batch outputs must equal batch paragraphDedup row-for-row")
    // the store is exactly the corpus' distinct segment keys
    val distinctKeys = spark.sql(
      s"SELECT COUNT(DISTINCT key) FROM (SELECT md5(chunk) AS key FROM (" +
        "SELECT explode(transform(sequence(0, greatest(size(split(text, ' ')) - 1, 0), 4), " +
        "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 4)))) AS chunk " +
        "FROM parquet.`/root/testdata/sf0.001/documents.parquet`))").head().getLong(0)
    assert(keys().size.toLong == distinctKeys, "store = distinct corpus segment keys")

    // crash at the exactly-once seam: restore the last batch to the
    // "append ran, commit didn't land" state, then replay — rollback
    // removes the orphaned append, the re-apply restores the same rows
    val logDir = graft.engine.WarehouseMeta.tableLocation(spark, s"${name}_ingest_log")
    val last = java.nio.file.Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".commit"))
      .maxBy(_.getFileName.toString.stripSuffix(".commit").toLong)
    val bid = last.getFileName.toString.stripSuffix(".commit").toLong
    java.nio.file.Files.move(last, logDir.resolve(s"$bid.intent"))
    val before = keys()
    TextAnalysis.applySegmentIngestBatch(spark, shard2, bid, "doc_id", "text",
      name, outDir, window = 4)
    assert(keys() == before,
      "crashed-append replay must roll back then restore the exact keys")
    // replaying a COMMITTED batch is a no-op
    assert(TextAnalysis.applySegmentIngestBatch(spark, shard2, bid, "doc_id",
      "text", name, outDir, window = 4) == -1L)
  }

  test("gateIngestStream: gate-on-arrival — stream ≡ batch gopher gate, audit sums, crash rollback, replay no-op") {
    import scala.jdk.CollectionConverters._
    import graft.ops.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val cut = docs.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0).toLong
    val shard1 = docs.filter(col("doc_id") < cut)
    val shard2 = docs.filter(col("doc_id") >= cut)
    val name = "graft_gate_loop"
    TextAnalysis.resetGateStore(spark, name)
    // t19's fixture-scaled thresholds, so every rule actually varies here
    val stop = Seq("the", "a", "of", "and", "is")
    def gateArgs(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.gopherRules(df, "doc_id", "text",
        minWords = 30, maxWords = 90, minMeanWordLen = 4.0,
        maxMeanWordLen = 4.9, minAlphaFrac = 0.8, minStopwords = 2,
        stopwords = stop)

    val tmp = java.nio.file.Files.createTempDirectory("gate_loop")
    val src = tmp.resolve("src"); java.nio.file.Files.createDirectories(src)
    val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    def land(df: org.apache.spark.sql.DataFrame, fname: String): Unit = {
      val stage = tmp.resolve(s"stage_$fname")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      java.nio.file.Files.move(part, src.resolve(fname))
    }
    def runStream(): Unit = TextAnalysis.gateIngestStream(spark,
        spark.readStream.schema(docs.schema).parquet(src.toString),
        "doc_id", "text", name, outDir, ckpt,
        minWords = 30, maxWords = 90, minMeanWordLen = 4.0,
        maxMeanWordLen = 4.9, minAlphaFrac = 0.8, minStopwords = 2,
        stopwords = stop)
      .awaitTermination()
    def audit() = TextAnalysis.readGateAudit(spark, name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet

    // run 1 drains shard1, stops at the batch boundary; run 2 restarts
    // from the checkpoint and processes only the new file
    land(shard1, "f1.parquet"); runStream()
    assert(audit().size == 1, "one committed batch, one audit row")
    land(shard2, "f2.parquet"); runStream()
    assert(audit().size == 2, "run 2 appended exactly one more audit row")

    // landed survivors (with their FULL original columns) ≡ the batch gate
    val streamed = spark.read.parquet(outDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batchPass = docs.join(
        gateArgs(docs).filter(col("pass_gopher")).select("doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batchPass,
      "streamed landed docs must equal the batch pipeline's gopher survivors")

    // audit sums ≡ the batch pipeline's per-rule reject counts
    val b = gateArgs(docs).agg(
        count(lit(1)), sum(when(col("pass_gopher"), 1L).otherwise(0L)),
        sum(when(!col("ok_word_count"), 1L).otherwise(0L)),
        sum(when(!col("ok_mean_word_len"), 1L).otherwise(0L)),
        sum(when(!col("ok_alpha"), 1L).otherwise(0L)),
        sum(when(!col("ok_stopwords"), 1L).otherwise(0L))).head()
    val sums = audit().toSeq.map(a => (a._2, a._3, a._4, a._5, a._6, a._7))
      .reduce((x, y) => (x._1 + y._1, x._2 + y._2, x._3 + y._3,
        x._4 + y._4, x._5 + y._5, x._6 + y._6))
    assert(sums == ((b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3),
      b.getLong(4), b.getLong(5))),
      "audit history sums to the whole-corpus rule counts")
    assert(sums._1 == docs.count(), "every ingested doc is audited once")

    // crash at the exactly-once seam: restore the last batch to the
    // "append ran, commit didn't land" state, then replay — rollback
    // removes the orphaned audit row + landing, the re-apply restores them
    val logDir = graft.engine.WarehouseMeta.tableLocation(spark, s"${name}_ingest_log")
    val last = java.nio.file.Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".commit"))
      .maxBy(_.getFileName.toString.stripSuffix(".commit").toLong)
    val bid = last.getFileName.toString.stripSuffix(".commit").toLong
    java.nio.file.Files.move(last, logDir.resolve(s"$bid.intent"))
    val before = audit()
    val replayed = TextAnalysis.applyGateIngestBatch(spark, shard2, bid,
      "doc_id", "text", name, outDir,
      minWords = 30, maxWords = 90, minMeanWordLen = 4.0,
      maxMeanWordLen = 4.9, minAlphaFrac = 0.8, minStopwords = 2,
      stopwords = stop)
    assert(audit() == before,
      "crashed-append replay must roll back then restore the exact audit rows")
    assert(replayed >= 0, "the replay re-applies (it was not committed)")
    assert(spark.read.parquet(outDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet == batchPass,
      "landed output survives the crash replay unchanged")
    // replaying a COMMITTED batch is a no-op
    assert(TextAnalysis.applyGateIngestBatch(spark, shard2, bid, "doc_id",
      "text", name, outDir, minWords = 30, maxWords = 90,
      minMeanWordLen = 4.0, maxMeanWordLen = 4.9, minAlphaFrac = 0.8,
      minStopwords = 2, stopwords = stop) == -1L)
    assert(audit() == before)
    graft.engine.WarehouseMeta.deleteRecursively(tmp)
  }

  test("blockIngestStream: blocklist-on-arrival — gates against the CURRENT list, audit, crash rollback, replay no-op") {
    import scala.jdk.CollectionConverters._
    import graft.ops.TextAnalysis
    // deterministic URLs over the corpus: doc_id % 4 picks the host —
    // hosts 0 (subdomain of blocked) and 3 (blocked later) will gate;
    // host 2 is the prefix-label trap (tracker.net.example.org survives)
    val hosts = array(lit("ads.tracker.net"), lit("news.example.org"),
      lit("tracker.net.example.org"), lit("media.spam.io"))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        concat(lit("https://"), element_at(hosts, (col("doc_id") % 4 + 1).cast("int")),
          lit("/p/"), col("doc_id")).as("url"))
    val cut = docs.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0).toLong
    val shard1 = docs.filter(col("doc_id") < cut)
    val shard2 = docs.filter(col("doc_id") >= cut)
    val name = "graft_block_loop"
    TextAnalysis.resetBlocklistStore(spark, name)
    TextAnalysis.addBlockedDomains(spark, name, Seq("Tracker.NET"))
    // re-adding an existing domain (case-insensitively) is a store no-op
    TextAnalysis.addBlockedDomains(spark, name, Seq("tracker.net"))
    assert(spark.table(s"${name}_domains").count() == 1)

    val tmp = java.nio.file.Files.createTempDirectory("block_loop")
    val src = tmp.resolve("src"); java.nio.file.Files.createDirectories(src)
    val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    def land(df: org.apache.spark.sql.DataFrame, fname: String): Unit = {
      val stage = tmp.resolve(s"stage_$fname")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      java.nio.file.Files.move(part, src.resolve(fname))
    }
    def runStream(): Unit = TextAnalysis.blockIngestStream(spark,
        spark.readStream.schema(docs.schema).parquet(src.toString),
        "doc_id", "url", name, outDir, ckpt)
      .awaitTermination()
    def audit() = TextAnalysis.readBlockAudit(spark, name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def landed() = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet

    // batch 0 gates under {tracker.net}: only host 0 (ads.tracker.net) drops
    land(shard1, "f1.parquet"); runStream()
    val kept1 = ids(shard1.filter(col("doc_id") % 4 =!= 0))
    assert(landed() == kept1,
      "subdomain of blocked drops; the prefix-label host survives")

    // TAKEDOWN between batches: spam.io joins the list — batch 1 must gate
    // against the CURRENT list (hosts 0 and 3 drop), batch 0 stays as-is
    TextAnalysis.addBlockedDomains(spark, name, Seq("spam.io"))
    land(shard2, "f2.parquet"); runStream()
    val kept2 = ids(shard2.filter(col("doc_id") % 4 =!= 0 && col("doc_id") % 4 =!= 3))
    assert(landed() == kept1 ++ kept2,
      "batch 1 gated by the updated list; committed batch 0 not rewritten")

    // audit rows carry the exact per-batch arithmetic
    val n1 = shard1.count(); val n2 = shard2.count()
    assert(audit() == Set(
      (0L, n1, n1 - kept1.size, kept1.size.toLong),
      (1L, n2, n2 - kept2.size, kept2.size.toLong)))

    // crash at the exactly-once seam: rollback removes the orphaned audit
    // row, the replay re-gates under the current list → identical state
    val logDir = graft.engine.WarehouseMeta.tableLocation(spark, s"${name}_ingest_log")
    val last = java.nio.file.Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".commit"))
      .maxBy(_.getFileName.toString.stripSuffix(".commit").toLong)
    val bid = last.getFileName.toString.stripSuffix(".commit").toLong
    java.nio.file.Files.move(last, logDir.resolve(s"$bid.intent"))
    val before = audit()
    val replayed = TextAnalysis.applyBlockIngestBatch(spark, shard2, bid,
      "doc_id", "url", name, outDir)
    assert(replayed == kept2.size.toLong && audit() == before &&
      landed() == kept1 ++ kept2)
    // replaying a COMMITTED batch is a no-op
    assert(TextAnalysis.applyBlockIngestBatch(spark, shard2, bid,
      "doc_id", "url", name, outDir) == -1L)
    assert(audit() == before)
    graft.engine.WarehouseMeta.deleteRecursively(tmp)
  }

  test("retroScanLandings: committed landings re-gate under the current list; swaps crash-heal; re-run no-op") {
    import scala.jdk.CollectionConverters._
    import graft.ops.TextAnalysis
    val hosts = array(lit("ads.tracker.net"), lit("news.example.org"),
      lit("tracker.net.example.org"), lit("media.spam.io"))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        concat(lit("https://"), element_at(hosts, (col("doc_id") % 4 + 1).cast("int")),
          lit("/p/"), col("doc_id")).as("url"))
    val name = "graft_retro_loop"
    TextAnalysis.resetBlocklistStore(spark, name)
    TextAnalysis.addBlockedDomains(spark, name, Seq("tracker.net"))
    val tmp = java.nio.file.Files.createTempDirectory("retro_loop")
    val outDir = s"$tmp/out"
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    def landed() = ids(spark.read.parquet(outDir))
    // two committed batches under {tracker.net}: host 0 drops on arrival
    val shard1 = docs.filter(col("doc_id") % 2 === 0)
    val shard2 = docs.filter(col("doc_id") % 2 === 1)
    assert(TextAnalysis.applyBlockIngestBatch(spark, shard1, 0L, "doc_id",
      "url", name, outDir) >= 0)
    assert(TextAnalysis.applyBlockIngestBatch(spark, shard2, 1L, "doc_id",
      "url", name, outDir) >= 0)
    val arrivalKept = ids(docs.filter(col("doc_id") % 4 =!= 0))
    assert(landed() == arrivalKept)

    // TAKEDOWN after commit: arrivals already landed media.spam.io docs —
    // the retro scan must remove them from the committed batch dirs
    TextAnalysis.addBlockedDomains(spark, name, Seq("spam.io"))
    val rep = TextAnalysis.retroScanLandings(spark, name, outDir, "doc_id", "url")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val finalKept = ids(docs.filter(col("doc_id") % 4 =!= 0 && col("doc_id") % 4 =!= 3))
    assert(landed() == finalKept,
      "retro scan brings every committed landing up to the current list")
    // report arithmetic: spam.io docs (doc_id % 4 == 3, all odd) sat in batch 1
    val removed1 = ids(shard2.filter(col("doc_id") % 4 === 3)).size.toLong
    assert(rep(0L)._2 == 0L && rep(1L)._2 == removed1,
      s"only batch 1 held spam.io docs: $rep")
    assert(rep.values.forall { case (b, r, a) => b - r == a })

    // re-run is a no-op: nothing left to remove, landings unchanged
    val rep2 = TextAnalysis.retroScanLandings(spark, name, outDir, "doc_id", "url")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rep2 == Map(0L -> 0L, 1L -> 0L) && landed() == finalKept)

    // crash heal 1: "swap finished, cleanup crashed" — stale trash next to
    // a live dir is dropped
    val root = java.nio.file.Paths.get(outDir)
    val staleTrash = root.resolve(".trash-batch=0")
    java.nio.file.Files.createDirectories(staleTrash)
    java.nio.file.Files.write(staleTrash.resolve("junk"), Array[Byte](1))
    // crash heal 2: "between the renames" — live dir missing, trash holds
    // the original; heal must restore it before scanning
    java.nio.file.Files.move(root.resolve("batch=1"), root.resolve(".trash-batch=1"))
    val rep3 = TextAnalysis.retroScanLandings(spark, name, outDir, "doc_id", "url")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rep3 == Map(0L -> 0L, 1L -> 0L), "healed state has nothing to remove")
    assert(landed() == finalKept, "both batches restored and current")
    assert(!java.nio.file.Files.exists(staleTrash) &&
      !java.nio.file.Files.exists(root.resolve(".trash-batch=1")))
    graft.engine.WarehouseMeta.deleteRecursively(tmp)
  }

  test("scoreIngestStream: prequential model loop — stream ≡ per-batch twin, crash rollback, compaction neutral") {
    import scala.jdk.CollectionConverters._
    import graft.ops.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val cut = docs.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0).toLong
    val shard1 = docs.filter(col("doc_id") < cut)
    val shard2 = docs.filter(col("doc_id") >= cut)
    val name = "graft_model_loop"
    TextAnalysis.resetModelStore(spark, name)

    val tmp = java.nio.file.Files.createTempDirectory("model_loop")
    val src = tmp.resolve("src"); java.nio.file.Files.createDirectories(src)
    val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    def land(df: org.apache.spark.sql.DataFrame, fname: String): Unit = {
      val stage = tmp.resolve(s"stage_$fname")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      java.nio.file.Files.move(part, src.resolve(fname))
    }
    def runStream(): Unit = TextAnalysis.scoreIngestStream(spark,
        spark.readStream.schema(docs.schema).parquet(src.toString),
        "doc_id", "text", name, outDir, ckpt)
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "tokens", "avg_neg_logp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    land(shard1, "f1.parquet"); runStream()
    land(shard2, "f2.parquet"); runStream()

    // prequential twin: batch 0 scores against the EMPTY model (all 0 by
    // the documented floor), batch 1 against batch 0's corpus
    val twin0 = rows(TextAnalysis.unigramLogProb(shard1, "doc_id", "text",
      model = Some(shard1.filter(lit(false)))))
    val twin1 = rows(TextAnalysis.unigramLogProb(shard2, "doc_id", "text",
      model = Some(shard1)))
    assert(twin0.forall(_._3 == 0.0), "empty-model scores are 0 by the total floor")
    assert(rows(spark.read.parquet(s"$outDir/batch=0")) == twin0)
    assert(rows(spark.read.parquet(s"$outDir/batch=1")) == twin1)
    assert(twin1.exists(_._3 > 0.0), "the prior-batch model produces real surprisal")

    // model = every batch's token counts, summed
    def model() = spark.table(s"${name}_model").groupBy("tok")
      .agg(sum(col("n")).as("tf")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expectModel = docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(model() == expectModel, "store model = whole-corpus counts after both batches")

    // crash injection: last commit back to intent, replay restores counts
    val logDir = graft.engine.WarehouseMeta.tableLocation(spark, s"${name}_ingest_log")
    val last = java.nio.file.Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".commit"))
      .maxBy(_.getFileName.toString.stripSuffix(".commit").toLong)
    val bid = last.getFileName.toString.stripSuffix(".commit").toLong
    java.nio.file.Files.move(last, logDir.resolve(s"$bid.intent"))
    TextAnalysis.applyScoreIngestBatch(spark, shard2, bid, "doc_id", "text", name, outDir)
    assert(model() == expectModel, "crashed-append replay must not double-count")
    assert(TextAnalysis.applyScoreIngestBatch(spark, shard2, bid, "doc_id",
      "text", name, outDir) == -1L, "committed replay is a no-op")

    // compaction folds the count log without changing the model
    TextAnalysis.compactModelStore(spark, name)
    assert(model() == expectModel, "compaction is read-equivalent")
    assert(spark.table(s"${name}_model").count() == expectModel.size.toLong,
      "compaction leaves one row per token")
  }

  test("streamToZorder: exactly-once batch landing + cadence maintain — kill/restart ≡ batch, crash rollback, replay no-op") {
    import scala.jdk.CollectionConverters._
    import graft.ops.Layout
    import java.nio.file.Files
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val cut = li.agg(max("l_orderkey")).head().getLong(0) * 8 / 10
    val base = li.filter(col("l_orderkey") <= cut)
    val tail = li.filter(col("l_orderkey") > cut)
    val mid = li.agg(max("l_orderkey")).head().getLong(0) * 9 / 10
    val (shard1, shard2) = (tail.filter(col("l_orderkey") <= mid),
      tail.filter(col("l_orderkey") > mid))

    val tmp = Files.createTempDirectory("graft_zsink")
    val table = s"$tmp/t"; val ckpt = s"$tmp/ckpt"
    val src = tmp.resolve("src"); Files.createDirectories(src)
    Layout.zorderInit(spark, base, table, "l_orderkey", "l_suppkey", nFiles = 8)
    def land(df: org.apache.spark.sql.DataFrame, fname: String): Unit = {
      val stage = tmp.resolve(s"stage_$fname")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = Files.list(stage).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      Files.move(part, src.resolve(fname))
    }
    def runStream(): Unit = EventStreams.streamToZorder(
      spark.readStream.schema(base.schema).parquet(src.toString),
      table, ckpt, maintainEvery = 1).awaitTermination()

    // run 1 lands shard1 (batch 0) and maintains it in; run 2 RESTARTS
    // from the checkpoint and processes only the new file (kill/restart)
    land(shard1, "f1.parquet"); runStream()
    assert(Layout.currentGen(table).exists(_ >= 1L), "cadence maintain committed")
    assert(Layout.zorderRead(spark, table).count() ==
      base.count() + shard1.count())
    land(shard2, "f2.parquet"); runStream()
    val want = li.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val got = Layout.zorderRead(spark, table).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == want, "streamed+maintained table ≡ batch union, exactly once")
    // re-running with nothing new is a no-op (no dup landing, no new gen)
    val genBefore = Layout.currentGen(table)
    runStream()
    assert(Layout.currentGen(table) == genBefore &&
      Layout.zorderRead(spark, table).count() == li.count())

    // crash at the seam: restore the last batch to "append ran, commit
    // didn't land" + an orphan partial file; the replay rolls the orphan
    // back and re-applies exactly once
    val log = java.nio.file.Paths.get(table, "batchlog")
    val last = Files.list(log).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".commit"))
      .maxBy(_.getFileName.toString.stripSuffix(".commit").toLong)
    val bid = last.getFileName.toString.stripSuffix(".commit").toLong
    Files.move(last, log.resolve(s"$bid.intent"))
    shard2.limit(7).coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/orphan")
    val orphanPart = Files.list(tmp.resolve("orphan")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).next()
    Files.move(orphanPart,
      java.nio.file.Paths.get(table, "landing", "partial-orphan.parquet"))
    val n = Layout.zorderAppendBatch(spark, shard2, table, bid)
    assert(n == shard2.count(), "crashed batch re-applies its full row count")
    assert(Layout.zorderAppendBatch(spark, shard2, table, bid) == -1L,
      "committed-batch replay is a no-op")
    assert(Layout.zorderMaintain(spark, table)._1 == shard2.count(),
      "the re-applied batch folds once — the orphan partial never does")
    assert(Layout.zorderRead(spark, table).count() ==
      li.count() + shard2.count(), "exactly one extra copy of shard2 " +
        "(the deliberate re-apply), zero copies of the orphan")
    graft.engine.WarehouseMeta.deleteRecursively(tmp)
  }

  test("takedownStream: streamed keys vector-delete exactly once across kill/restart, zero data files touched, cadence purge erases") {
    import scala.jdk.CollectionConverters._
    import graft.ops.Layout
    import java.nio.file.Files
    val grid = spark.range(64L * 64L)
      .select((col("id") / 64).cast("long").as("a"), (col("id") % 64).as("b"),
        col("id").as("k"))
    val tmp = Files.createTempDirectory("graft_tdown")
    val table = s"$tmp/t"; val ckpt = s"$tmp/ckpt"
    val src = tmp.resolve("src"); Files.createDirectories(src)
    Layout.zorderInit(spark, grid, table, "a", "b", nFiles = 16)
    Layout.zorderBloomBuild(spark, table, "k")
    def land(keys: Seq[Long], fname: String): Unit = {
      import spark.implicits._
      val stage = tmp.resolve(s"stage_$fname")
      keys.toDF("k").coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = Files.list(stage).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      Files.move(part, src.resolve(fname)); ()
    }
    val keySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    def runStream(materializeEvery: Int = 0): Unit = EventStreams.takedownStream(
      spark.readStream.schema(keySchema).parquet(src.toString),
      table, "k", ckpt, materializeEvery).awaitTermination()

    // batch 0: three keys vector-delete with zero data-file writes; a
    // NULL key rides along (REVIEW PIN: it must be ignored, not kill the
    // stream — the engine's NULL-never-matches delete contract)
    val filesBefore = Layout.currentSpans(table).map(_.file).toSet
    locally {
      import spark.implicits._
      val stage = tmp.resolve("stage_b0")
      Seq(Some(5L), Some(777L), Some(2048L), None).toDF("k")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = Files.list(stage).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      Files.move(part, src.resolve("b0.parquet")); ()
    }
    runStream()
    assert(Layout.zorderRead(spark, table).count() == 4096L - 3)
    assert(Layout.currentSpans(table).map(_.file).toSet == filesBefore,
      "takedown batches must not touch data files")
    // kill/restart: the checkpoint replays nothing; a forced re-delete of
    // the same keys is a no-op by DV idempotence (the exactly-once proof)
    runStream()
    assert(Layout.zorderDeleteVectoredByKey(spark, table, "k",
      Seq(5L, 777L, 2048L)) == ((0L, 0)))
    assert(Layout.zorderRead(spark, table).count() == 4096L - 3)

    // batch 1 with cadence purge: new keys tombstone, then materialize
    // erases every tombstone physically
    land(Seq(4095L, 6L), "b1.parquet"); runStream(materializeEvery = 1)
    assert(Layout.zorderRead(spark, table).count() == 4096L - 5)
    assert(Layout.currentSpans(table).forall(_.dvRows == 0),
      "cadence materialize must leave no tombstones")
    assert(Layout.zorderRead(spark, table)
      .filter(col("k").isin(5L, 777L, 2048L, 4095L, 6L)).count() == 0)
    graft.engine.WarehouseMeta.deleteRecursively(tmp)
  }

  test("cdcFollowStream: cadence polls apply exactly-once; kill/restart and replayed ticks are no-ops; crashed-poll intent replays pinned (r15)") {
    import scala.jdk.CollectionConverters._
    import graft.ops.Layout
    import java.nio.file.Files
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_cdcs")
    val pri = s"$tmp/pri"; val fol = s"$tmp/fol"
    val ticks = tmp.resolve("ticks"); Files.createDirectories(ticks)
    val base = spark.range(512L)
      .select((col("id") / 8).cast("long").as("a"), (col("id") % 8).as("b"),
        col("id").as("k"), concat(lit("v"), col("id")).as("v"))
    Layout.zorderInit(spark, base, pri, "a", "b", nFiles = 4,
      keepGenerations = 8)
    Layout.zorderCdcSeed(spark, pri, fol, nFiles = 4)
    def tick(name: String): Unit = {
      val stage = tmp.resolve(s"stage_$name")
      Seq(1L).toDF("t").coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = Files.list(stage).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      Files.move(part, ticks.resolve(s"$name.parquet")); ()
    }
    val tickSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("t",
        org.apache.spark.sql.types.LongType)))
    def run(ckpt: String): Unit = EventStreams.cdcFollowStream(
      spark.readStream.schema(tickSchema).parquet(ticks.toString),
      pri, fol, "k", ckpt).awaitTermination()
    def cursor(): Long = new String(Files.readAllBytes(
      java.nio.file.Paths.get(fol, "cdc-cursor")), "UTF-8").trim.toLong
    def rows(path: String): Set[(Long, String)] =
      Layout.zorderRead(spark, path).select("k", "v")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    // tick with no primary change: cursor stasis, zero mutations
    tick("t0"); run(s"$tmp/ckpt")
    assert(cursor() == 0L && rows(fol) == rows(pri))
    // primary mutates; the next tick's poll applies it all
    Layout.zorderAppend((900L until 950L)
      .map(k => (k % 64, k % 8, k, s"v$k")).toDF("a", "b", "k", "v"), pri)
    Layout.zorderMaintain(spark, pri)
    Layout.zorderDeleteVectoredByKey(spark, pri, "k", (0L until 16L).toSeq)
    tick("t1"); run(s"$tmp/ckpt")
    assert(rows(fol) == rows(pri), "the cadence poll must apply the changes")
    val cur1 = cursor()
    // kill/restart with the SAME checkpoint: no new ticks, nothing runs;
    // a FRESH checkpoint replays BOTH ticks — each re-poll is a cursor
    // stasis no-op (exactly-once rides the cursor protocol, not the sink)
    run(s"$tmp/ckpt")
    run(s"$tmp/ckpt2")
    assert(cursor() == cur1 && rows(fol) == rows(pri),
      "replayed ticks must be exact no-ops")
    // a poll that crashed mid-apply (intent pinned, partial insert in the
    // follower's landing): the next tick repairs it, exactly once
    Layout.zorderAppend(Seq((9L, 1L, 8000L, "late")).toDF("a", "b", "k", "v"), pri)
    Layout.zorderMaintain(spark, pri)
    java.nio.file.Files.write(java.nio.file.Paths.get(fol, "cdc-intent"),
      (cur1 + 1).toString.getBytes("UTF-8"))
    Layout.zorderAppend(Seq((9L, 1L, 8000L, "late")).toDF("a", "b", "k", "v"), fol)
    tick("t2"); run(s"$tmp/ckpt")
    assert(rows(fol) == rows(pri) &&
      Layout.zorderRead(spark, fol).filter(col("k") === 8000L).count() == 1L,
      "the crashed poll's replay must land exactly one copy")
    graft.engine.WarehouseMeta.deleteRecursively(tmp)
  }

  test("journalCompactStream: journal arrivals fold into the z-tables on cadence — kill/restart + replayed ticks no-op, auto-pilot census clears, chain answers unchanged (r16)") {
    import graft.engine.{MemGraph, ViewGraph, WarehouseGraph}
    import graft.ops.Layout
    val tmp = java.nio.file.Files.createTempDirectory("graft_jzs")
    val dir = s"$tmp/wh"
    val g = MemGraph(spark)
    val ns = (1 to 200).map(i => g.node("P", "i" -> i).save()).toIndexedSeq
    for (i <- 0 until 199) g.edge(ns(i), "E", ns(i + 1)).save()
    val wh = new WarehouseGraph(spark, dir)
    wh.append(g.changesDf)
    wh.compactZorder(nFiles = 8)
    // the journal dir itself is the ticker: a journal file arriving IS
    // the maintenance trigger (content unused — the increment reads the
    // warehouse's own journal past the zseq marker)
    def run(ckpt: String): Unit = EventStreams.journalCompactStream(
      EventStreams.journalStream(spark, s"$dir/journal"), dir,
      s"$tmp/$ckpt", optimizeEvery = 1).awaitTermination()
    val chainArgs = graft.query.Fetch.Args(
      chain = "[a:P] -(e:E)> (b:P)",
      where = Seq("CAST(a.data.i AS BIGINT) % 7 = 2"))
    def chain(): Seq[String] =
      graft.query.Fetch.df(wh.zView, chainArgs).select("uid")
        .collect().map(_.getString(0)).toSeq.sorted
    val chain0 = chain()
    assert(chain0.nonEmpty)
    // batch 0 delivers the base journal: the increment is a caught-up
    // no-op (zseq at maxSeq) and the auto-pilot may bin-pack/refresh —
    // answers must be invariant under maintenance
    run("ckpt")
    assert(chain() == chain0, "auto-pilot maintenance must not change answers")
    assert(Layout.zorderAdvise(spark, s"$dir/znodes")
      .filter(col("fire")).count() == 0, "node census must be all-clear")
    assert(Layout.zorderAdvise(spark, s"$dir/zedges")
      .filter(col("fire")).count() == 0, "edge census must be all-clear")
    // churn lands in the journal; the NEXT tick folds it in O(churn)
    val seq0 = wh.maxSeq
    val fresh = g.node("P", "i" -> 5555).save()
    ns(30)("nick") = "streamed"; ns(30).save()
    val doomed = ns(90)
    doomed.delete(disconnect = true)
    wh.append(g.changesDf.filter(col("seq") > seq0))
    run("ckpt")
    assert(wh.zNodes.select("uid").except(wh.nodes.select("uid")).count() == 0 &&
      wh.nodes.select("uid").except(wh.zNodes.select("uid")).count() == 0,
      "streamed increment must land the folded state")
    assert(wh.zPointNode(fresh.uid).count() == 1L)
    assert(wh.zPointNode(doomed.uid).count() == 0L)
    assert(wh.zPointNode(ns(30).uid).select("props").head().getString(0)
      .contains("streamed"))
    // kill/restart on the SAME checkpoint: no new arrivals, nothing runs;
    // a FRESH checkpoint replays every journal file — each re-tick is a
    // caught-up no-op (exactly-once rides the zseq marker, not the sink)
    val genN = Layout.currentGen(s"$dir/znodes").get
    val genE = Layout.currentGen(s"$dir/zedges").get
    run("ckpt")
    run("ckpt_replay")
    assert(Layout.currentGen(s"$dir/znodes").contains(genN) &&
      Layout.currentGen(s"$dir/zedges").contains(genE),
      "replayed ticks must commit nothing")
    assert(wh.zNodes.count() == wh.nodes.count())
    // crash injection at the exactly-once seam: the marker rolled back
    // mid-increment (as if the tick died before advancing it) — the next
    // replay re-runs the SAME tail and must land net one copy
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/zseq"), seq0.toString)
    // a real crash precedes BOTH marker writes — drop the consumed-file
    // list too (its absence also exercises the pre-r16 full-scan fallback)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/zseq-files"))
    run("ckpt_crash")
    assert(wh.zNodes.filter(col("uid") === fresh.uid).count() == 1L,
      "a replayed increment must land exactly one copy")
    assert(wh.zNodes.count() == wh.nodes.count() &&
      wh.zEdges.count() == wh.edges.count())
    // the cadence re-pins the snapshot pointer after its optimize drain:
    // the published cut must name the CURRENT generations (otherwise the
    // drain's restatements would strand pinned readers on generations
    // the retention window will age out)
    val snap = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/zsnap")).trim.split("\t")
    assert(snap(0).toLong == wh.maxSeq &&
      wh.zsnapSeq.contains(wh.maxSeq),
      "the pointer's seq must be the consumed journal frontier")
    assert(snap(1).toLong == Layout.currentGen(s"$dir/znodes").get &&
      snap(2).toLong == Layout.currentGen(s"$dir/zedges").get,
      "the cadence must re-pin the pointer to the current generations")
    // the z-view chain agrees with the journal-fold chain end to end
    assert(graft.query.Fetch.df(new ViewGraph(spark, wh.nodes, wh.edges),
        chainArgs).select("uid").collect().map(_.getString(0)).toSeq.sorted
      == chain())
    graft.engine.WarehouseMeta.deleteRecursively(tmp)
  }

  test("journal stream tails warehouse appends") {
    val dir = java.nio.file.Files.createTempDirectory("graft_js").toString
    val g = graft.engine.MemGraph(spark)
    g.node("P", "name" -> "x").save()
    val wh = new graft.engine.WarehouseGraph(spark, dir)
    wh.append(g.changesDf)
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.journalStream(spark, s"$dir/journal"), "journal_tail",
      org.apache.spark.sql.streaming.OutputMode.Append())
    assert(streamed.count() == 1)
    assert(streamed.head().getAs[String]("uid") == g.nodes.head().getAs[String]("uid"))
  }

  test("contaminationGuardStream: stream ≡ batch scoring across kill/restart; full-copy doc scores 1.0") {
    import scala.jdk.CollectionConverters._
    import graft.ops.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val evalSet = docs.filter(col("doc_id") % 50 === 0)
    // candidate training docs: the rest, PLUS a verbatim copy of an eval
    // doc under a fresh id — the leak the guard exists to catch
    val leak = evalSet.limit(1)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val train = docs.filter(col("doc_id") % 50 =!= 0).unionByName(leak)
    val name = "graft_guard_stream"
    Dedup.writeEvalShingleStore(spark, evalSet, "doc_id", "text", name, k = 5)

    val tmp = java.nio.file.Files.createTempDirectory("guard_stream")
    val src = tmp.resolve("src")
    val outDir = s"$tmp/scored"; val ckpt = s"$tmp/ckpt"
    java.nio.file.Files.createDirectories(src)
    def land(df: org.apache.spark.sql.DataFrame, fname: String): Unit = {
      val stage = tmp.resolve(s"stage_$fname")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      java.nio.file.Files.move(part, src.resolve(fname))
    }
    def runStream(): Unit = Dedup.contaminationGuardStream(spark,
        spark.readStream.schema(train.schema).parquet(src.toString),
        "doc_id", "text", name, outDir, ckpt)
      .awaitTermination()

    // two files, two runs over one checkpoint = kill at a batch boundary
    land(train.filter(col("doc_id") % 2 === 0), "f1.parquet")
    runStream()
    land(train.filter(col("doc_id") % 2 =!= 0), "f2.parquet")
    runStream()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "n_shingles", "n_contaminated", "contamination")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val streamed = rows(spark.read.parquet(outDir))
    val batch = rows(Dedup.contaminationAgainstStore(spark, train, "doc_id", "text", name))
    assert(streamed == batch, "per-batch landed scores ≡ one batch pass (docs score independently)")
    val leakRow = streamed.find(_._1 >= 1000000L).get
    assert(leakRow._4 == 1.0, s"verbatim eval copy must score 1.0, got $leakRow")
    assert(streamed.exists(r => r._4 < 1.0), "clean docs score below 1")
    graft.engine.WarehouseMeta.deleteRecursively(tmp)
  }
}
