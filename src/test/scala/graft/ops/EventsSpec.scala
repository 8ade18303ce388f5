package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the batch event operators beyond the oracle rows (e01–e04):
  * as-of join semantics on hand-built timelines, including the null and
  * tied-timestamp edges the oracle data may not exercise. */
class EventsSpec extends AnyFunSuite with SparkSpec {

  test("asofJoin: each purchase gets its user's latest strictly-prior view") {
    import spark.implicits._
    val rows = Seq(
      // user 1: view(1) view(2) purchase(3) view(4) purchase(5)
      (1L, 1, "view", "2026-01-01 10:00:00"),
      (2L, 1, "view", "2026-01-01 10:05:00"),
      (3L, 1, "purchase", "2026-01-01 10:06:00"),
      (4L, 1, "view", "2026-01-01 10:07:00"),
      (5L, 1, "purchase", "2026-01-01 10:08:00"),
      // user 2: purchase before any view → no match (null)
      (6L, 2, "purchase", "2026-01-01 09:00:00"),
      (7L, 2, "view", "2026-01-01 09:30:00"),
      // tied timestamp: view 8 precedes purchase 9 in the (ts, event_id) order
      (8L, 3, "view", "2026-01-01 08:00:00"),
      (9L, 3, "purchase", "2026-01-01 08:00:00"),
      // other event types are invisible to the join
      (10L, 1, "click", "2026-01-01 10:05:30"))
    val df = rows.toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = Events.asofJoin(df, "purchase", "view")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got == Map(
      3L -> Some(2L), 5L -> Some(4L), 6L -> None, 9L -> Some(8L)))
  }

  test("asofJoin: reversed roles finds the prior purchase for each view") {
    import spark.implicits._
    val df = Seq(
      (1L, 1, "purchase", "2026-01-01 10:00:00"),
      (2L, 1, "view", "2026-01-01 10:01:00"))
      .toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = Events.asofJoin(df, "view", "purchase").collect()
    assert(got.length == 1 && got.head.getLong(0) == 2L && got.head.getLong(2) == 1L)
  }

  test("date lake: day range prunes whole partition directories; layout never changes answers") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val rows = Seq(
      (1L, 1, "view", "2026-02-01 10:00:00", 1.5),
      (2L, 2, "click", "2026-02-01 11:00:00", 2.5),
      (3L, 1, "view", "2026-02-02 10:00:00", 3.5),
      (4L, 3, "view", "2026-02-03 10:00:00", 4.5),
      (5L, 2, "view", "2026-02-03 12:00:00", 5.5))
    val df = rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val path = java.nio.file.Files.createTempDirectory("graft_lake").toString
    Events.writeDateLake(df, path)
    // Hive-style day directories on disk
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("dt=2026-02-01", "dt=2026-02-02", "dt=2026-02-03"))

    val read = Events.readDateLake(spark, path, "2026-02-02", "2026-02-03")
    // pruning happens at PLANNING time: the scan selects 2 of 3 day dirs
    val scan = read.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.selectedPartitions.partitionCount == 2,
      s"expected 2 pruned day partitions, scan reads ${scan.selectedPartitions.partitionCount}")
    assert(scan.metadata("PartitionFilters").contains("dt"),
      "the day range must land in PartitionFilters, not row filters")

    // the lake answers exactly what the unpartitioned frame answers
    val got = read.select("event_id", "user_id", "value", "dt")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet
    assert(got == Set((3L, 1, 3.5, "2026-02-02"), (4L, 3, 4.5, "2026-02-03"),
      (5L, 2, 5.5, "2026-02-03")))
  }

  test("restateDays replaces only its days; compactDateLake folds small files in place") {
    import spark.implicits._
    def mk(rows: Seq[(Long, Int, String, String, Double)]) =
      rows.toDF("event_id", "user_id", "event_type", "ts", "value")
        .withColumn("ts", to_timestamp(col("ts")))
    val path = java.nio.file.Files.createTempDirectory("graft_lake2").toString
    Events.writeDateLake(mk(Seq(
      (1L, 1, "view", "2026-02-01 10:00:00", 1.0),
      (2L, 2, "view", "2026-02-02 10:00:00", 2.0),
      (3L, 3, "view", "2026-02-03 10:00:00", 3.0))), path)
    def day(dt: String) = new java.io.File(s"$path/dt=$dt")
    val d1Files = day("2026-02-01").listFiles().filter(_.getName.endsWith(".parquet")).toSeq
    val d3Before = day("2026-02-03").lastModified()

    // RESTATE day 02 (the bad-upstream repair): day 01 and 03 untouched
    Events.restateDays(mk(Seq(
      (20L, 2, "view", "2026-02-02 10:00:00", 2.5),
      (21L, 4, "view", "2026-02-02 11:00:00", 2.6))), path)
    assert(day("2026-02-01").listFiles().filter(_.getName.endsWith(".parquet")).toSeq
      == d1Files, "restating day 02 must not rewrite day 01's files")
    val all = Events.readDateLake(spark, path, "2026-02-01", "2026-02-03")
    assert(all.select("event_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 20L, 21L, 3L), "day 02 fully replaced, neighbors intact")

    // accumulate small files on day 02 (micro-batch appends), then COMPACT
    for (b <- 0 until 2)
      mk(Seq((30L + b, 9, "view", "2026-02-02 12:00:00", 1.0)))
        .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode("append").partitionBy("dt").parquet(path)
    assert(day("2026-02-02").listFiles().count(_.getName.endsWith(".parquet")) >= 3,
      "appends accumulated multiple files")
    Events.compactDateLake(spark, path, "2026-02-02", "2026-02-02")
    assert(day("2026-02-02").listFiles().count(_.getName.endsWith(".parquet")) == 1,
      "compaction folds the day to one file")
    assert(!new java.io.File(s"$path/_compact_stage").exists(), "stage cleaned up")
    val after = Events.readDateLake(spark, path, "2026-02-01", "2026-02-03")
    assert(after.select("event_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 20L, 21L, 30L, 31L),
      "compaction changes files, never answers; other days untouched")
  }

  test("maintainDailyRollup: incremental by day, idempotent, restate re-rolls one day only") {
    import spark.implicits._
    def mk(rows: Seq[(Long, Int, String, String, Double)]) =
      rows.toDF("event_id", "user_id", "event_type", "ts", "value")
        .withColumn("ts", to_timestamp(col("ts")))
    val lake = java.nio.file.Files.createTempDirectory("graft_lake3").toString
    val roll = java.nio.file.Files.createTempDirectory("graft_roll").toString + "/r"
    Events.writeDateLake(mk(Seq(
      (1L, 1, "view", "2026-02-01 10:00:00", 1.0),
      (2L, 1, "view", "2026-02-01 11:00:00", 2.0),
      (3L, 2, "click", "2026-02-02 10:00:00", 3.0))), lake)
    assert(Events.maintainDailyRollup(spark, lake, roll)
      == Seq("2026-02-01", "2026-02-02"), "initial maintain rolls every day")
    assert(Events.maintainDailyRollup(spark, lake, roll).isEmpty, "unchanged lake → no-op")
    // partition discovery appends dt last — read columns by name
    def byName() = Events.readDailyRollup(spark, roll)
      .select("dt", "event_type", "n_events", "n_users", "value_sum")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(byName() == Set(
      ("2026-02-01", "view", 2L, 1L, 3.0),
      ("2026-02-02", "click", 1L, 1L, 3.0)))
    // a NEW day appears in the lake → maintain reads exactly that day
    mk(Seq((4L, 3, "view", "2026-02-03 09:00:00", 4.0)))
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("append").partitionBy("dt").parquet(lake)
    assert(Events.maintainDailyRollup(spark, lake, roll) == Seq("2026-02-03"))
    assert(byName().contains(("2026-02-03", "view", 1L, 1L, 4.0)))
    // a lake day restates → restateRollupDays repairs exactly that day
    val d1Files = new java.io.File(s"$roll/dt=2026-02-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq
    Events.restateDays(mk(Seq(
      (30L, 7, "click", "2026-02-02 12:00:00", 9.0))), lake)
    Events.restateRollupDays(spark, lake, roll, Seq("2026-02-02"))
    assert(byName() == Set(
      ("2026-02-01", "view", 2L, 1L, 3.0),
      ("2026-02-02", "click", 1L, 1L, 9.0),
      ("2026-02-03", "view", 1L, 1L, 4.0)))
    assert(new java.io.File(s"$roll/dt=2026-02-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq == d1Files,
      "restating day 02's rollup must not rewrite day 01's files")
  }

  test("rateAnomalies: planted spike flags; warm-up and zero-spread stay null") {
    import spark.implicits._
    // jittered baseline (9/11/10 repeating) for 8 hours, then a 100-event
    // spike at hour 8 — a CONSTANT baseline would zero the spread and
    // correctly null every z, so the jitter is what arms the detector
    val base = Seq(9, 11, 10, 9, 11, 10, 9, 10)
    val rows = base.zipWithIndex.flatMap { case (n, h) => (1 to n).map(_ => h) } ++
      (1 to 100).map(_ => 8)
    val df = rows.zipWithIndex.map { case (h, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-03-01 ${h}%02d:15:00"))
    }.toDF("event_id", "ts")
    val got = Events.rateAnomalies(df, "ts", trailing = 6, zThreshold = 3.0)
      .orderBy("bucket_ts").collect()
      .map(r => (r.getTimestamp(0).toString.substring(11, 13),
        r.getLong(1), Option(r.get(3)), r.getBoolean(4)))
    assert(got(0)._3.isEmpty && got(1)._3.isEmpty,
      "under 2 trailing observations z is null")
    assert(got.slice(2, 8).forall(t => t._3.nonEmpty && !t._4),
      s"jittered baseline hours score but stay calm: ${got.slice(2, 8).toSeq}")
    val spike = got.last
    assert(spike._1 == "08" && spike._2 == 100L && spike._4,
      s"the spike hour must flag: $spike")
    // zero-spread guard: a constant series never divides by zero
    val flat = (0 until 4).flatMap(h => (1 to 5).map(_ => h)).zipWithIndex
      .map { case (h, i) => (i.toLong, java.sql.Timestamp.valueOf(f"2026-03-02 ${h}%02d:00:00")) }
      .toDF("event_id", "ts")
    val flatGot = Events.rateAnomalies(flat, "ts").collect()
    assert(flatGot.forall(r => r.get(3) == null && !r.getBoolean(4)),
      "zero trailing spread yields null z, never an engine div-by-zero")
  }
}
