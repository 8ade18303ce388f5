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
}
