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
}
