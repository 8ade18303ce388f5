package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the one-pass expectation checker: null semantics (an
  * unevaluable rule is a violation), uniqueness accounting, and the
  * per-row quarantine channel staying shuffle-free. */
class QualitySpec extends AnyFunSuite with SparkSpec {

  private def frame = {
    import spark.implicits._
    Seq(
      (Some(1L), Some(10.0), "view"),
      (Some(2L), Some(-3.0), "view"),     // range violation
      (None: Option[Long], Some(5.0), "click"), // null id
      (Some(2L), None: Option[Double], "bogus") // dup id, null value, bad type
    ).toDF("id", "value", "kind")
  }

  test("check: one row per rule; NULL evaluations and null keys count as violations") {
    val got = Quality.check(frame, Seq(
        Quality.notNull("id_not_null", col("id")),
        Quality.inRange("value_0_100", col("value"), 0.0, 100.0),
        Quality.inSet("kind_known", col("kind"), Seq("view", "click"))),
      uniqueKeys = Seq("id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("id_not_null") == (1L, 4L))
    // -3.0 is out of range AND the null value is unevaluable → 2 violations
    assert(got("value_0_100") == (2L, 4L))
    assert(got("kind_known") == (1L, 4L))
    // 4 rows, distinct non-null ids = {1, 2} → 2 uniqueness violations
    // (the duplicate 2 and the null key)
    assert(got("unique:id") == (2L, 4L))
  }

  test("violations: per-row quarantine channel tags broken rules, shuffle-free") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val rules = Seq(
      Quality.notNull("id_not_null", col("id")),
      Quality.inRange("value_0_100", col("value"), 0.0, 100.0),
      Quality.inSet("kind_known", col("kind"), Seq("view", "click")))
    val bad = Quality.violations(frame, rules)
    val got = bad.collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[String]("broken_rules")).toMap
    assert(got == Map("view" -> "value_0_100", "click" -> "id_not_null",
      "bogus" -> "value_0_100,kind_known"))
    val shuffles = bad.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty, "the quarantine channel must be pure map work")
  }

  test("profile: nulls + exact distinct per column in one pass; approx within HLL tolerance") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), "a"), (Some(1L), "b"), (None, "b"), (Some(3L), "c"), (None, "c"))
      .toDF("k", "v")
    val got = Quality.profile(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map("k" -> ((5L, 2L, 2L)), "v" -> ((5L, 0L, 3L))),
      s"5 rows; k: 2 nulls / {1,3}; v: 0 nulls / {a,b,c} — got $got")
    val approx = Quality.profile(df, Seq("k", "v"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(approx("k") >= 1 && approx("k") <= 3 && approx("v") >= 2 && approx("v") <= 4,
      "HLL cardinalities within tolerance on a tiny frame")
    // one aggregation pass: a single pair of hash-aggregate exchanges, no
    // per-column rescan (the scan appears once in the executed plan)
    val plan = Quality.profile(df.repartition(3), Seq("k", "v"))
      .queryExecution.executedPlan.toString
    assert("Scan|LocalTableScan".r.findAllIn(plan).size <= 2,
      s"profiling must not rescan per column:\n$plan")
  }
}
