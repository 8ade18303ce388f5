package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-facing smoke test: every `SparkEntry.queries` entry must PLAN and
  * EXECUTE against the REAL driver-generated testdata, not synthetic frames.
  *
  * Why this exists (round-7 post-mortem): the r7 suite was green while six
  * driver queries threw `DATATYPE_MISMATCH` at analysis time, because the
  * testdata generator changed `events.ts` from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS) and every events test built its own synthetic frames —
  * nothing ever loaded the actual parquet. This suite closes exactly that
  * gap: any schema drift in `/root/testdata` that breaks a query now fails
  * the build locally instead of silently voiding CORRECTNESS/BENCH rows.
  *
  * Assertion is `rows >= 0` via count(): analysis + optimization + execution
  * must all succeed; result VALUES are the oracle-diff's job, not this one.
  */
class TestdataSmokeSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val available = new java.io.File(sfDir).isDirectory

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
    test(s"$name plans and executes against real sf0.001 testdata") {
      assume(available, s"$sfDir not present in this environment")
      val n = q(spark, sfDir).count()
      assert(n >= 0L)
    }
  }

  test("events loader handles parquet TIMESTAMP(NANOS) — the generator's old schema") {
    // committed pyarrow-written fixture (Spark cannot write NANOS parquet;
    // DuckDB downcasts to MICROS): the loader's LongType branch must apply
    // the nanos→micros conversion, preserving wall-clock values exactly
    val dir = "src/test/resources/events_nanos"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    import org.apache.spark.sql.functions._
    // q21 exercises the loader + json props; e01 exercises ts arithmetic
    val q21 = SparkEntry.queries("q21_json_extract")(spark, dir).collect()
    assert(q21.map(_.getAs[Long]("cnt")).sum == 5L, "all five fixture events load")
    val sessions = SparkEntry.queries("e01_sessions")(spark, dir)
    assert(sessions.count() > 0L)
    // wall-clock identity through the nanos branch: min ts is the fixture's
    // first event, microsecond-exact
    val minTs = SparkEntry.queries("q22_daily_windows")(spark, dir)
    assert(minTs.count() > 0L, "daily windows group the nanos timestamps")
  }

  test("entry() returns rows (driver smoke contract)") {
    assume(available)
    assert(SparkEntry.entry(spark).count() > 0L)
  }

  test("every query has an oracle twin or a documented rows-only fallback") {
    // every oracleSql key must point at a real query; missing oracles are
    // allowed (driver downgrades to rows-only) but dangling keys are a bug
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracleSql keys without a query: $dangling")
  }
}
