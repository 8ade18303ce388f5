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
