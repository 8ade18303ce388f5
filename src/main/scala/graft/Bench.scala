package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. The session is warmed (codegen/JIT of a trivial
  * job + one small parquet read) before timing so the first measured query
  * isn't charged Spark startup; queries run in sorted name order.
  *
  * Each query is timed SPARK_GRAFT_REPS times (default 3) and the per-query
  * MEDIAN is reported: the host shows up to 3× run-to-run variance under
  * external load (BASELINE.md), so a single-pass number is noise — the
  * median of three discards one-off spikes while staying cheap. */
object Bench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink forces FULL evaluation of every output column — count()
        // would let Catalyst prune projection-only work down to a row count
        val ok = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
        } catch { case _: Throwable => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> (if (times.exists(_ < 0)) -1.0 else median(times))
    }
    // per-query medians rounded to 4 dp: keeps the line short enough that a
    // tail-capture of stdout can't truncate entries (BENCH_r03 lost its
    // head). Locale.ROOT so a comma-decimal default locale can't corrupt
    // the JSON.
    def r4(v: Double): String =
      if (v < 0) "-1.0"
      else String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${r4(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps}""")
    // compact duplicate LAST so even a truncated tail keeps a parseable total
    println(s"""{"metric":"total","value":${r4(total)},"unit":"sec","n_queries":${results.size},"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
