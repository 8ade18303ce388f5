package graft
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for SparkEntry queries to files.
  * Usage: Test/runMain graft.PlanFormatMain <outDir> <sfDir> <suffix> [nameRegex]
  * Writes <outDir>/<query>_<suffix>.txt per matching query. Bench-shaped
  * session (local[32], AQE off, shuffle=32) so the dumped plan is the plan
  * the bench actually runs.
  */
object PlanFormatMain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = args(1)
    val suffix = args(2)
    val re = (if (args.length > 3) args(3) else ".*").r
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if re.pattern.matcher(name).matches()) {
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plan] wrote $name")
      } catch { case e: Throwable =>
        println(s"[plan] FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
