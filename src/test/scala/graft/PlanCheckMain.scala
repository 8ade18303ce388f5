package graft
import org.apache.spark.sql.SparkSession
/** Scratch plan auditor (test scope): prints exchange-reuse stats for a
  * SparkEntry query. Usage: Test/runMain graft.PlanCheckMain <query> <sfDir> */
object PlanCheckMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE_COUNT=" + "ReusedExchange".r.findAllIn(plan).length)
    println("EXCHANGE_COUNT=" + "Exchange hash".r.findAllIn(plan).length)
    println("SCAN_COUNT=" + "Scan parquet".r.findAllIn(plan).length)
    spark.stop()
  }
}
