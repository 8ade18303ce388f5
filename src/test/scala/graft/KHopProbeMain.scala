package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B: x03's 2-hop reach with and without the kHop edge persist.
  * Usage: Test/runMain graft.KHopProbeMain <sfDir> [reps]
  */
object KHopProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = StarGraph(spark, dir)
    for (persist <- Seq(true, false); rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val seed = g.nodes.filter(col("uid") === "nation:0")
      graft.ops.Traversals.kHop(g, seed, hops = 2, persistEdges = persist)
        .groupBy("kind").agg(count(lit(1)).as("reached"))
        .write.format("noop").mode("overwrite").save()
      println(f"[khop-probe] persist=$persist rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
