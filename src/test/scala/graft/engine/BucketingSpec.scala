package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** The co-location claim behind the 100 TB design (SURVEY §1.5, §3.2):
  * compacting nodes (bucketed by uid) and edges (bucketed by startuid) with
  * the same bucket count makes the traversal join run WITHOUT a shuffle
  * exchange on either side. */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed compaction makes the traversal join shuffle-free") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    val g = MemGraph(spark)
    val ns = (1 to 50).map(i => g.node("P", "i" -> i).save())
    for (i <- 0 until 49) g.edge(ns(i), "E", ns(i + 1)).save()
    val wh = new WarehouseGraph(spark, dir)
    wh.append(g.changesDf)
    wh.compactBucketed(buckets = 4, tablePrefix = "bkt_test")

    val nodes = spark.table("bkt_test_nodes")
    val edges = spark.table("bkt_test_edges")
    val hop = edges.join(nodes, edges("startuid") === nodes("uid"))
    assert(hop.count() == 49)

    val shuffles = hop.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"expected shuffle-free bucketed join, found ${shuffles.length} exchanges:\n" +
        hop.queryExecution.executedPlan)
  }
}
