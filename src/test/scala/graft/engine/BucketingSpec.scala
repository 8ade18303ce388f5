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

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    // string-count so AQE-wrapped plans are included too
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
  }

  test("star warehouse: 2-hop co-part motif + per-order agg has ZERO shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries("w20_copart_pairs_wh")(spark, dir)
    assert(df.count() > 0)
    val collected = df.queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }
    assert(collected.isEmpty && shuffleCount(df) == 0,
      s"bucket-aligned motif must not shuffle:\n${df.queryExecution.executedPlan}")
  }

  test("star warehouse chains return exactly the parquet-projection results") {
    val dir = "/root/testdata/sf0.001"
    for (pair <- Seq(
        ("w01_order_counts_wh", "g01_order_counts"),
        ("w08_orders_of_customer_wh", "g08_orders_of_customer"))) {
      val (w, g) = pair
      val wRows = graft.SparkEntry.queries(w)(spark, dir)
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
      val gRows = graft.SparkEntry.queries(g)(spark, dir)
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
      assert(wRows sameElements gRows, s"$w must equal $g")
    }
  }
}
