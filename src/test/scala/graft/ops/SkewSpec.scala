package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkSpec {

  test("salted join returns exactly the plain join's rows") {
    import spark.implicits._
    // key 1 is hot: 500 of 600 rows
    val large = ((1 to 500).map(i => (1, s"L$i")) ++ (1 to 100).map(i => (i % 7 + 2, s"M$i")))
      .toDF("k", "lv")
    val small = (1 to 8).map(i => (i, s"S$i")).toDF("k", "sv")
    val plain = large.join(small, Seq("k")).select("k", "lv", "sv")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, Seq("k"), factor = 4)
      .select("k", "lv", "sv").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.size == 600)
  }

  test("hotKeys finds the dominating key") {
    import spark.implicits._
    val df = ((1 to 500).map(_ => 1) ++ (1 to 50).map(i => i + 1)).toDF("k")
    val hot = Skew.hotKeys(df, "k", threshold = 100).collect()
    assert(hot.length == 1 && hot.head.getInt(0) == 1)
  }

  test("GraphSession.fromFiles reads csv and json graph exports") {
    val g = graft.engine.GraphSession.inMemory(spark)
    val a = g.node("Person", "name" -> "Ann").save()
    val b = g.node("Person", "name" -> "Ben").save()
    g.edge(a, "Knows", b).save()
    for (fmt <- Seq("csv", "json")) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_$fmt").toString
      val w = g.nodes.write.format(fmt)
      (if (fmt == "csv") w.option("header", "true") else w).save(s"$dir/nodes")
      val we = g.edges.write.format(fmt)
      (if (fmt == "csv") we.option("header", "true") else we).save(s"$dir/edges")
      val opened = graft.engine.GraphSession.fromFiles(spark, dir, fmt)
      val res = graft.query.Fetch.df(opened, graft.query.Fetch.Args(
        chain = "[p:Person] -(e:Knows)> (q:Person)"))
      assert(res.count() == 1, s"format $fmt")
    }
  }

  test("GraphSession facade: working set merged into a warehouse") {
    val g = graft.engine.GraphSession.inMemory(spark)
    val a = g.node("Person", "name" -> "Ann").save()
    val b = g.node("Person", "name" -> "Ben").save()
    g.edge(a, "Knows", b).save()
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    val w = graft.engine.GraphSession.open(spark, dir)
    w.merge(g)
    assert(w.fetchCount(graft.query.Fetch.Args(chain = "(n:Person)")) == 2)
    val df = w.fetchDf(graft.query.Fetch.Args(
      chain = "[p:Person] -(e:Knows)> (q:Person)"))
    assert(df.count() == 1)
    // extension functions registered by the facade
    assert(spark.sql("SELECT cosine_similarity(array(1.0F,0.0F), array(1.0F,0.0F))")
      .head().getDouble(0) == 1.0)
  }
}
