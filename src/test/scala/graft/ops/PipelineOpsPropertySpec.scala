package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Seeded-random equivalence suites for the training-pipeline operators:
  * each distributed plan is checked against a naive in-driver evaluator on
  * randomized inputs (the same doctrine as FetchPropertySpec/UndoPropertySpec,
  * which found real bugs in round 2). */
class PipelineOpsPropertySpec extends AnyFunSuite with SparkSpec {

  test("asofJoin ≡ naive per-row scan on random event streams") {
    import spark.implicits._
    val rnd = new Random(20260812L)
    for (round <- 1 to 3) {
      // dense ts range forces collisions so the (ts, event_id) tiebreak is hit
      val events = (1 to 200).map { i =>
        (i.toLong, rnd.nextInt(8), if (rnd.nextBoolean()) "view" else "purchase",
          rnd.nextInt(40))
      }
      val naive = events.filter(_._3 == "purchase").map { case (id, u, _, t) =>
        val prior = events.filter { case (vid, vu, vt, vts) =>
          vt == "view" && vu == u && (vts < t || (vts == t && vid < id))
        }
        // latest prior in (ts, event_id) order
        id -> prior.sortBy(e => (e._4, e._1)).lastOption.map(_._1)
      }.toMap
      val df = events.toDF("event_id", "user_id", "event_type", "secs")
        .withColumn("ts", timestamp_seconds(col("secs"))).drop("secs")
      val got = Events.asofJoin(df, "purchase", "view")
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long]))
        .toMap
      assert(got == naive, s"round $round diverged from the naive evaluator")
    }
  }

  test("stratifiedExact is invariant under input partitioning and row order") {
    import spark.implicits._
    val rnd = new Random(7L)
    val rows = rnd.shuffle((1 to 300).toList).map(i => (i.toLong, s"g${i % 5}"))
    val base = rows.toDF("id", "grp")
    val expected = Sampling.stratifiedExact(base, "grp", "id", 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    for (parts <- Seq(1, 3, 17)) {
      val reshaped = rows.reverse.toDF("id", "grp").repartition(parts)
      val got = Sampling.stratifiedExact(reshaped, "grp", "id", 7)
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == expected, s"sample changed under repartition($parts)")
    }
  }

  test("packBins ≡ naive sequential cumulative-sum fold per shard") {
    import spark.implicits._
    val rnd = new Random(42L)
    val docs = (1 to 120).map { i =>
      val shard = s"sh${i % 3}"
      val tokens = (1 to (1 + rnd.nextInt(9))).map(k => s"w$k").mkString(" ")
      (i.toLong, shard, tokens)
    }
    val budget = 12
    val naive = docs.groupBy(_._2).flatMap { case (_, shardDocs) =>
      var cum = 0L
      shardDocs.sortBy(_._1).map { case (id, _, text) =>
        val bin = (cum / budget).toInt
        cum += text.split(" ").length
        id -> bin
      }
    }
    val got = TextAnalysis.packBins(docs.toDF("doc_id", "shard", "text"),
        "shard", "doc_id", "text", budget)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("bin")).toMap
    assert(got == naive)
  }

  test("scrubRepeatedNgrams ≡ naive hot-span masking on random corpora") {
    import spark.implicits._
    val rnd = new Random(20260813L)
    for ((n, minDf) <- Seq((2, 2), (3, 2), (3, 3))) {
      // tiny vocab forces heavy n-gram collisions across docs
      val vocab = Seq("a", "b", "c", "d")
      val docs = (1 to 30).map { i =>
        val len = 1 + rnd.nextInt(10) // includes docs shorter than n
        (i.toLong, (1 to len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val grams = docs.flatMap { case (id, text) =>
        text.split(" ").sliding(n).filter(_.length == n).map(g => (id, g.mkString(" ")))
      }
      val hot = grams.distinct.groupBy(_._2).filter(_._2.size >= minDf).keySet
      val naive = docs.map { case (id, text) =>
        val toks = text.split(" ")
        val covered = toks.sliding(n).zipWithIndex
          .filter { case (g, _) => g.length == n && hot(g.mkString(" ")) }
          .flatMap { case (_, s) => s until s + n }.toSet
        val keptToks = toks.zipWithIndex.filterNot(t => covered(t._2)).map(_._1)
        id -> ((toks.length.toLong, (toks.length - keptToks.length).toLong,
          keptToks.mkString(" ")))
      }.toMap
      val got = Dedup.scrubRepeatedNgrams(docs.toDF("doc_id", "text"),
          "doc_id", "text", n, minDf)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got == naive, s"(n=$n, minDf=$minDf) diverged from the naive evaluator")
    }
  }

  test("contamination ratio equals the naive shingle-set intersection") {
    import spark.implicits._
    val rnd = new Random(99L)
    val vocab = (1 to 20).map(i => s"tok$i")
    val docs = (1 to 40).map { i =>
      (i.toLong, (1 to 15).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val k = 3
    def shingles(text: String): Set[String] =
      text.split(" ").sliding(k).filter(_.length == k).map(_.mkString(" ")).toSet
    val isEval = (id: Long) => id % 7 == 0
    val trainSh = docs.filterNot(d => isEval(d._1)).flatMap(d => shingles(d._2)).toSet
    val naive = docs.filter(d => isEval(d._1)).map { case (id, text) =>
      val sh = shingles(text)
      id -> (sh.size.toLong, sh.count(trainSh.contains).toLong)
    }.toMap
    val got = Dedup.contamination(docs.toDF("doc_id", "text"), "doc_id", "text",
        col("doc_id") % 7 === 0, k)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == naive)
  }
}
