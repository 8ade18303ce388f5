package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Determinism and cardinality pins for the hash-keyed sampling operators
  * (the oracle rows s04/s05 cover cross-engine equality). */
class SamplingSpec extends AnyFunSuite with SparkSpec {

  test("stratifiedExact: exactly n per stratum, deterministic, a subset") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "grp")
    val take = () => Sampling.stratifiedExact(df, "grp", "id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val s1 = take()
    assert(s1 == take(), "re-running yields the identical sample")
    assert(s1.groupBy(_._2).forall(_._2.length == 5), "5 rows per stratum")
    assert(s1.map(_._1).forall(i => i >= 1 && i <= 100))
    // n larger than a stratum keeps the whole stratum
    val small = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    assert(Sampling.stratifiedExact(small, "grp", "id", 5).count() == 3)
  }

  test("weightedMix: per-stratum exact counts; absent strata excluded") {
    import spark.implicits._
    val df = (1 to 60).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    val got = Sampling.weightedMix(df, "grp", "id", Map("g0" -> 4, "g2" -> 1))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == 5 && got.count(_._2 == "g0") == 4
      && got.count(_._2 == "g2") == 1, "g1 is absent from the mix")
    // shares stratifiedExact's ranking: the g0 picks ARE its top-4
    val strat = Sampling.stratifiedExact(df, "grp", "id", 4)
      .collect().filter(_.getString(1) == "g0").map(_.getLong(0)).toSet
    assert(got.filter(_._2 == "g0").map(_._1).toSet == strat)
    // a count larger than the stratum keeps the whole stratum
    assert(Sampling.weightedMix(df, "grp", "id", Map("g1" -> 999)).count() == 20)
  }

  test("weightedMixFractional: deterministic replication, exact floors, hash-keyed extras") {
    import spark.implicits._
    val df = (1 to 400).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "grp")
    val run = () => Sampling.weightedMixFractional(df, "grp", "id",
      Map("g0" -> 2.5, "g1" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(x => (x._1, x._3)).toSeq
    val s1 = run()
    assert(s1 == run(), "re-running yields the identical replicated set")
    // weight 2.5: every g0 row appears 2 or 3 times; ~half get the 3rd copy
    val g0Copies = s1.filter(_._2 == "g0").groupBy(_._1).view.mapValues(_.length).toMap
    assert(g0Copies.values.forall(c => c == 2 || c == 3))
    assert(g0Copies.size == 200, "every g0 row keeps at least its floor copies")
    val thirds = g0Copies.values.count(_ == 3)
    assert(math.abs(thirds / 200.0 - 0.5) < 0.15, s"got $thirds third-copies of 200")
    // weight 0.5 downsamples: each surviving row exactly once, ~half survive
    val g1Rows = s1.filter(_._2 == "g1")
    assert(g1Rows.groupBy(_._1).values.forall(_.length == 1))
    assert(math.abs(g1Rows.length / 200.0 - 0.5) < 0.15)
    // the 0.5-survivors are exactly the rows hashSample(0.5) keeps (same key)
    val hs = Sampling.hashSample(df.filter($"grp" === "g1"), "id", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(g1Rows.map(_._1).toSet == hs)
    // copy_idx is a clean 0-based replica index
    assert(s1.filter(_._3 == 0L).map(x => (x._1, x._2)).distinct.length ==
      s1.map(x => (x._1, x._2)).distinct.length)
  }

  test("epochShuffle: reproducible per seed, fresh order per epoch, stable shards") {
    import spark.implicits._
    val df = (1 to 300).map(_.toLong).toDF("id")
    val run = (seed: Long) => Sampling.epochShuffle(df, "id", shards = 4, seed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    val e1 = run(1)
    assert(e1 == run(1), "same epoch seed reproduces the identical order")
    val e2 = run(2)
    // shard assignment is seed-independent; within-shard order is not
    assert(e1.map(x => (x._1, x._2)) == e2.map(x => (x._1, x._2)))
    assert(e1 != e2, "a new epoch seed must produce a different order")
    // every shard is a 1..n dense ranking
    e1.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted == (1 to rows.size).toSeq)
    }
  }

  test("hashSample: deterministic, near the fraction, monotone in fraction") {
    import spark.implicits._
    val df = (1 to 2000).map(_.toLong).toDF("id")
    val at20 = Sampling.hashSample(df, "id", 0.2).collect().map(_.getLong(0)).toSet
    assert(at20 == Sampling.hashSample(df, "id", 0.2).collect().map(_.getLong(0)).toSet)
    assert(math.abs(at20.size / 2000.0 - 0.2) < 0.05, s"got ${at20.size} of 2000")
    // a smaller fraction selects a subset of a larger one (same hash order)
    val at10 = Sampling.hashSample(df, "id", 0.1).collect().map(_.getLong(0)).toSet
    assert(at10.subsetOf(at20))
    assert(Sampling.hashSample(df, "id", 0.0).count() == 0)
  }

  test("temperatureMix: low alpha flattens skew, upsamples the small stratum, deterministic") {
    import spark.implicits._
    // 400 "en" vs 100 "fr" — the skew temperature sampling exists to tame
    val df = ((1 to 400).map(i => (i.toLong, "en")) ++
      (1001 to 1100).map(i => (i.toLong, "fr"))).toDF("id", "lang")
    def shares(alpha: Double, target: Long): Map[String, Long] =
      Sampling.temperatureMix(df, "lang", "id", alpha, target)
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val flat = shares(alpha = 0.0, target = 250)
    // alpha=0: expected 125 per stratum — the small stratum's keep-rate
    // (≈1.25, fractional copies past 1) far exceeds the big one's (≈0.31)
    assert(flat("fr") > 100, s"alpha=0 must upsample fr past its size: $flat")
    assert(math.abs(flat("en") - 125L) < 40, s"alpha=0 en share off: $flat")
    val natural = shares(alpha = 1.0, target = 250)
    // alpha=1 keeps natural frequency: en ≈ 200, fr ≈ 50
    assert(natural("en") > 3 * natural("fr"), s"alpha=1 keeps the skew: $natural")
    assert(flat("en") < natural("en") && flat("fr") > natural("fr"),
      "lower temperature moves mass from the big stratum to the small one")
    // upsampling emits real duplicate copies with distinct copy_idx
    val copies = Sampling.temperatureMix(df, "lang", "id", 0.0, 250)
      .filter(col("copy_idx") > 0).count()
    assert(copies > 0, "fractional weights above 1 must duplicate rows")
    // byte-deterministic across runs
    val a = Sampling.temperatureMix(df, "lang", "id", 0.5, 200)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = Sampling.temperatureMix(df.repartition(7), "lang", "id", 0.5, 200)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a == b, "resampling is a pure function of (ids, sizes, alpha, target)")
  }

  test("hashSplit: disjoint+exhaustive, near fractions, stable under corpus growth") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val small = (1L to 400L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def assign(df: org.apache.spark.sql.DataFrame) =
      Sampling.hashSplit(df, "id", splits).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assign(small)
    assert(a.size == 400, "every row gets exactly one label")
    val shares = a.values.groupBy(identity).view.mapValues(_.size / 400.0).toMap
    assert(math.abs(shares("train") - 0.8) < 0.08 &&
      shares.getOrElse("val", 0.0) > 0.0 && shares.getOrElse("test", 0.0) > 0.0,
      s"shares near fractions: $shares")
    // growth stability: adding rows never moves an existing row's split —
    // the leakage-safety property (yesterday's test doc can't become train)
    val b = assign((1L to 1000L).toDF("id"))
    assert(a.forall { case (id, s) => b(id) == s }, "old assignments are stable")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(small, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }
}
