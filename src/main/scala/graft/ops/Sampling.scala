package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. Both operators key off
  * md5 of the row id instead of an RNG, so a sample is reproducible across
  * engines, runs and cluster sizes — re-running a 100 TB curation job yields
  * the identical subset, and an external engine (the DuckDB oracle) can
  * verify it bit-for-bit. The reference has no sampling surface (its sets are
  * driver-side, graphydb.py:283-287); this is extension surface for the
  * data-mixing stage of a corpus pipeline. */
object Sampling {

  /** Exact-count stratified sample: the first `n` rows per stratum in
    * md5(id) order (id as tiebreak). One shuffle on the stratum key; each
    * window partition is a single stratum, so the sort is per-stratum, never
    * global. For strata too large to sort, take [[hashSample]] at a safe
    * over-fraction first and stratify the survivors. */
  def stratifiedExact(df: DataFrame, strataCol: String, idCol: String, n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive ($n)")
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= n).drop("_rk")
  }

  /** Data-mixing sampler: exact per-stratum counts (mixture ratios made
    * concrete — "5 parts label A to 2 parts label B"). Strata absent from
    * `counts` contribute nothing. Rows are ranked by the same md5(id) order
    * as [[stratifiedExact]]; the counts relation is tiny by nature and
    * explicitly broadcast, so the only shuffle is the per-stratum window. */
  def weightedMix(df: DataFrame, strataCol: String, idCol: String,
      counts: Map[String, Int]): DataFrame = {
    require(counts.nonEmpty && counts.values.forall(_ >= 0),
      "counts must be non-empty and non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val cdf = counts.toSeq.toDF("_stratum", "_take")
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .join(broadcast(cdf), col(strataCol).cast("string") === col("_stratum"))
      .filter(col("_rk") <= col("_take"))
      .drop("_rk", "_stratum", "_take")
  }

  /** Epoch-style weighted mix with FRACTIONAL weights (upsampling): weight w
    * replicates every row ⌊w⌋ times, plus one extra copy for the
    * deterministic md5-keyed fraction frac(w) of rows — weight 2.5 means
    * every row twice and (the same) half of the rows a third time, exactly
    * reproducible across runs and engines (no RNG). Strata absent from
    * `weights` contribute nothing; weight < 1 downsamples ([[hashSample]]
    * semantics per stratum). Pure map-side work: a broadcast weight join and
    * a codegen'd `explode(sequence)` — no shuffle, no window, scales
    * linearly. Output adds `copy_idx` (0-based replica index) so downstream
    * stages can spread replicas across partitions. */
  def weightedMixFractional(df: DataFrame, strataCol: String, idCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0.0),
      "weights must be non-empty and non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF("_stratum", "_w")
    df.join(broadcast(wdf), col(strataCol).cast("string") === col("_stratum"))
      .withColumn("_h32",
        conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long"))
      .withColumn("_copies",
        floor(col("_w")).cast("long") +
          when(col("_h32").cast("double") <
            (col("_w") - floor(col("_w"))) * lit(4294967296.0), 1L).otherwise(0L))
      .filter(col("_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_stratum", "_w", "_h32", "_copies")
  }

  /** Temperature-based mixture resampling — the multilingual-corpus
    * rebalancing trick: stratum sampling mass ∝ n_i^alpha, so alpha = 1
    * keeps natural frequency and alpha → 0 flattens toward uniform,
    * upsampling low-resource strata (per-row keep-weight may exceed 1 —
    * [[weightedMixFractional]]'s integer + fractional copies handle it).
    * Weights derive from the OBSERVED stratum sizes: one aggregate
    * reduces the corpus to |strata| counters on the driver, the weight
    * map broadcasts back, and the per-row decision is the same md5
    * predicate as [[hashSample]] — no shuffle of data rows. Weights are
    * rounded to 6 decimals so a cross-engine twin reproduces them without
    * last-ulp pow() divergence. */
  def temperatureMix(df: DataFrame, strataCol: String, idCol: String,
      alpha: Double, targetRows: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha out of [0,1] ($alpha)")
    require(targetRows > 0, "targetRows must be positive")
    val sizes = df.groupBy(col(strataCol).cast("string").as("_s"))
      .agg(count(lit(1)).as("_n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val z = sizes.values.map(n => math.pow(n.toDouble, alpha)).sum
    val weights = sizes.map { case (s, n) =>
      val w = math.pow(n.toDouble, alpha) / z * targetRows / n
      s -> BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    weightedMixFractional(df, strataCol, idCol, weights)
  }

  /** Deterministic epoch shuffle for training data: rows land in `shards`
    * by id hash and are ordered within each shard by a SEED-keyed hash —
    * epoch N uses seed N for a fresh but exactly reproducible order, the
    * property data loaders need for resumable training. The scale unit is
    * the shard (one window partition ≈ one output file); there is
    * deliberately no global order — a worker reads its shards in `_pos`
    * order. Output adds `_shard` and `_pos` (1-based within shard). */
  def epochShuffle(df: DataFrame, idCol: String, shards: Int, seed: Long): DataFrame = {
    require(shards > 0, s"shards must be positive ($shards)")
    val id = col(idCol).cast("string")
    val w = Window.partitionBy("_shard")
      .orderBy(md5(concat_ws(":", lit(seed), id)), col(idCol))
    df.withColumn("_shard",
        pmod(conv(substring(md5(id), 1, 8), 16, 10).cast("long"), lit(shards)))
      .withColumn("_pos", row_number().over(w))
  }

  /** Deterministic Bernoulli sample: keep rows whose md5(id) 32-bit prefix
    * falls under fraction·2³². A pure filter — no shuffle, no window, no RNG
    * state to coordinate — so it composes with scan pushdown and scales
    * linearly; the scale path when exact per-stratum counts aren't needed. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range ($fraction)")
    val threshold = (fraction * 4294967296.0).toLong
    df.filter(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long") < threshold)
  }

  /** Deterministic train/val/test split — DISJOINT and EXHAUSTIVE by
    * construction: the row's md5-derived 32-bit value lands in exactly one
    * cumulative-fraction band, in the given split order (the last split
    * absorbs the rounding tail, so every row gets a label and re-running
    * on a grown corpus never moves an old row between splits — the
    * property leakage-safe eval splits require). Fractions must sum to 1
    * (±1e-9). Map-only: one codegen'd hash + CASE per row. */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0.0), "fractions must be > 0")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${splits.map(_._2).sum}")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double")
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
    val label = splits.init.zip(bounds.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), hi)) =>
        val cond = h < lit(hi) * 4294967296.0
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
    }.fold(lit(splits.last._1))(_.otherwise(lit(splits.last._1)))
    df.withColumn("split", label)
  }
}
