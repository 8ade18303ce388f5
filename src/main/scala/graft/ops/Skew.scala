package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (brief: "skewed keys → salting or AQE
  * skew-join"). AQE's skew-join handles sort-merge skew automatically; this
  * helper covers the case AQE can't: a broadcast-infeasible join where one
  * key dominates (e.g. a celebrity node's edges, an ultra-common shingle).
  *
  * Pattern: replicate the SMALL side `factor`× with an explicit salt column,
  * salt the LARGE side randomly, join on (key, salt) — the hot key's rows
  * spread over `factor` partitions. */
object Skew {

  /** Large side: add a uniform random salt in [0, factor). */
  def saltLarge(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("_salt", (rand(seed = 7) * factor).cast("int"))

  /** Small side: replicate each row once per salt value. */
  def replicateSmall(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))

  /** Salted equi-join on `keys`: equivalent rows to `large.join(small, keys)`
    * but with the hot keys spread across `factor` reducers. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int): DataFrame =
    saltLarge(large, factor)
      .join(replicateSmall(small, factor), keys :+ "_salt")
      .drop("_salt")

  /** Keys whose frequency exceeds `threshold` — measure before salting;
    * salting everything costs a `factor`× blow-up of the small side. */
  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(key).count().filter(col("count") > threshold).select(key, "count")
}
