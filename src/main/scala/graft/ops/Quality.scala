package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a frame — the constraint
  * check every training-data ingest runs before accepting a batch (null
  * rates, value ranges, domain membership, key uniqueness). Part of the
  * pipeline extension surface (north star; absent in the reference).
  *
  * Scale posture: ONE aggregate pass evaluates every row-level expectation
  * — each rule is a `sum(when(...))` counter, so the map side reduces a
  * 100 TB scan to |rules| longs per task and the single reduce touches
  * |rules| counters, never data rows. Uniqueness rules ride the same
  * aggregate as `count distinct` columns. The row-level/uniqueness split
  * is explicit in the API because that is the real cost boundary: row
  * rules are embarrassingly partial-aggregatable; distinct counts shuffle
  * their key column (still hashes, never whole rows). */
object Quality {

  /** A row-level expectation: `holds` must evaluate TRUE for a clean row.
    * NULL results count as violations (an unevaluable rule is a dirty
    * row, not a clean one). */
  final case class Expect(name: String, holds: Column)

  def notNull(name: String, c: Column): Expect = Expect(name, c.isNotNull)
  def inRange(name: String, c: Column, lo: Double, hi: Double): Expect =
    Expect(name, c >= lo && c <= hi)
  def inSet(name: String, c: Column, values: Seq[Any]): Expect =
    Expect(name, c.isin(values: _*))

  /** Evaluate every expectation in one pass: returns
    * (rule STRING, violations BIGINT, total BIGINT) — one row per rule,
    * including one `unique:<col>` row per uniqueness key (violations =
    * total minus distinct values; NULL keys count into total, so a null
    * key is a uniqueness violation too). */
  def check(df: DataFrame, expects: Seq[Expect],
      uniqueKeys: Seq[String] = Nil): DataFrame = {
    require(expects.nonEmpty || uniqueKeys.nonEmpty, "no rules to check")
    // duplicate rule names would collide in the _v_<name> aliases and fail
    // later with an ambiguous-column error far from the caller's mistake
    val dupNames = expects.groupBy(_.name).collect { case (n, es) if es.size > 1 => n }
    require(dupNames.isEmpty, s"duplicate expectation names: ${dupNames.mkString(", ")}")
    require(uniqueKeys.distinct.size == uniqueKeys.size,
      s"duplicate unique keys: ${uniqueKeys.diff(uniqueKeys.distinct).mkString(", ")}")
    val rowAggs = expects.map(e =>
      sum(when(e.holds, 0L).otherwise(1L)).as(s"_v_${e.name}"))
    val uniqAggs = uniqueKeys.map(k =>
      count_distinct(col(k)).as(s"_u_$k"))
    val one = df.agg(count(lit(1)).as("_total"),
      (rowAggs ++ uniqAggs): _*)
    val rows =
      expects.map(e => struct(lit(e.name).as("rule"),
        coalesce(col(s"_v_${e.name}"), lit(0L)).as("violations"),
        col("_total").as("total"))) ++
      uniqueKeys.map(k => struct(lit(s"unique:$k").as("rule"),
        (col("_total") - col(s"_u_$k")).as("violations"),
        col("_total").as("total")))
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.violations").as("violations"),
        col("r.total").as("total"))
  }

  /** The ACCEPT side of the gate: rows passing EVERY row-level expectation
    * (NULL evaluations reject, same contract as [[check]]). Pure map
    * filter — composes with scan pushdown, adds no shuffle; pair with
    * [[violations]] for the quarantine channel and [[check]] for the
    * per-batch meter. This is stage 1 of the ingest pipeline
    * (gate → dedup → mix → pack). */
  def gate(df: DataFrame, expects: Seq[Expect]): DataFrame = {
    require(expects.nonEmpty, "no rules to check")
    df.filter(expects.map(e => coalesce(e.holds, lit(false))).reduce(_ && _))
  }

  /** The rows a batch gate would quarantine: every row violating ANY of the
    * row-level expectations, tagged with the comma-joined names of the
    * rules it broke — the per-row error channel to [[check]]'s per-batch
    * meter (same posture as Multimodal's status/error columns: loud per
    * payload, never per job). Pure map work — no shuffle, no second scan
    * shape beyond the caller's. */
  def violations(df: DataFrame, expects: Seq[Expect]): DataFrame = {
    require(expects.nonEmpty, "no rules to check")
    val broken = array(expects.map(e =>
      when(e.holds, lit(null).cast("string")).otherwise(lit(e.name))): _*)
    df.withColumn("_broken", array_compact(broken))
      .filter(size(col("_broken")) > 0)
      .withColumn("broken_rules", array_join(col("_broken"), ","))
      .drop("_broken")
  }

  /** Per-column dataset profile — the schema-discovery / data-quality scan
    * run before a new source joins a pipeline: row count, null count and
    * distinct cardinality per column, in ONE aggregation pass (Spark plans
    * the multi-column distinct as a single Expand + aggregate — one wide
    * stage, no per-column rescan) then unpivoted to one row per column.
    * `exact = false` swaps COUNT(DISTINCT) for HLL `approx_count_distinct`,
    * the 100 TB default — Expand multiplies rows ×(columns+1) for exact
    * multi-distinct, which is the documented cost of exactness here. */
  def profile(df: DataFrame, columns: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(columns.nonEmpty, "no columns to profile")
    val aggs = count(lit(1)).as("_rows") +: columns.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"),
      (if (exact) countDistinct(col(c))
       else approx_count_distinct(col(c))).as(s"_nd_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = columns.map(c => struct(lit(c).as("column"),
      col(s"_nulls_$c").as("n_nulls"), col(s"_nd_$c").as("n_distinct")))
    wide.select(col("_rows").as("n_rows"), explode(array(entries: _*)).as("e"))
      .select(col("e.column").as("column"), col("n_rows"),
        col("e.n_nulls").as("n_nulls"), col("e.n_distinct").as("n_distinct"))
  }
}
