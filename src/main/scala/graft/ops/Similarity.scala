package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`ARRAY<FLOAT>`). Part of the training-data-pipeline extension surface
  * (north star; absent in the reference).
  *
  * Scale posture:
  *   - [[bruteForceTopK]] is the exactness baseline: one pass over the corpus
  *     per query batch, a broadcast of the (small) query set, and a
  *     TakeOrderedAndProject top-k — no shuffle of the corpus itself.
  *   - [[ivfTopK]] is the scale path: corpus pre-partitioned by a cluster
  *     assignment (here the precomputed `label` column stands in for IVF
  *     centroid assignment); a query probes only its cluster's partition,
  *     cutting the scanned fraction to ~1/nlist.
  *   - [[cosineLshTopK]] buckets by random-hyperplane sign bits (deterministic
  *     md5-seeded planes) and scans only the query's bucket — recall tunable
  *     by `bits`.
  *
  * All arithmetic is element-wise double fold in array order, reproducible by
  * the DuckDB oracle (`list_transform`/`list_sum` over the same lists).
  */
object Similarity {

  /** Σ aᵢ·bᵢ as an ordered left fold (deterministic summation order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Codegen'd fused cosine ([[graft.functions.CosineSimilarity]]): one
    * generated loop computes dot and both norms, replacing the interpreted
    * higher-order-function fold that dominated the similarity family's wall
    * time (HOF lambdas evaluate expression trees per ELEMENT — measured r8,
    * the whole s/d-embedding family was HOF-bound, not data-bound). The
    * accumulation order matches `dot/(norm·norm)` exactly (ExpressionsSpec
    * asserts bit-equality through codegen), so oracle hashes are unchanged.
    * Zero-norm/mismatched-length inputs yield NULL (dropped by every ≥
    * threshold filter and sorted last in top-k) where the fold form gave
    * NaN (which Spark sorts FIRST in a descending top-k — strictly worse
    * for degenerate vectors). NOTE this diverges from the DuckDB oracle's
    * explicit `dot/(nrm*qn)` division, which follows IEEE on a zero norm
    * (NaN/Inf, kept by comparisons per DuckDB's float semantics); the
    * oracle corpus contains no zero-norm vectors, so the divergence is
    * documented, not a hashed path. */
  private def cosine(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** The ops below score with the registry-resolved `cosine_similarity`;
    * registration is idempotent and per-session. */
  private def ensureExprs(df: DataFrame): Unit =
    graft.functions.GraftExtensions.register(df.sparkSession)

  /** Exact cosine top-k against one query vector (given as the row of
    * `df` with `idCol == queryId`). Returns (id, cosine) — k rows, best
    * first; the query row itself is excluded. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, roundTo: Int = 4): DataFrame = {
    ensureExprs(df)
    val q = df.filter(col(idCol) === queryId).select(col(vecCol).as("qv"))
    df.filter(col(idCol) =!= queryId)
      .join(broadcast(q))
      .select(col(idCol).as("id"),
        round(cosine(col(vecCol), col("qv")), roundTo).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Codegen'd Σ aᵢ·bᵢ ([[graft.functions.DotProduct]]) — same rationale
    * as the fused cosine: the HOF fold interprets per element. */
  private def dotFast(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  /** Exact maximum-inner-product top-k (MIPS) against one query vector —
    * the recommendation/retrieval scoring where magnitude MATTERS (user·item
    * affinity, unnormalized retrieval logits), so cosine top-k is the wrong
    * operator. Same physical shape as [[bruteForceTopK]]: broadcast the one
    * query row, one corpus scan, TakeOrderedAndProject — the corpus never
    * shuffles. */
  def mipsTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, roundTo: Int = 4): DataFrame = {
    ensureExprs(df)
    val q = df.filter(col(idCol) === queryId).select(col(vecCol).as("qv"))
    df.filter(col(idCol) =!= queryId)
      .join(broadcast(q))
      .select(col(idCol).as("id"),
        round(dotFast(col(vecCol), col("qv")), roundTo).as("ip"))
      .orderBy(col("ip").desc, col("id"))
      .limit(k)
  }

  /** The MIPS→cosine reduction (Bachrach et al., RecSys 2014 — public):
    * append sqrt(M² − ‖x‖²) to every corpus vector, where M = max corpus
    * norm. Every augmented vector then has norm EXACTLY M, so for a query
    * augmented with 0, cosine([q;0], [x;√(M²−‖x‖²)]) = ⟨q,x⟩/(‖q‖·M) —
    * monotone in the inner product. That turns EVERY cosine ANN structure
    * in this module (LSH buckets, IVF, PQ) into a MIPS index with zero new
    * machinery. One aggregation computes M (a 1-row broadcast); the
    * augmentation itself is a map-only projection. Returns
    * (`idCol`, `vecCol` augmented, max_norm). */
  def mipsAugment(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val withNorm = df.select(col(idCol), col(vecCol), norm(col(vecCol)).as("_n"))
    val m = withNorm.agg(max(col("_n")).as("max_norm"))
    withNorm.join(broadcast(m))
      // greatest(…, 0): FP can push M² − ‖x‖² a hair negative for the max row
      .select(col(idCol),
        concat(col(vecCol),
          array(sqrt(greatest(col("max_norm") * col("max_norm")
            - col("_n") * col("_n"), lit(0.0))).cast("float"))).as(vecCol),
        col("max_norm"))
  }

  /** MIPS through the reduction at scale: LSH-bucket the AUGMENTED corpus,
    * probe the query's bucket (plus `probeRadius` flipped-bit neighbors —
    * [[probeMasks]]), then re-score the shortlist by EXACT inner product on
    * the ORIGINAL vectors (shortlist-refine, the s18 posture: ranking never
    * trusts the blocking). The query augments with 0, so its bucket uses
    * the same d+1-dim planes. Full radius (= bits) probes every bucket —
    * the spec pins that case ≡ [[mipsTopK]] exactly. */
  def mipsTopKLsh(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, bits: Int = 4, probeRadius: Int = 1,
      roundTo: Int = 4): DataFrame = {
    require(bits >= 1 && probeRadius >= 0 && probeRadius <= bits,
      s"radius $probeRadius outside [0, $bits]")
    ensureExprs(df)
    val aug = mipsAugment(df, idCol, vecCol)
    val dim = probeDim(aug, vecCol)
    val bucketOf: Column => Column =
      v => dim.map(lshBucket(v, bits, _)).getOrElse(lshBucket(v, bits))
    val corpus = aug.select(col(idCol).as("id"), bucketOf(col(vecCol)).as("_b"))
    // query augments with 0 (directly from df — no need to re-derive the
    // corpus augmentation); bucket computed ONCE, probes XOR the COLUMN —
    // inlining the dim-unrolled bucket per mask multiplies a ~10³-node
    // expression by 2^probe and stalls codegen (measured: this round)
    val qAug = df.filter(col(idCol) === queryId)
      .select(concat(col(vecCol), array(lit(0.0f))).as("qv"))
      .select(bucketOf(col("qv")).as("_qb0"))
      .select(explode(array(probeMasks(bits, probeRadius).map(m =>
        col("_qb0").bitwiseXOR(lit(m))): _*)).as("_b"))
    val shortlist = corpus.join(broadcast(qAug), Seq("_b"))
      .filter(col("id") =!= queryId).select("id")
    val q = df.filter(col(idCol) === queryId).select(col(vecCol).as("qv"))
    df.join(shortlist, df(idCol) === shortlist("id"), "left_semi")
      .join(broadcast(q))
      .select(col(idCol).as("id"),
        round(dotFast(col(vecCol), col("qv")), roundTo).as("ip"))
      .orderBy(col("ip").desc, col("id"))
      .limit(k)
  }

  /** Exact batched cosine top-k — the recall baseline for every ANN path:
    * one broadcast of the query set, ONE full corpus scan regardless of how
    * many queries ride it, per-query window top-k (partition = query id,
    * so the sort is per-query, never global). At 100 TB this is the
    * measurement harness, not the serving path: run it over a SAMPLED
    * query set and feed [[recallAtK]] to score an ANN configuration.
    * Returns (query_id, id, cosine), k rows per query, self-matches
    * excluded. */
  def bruteForceTopKBatch(df: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, roundTo: Int = 4): DataFrame = {
    ensureExprs(df)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = df.join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("id"),
        round(cosine(col(vecCol), col("qv")), roundTo).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("id"))
    scored.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Recall@k of an approximate neighbor frame against an exact one — the
    * metric every ANN tuning loop needs (probe counts, LSH bits, IVF cells
    * are recall/cost dials; this measures the recall side). Both inputs
    * carry (query_id, id, ...); per query: |approx ∩ exact| / |exact|,
    * rounded to 6 dp, 0.0 when the approx frame missed a query entirely.
    * Shuffles key on (query_id, id) then query_id — evaluation-sized, not
    * corpus-sized. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("id"))
    val e = exact.select(col("query_id"), col("id"))
    val hits = a.join(e, Seq("query_id", "id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    e.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / col("n_exact"), 6)
          .as("recall"))
  }

  /** IVF-style probe: identical contract to [[bruteForceTopK]] but scans only
    * rows whose `clusterCol` equals the query's cluster. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, clusterCol: String,
      queryId: Long, k: Int, roundTo: Int = 4): DataFrame = {
    ensureExprs(df)
    val q = df.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), col(clusterCol).as("qc"))
    df.filter(col(idCol) =!= queryId)
      .join(broadcast(q), col(clusterCol) === col("qc"))
      .select(col(idCol).as("id"),
        round(cosine(col(vecCol), col("qv")), roundTo).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** IVF coarse-quantizer assignment against an explicit codebook: every
    * row gets `_cid` = the codebook id with the highest cosine to its
    * vector (`_sim`, rounded; ties → lowest cid). The codebook is tiny by
    * definition (learned offline, e.g. k-means over a sample), so it folds
    * into ONE projected expression — the corpus is never shuffled, never
    * joined, and the assignment is pure codegen'd map work: the only shape
    * that scales to re-quantizing a 100 TB corpus. Cosines are computed as
    * the same ordered fold as [[dot]]/[[norm]], so an external engine
    * reproduces assignments bit-for-bit. */
  def assignByCodebook(df: DataFrame, vecCol: String,
      codebook: Seq[(Int, Seq[Double])], roundTo: Int = 6): DataFrame = {
    require(codebook.nonEmpty, "empty codebook")
    // a zero-norm centroid would make every cosine NaN, and NaN sorts above
    // every number in Spark — the whole corpus would silently land there
    require(codebook.forall { case (_, v) => v.exists(_ != 0.0) },
      "codebook contains a zero vector (undefined cosine)")
    val v = col(vecCol)
    val n = norm(v)
    val scored = codebook.map { case (cid, cvec) =>
      val cArr = array(cvec.map(lit): _*)
      val cNorm = math.sqrt(cvec.map(x => x * x).sum)
      // struct orders lexicographically: highest sim wins, then lowest cid
      // (negated so the max picks the smallest id on ties)
      struct(round(dot(v, cArr) / (n * lit(cNorm)), roundTo).as("sim"),
        lit(-cid).as("negcid"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    df.withColumn("_best", best)
      .withColumn("_cid", -col("_best.negcid"))
      .withColumn("_sim", col("_best.sim"))
      .drop("_best")
  }

  /** The `nprobe` nearest codebook cells for a vector, as an array column —
    * the IVF multi-probe set. Same scoring/rounding/tie rules as
    * [[assignByCodebook]] (cosine rounded to `roundTo`, ties → lowest cid;
    * `probeCells(...)[0]` IS the assignment), computed like it: the tiny
    * codebook folds into one projected expression, so deriving each
    * query's probe set is pure codegen'd map work — no shuffle, no join,
    * no driver collect of query vectors. */
  def probeCells(vecCol: Column, codebook: Seq[(Int, Seq[Double])],
      nprobe: Int, roundTo: Int = 6): Column = {
    require(codebook.nonEmpty, "empty codebook")
    require(nprobe >= 1 && nprobe <= codebook.size,
      s"nprobe $nprobe outside [1, ${codebook.size}]")
    require(codebook.forall { case (_, v) => v.exists(_ != 0.0) },
      "codebook contains a zero vector (undefined cosine)")
    val v = vecCol
    val n = norm(v)
    val scored = codebook.map { case (cid, cvec) =>
      val cArr = array(cvec.map(lit): _*)
      val cNorm = math.sqrt(cvec.map(x => x * x).sum)
      // lexicographic struct sort: ascending (−sim, cid) = best sim first,
      // ties to the lowest cid — the assignByCodebook order
      struct((-round(dot(v, cArr) / (n * lit(cNorm)), roundTo)).as("negsim"),
        lit(cid).as("cid"))
    }
    slice(transform(array_sort(array(scored: _*)), s => s.getField("cid")),
      1, nprobe)
  }

  /** IVF top-k with multi-probe: the query scans its `nprobe` NEAREST
    * cells instead of only the argmax cell — the recall dial IVF ships
    * (scanned fraction ≈ nprobe/nlist). nprobe = 1 is exactly the
    * single-cell probe; nprobe = nlist degenerates to brute force.
    * Corpus assignment stays the shuffle-free [[assignByCodebook]]
    * projection; the probe set rides the broadcast query row. */
  def ivfTopKNprobe(df: DataFrame, idCol: String, vecCol: String,
      codebook: Seq[(Int, Seq[Double])], queryId: Long, k: Int,
      nprobe: Int, roundTo: Int = 4): DataFrame = {
    ensureExprs(df)
    val assigned = assignByCodebook(df, vecCol, codebook)
    val q = assigned.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"),
        probeCells(col(vecCol), codebook, nprobe).as("qcells"))
    assigned.filter(col(idCol) =!= queryId)
      .join(broadcast(q), array_contains(col("qcells"), col("_cid")))
      .select(col(idCol).as("id"), col("_cid").as("cid"),
        round(cosine(col(vecCol), col("qv")), roundTo).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a value in [-0.5, 0.5) derived from md5 — reproducible everywhere. */
  private def planeComponent(plane: Column, dim: Column): Column =
    (conv(substring(md5(concat_ws(":", plane, dim)), 1, 8), 16, 10).cast("long")
      .cast("double") / lit(4294967296.0)) - lit(0.5)

  /** Driver-side mirror of [[planeComponent]] — MUST stay bit-identical to
    * the SQL form (md5 of "plane:i", first 8 hex chars as an unsigned int,
    * /2³² − 0.5; every step exact in double). Lets plane matrices fold into
    * LITERALS at plan time instead of re-hashing per element per row. */
  def planeComponentValue(plane: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16).toDouble / 4294967296.0 - 0.5
  }

  /** Sign-bit bucket id for a vector under `bits` random hyperplanes.
    * Generic (dim-agnostic) form: the plane component is re-derived from
    * md5 per ELEMENT per ROW inside an interpreted lambda — correct
    * anywhere, but measured r8 as the dominant cost of every LSH query.
    * Prefer the dim-unrolled overload when the vector width is known. */
  def lshBucket(vec: Column, bits: Int): Column = {
    val bitCols = (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(lit(p), i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Dim-unrolled [[lshBucket]]: plane components are Scala-computed
    * LITERALS and each projection is a flat codegen'd sum — no md5 at
    * runtime, no interpreted lambdas. Bit-identical to the generic form
    * for rows of width ≤ `dim` (missing tail elements contribute exactly
    * the 0.0 the generic fold never adds; a row WIDER than `dim` would
    * diverge — callers probe the actual width, and embedding columns are
    * uniform-width by construction). */
  def lshBucket(vec: Column, bits: Int, dim: Int): Column = {
    val bitCols = (0 until bits).map { p =>
      val proj = (0 until dim).map(i =>
        coalesce(try_element_at(vec, lit(i + 1)).cast("double"), lit(0.0)) *
          lit(planeComponentValue(p, i))).reduce(_ + _)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** First non-empty vector's width, from one tiny LIMIT-1 job (reads one
    * row of one partition — not a scan). None on an empty frame. */
  def probeDim(df: DataFrame, vecCol: String): Option[Int] =
    df.select(size(col(vecCol)).as("n")).filter(col("n") > 0)
      .limit(1).collect().headOption.map(_.getInt(0))

  /** Precompute a reusable bucketed corpus for repeated LSH queries: adds
    * `_bucket` (sign-bit id under `bits` hyperplanes), clustered by bucket
    * so each probe reads co-located partitions. Persist/write this once;
    * per-query work then drops to one bucket scan with NO per-row
    * hyperplane projections recomputed. (No `_norm` column: the fused
    * cosine_similarity expression computes norms inline, so shipping a
    * precomputed norm through every LSH shuffle was dead weight — r9.) */
  def bucketize(df: DataFrame, vecCol: String, bits: Int): DataFrame = {
    val bucket = probeDim(df, vecCol)
      .map(dim => lshBucket(col(vecCol), bits, dim))
      .getOrElse(lshBucket(col(vecCol), bits))
    df.withColumn("_bucket", bucket)
      .repartition(col("_bucket"))
  }

  /** LSH cosine top-k over a [[bucketize]]d corpus (must carry `_bucket`).
    * Only the query's bucket is scanned. */
  def cosineLshTopKPre(bucketed: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, roundTo: Int = 4): DataFrame = {
    ensureExprs(bucketed)
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), col("_bucket").as("qb"))
    bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(q), col("_bucket") === col("qb"))
      .select(col(idCol).as("id"),
        round(cosine(col(vecCol), col("qv")), roundTo).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Multi-probe LSH top-k over a [[bucketize]]d corpus: probes the query's
    * bucket plus every bucket at Hamming distance 1 (one hyperplane sign
    * flipped). A near neighbor separated from the query by a single
    * borderline plane — the dominant LSH miss mode — is recovered at
    * (bits+1)× the probe cost, still ≪ a full scan. Probe values are
    * distinct, so each corpus row joins at most once. */
  def cosineLshTopKMultiProbe(bucketed: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, bits: Int, roundTo: Int = 4): DataFrame = {
    val probes = array((0 until bits).map(i =>
      col("_bucket").bitwiseXOR(lit(1L << i))) :+ col("_bucket"): _*)
    ensureExprs(bucketed)
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), explode(probes).as("qb"))
    bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(q), col("_bucket") === col("qb"))
      .select(col(idCol).as("id"),
        round(cosine(col(vecCol), col("qv")), roundTo).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** BATCHED LSH top-k: one pass answers a whole query SET (real pipelines
    * probe thousands of queries at once — a per-query loop would rescan the
    * corpus per query). `queries` must carry `_bucket` computed with the
    * SAME planes/bits as the [[bucketize]]d corpus (corpus-derived query
    * rows — e.g. `bucketed.filter(id isin ...)` — already do).
    *
    * The join stays on `_bucket` (each query touches one bucket; the query
    * set is broadcast), and ranking is a per-query window top-k — partition
    * = query id, so the sort is per-query, never global. Rows whose corpus
    * id equals the query id are excluded (self-match). Returns
    * (query_id, id, cosine): k rows per query. */
  def cosineLshTopKBatch(bucketed: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, roundTo: Int = 4): DataFrame = {
    ensureExprs(bucketed)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col("_bucket").as("qb"))
    val scored = bucketed
      .join(broadcast(q), col("_bucket") === col("qb") && col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("id"),
        round(cosine(col(vecCol), col("qv")), roundTo).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("id"))
    scored.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** BATCHED multi-probe LSH top-k — the shipped high-recall configuration
    * (vs [[cosineLshTopKBatch]]'s single-bucket probe): each query probes
    * every bucket within Hamming distance `radius` of its own (radius 1 =
    * one borderline hyperplane forgiven — the dominant LSH miss mode;
    * radius 2 = two). The probe masks are plan-time literals (Σ_{r≤radius}
    * C(bits, r) of them — e.g. 11 for bits=4 r=2, 37 for bits=8 r=2), the
    * query set explodes by probe and broadcasts, and the corpus is still
    * read ONCE with each row joining at most once per query (probe buckets
    * are distinct). Scanned corpus fraction ≈ probes/2^bits — the
    * recall/cost dial [[recallAtK]] tunes; s13 pins the shipped point. */
  /** XOR masks for every bucket within Hamming distance `radius`:
    * enumerated as bit-position combinations — Σ_{r≤radius} C(bits, r)
    * masks materialized directly, never a 2^bits scan (bits=24 r=1 is 25
    * masks, not a 16M-element driver filter). */
  private[ops] def probeMasks(bits: Int, radius: Int): Seq[Long] =
    (0 to radius).flatMap(r =>
      (0 until bits).combinations(r)
        .map(_.foldLeft(0L)((m, i) => m | (1L << i))).toSeq)

  def cosineLshTopKBatchMultiProbe(bucketed: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int, radius: Int = 1,
      roundTo: Int = 4): DataFrame = {
    require(radius >= 0 && radius <= bits, s"radius $radius outside [0, $bits]")
    ensureExprs(bucketed)
    val probes = array(probeMasks(bits, radius)
      .map(m => col("_bucket").bitwiseXOR(lit(m))): _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(probes).as("qb"))
    val scored = bucketed
      .join(broadcast(q), col("_bucket") === col("qb") && col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("id"),
        round(cosine(col(vecCol), col("qv")), roundTo).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("id"))
    scored.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** One-shot LSH-bucketed cosine top-k. For repeated queries against the
    * same corpus, [[bucketize]] once and use [[cosineLshTopKPre]]. */
  def cosineLshTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, bits: Int = 8, roundTo: Int = 4): DataFrame =
    cosineLshTopKPre(
      df.withColumn("_bucket", lshBucket(col(vecCol), bits)),
      idCol, vecCol, queryId, k, roundTo)

  // ------------------------------------------------- persisted vector index

  /** The vector-search analog of the dedup signature store: [[bucketize]]'s
    * LSH layout persisted as ONE bucketed table `<name>_vlsh`
    * (id BIGINT, vec ARRAY<FLOAT>, bucket BIGINT — canonical names so
    * fresh-JVM re-registration needs no schema sidecar), clustered+sorted
    * by bucket. Queries across sessions and processes probe pre-clustered
    * partitions without re-bucketing the corpus; `bits` is pinned in
    * TBLPROPERTIES so query-side bucket derivation always hashes with the
    * stored planes. Same [[graft.engine.WarehouseMeta]] durability
    * contract as `Dedup.ensureSignatureStore`: matching fingerprint never
    * rebuilds (fresh JVM re-registers metadata-only), changed fingerprint
    * rebuilds. Returns true if a build ran. */
  def ensureVectorIndex(spark: org.apache.spark.sql.SparkSession,
      df: => DataFrame, idCol: String, vecCol: String, name: String,
      fingerprint: String, bits: Int, buckets: Int = 16): Boolean = {
    import graft.engine.WarehouseMeta
    val table = s"${name}_vlsh"
    WarehouseMeta.withBuildLock(spark, name) {
      val inCatalog = spark.catalog.tableExists(table) &&
        WarehouseMeta.storedFingerprint(spark, table).contains(fingerprint)
      lazy val reRegistered = WarehouseMeta.readSidecar(spark, s"${name}_meta.tsv")
        .exists { m =>
          m.get("sig").contains(fingerprint) &&
            m.get("buckets").contains(buckets.toString) &&
            m.get("bits").contains(bits.toString) &&
            java.nio.file.Files.isDirectory(WarehouseMeta.tableLocation(spark, table)) &&
            !spark.catalog.tableExists(table) && {
              spark.sql(
                s"""CREATE TABLE $table (id BIGINT, vec ARRAY<FLOAT>, bucket BIGINT)
                   |USING PARQUET
                   |CLUSTERED BY (bucket) SORTED BY (bucket) INTO $buckets BUCKETS
                   |LOCATION '${WarehouseMeta.tableLocation(spark, table).toUri}'
                   |TBLPROPERTIES ('graft.fingerprint' = '$fingerprint',
                   |  'graft.bits' = '$bits')""".stripMargin)
              true
            }
        }
      if (inCatalog || reRegistered) false
      else {
        val src = df
        val bucket = probeDim(src, vecCol)
          .map(dim => lshBucket(col(vecCol), bits, dim))
          .getOrElse(lshBucket(col(vecCol), bits))
        WarehouseMeta.replaceBucketedTable(spark, table, "bucket", buckets,
          src.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
            bucket.as("bucket")),
          Map("graft.fingerprint" -> fingerprint, "graft.bits" -> bits.toString))
        // a rebuild starts a new corpus state: tombstones from the previous
        // one must not delete freshly indexed rows, and stale ingest-loop
        // batch commits must not suppress a new stream's appends
        WarehouseMeta.dropIdManifest(spark, s"${name}_vtomb")
        WarehouseMeta.deleteRecursively(
          WarehouseMeta.tableLocation(spark, s"${name}_vingest_log"))
        WarehouseMeta.writeSidecar(spark, s"${name}_meta.tsv", Map(
          "sig" -> fingerprint, "buckets" -> buckets.toString,
          "bits" -> bits.toString))
        true
      }
    }
  }

  /** The stored index as a [[bucketize]]-shaped frame (idCol/vecCol names
    * restored, `_bucket` ready for every `cosineLshTopK*` operator) plus
    * its stored `bits`. */
  def vectorIndex(spark: org.apache.spark.sql.SparkSession, name: String,
      idCol: String, vecCol: String): (DataFrame, Int) = {
    val table = s"${name}_vlsh"
    val bits = storedBits(spark, table)
    val base = spark.table(table).select(col("id").as(idCol),
      col("vec").as(vecCol), col("bucket").as("_bucket"))
    // Tombstone-aware: deletes land in `<name>_vtomb` until the next
    // [[compactVectorIndex]]; the manifest is small by contract, so the
    // anti-join broadcasts and the scan keeps its bucketed distribution
    // (no Exchange added — SimilaritySpec lifecycle case pins this).
    // idManifest re-registers a surviving tombstone dir in a fresh JVM —
    // a restart must never resurrect deleted vectors.
    val live = graft.engine.WarehouseMeta.idManifest(spark, s"${name}_vtomb")
      .map(t => base.join(broadcast(t.select(col("id").as(idCol))),
        Seq(idCol), "left_anti"))
      .getOrElse(base)
    (live, bits)
  }

  private def storedBits(spark: org.apache.spark.sql.SparkSession,
      table: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .properties.getOrElse("graft.bits",
        sys.error(s"$table has no graft.bits property — not a vector index")).toInt

  /** Append a new vector batch into a persisted index: rows are bucketed
    * with the STORED `bits` (same deterministic planes) and `insertInto`
    * writes bucket-correct files — existing data is never reshuffled, the
    * same maintained-index posture as `Dedup.appendSignatureStore`. The
    * build fingerprint covers only the initial corpus; callers own folding
    * append provenance into it (or re-ensuring with a new fingerprint to
    * trigger a clean rebuild). Appending an id that is currently TOMBSTONED
    * fails loudly — the rows would be invisible until the next compaction
    * physically deleted them; [[compactVectorIndex]] first to re-ingest a
    * forgotten id. */
  def appendVectorIndex(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, idCol: String, vecCol: String, name: String): Unit = {
    val table = s"${name}_vlsh"
    graft.engine.WarehouseMeta.requireNotTombstoned(spark, s"${name}_vtomb",
      df.select(col(idCol).cast("long").as("id")), s"vector index $name")
    val bits = storedBits(spark, table)
    val bucket = probeDim(df, vecCol)
      .map(dim => lshBucket(col(vecCol), bits, dim))
      .getOrElse(lshBucket(col(vecCol), bits))
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
        bucket.as("bucket"))
      .write.mode(org.apache.spark.sql.SaveMode.Append).insertInto(table)
  }

  /** Delete vectors from a persisted index by id — tombstones, not a
    * rewrite: ids append to the tiny `<name>_vtomb` table and every
    * [[vectorIndex]] read anti-joins them out until [[compactVectorIndex]]
    * folds them in physically. Parquet has no row-level delete; at 100 TB
    * the rewrite is deferred and batched, never paid per delete. */
  def deleteFromVectorIndex(spark: org.apache.spark.sql.SparkSession,
      name: String, ids: Seq[Long]): Unit =
    graft.engine.WarehouseMeta.appendToIdManifest(spark, name,
      s"${name}_vtomb", ids)

  /** Fold accumulated tombstones into the index: rewrite survivors into a
    * STAGED bucketed table (bucket values are reused, so the rewrite
    * shuffles on `bucket` only — planes are never re-evaluated), swap the
    * staged files into the live location, and drop the tombstone table.
    * Staging first means the rewrite never reads files it is deleting; the
    * swap is metadata + a directory move. Returns true if a compaction ran
    * (false when there are no tombstones to fold).
    *
    * STOP STREAMS FIRST: a running [[annCandidatesStream]] resolved its
    * plan over the current index and tombstone files at query start — the
    * swap replaces those files, so its next micro-batch fails with
    * missing-file errors. Compact between stream restarts (the restart
    * then also picks up all deletes, per [[deleteFromVectorIndex]]). */
  def compactVectorIndex(spark: org.apache.spark.sql.SparkSession,
      name: String): Boolean = {
    import graft.engine.WarehouseMeta
    val table = s"${name}_vlsh"
    val tomb = s"${name}_vtomb"
    WarehouseMeta.withBuildLock(spark, name) {
      // resolve any crashed ingest batch before rewriting files — see
      // Dedup.compactSignatureStore / WarehouseMeta.rollbackStaleIntents
      WarehouseMeta.rollbackStaleIntents(spark, s"${name}_vingest_log", Seq(table))
      val manifest = WarehouseMeta.idManifest(spark, tomb)
      if (manifest.isEmpty) false
      else {
        val meta = spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        val props = meta.properties.filter { case (k, _) => k.startsWith("graft.") }
        val buckets = meta.bucketSpec.map(_.numBuckets).getOrElse(16)
        val survivors = spark.table(table)
          .join(broadcast(manifest.get.select("id")), Seq("id"), "left_anti")
          .select("id", "vec", "bucket")
        WarehouseMeta.swapRewriteBucketedTable(spark, table, "bucket", buckets,
          "id BIGINT, vec ARRAY<FLOAT>, bucket BIGINT", survivors, props)
        WarehouseMeta.dropIdManifest(spark, tomb)
        true
      }
    }
  }

  /** Apply ONE vector-ingest micro-batch to the persisted index,
    * EXACTLY-ONCE under replays — the vector twin of
    * `Dedup.applyIngestBatch`, sharing its commit-log protocol
    * ([[graft.engine.WarehouseMeta.exactlyOnceBatch]]): near-dup
    * candidates of the batch against the INDEX (same-bucket probe widened
    * by `radius`, cosine ≥ minCosine) AND within the batch itself
    * ([[graft.ops.Dedup.embeddingDupPairsLsh]] at the stored bits — with
    * AvailableNow a whole backlog drains as one batch, so same-batch dups
    * are a primary case) land idempotently in `candsPath/batch=<batchId>/`
    * tagged `src` = `corpus`/`batch` and normalized (id_a < id_b); the
    * ACCEPTED vectors (no corpus match, not the greater side of a
    * within-batch pair) append bucket-correct into the index so the NEXT
    * batch sees them. Returns the accepted count (-1 for a skipped
    * replay). Runs under the index's build lock. */
  def applyVectorIngestBatch(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, batchId: Long, idCol: String, vecCol: String,
      name: String, candsPath: String, minCosine: Double,
      radius: Int = 0, roundTo: Int = 4): Long = {
    import graft.engine.WarehouseMeta
    WarehouseMeta.withBuildLock(spark, name) {
      WarehouseMeta.exactlyOnceBatch(spark, s"${name}_vingest_log", batchId,
          Seq(s"${name}_vlsh")) {
        val (indexed, bits) = vectorIndex(spark, name, "old_id", "old_vec")
        require(radius >= 0 && radius <= bits, s"radius $radius outside [0, $bits]")
        ensureExprs(batch)
        val dim = probeDim(indexed, "old_vec")
        val qBucket = dim.map(d => lshBucket(col(vecCol), bits, d))
          .getOrElse(lshBucket(col(vecCol), bits))
        val probed = batch.select(col(idCol).cast("long").as("new_id"),
            col(vecCol).as("new_vec"), qBucket.as("_qb0"))
          .select(col("new_id"), col("new_vec"),
            explode(array(probeMasks(bits, radius)
              .map(m => col("_qb0").bitwiseXOR(lit(m))): _*)).as("qb"))
        val cross = probed.join(indexed,
            col("_bucket") === col("qb") && col("old_id") =!= col("new_id"))
          .select(least(col("new_id"), col("old_id")).as("id_a"),
            greatest(col("new_id"), col("old_id")).as("id_b"),
            round(cosine(col("old_vec"), col("new_vec")), roundTo).as("cosine"))
          .filter(col("cosine") >= minCosine)
          .distinct()
          .withColumn("src", lit("corpus"))
        val inner = graft.ops.Dedup.embeddingDupPairsLsh(
            batch.select(col(idCol).cast("long").as(idCol), col(vecCol)),
            idCol, vecCol, minCosine, bits)
          .withColumn("cosine", round(col("cosine"), roundTo))
          .withColumn("src", lit("batch"))
        cross.unionByName(inner)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$candsPath/batch=$batchId")
        val landed = spark.read.parquet(s"$candsPath/batch=$batchId")
        val dropIds = landed.filter(col("src") === "corpus")
          .select(explode(array(col("id_a"), col("id_b"))).as("_dup"))
          .unionByName(landed.filter(col("src") === "batch")
            .select(col("id_b").as("_dup")))
          .distinct()
        val accepted = batch.join(dropIds,
          batch(idCol).cast("long") === dropIds("_dup"), "left_anti")
        val nAccepted = accepted.count()
        if (nAccepted > 0)
          appendVectorIndex(spark, accepted, idCol, vecCol, name)
        nAccepted
      }.getOrElse(-1L)
    }
  }

  /** The closed VECTOR ingest loop as a stream: each micro-batch is
    * near-dup-checked against the index and the accepted vectors are
    * indexed before the next batch — [[applyVectorIngestBatch]] under
    * foreachBatch with AvailableNow, restart-safe end to end exactly like
    * `Dedup.dedupIngestStream` (streaming checkpoint replays uncommitted
    * batchIds; the commit log makes each index append exactly-once). */
  def annIngestStream(spark: org.apache.spark.sql.SparkSession,
      vecStream: DataFrame, idCol: String, vecCol: String, name: String,
      candsPath: String, checkpoint: String, minCosine: Double,
      radius: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    vecStream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyVectorIngestBatch(b.sparkSession, b, id, idCol, vecCol, name,
          candsPath, minCosine, radius)
        // refresh the caller's session too (insertInto only refreshes the
        // stream's session clone — see Dedup.dedupIngestStream)
        spark.catalog.refreshTable(s"${name}_vlsh")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** STREAMING ANN candidates against the persisted index: query vectors
    * arrive as a stream, each row derives its probe bucket locally
    * ([[lshBucket]] is already a stateless per-row expression), and a
    * stream-STATIC join against the bucketed index scores every candidate
    * in the query's bucket — append-mode, zero stateful operators.
    *
    * Deliberately emits SCORED CANDIDATES, not top-k: per-query ranking on
    * an unbounded stream is a stateful aggregation whose state never
    * closes without a watermark contract; the production shape is
    * candidates → downstream ranker (or a windowed top-k the caller owns).
    * Exact cosines ride along, so ranking is a trivial consumer step;
    * SimilaritySpec pins candidate-set ≡ the batch scored set. */
  def annCandidatesStream(spark: org.apache.spark.sql.SparkSession,
      queryStream: DataFrame, idCol: String, vecCol: String, name: String,
      roundTo: Int = 4, radius: Int = 0): DataFrame = {
    // ensure the tombstone manifest exists BEFORE the plan resolves, so
    // every (re)start of the stream enforces all deletes recorded so far
    // (see dedupIncrementStream — same stream-static visibility contract)
    graft.engine.WarehouseMeta.ensureIdManifest(spark, name, s"${name}_vtomb")
    val (indexed, bits) = vectorIndex(spark, name, "id", "vec")
    require(radius >= 0 && radius <= bits, s"radius $radius outside [0, $bits]")
    ensureExprs(queryStream)
    val dim = probeDim(indexed, "vec")
    val qBucket = dim.map(d => lshBucket(col(vecCol), bits, d))
      .getOrElse(lshBucket(col(vecCol), bits))
    // multi-probe (radius > 0) mirrors cosineLshTopKBatchMultiProbe — the
    // shipped s13 recall dial is available on the ingest path too: probe
    // masks are plan-time literals, each query row explodes into its probe
    // set BEFORE the stream-static join, still stateless and append-mode
    val q = queryStream.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        qBucket.as("_qb0"))
      .select(col("query_id"), col("qv"),
        explode(array(probeMasks(bits, radius)
          .map(m => col("_qb0").bitwiseXOR(lit(m))): _*)).as("qb"))
    q.join(indexed, col("_bucket") === col("qb") && col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        round(cosine(col("vec"), col("qv")), roundTo).as("cosine"))
  }

  // ----------------------------------------------------- product quantization

  /** Squared L2 distance between two array columns as an ordered left fold
    * (deterministic summation order, like [[dot]]). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)

  /** PQ codebooks: `codebooks(j)` is subspace `j`'s centroid list
    * (cid, centroid subvector). Subspaces tile the vector in order; every
    * centroid in a subspace must share one length, which defines the tile. */
  type PqCodebooks = Seq[Seq[(Int, Seq[Double])]]

  /** Product-quantization encode: each vector is split into `codebooks.size`
    * consecutive subvectors, and each subvector is replaced by the id of its
    * nearest centroid (squared L2, rounded to `roundTo` before the argmin;
    * ties → lowest cid). Adds `_code` = ARRAY<INT> of length M.
    *
    * This is the compact-code scale path for ANN over 100 TB of vectors:
    * like [[assignByCodebook]], the (tiny, offline-learned) codebooks fold
    * into ONE projected expression — encoding is pure codegen'd map work
    * with no shuffle and no join, and the stored corpus shrinks from
    * D floats to M bytes per row. Train with [[trainPqCodebooks]] or plug
    * in externally-learned centroids. */
  def encodePq(df: DataFrame, vecCol: String, codebooks: PqCodebooks,
      roundTo: Int = 6): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebooks")
    var off = 1 // Spark slice() is 1-based
    val codes = codebooks.map { cents =>
      val len = cents.head._2.length
      require(cents.forall(_._2.length == len), "ragged centroids in one subspace")
      val sub = slice(col(vecCol), off, len)
      off += len
      val scored = cents.map { case (cid, cvec) =>
        // struct orders lexicographically: least() takes the smallest
        // distance, then the smallest cid
        struct(round(sqDist(sub, array(cvec.map(lit): _*)), roundTo).as("d"),
          lit(cid).as("cid"))
      }
      val best = if (scored.size == 1) scored.head else least(scored: _*)
      best.getField("cid")
    }
    df.withColumn("_code", array(codes: _*))
  }

  /** Asymmetric-distance (ADC) top-k over a PQ-[[encodePq]]d corpus: the
    * query stays exact; each row's approximate squared distance is the sum
    * of per-subspace lookup-table entries `d(q_sub_j, centroid(code_j))`,
    * computed driver-side from the tiny codebooks and folded into the
    * projection as a literal map per subspace. The scan is pure map work +
    * a physical top-k (TakeOrderedAndProject) — no join, no shuffle, and
    * only the M-byte codes are read, never the full vectors: the query
    * shape that makes PQ the standard billion-vector ANN layout. Returns
    * (id, approx_dist), nearest first, ties → lowest id. */
  def pqTopK(encoded: DataFrame, idCol: String, query: Seq[Double],
      codebooks: PqCodebooks, k: Int, roundTo: Int = 4,
      tableRoundTo: Int = 6): DataFrame =
    encoded.select(col(idCol).as("id"),
        round(adcDistExpr(query, codebooks, tableRoundTo), roundTo).as("approx_dist"))
      .orderBy(col("approx_dist").asc_nulls_last, col("id"))
      .limit(k)

  /** The (unrounded-total) ADC sum for one query: per subspace, the
    * driver-computed lookup table folds into a literal map indexed by the
    * row's `_code` entry; the 4 (or M) terms sum left-associated — the
    * association the DuckDB twins mirror. */
  private def adcDistExpr(query: Seq[Double], codebooks: PqCodebooks,
      tableRoundTo: Int = 6): Column = {
    val dims = codebooks.map(_.head._2.length)
    require(dims.sum == query.length,
      s"query dim ${query.length} != codebook tiling ${dims.sum}")
    var off = 0
    codebooks.zipWithIndex.map { case (cents, j) =>
      val len = cents.head._2.length
      val qSub = query.slice(off, off + len)
      off += len
      val table = cents.flatMap { case (cid, cvec) =>
        // same ordered fold as sqDist, same rounding both engines
        val d = qSub.zip(cvec).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
        Seq(lit(cid), lit(BigDecimal(d).setScale(tableRoundTo, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      element_at(map(table: _*), element_at(col("_code"), j + 1))
    }.reduce(_ + _)
  }

  /** Shortlist-refine ANN — the standard billion-vector serving recipe
    * (IVFPQ+refine in the Faiss/SPANN lineage): [[pqTopK]] ranks the WHOLE
    * corpus from its M-byte codes alone (map-only + physical top-k), keeps a
    * `shortlist`-sized candidate set, and ONLY those rows' full vectors are
    * re-read for an exact-cosine re-rank to the final top-`k`. The
    * approximation error of the compact codes is confined to the
    * shortlist/ignore boundary; the returned ordering is exact over the
    * shortlist. Returns (id, cosine), best first, ties → lowest id.
    *
    * Scale shape: the shortlist is k' rows — it broadcasts, and the refine
    * join against the raw vector table is a broadcast hash semi-probe, so
    * the full-precision vectors are touched for k' rows total (on an
    * id-bucketed table the scan itself prunes). Nothing about the refine
    * step depends on corpus size. */
  def pqTopKRerank(encoded: DataFrame, raw: DataFrame, idCol: String,
      vecCol: String, query: Seq[Double], codebooks: PqCodebooks,
      shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    ensureExprs(raw)
    val short = pqTopK(encoded, idCol, query, codebooks, shortlist)
      .select(col("id").as("_sid"))
    raw.join(broadcast(short), col(idCol) === col("_sid"))
      .select(col(idCol).as("id"),
        round(cosine(col(vecCol), array(query.map(lit): _*)), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** IVFADC — the standard billion-vector serving LAYOUT (coarse quantizer
    * + product-quantized residuals, Jégou et al. 2011): every corpus vector
    * stores only its cell id and the M-byte PQ code of its RESIDUAL
    * (vector − cell centroid); a query ranks its `nprobe` nearest cells'
    * rows by ADC over per-cell lookup tables built from the query's own
    * residual. Residual coding is what separates this from flat PQ: codes
    * quantize the (much smaller) within-cell displacement, so the same
    * byte budget buys more precision.
    *
    * Scale shape: corpus-side cell assignment and residual encoding are the
    * [[assignByCodebook]]/[[encodePq]] shuffle-free projections (tiny
    * codebooks folded into codegen expressions); the query-side probe set
    * and ADC tables are driver arithmetic over those same tiny codebooks
    * (cosine cell ranking, 6-dp rounding, lowest-cid ties — the
    * [[probeCells]] rule, mirrored exactly); the scan reads only the probed
    * cells' code rows — on a cell-partitioned table, partition pruning.
    * Returns (id, approx_dist), nearest first, ties → lowest id. */
  def ivfAdcTopK(df: DataFrame, idCol: String, vecCol: String,
      coarse: Seq[(Int, Seq[Double])], codebooks: PqCodebooks,
      query: Seq[Double], nprobe: Int, k: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= coarse.size,
      s"nprobe $nprobe outside [1, ${coarse.size}]")
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val qn = math.sqrt(query.map(x => x * x).sum)
    val probed = coarse.map { case (cid, c) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      val dot = c.zip(query).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
      (round6(dot / (qn * cn)), cid)
    }.sortBy { case (sim, cid) => (-sim, cid) }.take(nprobe).map(_._2)
    val cmap = map(coarse.flatMap { case (cid, c) =>
      Seq(lit(cid), array(c.map(lit): _*)) }: _*)
    val encoded = encodePq(
      assignByCodebook(df, vecCol, coarse).withColumn("_res",
        zip_with(col(vecCol), element_at(cmap, col("_cid")),
          (x, c) => x.cast("double") - c)),
      "_res", codebooks)
    val centroidOf = coarse.toMap
    // ONE corpus pass: the probed-cell filter prunes the scan and a CASE
    // over _cid dispatches each row to its cell's query-residual ADC table
    // (all tables are plan literals) — never nprobe re-scans of the
    // assignment/encode lineage
    val dist = probed.map { cid =>
      val rq = query.zip(centroidOf(cid)).map { case (x, c) => x - c }
      (cid, adcDistExpr(rq, codebooks))
    }.foldLeft(Option.empty[Column]) { case (acc, (cid, e)) =>
      Some(acc.fold(when(col("_cid") === cid, e))(_.when(col("_cid") === cid, e)))
    }.get
    encoded.filter(col("_cid").isin(probed.map(Int.box): _*))
      .select(col(idCol).as("id"), round(dist, 4).as("approx_dist"))
      .orderBy(col("approx_dist").asc_nulls_last, col("id"))
      .limit(k)
  }

  /** Train PQ codebooks with Lloyd's k-means per subspace, initialized from
    * the subvectors of the `k` lowest-id rows (deterministic start). Each
    * iteration is one distributed pass: [[encodePq]] assigns (map-only),
    * then a groupBy-per-subspace averages assigned subvectors — shuffles
    * carry M×k centroid partials, never vectors. Returns codebooks with
    * cids 0..k-1 per subspace. Exact FP determinism of the trained values
    * is not guaranteed (float sums commute differently across partitions);
    * downstream oracle-checked paths should use fixed codebooks. */
  def trainPqCodebooks(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 5): PqCodebooks = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val len = dim / m
    val init: PqCodebooks = df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect().zipWithIndex.map { case (r, cid) =>
        (cid, r.getSeq[Float](0).map(_.toDouble).toSeq)
      }.toSeq match {
        case rows => (0 until m).map(j => rows.map { case (cid, v) =>
          (cid, v.slice(j * len, (j + 1) * len)) })
      }
    (1 to iters).foldLeft(init) { (books, _) =>
      val coded = encodePq(df, vecCol, books)
      // one pass: explode (subspace j, code, subvector) then average —
      // partial aggregation keeps the shuffle at M×k rows of length-len sums
      val parts = (0 until m).map { j =>
        coded.select(lit(j).as("j"), element_at(col("_code"), j + 1).as("cid"),
          slice(col(vecCol), j * len + 1, len).as("sub"))
      }.reduce(_ unionAll _)
      val means = parts.groupBy("j", "cid")
        .agg(count(lit(1)).as("n"),
          array((0 until len).map(i =>
            sum(element_at(col("sub"), i + 1).cast("double"))): _*).as("sums"))
        .collect().map { r =>
          val n = r.getLong(2).toDouble
          ((r.getInt(0), r.getInt(1)), r.getSeq[Double](3).map(_ / n).toSeq)
        }.toMap
      (0 until m).map(j => books(j).map { case (cid, old) =>
        (cid, means.getOrElse((j, cid), old)) // empty cluster keeps its centroid
      })
    }
  }

  // ------------------------------------------- scalar quantization (SQ8)

  /** Per-dimension [min, max] corpus ranges — the whole "model" scalar
    * quantization needs. */
  final case class SqParams(mins: Seq[Double], maxs: Seq[Double]) {
    require(mins.length == maxs.length && mins.nonEmpty, "ragged SQ params")
    def dim: Int = mins.length
  }

  /** Train SQ8: per-dimension min/max in ONE aggregation pass (2·dim
    * partial-aggregating min/max expressions — no shuffle beyond the final
    * 1-row combine, no posexplode of n·dim rows). The two dim-length arrays
    * live on the driver like the PQ codebooks: quantization "models" are
    * kilobytes; folding them into projections as literals keeps encode and
    * scoring shuffle-free. */
  def trainSq(df: DataFrame, vecCol: String): SqParams = {
    val dim = df.select(org.apache.spark.sql.functions.size(col(vecCol))).head().getInt(0)
    val aggs = (0 until dim).map(i =>
        min(element_at(col(vecCol), i + 1).cast("double")).as(s"_mn$i")) ++
      (0 until dim).map(i =>
        max(element_at(col(vecCol), i + 1).cast("double")).as(s"_mx$i"))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    SqParams((0 until dim).map(r.getDouble), (0 until dim).map(i => r.getDouble(dim + i)))
  }

  /** Encode each vector to 8-bit codes: codeᵢ = round((xᵢ−minᵢ)/(maxᵢ−minᵢ)·255),
    * clamped to [0,255] (out-of-range only for vectors OUTSIDE the training
    * corpus); a degenerate dimension (min = max) codes 0. Map-only literal
    * projection appending `_sq` (ARRAY<INT>) — 4× smaller than float32 at
    * scan time, no codebook training step, the standard cheap tier below
    * PQ. */
  def encodeSq(df: DataFrame, vecCol: String, p: SqParams): DataFrame = {
    val codes = (0 until p.dim).map { i =>
      val x = element_at(col(vecCol), i + 1).cast("double")
      val span = p.maxs(i) - p.mins(i)
      if (span <= 0.0) lit(0)
      else least(greatest(round((x - lit(p.mins(i))) / lit(span) * 255.0), lit(0.0)),
        lit(255.0)).cast("int")
    }
    df.withColumn("_sq", array(codes: _*))
  }

  // ------------------------------------------- binary quantization (1-bit)

  /** Train 1-bit quantization: per-dimension MEANS in one aggregation —
    * the threshold that balances each bit (≈half the corpus above, half
    * below), maximizing the information a sign bit carries. */
  def trainBq(df: DataFrame, vecCol: String): Seq[Double] = {
    val dim = df.select(org.apache.spark.sql.functions.size(col(vecCol))).head().getInt(0)
    val r = df.agg(
      avg(element_at(col(vecCol), 1).cast("double")).as("_m0"),
      (1 until dim).map(i =>
        avg(element_at(col(vecCol), i + 1).cast("double")).as(s"_m$i")): _*).head()
    (0 until dim).map(r.getDouble)
  }

  /** Encode to sign bits packed 64-per-long: bit i of word i/64 set when
    * xᵢ > meanᵢ — 32× smaller than float32. Map-only literal projection
    * appending `_bq` (ARRAY<BIGINT>, ⌈dim/64⌉ words). */
  def encodeBq(df: DataFrame, vecCol: String, means: Seq[Double]): DataFrame = {
    val words = means.indices.grouped(64).map { idxs =>
      idxs.map { i =>
        when(element_at(col(vecCol), i + 1).cast("double") > means(i),
          lit(1L << (i % 64))).otherwise(lit(0L))
      }.reduce(_ + _)
    }.toSeq
    df.withColumn("_bq", array(words: _*))
  }

  /** Hamming top-k over the packed sign bits: the query's bits compute
    * driver-side, per-row distance is Σ bit_count(word XOR qword) — one
    * codegen'd projection over ⌈dim/64⌉ longs (the float vectors are never
    * read), then the physical top-k. The coarsest, cheapest ANN tier
    * (1 bit/dim); rerank survivors with [[sqTopK]]/[[pqTopKRerank]]/exact
    * cosine when precision matters. Ties break by id. */
  def bqTopK(encoded: DataFrame, idCol: String, query: Seq[Double],
      means: Seq[Double], k: Int): DataFrame = {
    require(query.length == means.length, s"query dim ${query.length} != ${means.length}")
    val qWords = query.indices.grouped(64).map(_.map(i =>
      if (query(i) > means(i)) 1L << (i % 64) else 0L).reduce(_ | _)).toSeq
    val dist = qWords.zipWithIndex.map { case (qw, w) =>
      bit_count(element_at(col("_bq"), w + 1).bitwiseXOR(lit(qw))).cast("long")
    }.reduce(_ + _)
    encoded.select(col(idCol).as("id"), dist.as("hamming"))
      .orderBy(col("hamming").asc_nulls_last, col("id"))
      .limit(k)
  }

  /** ADC top-k over SQ8 codes: reconstruct x̂ᵢ = minᵢ + codeᵢ/255·spanᵢ and
    * rank by Σ(qᵢ−x̂ᵢ)² — one codegen'd literal fold per row over the code
    * array only (the float vectors are never read), then the physical
    * top-k. Same plan shape as [[pqTopK]]: no join, no shuffle. */
  def sqTopK(encoded: DataFrame, idCol: String, query: Seq[Double],
      p: SqParams, k: Int, roundTo: Int = 4): DataFrame = {
    require(query.length == p.dim, s"query dim ${query.length} != ${p.dim}")
    val dist = (0 until p.dim).map { i =>
      val span = p.maxs(i) - p.mins(i)
      val recon =
        if (span <= 0.0) lit(p.mins(i))
        else lit(p.mins(i)) + element_at(col("_sq"), i + 1).cast("double") / 255.0 * lit(span)
      val diff = lit(query(i)) - recon
      diff * diff
    }.reduce(_ + _)
    encoded.select(col(idCol).as("id"), round(dist, roundTo).as("approx_dist"))
      .orderBy(col("approx_dist").asc_nulls_last, col("id"))
      .limit(k)
  }
}
