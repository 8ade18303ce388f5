package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora (project north star;
  * the reference engine has only uid-identity dedup, graphydb.py:283-287).
  *
  * All transforms are pure DataFrame pipelines: shuffles happen on shingle /
  * band keys only, never on full text; every hash is expressed with
  * deterministic SQL arithmetic (md5-derived 60-bit codes) so an external
  * engine (the DuckDB oracle) can reproduce results bit-for-bit.
  *
  * Scale notes (100 TB posture):
  *   - shingling explodes ~L rows per doc but carries only (id, 60-bit hash);
  *   - candidate generation joins on shingle/band-signature — skew-prone keys
  *     (ultra-common shingles) should be frequency-capped upstream via
  *     [[commonShingleFilter]];
  *   - MinHash-LSH replaces the quadratic all-pairs join with per-band
  *     bucket joins: cost ~ sum over buckets of bucket².
  */
object Dedup {

  /** 60-bit deterministic content hash: first 15 hex chars of md5.
    * DuckDB twin: `('0x' || substr(md5(s), 1, 15))::BIGINT`. */
  def hash60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact duplicate groups by full content: one row per duplicated key. */
  def exactDupGroups(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("copies"), min(col(idCol)).as("keep_id"))
      .filter(col("copies") > 1)

  /** Exact dedup: keep the minimum-id row per content key (hash-groupBy —
    * one shuffle on the key, map-side partial min). */
  def exactDedup(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val keep = df.groupBy(keyCols.map(col): _*).agg(min(col(idCol)).as(idCol))
    df.join(keep, keyCols :+ idCol, "left_semi")
  }

  /** Distinct k-word shingles per document: (id, shingle STRING).
    * Tokenization is a plain single-space split so the oracle can mirror it. */
  def wordShingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    // shingle i = tokens[i..i+k-1], i in 0..len-k (empty when doc shorter than k)
    val sh = when(size(toks) >= k,
      transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array())
    // The explicit IsNotNull(id) is LOAD-BEARING for exchange reuse (r16
    // opt): a verify stage that inner-joins the signature table on id gets
    // isnotnull(id) inferred and pushed into ITS copy of this subtree's
    // scan, while the candidate side's copy has no such filter — the two
    // otherwise-identical minhash pipelines then fail to canonicalize
    // equal and BOTH execute (measured: d12 ran the full shingle+minhash
    // aggregation twice). Filtering here puts the same pushed filter on
    // every copy, so ReuseExchange dedupes them; a null id never produced
    // a candidate pair anyway (least/greatest of null compares false).
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), explode(array_distinct(sh)).as("shingle"))
  }

  /** Optional skew guard: drop shingles appearing in more than `maxDf` docs
    * (they generate quadratic join fanout and carry no dedup signal). */
  def commonShingleFilter(shingles: DataFrame, maxDf: Long): DataFrame = {
    val rare = shingles.groupBy("shingle").count().filter(col("count") <= maxDf)
    shingles.join(rare.select("shingle"), Seq("shingle"), "left_semi")
  }

  /** All-pairs n-gram Jaccard over shared shingles (self-blocking: only pairs
    * sharing ≥1 shingle are generated). Returns id_a < id_b with
    * `jaccard` = shared / (|A| + |B| - shared), rounded to 6 dp.
    *
    * `maxDf` is the production skew guard ([[commonShingleFilter]] semantics,
    * applied on the 60-bit hashes): shingles in more than `maxDf` docs are
    * excluded from PAIRING (|A|/|B| still count them), killing the hot join
    * keys an ultra-common shingle would create at corpus scale. The default
    * is uncapped — capping is an explicit opt-in, audited via
    * [[jaccardOverflowShingles]] (no silent caps). Uncapped all-pairs remains
    * quadratic in the worst case; at corpus scale prefer [[lshCandidates]]
    * and use this as its correctness twin on samples. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5, maxDf: Long = Long.MaxValue): DataFrame =
    sharedShinglePairs(df, idCol, textCol, k, maxDf)
      .withColumn("jaccard",
        round(col("shared").cast("double") / (col("na") + col("nb") - col("shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** Shared machinery of [[ngramJaccardPairs]] / [[ngramContainmentPairs]]:
    * (id_a, id_b, shared, na, nb) — the shared-shingle count of every
    * candidate pair plus each side's TOTAL shingle count (|A|/|B| count ALL
    * shingles — computed before any pruning; the df window [2, maxDf]
    * excludes shingles from PAIRING only).
    *
    * Single-shuffle bucket shape (see [[lshCandidates]]): one exchange of
    * (h, id) to the shingle hash; the df window becomes a free size()
    * filter (df 1 can never pair), replacing the former count + semi-join
    * pre-pass AND the double shuffle into the self-join. The per-bucket
    * pair block materializes in-task — bounded by maxDf when capped (the
    * production path); uncapped stays quadratic-by-design, same as the
    * self-join it replaces (correctness twin, run on samples). Measured
    * (r8, sf0.1): 1.25× on both the capped and uncapped entries. */
  private def sharedShinglePairs(df: DataFrame, idCol: String,
      textCol: String, k: Int, maxDf: Long): DataFrame = {
    // join on the 60-bit shingle hash, not the string: same pairs (collision
    // odds ~2^-61 per shingle pair), ~60% less shuffle payload
    val sh = wordShingles(df, idCol, textCol, k)
      .select(col("id"), hash60(col("shingle")).as("h"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val bucketed = sh.groupBy("h").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxDf)
    explodeBucketPairs(bucketed)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      // no broadcast hint on sizes: its cardinality is the document count, so
      // at corpus scale it must stay a shuffle join (AQE broadcasts when small)
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
  }

  /** Explode a bucketed `ids` array column into normalized in-task pairs —
    * the shared tail of every single-shuffle bucket-pair generator
    * ([[lshCandidates]], [[sharedShinglePairs]]). Each id appears once per
    * bucket (the upstream aggregates are per-doc distinct), so
    * least/greatest alone yields id_a < id_b; the strict filter drops
    * degenerate duplicate-id inputs. */
  private def explodeBucketPairs(bucketed: DataFrame): DataFrame =
    bucketed
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(least(x, y) AS id_a,
          |                        greatest(x, y) AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .filter(col("id_a") < col("id_b"))

  /** All-pairs n-gram CONTAINMENT over shared shingles: shared / min(|A|,
    * |B|) — the partial-duplicate metric Jaccard under-scores when sizes
    * differ (a 50-shingle doc fully embedded in a 5000-shingle doc scores
    * J ≈ 0.01 but containment 1.0; quote/boilerplate detection needs the
    * latter). Same single-shuffle bucket shape, df-cap semantics and audit
    * contract as [[ngramJaccardPairs]]; |A|/|B| count ALL shingles. */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5, maxDf: Long = Long.MaxValue): DataFrame = {
    val sh = wordShingles(df, idCol, textCol, k)
      .select(col("id"), hash60(col("shingle")).as("h"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val bucketed = sh.groupBy("h").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxDf)
    bucketed
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(least(x, y) AS id_a,
          |                        greatest(x, y) AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("containment",
        round(col("shared").cast("double") / least(col("na"), col("nb")), 6))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
  }

  /** The shingle hashes a `maxDf` cap excludes from pairing: (h, df).
    * Production Jaccard entries pair [[ngramJaccardPairs]]'s `maxDf` with
    * this audit — a non-empty result names exactly which (hashed) shingles
    * were too common to pair on, so the cap is never silent. */
  def jaccardOverflowShingles(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, maxDf: Long = Long.MaxValue): DataFrame =
    wordShingles(df, idCol, textCol, k)
      .groupBy(hash60(col("shingle")).as("h"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)

  /** MinHash parameters shared with the DuckDB oracle: h ≡ hash60 mod P;
    * mh_i = (A_i · h + B_i) mod P with A_i = 101 + 37 i (odd), B_i = 12345 +
    * 789 i. P is a prime > 2^32; A_i·h < 2^48 so the arithmetic never
    * overflows a 64-bit signed integer in either engine. */
  val P: Long = 4294967311L
  def aCoef(i: Int): Long = 101L + 37L * i
  def bCoef(i: Int): Long = 12345L + 789L * i

  /** WIDE MinHash signatures: (id, mh_0 .. mh_{numHashes-1}) in ONE shuffle.
    *
    * The r7 shape exploded every (id, shingle) row numHashes× and shuffled
    * the multiplied rows on (id, i) — for a 16-hash signature that is 16×
    * the shuffle payload and 16× the rows through the aggregate, and it was
    * the measured bottleneck of the whole LSH family (d03/x04 ≈ 5.7 s of
    * the 55.8 s battery). All numHashes mins over the SAME shingle-hash
    * stream are instead computed as parallel min-aggregate columns: rows
    * shuffle once on id, partial mins combine map-side, and the ×numHashes
    * work happens inside whole-stage codegen on in-memory columns. At
    * corpus scale the shuffle carries one row per (doc, distinct shingle)
    * — the minimum any shingle-based signature needs. */
  def minhashWide(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 16): DataFrame = {
    val sh = wordShingles(df, idCol, textCol, k)
      .withColumn("h", pmod(hash60(col("shingle")), lit(P)))
    val mins = (0 until numHashes).map(i =>
      min(pmod(lit(aCoef(i)) * col("h") + lit(bCoef(i)), lit(P))).as(s"mh_$i"))
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash signatures in long format: (id, i, mh) for i in 0 until
    * numHashes — a posexplode over [[minhashWide]], same values as ever. */
  def minhash(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 16): DataFrame =
    minhashWide(df, idCol, textCol, k, numHashes)
      .select(col("id"),
        posexplode(array((0 until numHashes).map(i => col(s"mh_$i")): _*)))
      .toDF("id", "i", "mh")

  /** Per-band (band, sig) structs sliced from [[minhashWide]] columns — no
    * extra shuffle; shared by [[bandSignatures]] and the incremental store. */
  private def bandStructs(bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until rowsPerBand).map(r =>
          col(s"mh_${b * rowsPerBand + r}").cast("string")): _*).as("sig"))
    }: _*)

  /** Per-(id, band) LSH signatures (deterministic in-band order): bands are
    * sliced out of the wide signature row with no extra shuffle — the r7
    * shape re-aggregated the long format on (id, band), paying a second
    * exchange for a concat the wide columns give for free. */
  private def bandSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int, rowsPerBand: Int): DataFrame =
    minhashWide(df, idCol, textCol, k, bands * rowsPerBand)
      .select(col("id"), explode(bandStructs(bands, rowsPerBand)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))

  /** LSH candidate pairs: band docs by (band, concatenated band signature),
    * join within buckets. bands × rowsPerBand must equal numHashes.
    *
    * Buckets larger than `maxBucket` are dropped BEFORE the self-join: one
    * degenerate signature (e.g. thousands of empty/near-empty docs sharing a
    * minhash) would otherwise cost bucket² pairs on one shuffle key. The
    * pre-filter is a (band, sig) aggregate — same key as the join, linear.
    * The DEFAULT is uncapped: capping is an explicit opt-in that a production
    * pipeline pairs with [[lshOverflowBuckets]] on the same `maxBucket`, so a
    * cap is never silent. */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      maxBucket: Long = Long.MaxValue): DataFrame = {
    val bandSig = bandSignatures(df, idCol, textCol, k, bands, rowsPerBand)
    // One shuffle to the bucket key, pairs generated IN-TASK: the former
    // shape self-joined the signature set on (band, sig) — the same rows
    // shuffled twice into the join, plus a count+semi-join pre-pass when
    // capped. Collecting each bucket to an array on the single (band, sig)
    // exchange makes the cap a free size() filter and generates pairs with
    // a nested transform over the array (each id appears once per bucket,
    // so least/greatest normalization alone yields id_a < id_b). The HOFs
    // evaluate interpreted, not codegen — measured (r8, sf0.1) still a
    // 1.5× win here because the avoided double shuffle carries fat string
    // signatures; see [[simhashDupPairs]] for the slim-row counterexample.
    // The array is bounded by the cap when one is set; uncapped, a
    // degenerate bucket would have cost bucket² join rows anyway — the
    // array form OOMs no earlier than the join form blew up the shuffle.
    val bucketed = bandSig.groupBy("band", "sig")
      .agg(collect_list(col("id")).as("ids"))
    val kept =
      if (maxBucket == Long.MaxValue) bucketed
      else bucketed.filter(size(col("ids")) <= maxBucket)
    kept
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(least(x, y) AS id_a,
          |                        greatest(x, y) AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .filter(col("id_a") < col("id_b")) // degenerate duplicate-id inputs
      .distinct()
  }

  /** Signature-estimated Jaccard for candidate pairs — the verify stage of
    * the LSH scale path. P[mh_i(A) = mh_i(B)] = J(A,B) for a random minwise
    * hash (Broder 1997), so the equal-component fraction of two signatures
    * is an unbiased estimate of the pair's Jaccard, with standard deviation
    * sqrt(J(1-J)/numHashes). Candidates typically come from
    * [[lshCandidates]] over the SAME (k, numHashes) parameters; re-scoring
    * them here costs two hash joins of numHashes-int arrays against the
    * signature table — never a second shingle pass over the corpus, which
    * is the point at 100 TB: the exact [[ngramJaccardPairs]] verify would
    * re-read and re-shingle every document. Catalyst reuses the signature
    * aggregate's exchange when both the candidates and the signatures
    * derive from one plan. Returns (id_a, id_b, est_jaccard ≥ minEstimate),
    * est rounded to 6 dp. */
  def estimateJaccardBySignature(df: DataFrame, idCol: String, textCol: String,
      candidates: DataFrame, k: Int = 3, numHashes: Int = 16,
      minEstimate: Double = 0.0): DataFrame = {
    val sig = minhashWide(df, idCol, textCol, k, numHashes).select(col("id"),
      array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
    candidates
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard", round(
        expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b))" +
          s" / CAST($numHashes AS DOUBLE)"), 6))
      .filter(col("est_jaccard") >= minEstimate)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** The buckets a `maxBucket` cap would drop: (band, sig, bcount). Pipelines
    * using [[lshCandidates]] should count/log these — a non-empty result
    * means some docs (typically degenerate near-empty text) were exempted
    * from candidate generation in that band. */
  def lshOverflowBuckets(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      maxBucket: Long = Long.MaxValue): DataFrame =
    bandSignatures(df, idCol, textCol, k, bands, rowsPerBand)
      .groupBy("band", "sig")
      .agg(count(lit(1)).as("bcount"))
      .filter(col("bcount") > maxBucket)

  /** 60-bit SimHash over distinct whitespace tokens: per bit b, the sign of
    * Σ ±1 across token hashes decides the bit. Returns (id, simhash LONG).
    *
    * Same wide-aggregate shape as [[minhashWide]] (r8): the r7 form exploded
    * every (id, token) row 60× and paid two exchanges (sum on (id, b), then
    * re-sum on id); the 60 per-bit sums are instead parallel aggregate
    * columns over the un-multiplied token stream — one shuffle on id, 60×
    * less shuffle payload, bit assembly in a final codegen projection. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .withColumn("th", hash60(col("tok")))
    val sums = (0 until 60).map(b =>
      sum(when(expr(s"(shiftrightunsigned(th, $b) & 1) = 1"), 1).otherwise(-1)).as(s"s_$b"))
    toks.groupBy("id").agg(sums.head, sums.tail: _*)
      .select(col("id"),
        (0 until 60).map(b =>
          when(col(s"s_$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _).as("simhash"))
  }

  /** Within-block cosine pairs over a (id, blk, v, nrm) frame: the join key
    * is the block, so cost is Σ block² — never a full cross join. Blocks
    * larger than `maxBlock` are dropped BEFORE the self-join (same guard as
    * [[lshCandidates]]'s bucket cap): one degenerate block — e.g. a coarse
    * label covering half the corpus, or too few LSH bits for the corpus
    * size — would otherwise re-quadratice the join on a single shuffle key.
    * The default is far above the oracle fixtures, so capping only engages
    * at corpus scale; audit what a cap dropped via [[overflowBlocks]]. */
  private def pairsByBlock(blocked: DataFrame, threshold: Double,
      maxBlock: Long = Long.MaxValue): DataFrame = {
    graft.functions.GraftExtensions.register(blocked.sparkSession)
    // Single-shuffle bucket shape (see [[lshCandidates]]): one exchange of
    // (id, vector) to the block key — the former self-join shuffled the
    // vectors twice and needed a count+semi-join pre-pass for the cap.
    // Measured (r8, sf0.1) 2.1–2.6× on d05/d06: embedding payloads are the
    // fattest rows in the family, so halving the exchanges dominates the
    // interpreted-HOF pair loop. Scoring stays the fused single-pass
    // dot+norms ([[graft.functions.CosineSimilarity]], eval'd per pair);
    // IEEE * is commutative, so least/greatest id normalization cannot
    // change the score.
    val bucketed = blocked.groupBy("blk")
      .agg(collect_list(struct(col("id"), col("v"))).as("ms"))
    val kept =
      if (maxBlock == Long.MaxValue) bucketed
      else bucketed.filter(size(col("ms")) <= maxBlock)
    kept
      .select(explode(expr(
        """flatten(transform(ms, (x, i) ->
          |  transform(slice(ms, i + 2, size(ms)),
          |            y -> struct(least(x.id, y.id) AS id_a,
          |                        greatest(x.id, y.id) AS id_b,
          |                        round(cosine_similarity(x.v, y.v), 6) AS cosine))))""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.cosine").as("cosine"))
      .filter(col("id_a") < col("id_b") && col("cosine") >= threshold)
  }

  /** Near-dup by embedding cosine: pairs with cosine ≥ threshold, blocked by
    * an exact-match coarse key (same label) to avoid the full cross join. */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double, maxBlock: Long = Long.MaxValue): DataFrame =
    pairsByBlock(df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      col(vecCol).as("v")), threshold, maxBlock)

  /** The blocks a `maxBlock` cap would drop: (blk, bcount). Pipelines using
    * the capped pair generators should count/log these — non-empty means
    * some rows were exempted from pair generation (no silent caps). */
  def overflowBlocks(df: DataFrame, blockCol: String, maxBlock: Long): DataFrame =
    df.groupBy(col(blockCol).as("blk")).agg(count(lit(1)).as("bcount"))
      .filter(col("bcount") > maxBlock)

  /** Hamming-banded near-dup pairs over an arbitrary `(id, hash)` frame —
    * the band-blocking core shared by text SimHash ([[simhashDupPairs]],
    * 60-bit) and image perceptual hashes
    * ([[graft.ops.Multimodal.imageDupPairs]], 64-bit dHash): the hash
    * splits into `bands` equal slices, and by pigeonhole any pair within
    * `bands − 1` flipped bits shares at least one EXACT band — so joining
    * per (band, slice-value) buckets then verifying
    * `bit_count(a XOR b) ≤ maxHamming` has complete recall for
    * maxHamming ≤ bands − 1. Shuffles carry (id, hash) only — 16 bytes a
    * row; the verify step is one codegen'd expression.
    *
    * DELIBERATELY the self-join shape, not [[lshCandidates]]'s bucket
    * array (measured r8, sf0.1): with 16-byte rows halving the exchanges
    * saves almost nothing, while moving pair generation + the Hamming
    * verify from codegen'd join rows into interpreted higher-order
    * functions DOUBLED the query (0.83 s → 1.66 s). The array form wins
    * exactly where the join shuffles fat payloads twice (embedding
    * vectors 2.1–2.6×, shingle strings 1.25–1.5×); with slim rows the
    * codegen join is the right plan and AQE handles the exchange sizing. */
  def hammingBandPairs(hashes: DataFrame, bits: Int, maxHamming: Int,
      bands: Int, probeRadius: Int = 0, keyCols: Seq[String] = Nil): DataFrame = {
    require(maxHamming <= bands * (probeRadius + 1) - 1,
      s"band-blocking recall is only complete for maxHamming <= bands*(probeRadius+1)-1 " +
        s"($maxHamming > ${bands * (probeRadius + 1) - 1})")
    require(bits % bands == 0, s"bands must divide the hash width ($bands ∤ $bits)")
    val width = bits / bands
    require(probeRadius <= width, s"probeRadius $probeRadius exceeds slice width $width")
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val kCols = keyCols.map(col)
    val banded0 = hashes.select(Seq(col("id"), col("hash")) ++ kCols :+
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          (shiftrightunsigned(col("hash"), b * width).bitwiseAND(lit(mask))).as("slice"))
      }: _*)).as("bs"): _*)
      .select(Seq(col("id"), col("hash")) ++ kCols ++
        Seq(col("bs.band").as("band"), col("bs.slice").as("slice")): _*)
    // Radius probing defeats the radius-0 path's two-sided exchange reuse:
    // the probe side explodes BEFORE its exchange, so the two join inputs
    // are different subtrees and EACH side re-executes the full upstream
    // chain — for the media queries that chain is synthesize+decode+
    // fingerprint, the most expensive stage of the whole query (measured
    // r16 opt: m05's two heaviest stages were the same 50 CPU-s pipeline
    // run twice). Persist + eagerly materialize the slim banded rows once
    // (bands × 16-ish bytes per input row); both sides then scan the cache
    // (guide §2.4 "remove shuffles outright" applied to a duplicated scan,
    // §5 caching-when-reused). Blocks are dropped by the ContextCleaner
    // when the plan is GC'd.
    val banded = if (probeRadius == 0) banded0 else {
      val b = banded0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      b.count()
      b
    }
    val a = banded.select(Seq(col("id").as("id_a"), col("hash").as("ha"),
      col("band"), col("slice")) ++ kCols: _*)
    // GENERALIZED pigeonhole (r11): if hamming(x, y) <= maxHamming, some
    // band slice pair differs by <= floor(maxHamming/bands) bits — so for
    // thresholds ABOVE bands-1 the b-side probes every slice within
    // `probeRadius` flipped bits (Similarity.probeMasks enumeration)
    // instead of narrowing the slices. The alternative — more, narrower
    // bands — collapses the bucket space: 16 bands over 64 bits leave
    // 4-bit slices = 16 bucket values, which is ~n² candidate pairs on a
    // big corpus (measured: the r11 ScaleProbe m01 run at 500k uniform
    // hashes never finished). radius-2 probing on 16-bit slices keeps 65k
    // bucket values: ~120x fewer candidates at the same complete recall,
    // shuffle stays linear (548 slim rows per input row). probeRadius=0 is
    // the exact-band fast path (SimHash d07's plan, byte-identical).
    val b0 = banded.select(Seq(col("id").as("id_b"), col("hash").as("hb"),
      col("band"), col("slice")) ++ kCols: _*)
    val b =
      if (probeRadius == 0) b0
      else b0.select(Seq(col("id_b"), col("hb"), col("band")) ++ kCols :+
        explode(array(graft.ops.Similarity.probeMasks(width, probeRadius)
          .map(m => col("slice").bitwiseXOR(lit(m))): _*)).as("slice"): _*)
    // the explode breaks Catalyst's size estimate (Generate keeps the
    // input's sizeInBytes), so an unhinted radius plan BROADCASTS the
    // 548×-exploded probe side — measured driver OOM at 50k images with
    // AQE off (ScaleProbe r11). SHUFFLE_HASH on the compact side pins a
    // shuffle join with the unexploded rows as the build side: per-task
    // memory is bounded by n×bands/partitions slim rows, and the exploded
    // stream is neither sorted nor collected.
    // Extra equality keys (e.g. the video slot) join IN the bucket key
    // instead of post-filtering the pair stream: candidates that can never
    // survive the residual equality are never generated, shrinking the join
    // output and the Hamming verifies by the key's fan-out (guide §3.3 —
    // don't explode the join, restrict it).
    val aSide = if (probeRadius == 0) a else a.hint("shuffle_hash")
    aSide.join(b, Seq("band", "slice") ++ keyCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select((Seq("id_a", "id_b") ++ keyCols :+ "hamming").map(col): _*).distinct()
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming —
    * [[hammingBandPairs]] over the 60-bit [[simhash]] (complete recall for
    * the default 3 with 4 bands). */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame =
    hammingBandPairs(
      simhash(df, idCol, textCol).select(col("id"), col("simhash").as("hash")),
      bits = 60, maxHamming, bands)

  /** Transitive duplicate clusters from a candidate-pair frame
    * (`id_a`/`id_b` LONG): connected components over the pair graph. Pair
    * generation yields a–b and b–c but never a–c for borderline dups;
    * clustering closes that transitively so each duplicate GROUP gets one
    * keep-decision. Returns (id, cluster) where cluster = the smallest id in
    * the component (GraphX CC invariant). Iterative by nature → GraphX, the
    * same escape hatch as [[Analytics]] (per-iteration DataFrame joins would
    * re-shuffle the full pair graph every step). */
  def dupClusters(spark: org.apache.spark.sql.SparkSession, pairs: DataFrame,
      driverPairLimit: Long = 500000L): DataFrame = {
    import spark.implicits._
    // CARDINALITY-GATED plan choice (the kHop broadcast-gate pattern,
    // Traversals.kHop): candidate-pair graphs are post-blocking SMALL
    // relative to the corpus — usually a few thousand edges even when the
    // corpus is millions of docs — and GraphX CC pays one full stage round
    // per superstep (~300-600 ms each on this host) for parallelism that
    // graph can't use. Under `driverPairLimit` edges — bounded by an EXACT
    // count, not an estimate; 500k pairs costs the driver ~25 MB of boxed
    // tuples plus up to ~100 MB of transient HashMap entries, sized for
    // multi-GB driver heaps (lower it on small drivers) — collect the
    // pair list and run union-find on the driver: same invariant (cluster
    // = min member id), milliseconds instead of supersteps, and the pair
    // plan executes ONCE instead of per-Pregel-iteration. Measured (r10,
    // sf0.1): d15 2.0 s → ~1.5 s, p01 2.9 → 1.9 s. Over the limit — a
    // truly huge dup graph — the distributed GraphX path is unchanged.
    val slim = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = slim.count()
      if (n <= driverPairLimit) {
        val edges = slim.collect().map(r => (r.getLong(0), r.getLong(1)))
        val root = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (root.getOrElse(r, r) != r) r = root.getOrElse(r, r)
          var c = x // path compression
          while (root.getOrElse(c, c) != r) { val nx = root(c); root(c) = r; c = nx }
          r
        }
        for ((a, b) <- edges) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { // min-id root keeps the GraphX CC invariant
            if (ra < rb) root(rb) = ra else root(ra) = rb
            root.getOrElseUpdate(ra min rb, ra min rb)
          } else root.getOrElseUpdate(ra, ra)
        }
        val members = edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
        members.toSeq.map(id => (id, find(id))).toDF("id", "cluster")
      } else {
        import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph}
        // Fat partitions for the iterative CC (r8, same sizing as
        // Traversals.toGraphX): CC launches one stage per superstep, so
        // task count multiplies across the run; defaultParallelism/4 keeps
        // every executor busy on a real cluster while quartering the
        // dispatch bill.
        val nParts = math.max(2, spark.sparkContext.defaultParallelism / 4)
        val edgeRdd = slim.rdd.map(r => GxEdge(r.getLong(0), r.getLong(1), ()))
          .coalesce(nParts)
        val cc = GxGraph.fromEdges(edgeRdd, ()).connectedComponents().vertices
        // materialize before unpersisting the input in finally
        cc.count()
        cc.toDF("id", "cluster")
      }
    } finally slim.unpersist(false)
  }

  /** Keep ONE representative (the cluster id = min member id) per duplicate
    * cluster; rows absent from `clusters` (never paired) survive untouched. */
  def dedupByClusters(df: DataFrame, idCol: String, clusters: DataFrame): DataFrame = {
    val drop = clusters.filter(col("id") =!= col("cluster")).select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Quality-aware cluster representative: keep the member with the HIGHEST
    * `score` per duplicate cluster (ties → smallest id), instead of
    * [[dedupByClusters]]'s blind min-id rule — the curation posture where
    * near-dup groups keep their best-quality copy (longest, cleanest,
    * highest classifier score), not their oldest. `scored` must carry
    * (`idCol`, `scoreCol`) for at least every clustered id; rows absent
    * from `clusters` survive untouched. The winner election is ONE
    * max_by aggregation on the cluster key — the same map-side-combining
    * shape as [[graft.ops.TextAnalysis.paragraphDedup]]'s election, no
    * window, no second pass over the corpus; only cluster members (a
    * post-blocking sliver of the corpus) enter the shuffle. */
  def dedupByClustersBest(df: DataFrame, idCol: String, clusters: DataFrame,
      scored: DataFrame, scoreCol: String): DataFrame = {
    val members = clusters.join(
      scored.select(col(idCol).cast("long").as("id"), col(scoreCol).as("_score")),
      Seq("id"))
    // max_by on (score, -id): the struct comparison makes the tie-break
    // part of the same aggregate — one shuffle on cluster, no window sort
    val keep = members.groupBy("cluster")
      .agg(max_by(col("id"), struct(col("_score"), -col("id"))).as("keep_id"))
    val drop = members.join(keep,
        members("cluster") === keep("cluster") && col("id") =!= col("keep_id"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Benchmark-contamination check: for each eval-split document, the
    * fraction of its distinct k-gram shingles that appear ANYWHERE in the
    * train split. The train side collapses to distinct 60-bit shingle hashes
    * before the probe join, so shuffles carry hashes only and cost is
    * |eval shingles| + |distinct train shingles| — linear, never the
    * quadratic doc×doc overlap. The probe is a plain hash join shuffling
    * 8-byte hashes on both sides (eval is the LEFT side of a left-outer
    * join, which Spark cannot broadcast; the vocabulary-scale train side
    * should never be broadcast anyway) — linear and scale-safe. */
  def contamination(df: DataFrame, idCol: String, textCol: String,
      isEval: Column, k: Int = 5): DataFrame = {
    val flagged = df.withColumn("_eval", isEval)
    val evalSh = wordShingles(flagged.filter(col("_eval")), idCol, textCol, k)
      .select(col("id"), hash60(col("shingle")).as("h"))
    val trainSh = wordShingles(flagged.filter(!col("_eval")), idCol, textCol, k)
      .select(hash60(col("shingle")).as("h")).distinct()
    evalSh.join(trainSh.withColumn("hit", lit(1)), Seq("h"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("hit").isNotNull, 1).otherwise(0)).cast("long").as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
  }

  // ------------------------------------------- streaming contamination guard

  private def evalShingleTable(name: String) = s"${name}_evalsh"

  /** Persist the DISTINCT k-gram shingle hashes of an eval/benchmark
    * corpus into a bucketed table — the STATIC side of the contamination
    * guard ([[contaminationAgainstStore]]). Evals are tiny next to
    * training corpora, but the store form still matters: the guard's probe
    * join is bucket-local on the 60-bit hash, the store survives process
    * restarts, and adding a benchmark is one rebuild, not a re-read of
    * every eval file at stream start. Stores `k` in the table properties;
    * the guard refuses a mismatched probe the way the signature store
    * refuses mismatched increments. */
  def writeEvalShingleStore(spark: org.apache.spark.sql.SparkSession, evalDocs: DataFrame,
      idCol: String, textCol: String, name: String, k: Int = 5,
      buckets: Int = 16): Unit =
    graft.engine.WarehouseMeta.withBuildLock(spark, name) {
      val hashes = wordShingles(evalDocs, idCol, textCol, k)
        .select(hash60(col("shingle")).as("h")).distinct()
      graft.engine.WarehouseMeta.replaceBucketedTable(spark,
        evalShingleTable(name), "h", buckets, hashes,
        Map("graft.k" -> k.toString))
    }

  /** Score candidate TRAINING docs against the persisted eval-shingle
    * store — [[contamination]] with the eval side already collapsed to
    * stored distinct hashes: per doc, the fraction of its k-gram shingles
    * that appear in ANY benchmark. One shuffle of 8-byte doc-shingle
    * hashes into the store's bucketing; the store never re-shuffles.
    * Returns (id, n_shingles, n_contaminated, contamination). */
  def contaminationAgainstStore(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
      idCol: String, textCol: String, name: String): DataFrame = {
    val t = evalShingleTable(name)
    val k = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      .properties.getOrElse("graft.k",
        sys.error(s"eval-shingle store $t carries no graft.k property")).toInt
    val docSh = wordShingles(docs, idCol, textCol, k)
      .select(col("id"), hash60(col("shingle")).as("h"))
    docSh.join(spark.table(t).withColumn("hit", lit(1)), Seq("h"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("hit").isNotNull, 1).otherwise(0)).cast("long").as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
  }

  /** The contamination guard as a STREAM: each micro-batch of candidate
    * training docs scores against the eval store and lands at
    * `outPath/batch=<batchId>` — per-batch OVERWRITE, so a replayed batch
    * rewrites identical content and no commit log is needed (the store is
    * read-only here; this loop, unlike the three ingest loops, mutates
    * nothing). Downstream consumers filter on the contamination column to
    * quarantine leaking docs before training. */
  def contaminationGuardStream(spark: org.apache.spark.sql.SparkSession, docsStream: DataFrame,
      idCol: String, textCol: String, name: String, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        contaminationAgainstStore(b.sparkSession, b, idCol, textCol, name)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$outPath/batch=$id")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Repeated-n-gram scrub — the fixed-length analog of exact-substring
    * dedup (remove corpus-wide boilerplate spans from every document, not
    * whole near-dup documents): any n-gram appearing in at least `minDf`
    * DISTINCT documents is "hot", and every token position covered by a hot
    * n-gram occurrence is dropped; survivors re-join in original order.
    * Returns (id, n_tokens, n_removed, cleaned_text) — one row per input
    * document, including documents scrubbed to empty.
    *
    * Scale shape: the n-gram df aggregation and the hot-gram semi-join
    * shuffle (gram-hash, id, position) rows only — never document text; the
    * rebuild groups by id with a per-doc `sort_array` (positions within one
    * document, bounded by doc length — no global order anywhere). The hot
    * set is usually tiny (boilerplate) but is NOT broadcast-assumed: at
    * web-corpus scale it can exceed driver memory, so the plan keeps it a
    * distributed semi-join and lets AQE downgrade to broadcast when small.
    * Production n is 10+ with a high `minDf`; tests/fixtures use small n. */
  def scrubRepeatedNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Long): DataFrame = {
    require(n >= 1 && minDf >= 2, "need n >= 1 and minDf >= 2")
    val docs = df.select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
    val grams = docs.select(col("id"),
        posexplode(when(size(col("toks")) >= n,
            transform(sequence(lit(0), size(col("toks")) - n),
              i => hash60(concat_ws(" ", slice(col("toks"), i + 1, lit(n))))))
          .otherwise(array())))
      .toDF("id", "start", "gram")
    val hot = grams.groupBy("gram")
      .agg(countDistinct(col("id")).as("gdf"))
      .filter(col("gdf") >= minDf)
      .select("gram")
    // no distinct on the covered set: overlapping hot occurrences produce
    // duplicate (id, pos) rows, but the left_anti below is insensitive to
    // build-side duplicates — deduping first would add a full exchange +
    // two aggregates just to shrink a set the join shuffles anyway
    val covered = grams.join(hot, Seq("gram"), "left_semi")
      .select(col("id"), explode(sequence(col("start"), col("start") + n - 1)).as("pos"))
    val toks = docs.select(col("id"), posexplode(col("toks"))).toDF("id", "pos", "tok")
    val kept = toks.join(covered, Seq("id", "pos"), "left_anti")
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("cleaned_text"))
    docs.select(col("id"), size(col("toks")).as("n_tokens"))
      .join(kept, Seq("id"), "left")
      .select(col("id"),
        col("n_tokens").cast("long").as("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).cast("long").as("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** Near-dup pairs for UNLABELED corpora: blocks are random-hyperplane LSH
    * buckets ([[Similarity.lshBucket]], deterministic md5-seeded planes), so
    * no label column is needed and the cross join is still avoided.
    * Approximate by construction: a pair split across buckets is missed;
    * fewer `bits` → bigger buckets → higher recall at higher join cost. */
  def embeddingDupPairsLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 4, maxBlock: Long = Long.MaxValue): DataFrame = {
    // dim-unrolled bucketing when the width is probeable: plane components
    // become plan-time literals (no per-element md5 — see Similarity r8)
    val bucket = Similarity.probeDim(df, vecCol)
      .map(dim => Similarity.lshBucket(col(vecCol), bits, dim))
      .getOrElse(Similarity.lshBucket(col(vecCol), bits))
    pairsByBlock(df.select(col(idCol).as("id"), bucket.as("blk"),
      col(vecCol).as("v")), threshold, maxBlock)
  }

  /** [[embeddingDupPairsLsh]] with MULTI-PROBE recall recovery (r11): the
    * scale dial for hyperplane-LSH self-dedup is `bits` — more bits keep
    * buckets small (cost Σ block²) but P[pair co-buckets] = (1 − θ/π)^bits
    * decays, so raising bits for a bigger corpus silently sheds recall.
    * Probing every bucket within `probeRadius` flipped hyperplane signs
    * (the [[Similarity.cosineLshTopKBatchMultiProbe]] posture applied to a
    * SELF-join) recovers the pairs whose members straddle ≤ probeRadius
    * planes, which is where near-identical vectors go when they split at
    * all. Candidates are generated SLIM — (id, bucket) rows only, the fat
    * vectors never expand with the probe masks — then verified by one
    * exact cosine re-join per side. Precision is exact either way (cosine
    * verify); pairs(r) ⊇ pairs(0) by construction. `maxBucket` caps the
    * UNEXPANDED bucket size before pairing (same audit contract as
    * [[lshCandidates]] — cap opt-in, never silent). */
  def embeddingDupPairsLshProbed(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 8, probeRadius: Int = 1,
      maxBucket: Long = Long.MaxValue): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= bits,
      s"probeRadius $probeRadius outside [0, $bits]")
    graft.functions.GraftExtensions.register(df.sparkSession)
    val bucket = Similarity.probeDim(df, vecCol)
      .map(dim => Similarity.lshBucket(col(vecCol), bits, dim))
      .getOrElse(Similarity.lshBucket(col(vecCol), bits))
    val slim = df.select(col(idCol).cast("long").as("id"), bucket.as("blk"))
    val kept =
      if (maxBucket == Long.MaxValue) slim
      else {
        val ok = slim.groupBy("blk").agg(count(lit(1)).as("n"))
          .filter(col("n") <= maxBucket).select("blk")
        slim.join(ok, Seq("blk"), "left_semi")
      }
    val probed = slim.select(col("id").as("id_b"),
      explode(array(Similarity.probeMasks(bits, probeRadius)
        .map(m => col("blk").bitwiseXOR(lit(m))): _*)).as("blk"))
    val cands = kept.select(col("id").as("id_a"), col("blk"))
      .hint("shuffle_hash") // exploded side: size estimate lies (see hammingBandPairs)
      .join(probed, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val vecs = df.select(col(idCol).cast("long").as("vid"), col(vecCol).as("vv"))
    cands
      .join(vecs.select(col("vid").as("id_a"), col("vv").as("va")), "id_a")
      .join(vecs.select(col("vid").as("id_b"), col("vv").as("vb")), "id_b")
      .withColumn("cosine", round(expr("cosine_similarity(va, vb)"), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** SEMANTIC dedup (the SemDeDup recipe, Abbas et al. 2023, arXiv
    * 2303.09540): coarse-quantize every embedding to its nearest codebook
    * cell ([[Similarity.assignByCodebook]] — the whole codebook folds into
    * one shuffle-free codegen expression), generate exact cosine pairs
    * WITHIN cells only ([[embeddingDupPairs]] blocked on `_cid` — cost
    * Σ cell², never the cross join), close them transitively
    * ([[dupClusters]]) and keep the min-id representative per semantic
    * cluster ([[dedupByClusters]]). Returns the surviving rows of `df`.
    * At 100 TB the cell count is the dial: cells ≈ corpus/√corpus keeps
    * Σ cell² ≈ corpus^1.5 bounded, and the codebook stays a broadcast-size
    * literal list by contract. */
  def semanticDedup(spark: org.apache.spark.sql.SparkSession, df: DataFrame, idCol: String,
      vecCol: String, codebook: Seq[(Int, Seq[Double])],
      threshold: Double, maxCell: Long = Long.MaxValue): DataFrame = {
    val assigned = Similarity.assignByCodebook(df, vecCol, codebook)
    val pairs = embeddingDupPairs(assigned, idCol, vecCol, "_cid", threshold, maxCell)
    dedupByClusters(df, idCol, dupClusters(spark, pairs))
  }

  // -------------------------------------------------- incremental corpus dedup
  //
  // Every generator above recomputes signatures from the full corpus per run.
  // At 100 TB the production workflow is incremental: a new shard arrives and
  // must be deduped against the existing corpus WITHOUT re-reading or
  // re-shingling corpus text. The signature STORE below persists exactly what
  // candidate generation and verification need — MinHash band signatures,
  // full MinHash signature arrays, SimHash band slices — as bucketed parquet
  // tables (the [[graft.StarWarehouse]] recipe applied to signature output),
  // so an increment is: one text pass over the NEW batch, then bucket joins
  // against stored signatures. Corpus text is never touched again; the store
  // is maintained by appending each accepted batch's signatures
  // ([[appendSignatureStore]] — the Fts.upsertPostings posture for dedup).

  import org.apache.spark.sql.{SaveMode, SparkSession}

  private def storeTables(name: String): (String, String, String) =
    (s"${name}_bands", s"${name}_sigs", s"${name}_simhash")

  /** The store's READ view of one of its tables: ids tombstoned in
    * `<name>_tomb` ([[removeFromSignatureStore]]) are anti-joined out.
    * The takedown manifest is small by contract, so the anti-join
    * broadcasts and the bucketed scan keeps its distribution. */
  private def liveTable(spark: SparkSession, name: String,
      table: String): DataFrame = {
    val base = spark.table(table)
    graft.engine.WarehouseMeta.idManifest(spark, s"${name}_tomb")
      .map(t => base.join(broadcast(t.select("id")), Seq("id"), "left_anti"))
      .getOrElse(base)
  }

  private def simhashSliceStructs(simBands: Int): Column = {
    val width = 60 / simBands
    val mask = (1L << width) - 1L
    array((0 until simBands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), b * width).bitwiseAND(lit(mask)).as("slice"))
    }: _*)
  }

  private def replaceBucketedTable(spark: SparkSession, table: String,
      bucketCol: String, buckets: Int, df: DataFrame,
      props: Map[String, String]): Unit =
    graft.engine.WarehouseMeta.replaceBucketedTable(
      spark, table, bucketCol, buckets, df, props)

  /** The store's signing parameters, pinned in TBLPROPERTIES at build time
    * so an increment with mismatched (k, bands, rowsPerBand, simBands) fails
    * LOUDLY instead of silently generating zero candidates (signatures from
    * different parameters never collide). */
  private def requireStoreParams(spark: SparkSession, table: String,
      expected: Map[String, String]): Unit = {
    val stored = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .properties
    expected.foreach { case (key, want) =>
      val got = stored.get(key)
      require(got.contains(want),
        s"signature store $table was built with $key=${got.getOrElse("?")}, " +
          s"increment called with $key=$want — rebuild the store or match its parameters")
    }
  }

  /** Build (or rebuild) the persisted signature store for a corpus batch:
    *
    *   - `<name>_sigs`    (id, sig ARRAY<LONG>)        bucketed by id
    *   - `<name>_bands`   (id, band, sig STRING)       bucketed by sig
    *   - `<name>_simhash` (id, band, slice, simhash)   bucketed by slice
    *
    * ONE shingle pass feeds both MinHash tables: `_sigs` is written straight
    * off [[minhashWide]], and `_bands` is derived by reading `_sigs` BACK
    * (signature rows are ~136 bytes/doc — re-reading them beats caching or a
    * second corpus scan at any scale). The SimHash table is its own token
    * pass ([[simhash]] tokenizes words, not shingles). Bucketing puts every
    * future increment's probe join on pre-clustered store partitions: the
    * store side never re-shuffles (HashPartitioning(sig) satisfies the
    * (band, sig) join's clustering), only the new batch moves. */
  def writeSignatureStore(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, name: String, k: Int = 3, bands: Int = 4,
      rowsPerBand: Int = 4, simBands: Int = 4, buckets: Int = 16,
      maxBucket: Long = Long.MaxValue): Unit = {
    val numHashes = bands * rowsPerBand
    val (bandsT, sigsT, simT) = storeTables(name)
    // a rebuild starts a new corpus state: tombstones from the previous one
    // must not delete freshly written signatures, and stale ingest-loop
    // batch commits ([[applyIngestBatch]]) must not suppress a NEW stream's
    // appends (streaming batch ids restart with their checkpoint)
    graft.engine.WarehouseMeta.dropIdManifest(spark, s"${name}_tomb")
    graft.engine.WarehouseMeta.deleteRecursively(
      graft.engine.WarehouseMeta.tableLocation(spark, s"${name}_ingest_log"))
    val props = Map(
      "graft.k" -> k.toString, "graft.bands" -> bands.toString,
      "graft.rowsPerBand" -> rowsPerBand.toString,
      "graft.simBands" -> simBands.toString,
      "graft.maxBucket" -> maxBucket.toString)
    val wide = minhashWide(df, idCol, textCol, k, numHashes)
    replaceBucketedTable(spark, sigsT, "id", buckets,
      wide.select(col("id"),
        array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig")),
      props)
    // derive bands from the just-written sigs table: no second text pass.
    // `maxBucket` is the [[lshCandidates]] degenerate-bucket guard applied
    // at the STORE: a (band, sig) bucket larger than the cap is excluded
    // from the probe table — at corpus scale one degenerate signature
    // (thousands of near-empty docs) would otherwise fan out against every
    // future increment forever. Opt-in like every cap here, and never
    // silent: [[storeOverflowBuckets]] re-derives exactly what was dropped
    // from the (persisted, text-free) signature table.
    val sigs = spark.table(sigsT)
    val wideBack = sigs.select(col("id") +:
      (0 until numHashes).map(i => element_at(col("sig"), i + 1).as(s"mh_$i")): _*)
    val allBands = wideBack
      .select(col("id"), explode(bandStructs(bands, rowsPerBand)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val keptBands =
      if (maxBucket == Long.MaxValue) allBands
      else {
        val fits = allBands.groupBy("band", "sig")
          .agg(count(lit(1)).as("bcount"))
          .filter(col("bcount") <= maxBucket)
          .select("band", "sig")
        allBands.join(fits, Seq("band", "sig"), "left_semi")
      }
    replaceBucketedTable(spark, bandsT, "sig", buckets, keptBands, props)
    replaceBucketedTable(spark, simT, "slice", buckets,
      simhash(df, idCol, textCol)
        .select(col("id"), col("simhash"), explode(simhashSliceStructs(simBands)).as("bs"))
        .select(col("id"), col("bs.band").as("band"), col("bs.slice").as("slice"),
          col("simhash")),
      props)
  }

  // fixed structural schemas of the three store tables (not data-dependent,
  // so fresh-JVM re-registration needs no schema sidecar entries)
  private val sigsDdl = "id BIGINT, sig ARRAY<BIGINT>"
  private val bandsDdl = "id BIGINT, band INT, sig STRING"
  private val simDdl = "id BIGINT, band INT, slice BIGINT, simhash BIGINT"

  /** Durable store entry point — [[writeSignatureStore]] with the
    * [[graft.StarWarehouse]] reuse contract (shared
    * [[graft.engine.WarehouseMeta]] primitives): a store whose
    * `fingerprint` matches is NEVER rebuilt — same-JVM reopens are
    * catalog-metadata checks, a FRESH JVM (in-memory catalog) re-registers
    * the existing bucketed files from the sidecar with zero Spark jobs,
    * and a changed fingerprint (new/extended corpus batch) rebuilds. At
    * 100 TB re-signing the corpus because a process restarted is exactly
    * the cost this store exists to avoid — restart-survival is part of the
    * contract, not an optimization. Returns true if a build ran.
    *
    * `fingerprint` should capture the SOURCE of the stored batch (e.g.
    * [[graft.engine.WarehouseMeta.sourceSignature]] of the corpus files
    * plus any selection predicate); callers that append afterwards
    * ([[appendSignatureStore]]) own keeping it in sync. */
  def ensureSignatureStore(spark: SparkSession, df: => DataFrame, idCol: String,
      textCol: String, name: String, fingerprint: String, k: Int = 3,
      bands: Int = 4, rowsPerBand: Int = 4, simBands: Int = 4,
      buckets: Int = 16, maxBucket: Long = Long.MaxValue): Boolean = {
    import graft.engine.WarehouseMeta
    val (bandsT, sigsT, simT) = storeTables(name)
    val tables = Seq(bandsT, sigsT, simT)
    WarehouseMeta.withBuildLock(spark, name) {
      val inCatalog = tables.forall(t => spark.catalog.tableExists(t) &&
        WarehouseMeta.storedFingerprint(spark, t).contains(fingerprint))
      val callerParams = Map("k" -> k.toString, "bands" -> bands.toString,
        "rowsPerBand" -> rowsPerBand.toString, "simBands" -> simBands.toString,
        "maxBucket" -> maxBucket.toString)
      lazy val reRegistered = WarehouseMeta.readSidecar(spark, s"${name}_meta.tsv")
        .exists { m =>
          // Re-registration must stamp the STORE'S signing parameters, not
          // trust the caller's: a matching fingerprint with mismatched
          // k/bands/rowsPerBand would pass requireStoreParams and then
          // silently probe zero candidates (band signatures sliced with
          // the wrong geometry). Sidecars carry the params since r9-close;
          // a params-bearing sidecar that disagrees with the caller fails
          // LOUDLY, and a legacy sidecar without them falls through to a
          // fingerprint rebuild (which re-records them).
          val paramsRecorded = m.contains("k")
          val paramsOk = paramsRecorded &&
            callerParams.forall { case (key, v) => m.get(key).contains(v) }
          // only a SAME-fingerprint params mismatch is the silent-zero
          // hazard; a stale fingerprint just rebuilds with the new params
          if (m.get("sig").contains(fingerprint))
            require(!paramsRecorded || paramsOk,
              s"store $name was built with ${m.view.filterKeys(callerParams.contains).toMap} " +
                s"but ensure was called with $callerParams — mismatched signing " +
                "parameters would silently produce zero candidates")
          m.get("sig").contains(fingerprint) &&
            m.get("buckets").contains(buckets.toString) && paramsOk &&
            tables.forall(t =>
              java.nio.file.Files.isDirectory(WarehouseMeta.tableLocation(spark, t)) &&
                !spark.catalog.tableExists(t)) && {
              def create(table: String, ddl: String, bucketCol: String): Unit =
                spark.sql(
                  s"""CREATE TABLE $table ($ddl) USING PARQUET
                     |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO $buckets BUCKETS
                     |LOCATION '${WarehouseMeta.tableLocation(spark, table).toUri}'
                     |TBLPROPERTIES ('graft.fingerprint' = '$fingerprint',
                     |  'graft.k' = '$k', 'graft.bands' = '$bands',
                     |  'graft.rowsPerBand' = '$rowsPerBand', 'graft.simBands' = '$simBands',
                     |  'graft.maxBucket' = '$maxBucket')""".stripMargin)
              create(sigsT, sigsDdl, "id")
              create(bandsT, bandsDdl, "sig")
              create(simT, simDdl, "slice")
              true
            }
        }
      if (inCatalog || reRegistered) false
      else {
        writeSignatureStore(spark, df, idCol, textCol, name, k, bands, rowsPerBand,
          simBands, buckets, maxBucket)
        tables.foreach(t => spark.sql(
          s"ALTER TABLE $t SET TBLPROPERTIES ('graft.fingerprint' = '$fingerprint')"))
        WarehouseMeta.writeSidecar(spark, s"${name}_meta.tsv", Map(
          "sig" -> fingerprint, "buckets" -> buckets.toString) ++ callerParams)
        true
      }
    }
  }

  /** The (band, sig) buckets a store built with `maxBucket` EXCLUDED from
    * its probe table — re-derived from the persisted signature table (no
    * text), so the cap is auditable forever, not just at build time.
    * Returns (band, sig, bcount > maxBucket). */
  def storeOverflowBuckets(spark: SparkSession, name: String,
      maxBucket: Long): DataFrame = {
    val (bandsT, sigsT, _) = storeTables(name)
    val p = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(bandsT)).properties
    val (bands, rowsPerBand) = (p("graft.bands").toInt, p("graft.rowsPerBand").toInt)
    val numHashes = bands * rowsPerBand
    liveTable(spark, name, sigsT)
      .select(col("id") +:
        (0 until numHashes).map(i => element_at(col("sig"), i + 1).as(s"mh_$i")): _*)
      .select(col("id"), explode(bandStructs(bands, rowsPerBand)).as("bs"))
      .select(col("bs.band").as("band"), col("bs.sig").as("sig"))
      .groupBy("band", "sig")
      .agg(count(lit(1)).as("bcount"))
      .filter(col("bcount") > maxBucket)
  }

  /** Append a new batch's signatures into an existing store (after the batch
    * has been deduped and accepted): insertInto writes bucket-correct files
    * for every table, so future increments keep their shuffle-free store
    * side. The maintained-index analog of [[graft.query.Fts.upsertPostings]].
    * NOTE appends do not re-evaluate a build-time `maxBucket` cap (each
    * append is bounded by its batch; a bucket that grows past the cap
    * across many appends is re-capped at the next fingerprint rebuild —
    * audit any time via [[storeOverflowBuckets]]).
    *
    * Appending an id that is currently TOMBSTONED fails loudly: the rows
    * would be invisible until the next compaction physically deleted them
    * (silent loss). Re-ingesting a forgotten id requires
    * [[compactSignatureStore]] first. */
  def appendSignatureStore(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, name: String): Unit = {
    val (bandsT, sigsT, simT) = storeTables(name)
    graft.engine.WarehouseMeta.requireNotTombstoned(spark, s"${name}_tomb",
      df.select(col(idCol).cast("long").as("id")), s"signature store $name")
    val p = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(sigsT)).properties
    val (k, bands, rowsPerBand, simBands) = (p("graft.k").toInt,
      p("graft.bands").toInt, p("graft.rowsPerBand").toInt, p("graft.simBands").toInt)
    val numHashes = bands * rowsPerBand
    val wide = minhashWide(df, idCol, textCol, k, numHashes)
    wide.select(col("id"),
        array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
      .write.mode(SaveMode.Append).insertInto(sigsT)
    wide.select(col("id"), explode(bandStructs(bands, rowsPerBand)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      .write.mode(SaveMode.Append).insertInto(bandsT)
    simhash(df, idCol, textCol)
      .select(col("id"), col("simhash"), explode(simhashSliceStructs(simBands)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.slice").as("slice"),
        col("simhash"))
      .write.mode(SaveMode.Append).insertInto(simT)
  }

  /** Remove documents from the signature store by id — the takedown /
    * right-to-be-forgotten path for a maintained index: ids append to the
    * tiny `<name>_tomb` table (under the store's build lock, so a remove
    * can never interleave with a compaction dropping the same manifest)
    * and every store read anti-joins them out — no signature rewrite on
    * the takedown path. BATCH reads (increments, simhash increments, cap
    * audits) see a tombstone immediately; a RUNNING stream resolved its
    * plan at query start and picks up later tombstones at its next
    * restart ([[dedupIncrementStream]] guarantees the anti-join is in the
    * plan from the first start). [[compactSignatureStore]] folds
    * tombstones in physically on the operator's schedule. */
  def removeFromSignatureStore(spark: SparkSession, name: String,
      ids: Seq[Long]): Unit =
    graft.engine.WarehouseMeta.appendToIdManifest(spark, name,
      s"${name}_tomb", ids)

  /** Fold accumulated tombstones into all three store tables — each is
    * rewritten stage-and-swap (never reads files it is deleting; bucketing
    * and TBLPROPERTIES survive), then the tombstone table is dropped.
    * Returns true if a compaction ran (false with nothing to fold). Shares
    * the store's build lock, so a compaction never interleaves with a
    * rebuild.
    *
    * STOP STREAMS FIRST: a running [[dedupIncrementStream]] (or any
    * stream-static consumer of the store) resolved its plan over the
    * CURRENT store and tombstone files at query start — the swap replaces
    * those files, so its next micro-batch fails with missing-file errors.
    * The build lock serializes batch maintenance only; it cannot see a
    * stream's resolved plan. Compaction belongs between stream restarts
    * (the restart then also picks up all takedowns, per
    * [[removeFromSignatureStore]]). */
  def compactSignatureStore(spark: SparkSession, name: String): Boolean = {
    import graft.engine.WarehouseMeta
    val (bandsT, sigsT, simT) = storeTables(name)
    val tomb = s"${name}_tomb"
    WarehouseMeta.withBuildLock(spark, name) {
      // a crashed ingest batch must resolve BEFORE files are rewritten:
      // compacting past a stale intent would make the eventual replay's
      // rollback treat every post-compaction file as partial-apply output
      WarehouseMeta.rollbackStaleIntents(spark, s"${name}_ingest_log",
        { val (b, s2, m) = storeTables(name); Seq(b, s2, m) })
      val manifest = WarehouseMeta.idManifest(spark, tomb)
      if (manifest.isEmpty) false
      else {
        def meta(t: String) = spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
        val props = meta(sigsT).properties
          .filter { case (k, _) => k.startsWith("graft.") }
        val dead = manifest.get.select("id")
        def survivors(t: String) =
          spark.table(t).join(broadcast(dead), Seq("id"), "left_anti")
        def buckets(t: String) = meta(t).bucketSpec.map(_.numBuckets).getOrElse(16)
        WarehouseMeta.swapRewriteBucketedTable(spark, sigsT, "id",
          buckets(sigsT), sigsDdl, survivors(sigsT), props)
        WarehouseMeta.swapRewriteBucketedTable(spark, bandsT, "sig",
          buckets(bandsT), bandsDdl, survivors(bandsT), props)
        WarehouseMeta.swapRewriteBucketedTable(spark, simT, "slice",
          buckets(simT), simDdl, survivors(simT), props)
        WarehouseMeta.dropIdManifest(spark, tomb)
        true
      }
    }
  }

  /** Dedup a NEW batch against the persisted store — the incremental twin of
    * [[lshCandidates]] + [[estimateJaccardBySignature]], with the corpus side
    * replaced by stored signatures: one text pass over `newDocs` computes its
    * wide signatures (Catalyst reuses the one aggregate for both the band
    * probe and the verify join); candidates come from a bucket join of new
    * band signatures against `<name>_bands`; est-Jaccard re-scores each
    * candidate from `<name>_sigs`. Batch-1 TEXT is never scanned — the plan
    * reads only signature tables on the store side (DedupSpec pins this).
    * Returns (id_a, id_b, est_jaccard ≥ minEstimate), ids least/greatest
    * normalized. Within-batch dups are [[lshCandidates]] on `newDocs` alone;
    * this operator covers the new-vs-corpus half an increment adds. */
  def dedupIncrement(spark: SparkSession, newDocs: DataFrame, idCol: String,
      textCol: String, name: String, k: Int = 3, bands: Int = 4,
      rowsPerBand: Int = 4, minEstimate: Double = 0.0): DataFrame = {
    val numHashes = bands * rowsPerBand
    val (bandsT, sigsT, _) = storeTables(name)
    requireStoreParams(spark, bandsT, Map(
      "graft.k" -> k.toString, "graft.bands" -> bands.toString,
      "graft.rowsPerBand" -> rowsPerBand.toString))
    val wide = minhashWide(newDocs, idCol, textCol, k, numHashes)
    val newBands = wide
      .select(col("id").as("new_id"), explode(bandStructs(bands, rowsPerBand)).as("bs"))
      .select(col("new_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val newSigs = wide.select(col("id").as("new_id"),
      array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("new_sig"))
    newBands.join(storeBandSide(spark, name), Seq("band", "sig"))
      // a doc re-ingested under its stored id must not pair with itself
      .filter(col("old_id") =!= col("new_id"))
      .select("new_id", "old_id").distinct()
      .join(newSigs, "new_id")
      .join(storeSigSide(spark, name), "old_id")
      .withColumn("est_jaccard", estJaccardCol(numHashes))
      .filter(col("est_jaccard") >= minEstimate)
      .select(normalizedPair :+ col("est_jaccard"): _*)
  }

  // -- shared increment vocabulary (batch + streaming paths): the JOIN
  // ORDERS deliberately differ (streaming append-mode forbids the batch
  // path's pre-verify distinct — a stateful aggregation before a join),
  // but the store projections, the verify expression, and the pair
  // normalization must never diverge between the two contracts
  // (EventStreamsSpec pins stream ≡ batch on the same store).
  private def storeBandSide(spark: SparkSession, name: String): DataFrame =
    liveTable(spark, name, storeTables(name)._1)
      .select(col("id").as("old_id"), col("band"), col("sig"))
  private def storeSigSide(spark: SparkSession, name: String): DataFrame =
    liveTable(spark, name, storeTables(name)._2)
      .select(col("id").as("old_id"), col("sig").as("old_sig"))
  private def estJaccardCol(numHashes: Int): Column = round(
    expr("size(filter(zip_with(new_sig, old_sig, (x, y) -> x = y), b -> b))" +
      s" / CAST($numHashes AS DOUBLE)"), 6)
  private def normalizedPair: Seq[Column] = Seq(
    least(col("old_id"), col("new_id")).as("id_a"),
    greatest(col("old_id"), col("new_id")).as("id_b"))

  /** ROW-LOCAL MinHash signature — the same values as [[minhashWide]]
    * computed entirely within one row (shingle → 60-bit hash → per-
    * coefficient `array_min` fold), no explode, no shuffle, NO STATE.
    * This is the form streaming ingest needs: a stateless column
    * expression keeps the whole dedup-on-arrival pipeline append-mode with
    * zero stateful operators (stream-static joins only). The batch
    * aggregate form remains the bulk-corpus path (map-side combine over
    * exploded shingles beats per-row interpreted HOFs at backfill scale);
    * DedupSpec pins value equality between the two forms. Returns NULL
    * for docs with no k-shingle (shorter than k tokens). */
  def minhashSignature(textCol: Column, k: Int = 3, numHashes: Int = 16): Column = {
    val toks = split(textCol, " ")
    val sh = when(size(toks) >= k,
      array_distinct(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array())
    val hs = transform(sh, s => pmod(hash60(s), lit(P)))
    when(size(sh) > 0,
      array((0 until numHashes).map(i =>
        array_min(transform(hs,
          h => pmod(lit(aCoef(i)) * h + lit(bCoef(i)), lit(P))))): _*))
      .otherwise(lit(null))
  }

  /** STREAMING ingest dedup against the persisted store: the
    * dedup-on-arrival shape — documents flow in, each row computes its own
    * signature ([[minhashSignature]], stateless), bands probe the store's
    * bucketed tables via stream-STATIC joins, and candidates re-score from
    * stored signature arrays. Everything is append-mode; the only stateful
    * operator is the final cross-band `dropDuplicates` on (id_a, id_b)
    * (production streams should bound its state with a watermark +
    * `dropDuplicatesWithinWatermark` on ingest time; the contract is
    * otherwise identical to [[dedupIncrement]] — EventStreamsSpec pins
    * stream ≡ batch on the same store). */
  def dedupIncrementStream(spark: SparkSession, docsStream: DataFrame,
      idCol: String, textCol: String, name: String, k: Int = 3,
      bands: Int = 4, rowsPerBand: Int = 4, minEstimate: Double = 0.0): DataFrame = {
    val numHashes = bands * rowsPerBand
    val (bandsT, sigsT, _) = storeTables(name)
    // streaming plans resolve the store's read view at query start: ensure
    // the tombstone manifest EXISTS so the anti-join is in the plan — each
    // (re)start then enforces all takedowns recorded so far (mid-run
    // appends become visible at the next restart, the stream-static
    // contract; see removeFromSignatureStore)
    graft.engine.WarehouseMeta.ensureIdManifest(spark, name, s"${name}_tomb")
    requireStoreParams(spark, bandsT, Map(
      "graft.k" -> k.toString, "graft.bands" -> bands.toString,
      "graft.rowsPerBand" -> rowsPerBand.toString))
    val withSig = docsStream.select(col(idCol).as("new_id"),
        minhashSignature(col(textCol), k, numHashes).as("new_sig"))
      .filter(col("new_sig").isNotNull)
    val perBand = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until rowsPerBand).map(r =>
          element_at(col("new_sig"), b * rowsPerBand + r + 1).cast("string")): _*).as("sig"))
    }: _*)
    val banded = withSig.select(col("new_id"), col("new_sig"),
        explode(perBand).as("bs"))
      .select(col("new_id"), col("new_sig"),
        col("bs.band").as("band"), col("bs.sig").as("sig"))
    banded.join(storeBandSide(spark, name), Seq("band", "sig"))
      .filter(col("old_id") =!= col("new_id"))
      .join(storeSigSide(spark, name), "old_id")
      .withColumn("est_jaccard", estJaccardCol(numHashes))
      .filter(col("est_jaccard") >= minEstimate)
      .select(normalizedPair :+ col("est_jaccard"): _*)
      .dropDuplicates("id_a", "id_b")
  }

  // ------------------------------------------- streaming store MAINTENANCE
  //
  // [[dedupIncrementStream]] READS the store; a live ingest pipeline must
  // also WRITE it — dedup each micro-batch against the corpus so far, land
  // the duplicate pairs, and index the accepted docs so the NEXT batch sees
  // them. foreachBatch is the Spark surface for a sink with side effects;
  // exactly-once is this module's own commit log (the streamToDateLake
  // posture applied to a custom sink): Structured Streaming replays a
  // micro-batch after restart with the SAME batchId and data, so a
  // committed batch skips entirely, and a crashed one rolls back via a
  // pre-append file snapshot before re-applying.

  /** Apply ONE ingest micro-batch to the store, EXACTLY-ONCE under replays:
    *
    *   1. `<name>_ingest_log/<batchId>.commit` exists → no-op (replay of a
    *      fully applied batch).
    *   2. Any `.intent` without a `.commit` marks a CRASHED append: store
    *      files absent from its snapshot are that append's partial output —
    *      deleted before anything else runs (rollback), then the crashed
    *      batch re-applies when the stream replays it.
    *   3. Snapshot the store's data files into `<batchId>.intent`, compute
    *      duplicate pairs — BOTH new-vs-corpus ([[dedupIncrement]]) and
    *      WITHIN-BATCH ([[lshCandidates]] + signature re-score over the
    *      batch alone; with AvailableNow a whole backlog drains as one
    *      batch, so same-batch near-dups are a primary case, not an edge)
    *      — overwrite them into `pairsPath/batch=<batchId>` tagged with a
    *      `src` column (`corpus`/`batch`), append the ACCEPTED docs'
    *      signatures, and atomically promote intent → commit. Accepted =
    *      batch docs that neither paired with the corpus nor are the
    *      GREATER side of a within-batch pair (the kept side of every
    *      within-batch pair is its min id — the [[dedupByClusters]]
    *      keep-rule applied pairwise).
    *
    * Runs under the store's build lock, so batches serialize against
    * compactions and rebuilds. Returns the accepted-doc count (-1 for a
    * skipped replay). */
  def applyIngestBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      idCol: String, textCol: String, name: String, pairsPath: String,
      k: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      minEstimate: Double = 0.0): Long = {
    import graft.engine.WarehouseMeta
    WarehouseMeta.withBuildLock(spark, name) {
      val tables = { val (b, s, m) = storeTables(name); Seq(b, s, m) }
      WarehouseMeta.exactlyOnceBatch(spark, s"${name}_ingest_log", batchId, tables) {
        val cross = dedupIncrement(spark, batch, idCol, textCol, name, k,
          bands, rowsPerBand, minEstimate).withColumn("src", lit("corpus"))
        val inner = estimateJaccardBySignature(batch, idCol, textCol,
            lshCandidates(batch, idCol, textCol, k, bands, rowsPerBand),
            k, bands * rowsPerBand, minEstimate)
          .withColumn("src", lit("batch"))
        cross.unionByName(inner)
          .write.mode(SaveMode.Overwrite).parquet(s"$pairsPath/batch=$batchId")
        // drop set read BACK from the landed batch dir (no recompute, and
        // the indexed set provably matches the landed pairs): every batch
        // member of a corpus pair, plus the greater side of each
        // within-batch pair (min-id side survives)
        val landed = spark.read.parquet(s"$pairsPath/batch=$batchId")
        val dropIds = landed.filter(col("src") === "corpus")
          .select(explode(array(col("id_a"), col("id_b"))).as("id"))
          .unionByName(landed.filter(col("src") === "batch")
            .select(col("id_b").as("id")))
          .distinct()
        val accepted = batch.join(dropIds,
          batch(idCol).cast("long") === dropIds("id"), "left_anti")
        val nAccepted = accepted.count()
        if (nAccepted > 0)
          appendSignatureStore(spark, accepted, idCol, textCol, name)
        nAccepted
      }.getOrElse(-1L)
    }
  }

  /** The closed ingest loop as a STREAM: each micro-batch is deduped
    * against the store and the accepted docs are indexed into it before
    * the next batch runs — [[applyIngestBatch]] under foreachBatch with
    * AvailableNow (drain-the-backlog; a live deployment swaps the
    * trigger). Restart-safe end to end: the streaming checkpoint replays
    * uncommitted batches with identical batchIds, and the ingest commit
    * log makes each batch's store append exactly-once (EventStreamsSpec
    * kills a run mid-stream and pins store ≡ the batch pipeline's). */
  def dedupIngestStream(spark: SparkSession, docsStream: DataFrame,
      idCol: String, textCol: String, name: String, pairsPath: String,
      checkpoint: String, k: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      minEstimate: Double = 0.0): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        // the micro-batch frame belongs to the stream's session clone;
        // catalog state (external catalog, warehouse dir) is shared
        applyIngestBatch(b.sparkSession, b, id, idCol, textCol, name,
          pairsPath, k, bands, rowsPerBand, minEstimate)
        // insertInto refreshed the CLONE's relation cache only — refresh
        // the caller's session too, so the session that started the stream
        // reads the maintained store without a manual refresh (per-session
        // caches are the one piece of state the clone does NOT share)
        val (bt, st, mt) = storeTables(name)
        Seq(bt, st, mt).foreach(spark.catalog.refreshTable)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** SimHash increment: near-dup pairs of `newDocs` vs the stored corpus by
    * Hamming distance, via the stored band slices — the incremental twin of
    * [[simhashDupPairs]] (pigeonhole recall: complete for maxHamming ≤
    * simBands − 1). One token pass over the new batch; the store side reads
    * pre-bucketed (band, slice) rows, never corpus text. */
  def dedupIncrementSimhash(spark: SparkSession, newDocs: DataFrame,
      idCol: String, textCol: String, name: String, maxHamming: Int = 3,
      simBands: Int = 4): DataFrame = {
    require(maxHamming <= simBands - 1,
      s"band-blocking recall is only complete for maxHamming <= simBands-1 ($maxHamming > ${simBands - 1})")
    val (_, _, simT) = storeTables(name)
    requireStoreParams(spark, simT, Map("graft.simBands" -> simBands.toString))
    val newBanded = simhash(newDocs, idCol, textCol)
      .select(col("id").as("new_id"), col("simhash").as("new_hash"),
        explode(simhashSliceStructs(simBands)).as("bs"))
      .select(col("new_id"), col("new_hash"),
        col("bs.band").as("band"), col("bs.slice").as("slice"))
    val st = liveTable(spark, name, simT)
      .select(col("id").as("old_id"), col("band"), col("slice"),
        col("simhash").as("old_hash"))
    newBanded.join(st, Seq("band", "slice"))
      .filter(col("old_id") =!= col("new_id"))
      .withColumn("hamming", bit_count(col("new_hash").bitwiseXOR(col("old_hash"))))
      .filter(col("hamming") <= maxHamming)
      .select(least(col("old_id"), col("new_id")).as("id_a"),
        greatest(col("old_id"), col("new_id")).as("id_b"),
        col("hamming"))
      .distinct()
  }

  // -------------------------------------- exact-substring dedup (Lee 2021)
  //
  // "Deduplicating Training Data Makes Language Models Better" (Lee et al.
  // 2021, arXiv 2107.06499) removes every repeated substring of >= L chars,
  // keeping one occurrence — the recipe behind C4/MassiveText exact-substring
  // dedup. The paper builds one giant suffix array; that is a single-machine
  // shape. The distributed re-expression: L-char windows ANCHORED AT WORD
  // STARTS (content-defined positions — a fixed position grid would miss
  // clones landing at unaligned offsets, since grids are doc-relative),
  // grouped BY WINDOW TEXT; any window seen >= 2 times corpus-wide is a
  // duplicated span, and all but the corpus-first occurrence (min (id, pos))
  // are cut from their documents. Identical runs select identical interior
  // anchors in every copy, so any repeated run containing at least one full
  // word-anchored window is detected structurally — recall granularity
  // follows anchor density (one per word for natural text), and surviving
  // fragments shorter than L are exactly what "remove repeats >= L" allows.
  //
  // Scale posture: the shuffle carries (window, id, pos) — one row per WORD,
  // the same order as [[wordShingles]]; `hashWindows = true` swaps the key
  // for xxhash64(window), an 8-byte shuffle key (collision odds < n²/2⁶⁴),
  // spec-pinned equal on the test corpus. `anchorEvery = q` keeps only
  // windows with hash60(win) % q == 0 — CONTENT-correlated subsampling (a
  // window is kept in all of its copies or none, so precision is unhurt and
  // recall degrades geometrically, never by misalignment) — the 100 TB
  // dial. Election is one groupBy with map-side partial min — never a
  // window function over the corpus.

  /** Word-anchored `windowLen`-char windows over `textCol`: (id, pos, win)
    * with 1-based `pos` at each word start (position 1 and every position
    * after a space — split semantics, empty tokens included), keeping only
    * full windows (pos + windowLen - 1 <= length). The key column `win` is
    * the window text, or its xxhash64 when `hashWindows`. Anchor positions
    * come from one aggregate HOF over the token array (prefix sums —
    * per-element work is a length read, the r12 HOF rule). */
  private def anchoredWindows(df: DataFrame, idCol: String, textCol: String,
      windowLen: Int, anchorEvery: Int, hashWindows: Boolean): DataFrame = {
    require(windowLen >= 2, "need windowLen >= 2")
    require(anchorEvery >= 1, "need anchorEvery >= 1")
    val t = col(textCol)
    val starts = aggregate(
      split(t, " "),
      struct(lit(1L).as("nxt"), typedLit(Seq.empty[Long]).as("st")),
      (acc, tk) => struct(
        (acc.getField("nxt") + length(tk) + 1L).as("nxt"),
        concat(acc.getField("st"), array(acc.getField("nxt"))).as("st")),
      acc => acc.getField("st"))
    val win = col("_t").substr(col("pos").cast("int"), lit(windowLen))
    val occ = df.filter(length(t) >= windowLen)
      .select(col(idCol).as("id"), explode(starts).as("pos"), t.as("_t"))
      .filter(col("pos") + (windowLen - 1) <= length(col("_t")))
      .select(col("id"), col("pos"),
        (if (hashWindows) xxhash64(win) else win).as("win"))
    if (anchorEvery == 1) occ
    else occ.filter(
      pmod(if (hashWindows) col("win") else hash60(col("win")),
        lit(anchorEvery.toLong)) === 0L)
  }

  /** Duplicated-window occurrences: every (id, pos) whose `windowLen`-char
    * word-anchored window text occurs >= 2 times corpus-wide (within-doc
    * repeats count, as in Lee 2021), with the occurrence count riding
    * along. First occurrences are INCLUDED here — this is the
    * detection/audit view; [[scrubDuplicatedSpans]] is the removal that
    * spares the elected first. */
  def duplicatedWindows(df: DataFrame, idCol: String, textCol: String,
      windowLen: Int, anchorEvery: Int = 1,
      hashWindows: Boolean = false): DataFrame = {
    val occ = anchoredWindows(df, idCol, textCol, windowLen, anchorEvery,
      hashWindows)
    val dups = occ.groupBy("win")
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)
    occ.join(dups, Seq("win"), "inner")
      .select(col("id"), col("pos"), col("dup_count"))
  }

  /** Substring-granular CONTAMINATION: word-anchored `windowLen`-char
    * windows of `eval` found VERBATIM anywhere in `corpus` — catches a
    * quoted benchmark answer inside an otherwise-novel training document,
    * which the shingle-set scores ([[contaminationScores]],
    * [[contaminationAgainstStore]]) dilute by document length. One row
    * per eval doc that has at least one full window: total windows, hit
    * windows, and the hit fraction. Shuffle budget: one row per word on
    * each side; the corpus side reduces to DISTINCT window keys before
    * the join. */
  def substringContamination(eval: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, windowLen: Int, anchorEvery: Int = 1,
      hashWindows: Boolean = false): DataFrame = {
    val evalW = anchoredWindows(eval, idCol, textCol, windowLen, anchorEvery,
      hashWindows)
    val corpusW = anchoredWindows(corpus, idCol, textCol, windowLen,
      anchorEvery, hashWindows).select("win").distinct()
    val totals = evalW.groupBy("id").agg(count(lit(1)).as("n_windows"))
    val hits = evalW.join(corpusW, Seq("win"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq("id"), "left")
      .select(col("id"), col("n_windows"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_windows"), 6).as("hit_frac"))
  }

  /** Exact-substring scrub (the Lee 2021 removal): every duplicated
    * window's span [pos, pos+windowLen) is cut from its document EXCEPT
    * the corpus-first occurrence (min (id, pos) per window text), which
    * survives verbatim; overlapping cut spans within a document merge
    * before excision. Returns the input columns with `textCol` replaced by
    * the scrubbed text (docs with nothing to cut pass through verbatim,
    * including docs shorter than a window).
    *
    * Shapes: election is groupBy(win) → min(struct(id, pos)) (map-side
    * combinable); cuts per doc are a sorted position array (bounded by
    * windows-per-doc); the excision itself is one `aggregate` HOF walking
    * the sorted cut starts with a (cursor, acc) state — interpreted, but
    * per-element work is an attribute read + substr (the r12 HOF rule:
    * never capture a wide expression tree in the lambda). */
  def scrubDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      windowLen: Int, anchorEvery: Int = 1,
      hashWindows: Boolean = false): DataFrame = {
    val occ = anchoredWindows(df, idCol, textCol, windowLen, anchorEvery,
      hashWindows)
    val winners = occ.groupBy("win")
      .agg(min(struct(col("id"), col("pos"))).as("w0"),
        count(lit(1)).as("c"))
      .filter(col("c") > 1)
    val cuts = occ.join(winners, Seq("win"), "inner")
      .filter(struct(col("id"), col("pos")) =!= col("w0"))
      .groupBy("id").agg(sort_array(collect_list(col("pos"))).as("_cuts"))
      .withColumnRenamed("id", idCol)
    val t = col(textCol)
    // walk the sorted cut starts once: copy [cursor, s) when s is past the
    // cursor, then jump the cursor over the span; the tail copies at finish.
    // All positions 1-based to match substr/DuckDB.
    val scrubbed = aggregate(
      col("_cuts"),
      struct(lit(1L).as("cur"), lit("").as("acc")),
      (st, s) => struct(
        greatest(st.getField("cur"), s + windowLen).as("cur"),
        concat(st.getField("acc"),
          when(s > st.getField("cur"),
            t.substr(st.getField("cur").cast("int"),
              (s - st.getField("cur")).cast("int")))
            .otherwise(lit(""))).as("acc")),
      st => concat(st.getField("acc"),
        t.substr(st.getField("cur").cast("int"),
          greatest(length(t).cast("long") - st.getField("cur") + 1L, lit(0L))
            .cast("int"))))
    df.join(cuts, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("_cuts").isNull, t).otherwise(scrubbed))
      .drop("_cuts")
  }
}
