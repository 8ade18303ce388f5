package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation (extension surface): token
  * counting, quality scoring, language-ID heuristic, fingerprinting. All are
  * single-pass column expressions (whole-stage-codegen friendly, no UDFs) and
  * reproducible in the DuckDB oracle. */
object TextAnalysis {

  /** Whitespace token count (single-space corpus convention). */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword count upper bound: word-boundary pieces + digit runs —
    * a regex proxy for tokenizer cost estimation at ingest time. */
  def subwordCount(text: Column): Column =
    size(split(text, "(?<=[a-z])(?=[A-Z])|[^A-Za-z0-9]+"))

  def distinctTokenCount(text: Column): Column = size(array_distinct(split(text, " ")))

  /** Quality features per document: lengths, lexical diversity, punctuation
    * and digit density. Ratios rounded to 4 dp for cross-engine equality. */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).as("n_chars"),
      tokenCount(t).as("n_tokens"),
      distinctTokenCount(t).as("n_distinct"),
      round(distinctTokenCount(t).cast("double") / tokenCount(t), 4).as("lex_diversity"),
      (length(t) - length(regexp_replace(t, "[^a-zA-Z0-9 ]", ""))).as("n_punct"),
      (length(t) - length(regexp_replace(t, "[0-9]", ""))).as("n_digits"))
  }

  /** Encoding-damage signals — the standard corpus gate against mojibake
    * (bytes decoded under the wrong charset) and lossy transcoding:
    * `n_replacement` counts U+FFFD (a decoder already gave up),
    * `n_c1` counts C1 controls U+0080–U+009F (legal ASCII/UTF-8 never
    * produces them; classic latin-1-read-as-cp1252 damage),
    * `n_mojibake_marks` counts the Ã/Â/â UTF-8-read-as-latin-1 markers.
    * All are codegen'd length-difference expressions — map-only, no UDFs;
    * `damage_ratio` is their sum over the char length. Filter on it the
    * way length/stopword gates compose with [[qualityFeatures]]. */
  def encodingQuality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def countOf(pattern: String) =
      length(t) - length(regexp_replace(t, pattern, ""))
    val repl = countOf("\uFFFD")
    val c1 = countOf("[\u0080-\u009F]")
    val moji = countOf("[\u00C3\u00C2\u00E2]")
    df.select(
      col(idCol),
      length(t).as("n_chars"),
      repl.as("n_replacement"),
      c1.as("n_c1"),
      moji.as("n_mojibake_marks"),
      when(length(t) > 0,
        round((repl + c1 + moji).cast("double") / length(t), 6))
        .otherwise(lit(0.0)).as("damage_ratio"))
  }

  /** Stopword-hit language scores. The lists are tiny n-gram-style anchors —
    * the heuristic part of a real lang-ID pass; the Spark shape (explode →
    * semi-count per language) is the part that matters at scale. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "los", "y", "es", "las"))

  /** Predict language by maximum stopword hits (ties broken by language code
    * order); emits per-language scores too. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val scored = stopwords.toSeq.sortBy(_._1).foldLeft(df.select(col(idCol), toks.as("toks"))) {
      case (acc, (lang, words)) =>
        acc.withColumn(s"score_$lang",
          size(filter(col("toks"), t => t.isin(words.map(lit): _*))))
    }
    val langs = stopwords.keys.toSeq.sorted
    val best = langs.map(l => struct(col(s"score_$l").as("s"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    scored.withColumn("pred_lang",
        when(greatest(langs.map(l => col(s"score_$l")): _*) === 0, lit("und"))
          .otherwise(best.getField("l")))
      .select(col(idCol) +: langs.map(l => col(s"score_$l")) :+ col("pred_lang"): _*)
  }

  /** Per-domain corpus profile for web-crawl curation: the host extracted
    * with one codegen'd regexp, then document and token mass per domain —
    * the aggregation that drives domain-level allow/block lists and
    * per-source mixing ratios. One shuffle on the (low-cardinality) domain
    * key with map-side partial aggregation. */
  def domainStats(df: DataFrame, urlCol: String, textCol: String): DataFrame =
    df.select(regexp_extract(col(urlCol), "https?://([^/]+)", 1).as("domain"),
        tokenCount(col(textCol)).as("n"))
      .groupBy("domain")
      .agg(count(lit(1)).as("docs"), sum(col("n")).cast("long").as("tokens"))

  /** Exact interpolated length percentiles per shard — the cut points for
    * length-based quality filtering (Gopher-style doc-length rules need the
    * corpus' own distribution, not fixed thresholds). Exact `percentile`
    * sorts within each shard group only; for corpus-scale sketches switch
    * to `percentile_approx`, which is mergeable and single-pass. */
  def lengthPercentiles(df: DataFrame, shardCol: String, textCol: String,
      ps: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    val aggs = ps.map(p =>
      round(expr(s"percentile(n, $p)"), 4).as(s"p${(p * 100).toInt}")) :+
      count(lit(1)).as("docs")
    df.select(col(shardCol), tokenCount(col(textCol)).as("n"))
      .groupBy(shardCol)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Rolling-hash style document fingerprint: md5 prefix of the
    * whitespace-normalized lowercased text — byte-identical across engines. */
  def fingerprint(text: Column, hexChars: Int = 16): Column =
    substring(md5(lower(regexp_replace(text, "\\s+", " "))), 1, hexChars)

  /** Repetition signals (the CCNet/Gopher-rules style filters): duplicate-
    * token ratio and the most-frequent token's share of the document. One
    * explode + two aggregations — shuffles carry (id, token) only. */
  def repetitionFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum(col("c")).as("tokens"),
        round(lit(1.0) - count(lit(1)).cast("double") / sum(col("c")), 6).as("dup_token_ratio"),
        round(max(col("c")).cast("double") / sum(col("c")), 6).as("top_token_share"))

  /** Corpus vocabulary profile: the top-k tokens by total term frequency
    * (ties → token ascending), each with its document frequency — the
    * vocab-coverage / tokenizer-fit check run before training. One explode
    * feeding one aggregation (map-side partials mean the shuffle carries
    * per-partition (token, count) rows, never raw text) and a physical
    * top-k; df = COUNT(DISTINCT doc) adds the standard two-phase distinct
    * aggregation on the same token partitioning, no extra wide stage. */
  def vocabProfile(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("_vdoc"), explode(split(col(textCol), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("_vdoc")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(k)

  /** PII patterns, RE2-safe (no lookaround/backreferences) so RE2-based
    * engines — including the DuckDB oracle — apply identical semantics. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[^ ]+"
  val phoneRe = "\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII scrubbing for corpus release: emails, URLs and phone-shaped digit
    * runs replaced with typed placeholder tokens, with per-document match
    * counts for the audit trail. Counts run over the ORIGINAL text
    * independently per pattern, so an email embedded in a URL counts under
    * BOTH n_urls and n_emails; only the redacted output applies URL-first
    * precedence (the URL replacement consumes the email before the email
    * pattern runs). The oracle mirrors both behaviors. Single pass of
    * codegen'd regexp expressions — no UDFs, scales as a mapper. */
  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, urlRe, "<URL>"),
          emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>")
    df.select(col(idCol),
      size(regexp_extract_all(t, lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(urlRe), lit(0))).as("n_urls"),
      size(regexp_extract_all(t, lit(phoneRe), lit(0))).as("n_phones"),
      redacted.as("redacted"))
  }

  /** Greedy contiguous sequence packing for training batches: within each
    * shard, documents are laid out in id order and assigned
    * bin = ⌊exclusive-running-token-sum / budget⌋ — the streaming next-fit
    * packing a single writer would produce, expressed as one window sum.
    * Packing is inherently sequential, so the scale unit is the SHARD (one
    * window partition ≈ one output file's worth of data), never a global
    * order — a global `Window.orderBy` would funnel the corpus through one
    * task. */
  def packBins(df: DataFrame, shardCol: String, idCol: String, textCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive ($budget)")
    val w = Window.partitionBy(shardCol).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("doc_tokens", tokenCount(col(textCol)))
      .withColumn("bin",
        floor(coalesce(sum(col("doc_tokens")).over(w), lit(0L)) / lit(budget.toDouble))
          .cast("int"))
  }

  /** Cross-corpus segment dedup (the CCNet paragraph-hash recipe, cf.
    * Wenzek et al. 2020 — boilerplate/header removal at corpus scale):
    * documents split into non-overlapping `window`-token segments
    * ([[chunkTokens]] with overlap 0); a segment occurrence survives iff it
    * is the corpus-FIRST occurrence of that exact segment text, ordered by
    * (doc id, segment index) — repeats inside one doc dedup too. Returns one
    * row per input doc: total/kept segment counts and `clean_text`, the kept
    * segments rejoined in order ('' when everything was boilerplate).
    *
    * Scale shape: winner election groups on md5(segment) — the shuffle
    * carries (32-hex key, id, index) rows, and min(struct(id, idx)) combines
    * map-side, so the reduce side sees one candidate per key per partition.
    * The re-join back to occurrences is the same key (one exchange reused),
    * and reassembly shuffles each doc's KEPT segments once. No driver
    * materialization anywhere; every stage is linear in corpus tokens. */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8): DataFrame =
    dedupSegments(df, idCol, textCol, window, seen = None)._1

  /** The shared winner election + reassembly behind [[paragraphDedup]] and
    * the streaming loop ([[applySegmentIngestBatch]]): segment, elect the
    * corpus-first occurrence per key, optionally drop keys an earlier
    * batch already owns (`seen`: a frame with a `key` column), reassemble
    * per doc. Returns (per-doc output, surviving winner keys) — ONE
    * definition of the semantics, so batch and stream cannot diverge. */
  private def dedupSegments(df: DataFrame, idCol: String, textCol: String,
      window: Int, seen: Option[DataFrame]): (DataFrame, DataFrame) = {
    val segs = chunkTokens(df, idCol, textCol, size = window, overlap = 0)
      .select(col(idCol), col("chunk_id"), col("chunk"), md5(col("chunk")).as("key"))
    val first = segs.groupBy("key")
      .agg(min(struct(col(idCol), col("chunk_id"))).as("_first"))
    val winnersAll = segs.join(first, "key")
      .where(struct(col(idCol), col("chunk_id")) === col("_first"))
    val winners = seen.fold(winnersAll)(s =>
      winnersAll.join(s.select("key"), Seq("key"), "left_anti"))
    val perDoc = segs.groupBy(idCol).agg(count(lit(1)).as("total_segments"))
    val keptAgg = winners.groupBy(idCol).agg(
      count(lit(1)).as("kept"),
      concat_ws(" ",
        transform(array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
          s => s.getField("chunk"))).as("ct"))
    val out = perDoc.join(keptAgg, Seq(idCol), "left")
      .select(col(idCol), col("total_segments"),
        coalesce(col("kept"), lit(0L)).as("kept_segments"),
        coalesce(col("ct"), lit("")).as("clean_text"))
    (out, winners.select("key"))
  }

  /** Unigram-LM surprisal (the CCNet quality-filter signal, self-trained):
    * p(tok) = tf / total over the WHOLE corpus, and each doc scores
    * avg_neg_logp = Σ n·(−ln p) / Σ n over its token occurrences (natural
    * log, 4 dp) — low = in-distribution prose, high = outlier/garbage; the
    * standard perplexity-bucket split runs on this column. Self-training on
    * the scored corpus itself is one option; to score against a reference
    * corpus (the original CCNet setup) pass it as `model`.
    *
    * Scale shape: the model is ONE token-keyed aggregation (map-side
    * partials: the shuffle carries per-partition (token, count), never
    * occurrences); scoring joins per-doc token counts to it on the same
    * token key, then re-aggregates by doc. The corpus total rides a
    * broadcast single-row cross join. The model stays distributed
    * end-to-end — a 100 TB corpus' whitespace vocabulary never fits a
    * driver or a broadcast, and never needs to. */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String,
      model: Option[DataFrame] = None): DataFrame = model match {
    case Some(source) =>
      val mToks = source.select(explode(split(col(textCol), " ")).as("tok"))
      unigramLogProbFromCounts(df, idCol, textCol,
        mToks.groupBy("tok").agg(count(lit(1)).as("tf")),
        mToks.select(count(lit(1)).cast("double").as("_total")))
    case None =>
      // SELF-TRAINED: kept as INDEPENDENT raw-token passes on purpose.
      // r16 opt tried both "fewer passes" restructures and both measured
      // SLOWER at sf0.1: (a) deriving the model from the per-doc counts —
      // 1.3–1.5× (per-doc token counts barely compress, so the rollup
      // re-reads a near-raw exchange instead of map-side-partialling raw
      // tokens into a tiny shuffle); (b) deriving the corpus total from
      // the model counts — still ~1.25× (the broadcast total then DEPENDS
      // on the model exchange, serializing scans that previously ran as
      // independent parallel jobs). Guide §1.1's "ideal plan has a gotcha"
      // loop, documented so the next round doesn't re-try it.
      val mToks = df.select(explode(split(col(textCol), " ")).as("tok"))
      unigramLogProbFromCounts(df, idCol, textCol,
        mToks.groupBy("tok").agg(count(lit(1)).as("tf")),
        mToks.select(count(lit(1)).cast("double").as("_total")))
  }

  private def docTokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("n"))

  private def scoreAgainstModel(docTok: DataFrame, idCol: String,
      counts: DataFrame, total: DataFrame): DataFrame =
    // left join: a token unseen by the model (reference-corpus setup) floors
    // at tf=1 — the add-one estimate, maximal surprisal without a log(0)
    docTok.join(counts, Seq("tok"), "left").crossJoin(broadcast(total))
      .groupBy(idCol).agg(
        sum(col("n")).cast("long").as("tokens"),
        round(sum(col("n") * -log(coalesce(col("tf"), lit(1L))
            / greatest(col("_total"), lit(1.0))))
          / sum(col("n")), 4).as("avg_neg_logp"))

  /** [[unigramLogProb]] scoring against a PRE-AGGREGATED model: `counts` is
    * (tok, tf), `total` a single-row `_total` — the form a maintained model
    * store serves. An EMPTY model is well-defined (total floors at 1, every
    * token floors at tf=1 → score 0): the prequential batch-0 case. */
  def unigramLogProbFromCounts(df: DataFrame, idCol: String, textCol: String,
      counts: DataFrame, total: DataFrame): DataFrame =
    scoreAgainstModel(docTokenCounts(df, idCol, textCol), idCol, counts, total)

  /** Per-document BIGRAM surprisal — [[unigramLogProb]]'s order-2 upgrade
    * (context-aware perplexity, the stronger CCNet-style quality signal):
    * avg −log P(w₂|w₁) over the doc's bigrams under Laplace smoothing,
    * P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V). The model self-trains on `df` or
    * scores against a reference corpus (`model`); unseen bigrams fall to
    * 1/(c(w₁·)+V), unseen contexts to 1/V — never log 0. Fully
    * distributed: bigram and context counts are token-keyed aggregations,
    * doc scoring is two hash joins on those keys; only the 1-row vocabulary
    * size broadcasts. Docs under 2 tokens have no bigrams and no row. */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
      model: Option[DataFrame] = None): DataFrame = {
    def bigramsOf(src: DataFrame) = {
      val t = split(col(textCol), " ")
      src.select(col(idCol), t.as("_t"))
        .filter(org.apache.spark.sql.functions.size(col("_t")) >= 2)
        .select(col(idCol), explode(transform(
          sequence(lit(1), org.apache.spark.sql.functions.size(col("_t")) - 1),
          i => struct(element_at(col("_t"), i).as("w1"),
            element_at(col("_t"), i + 1).as("w2")))).as("bg"))
        .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    }
    val source = model.getOrElse(df)
    // NOT restructured to derive the model from the per-doc counts: tried
    // r16 opt, measured 1.57× SLOWER at sf0.1 — per-doc bigram counts
    // barely compress, so routing the model rollup through them replaces a
    // map-side-partial raw aggregation (tiny shuffle) with a second read
    // of the fat (id, w1, w2) exchange. Direct aggregation stands.
    val mBig = bigramsOf(source).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // context totals derive from the bigram counts (no third corpus pass)
    val ctx = mBig.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = source.select(explode(split(col(textCol), " ")).as("tok"))
      .agg(countDistinct("tok").cast("double").as("_v"))
    val docBg = bigramsOf(df).groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
    docBg.join(mBig, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(idCol).agg(
        sum(col("n")).cast("long").as("bigrams"),
        round(sum(col("n") * -log((coalesce(col("c12"), lit(0L)) + 1.0)
            / (coalesce(col("c1"), lit(0L)) + col("_v"))))
          / sum(col("n")), 4).as("avg_neg_logp"))
  }

  /** Adjacent symbol-pair counts over the corpus — the BPE trainer's inner
    * loop (Sennrich et al. 2016, public), exposed standalone: every
    * whitespace word becomes its character-symbol sequence plus an
    * end-of-word marker, and adjacent pairs count corpus-wide. Shuffles
    * carry (pair, count) only; the word explode is map-side. */
  def bpePairCounts(df: DataFrame, textCol: String,
      eow: String = "</w>"): DataFrame = {
    df.select(explode(split(col(textCol), " ")).as("_w"))
      .filter(length(col("_w")) > 0) // run-of-spaces artifacts carry no pair
      .select(concat(split(col("_w"), ""), array(lit(eow))).as("_s"))
      .filter(org.apache.spark.sql.functions.size(col("_s")) >= 2)
      .select(explode(transform(
        sequence(lit(1), org.apache.spark.sql.functions.size(col("_s")) - 1),
        i => struct(element_at(col("_s"), i).as("left"),
          element_at(col("_s"), i + 1).as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(count(lit(1)).as("n"))
  }

  /** Distributed BPE merge training: `nMerges` rounds of count-all-pairs →
    * merge the most frequent (ties → lexicographic (left, right)), exactly
    * the Sennrich recipe. The corpus collapses ONCE to its word-frequency
    * vocabulary (the standard trick — pair counts weight by word freq, so
    * iterations run over |vocab| rows, not |corpus|); each round is one
    * distributed aggregation plus a map-only merge pass over the symbol
    * arrays. Returns the merge list in training order.
    *
    * One-merge-per-round — exact but O(nMerges) Spark jobs; at realistic
    * vocab sizes (1k+ merges) the per-round scheduling floor dominates,
    * so the scale path is [[trainBpeMergesBatched]] (this method IS the
    * batchSize = 1 case of it — one code path, equality by construction,
    * pinned by TextAnalysisSpec). */
  def trainBpeMerges(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      textCol: String, nMerges: Int, eow: String = "</w>"): Seq[(String, String)] =
    trainBpeMergesBatched(spark, df, textCol, nMerges, batchSize = 1, eow)

  /** BPE merge training with BATCHED rounds — the 1000-merge scale path:
    * each round counts pairs ONCE, then commits up to `batchSize` merges
    * from that one count, chosen greedily in (count desc, left, right)
    * order subject to SYMBOL-DISJOINTNESS — no selected pair shares a
    * symbol with an earlier selection, so at any position at most one
    * selected pair can match and the single left-to-right application
    * pass is order-independent. Standard fast-BPE round batching: rounds
    * (= Spark jobs = the driver-side scheduling floor) shrink by up to
    * batchSize× while the counts each merge was chosen on are at most one
    * batch stale — batchSize = 1 is EXACT Sennrich (each merge sees fully
    * updated counts) and the default for the oracle-facing trainer.
    * Within a batch, rank order is the selection order, so the merge list
    * feeds [[bpeEncodeStats]] unchanged. */
  def trainBpeMergesBatched(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, textCol: String, nMerges: Int, batchSize: Int,
      eow: String = "</w>"): Seq[(String, String)] = {
    import spark.implicits._
    require(nMerges >= 1, "need nMerges >= 1")
    require(batchSize >= 1, "need batchSize >= 1")
    val vocab0 = df.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat(split(col("w"), ""), array(lit(eow))).as("syms"), col("freq"))
      .as[(Seq[String], Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // SCALE-ADAPTIVE round partitioning (r16 opt, guide §1.2/§2.6): the
    // trainer's cost is O(rounds × scheduling floor) once the corpus has
    // collapsed to its word vocabulary — at bench scale the vocab is a few
    // tens of thousands of rows, and every round previously paid 2-3 stages
    // × 32 near-empty tasks (measured: t26 warm = ~44 stages, none over
    // 160 ms of work). Size the per-round parallelism from the MATERIALIZED
    // vocab row count (~64k symbol rows per task), never below 1, never
    // above the session default — a 100 TB corpus vocabulary still fans out.
    val nVocab = vocab0.count()
    val roundParallelism = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, nVocab / 65536L + 1L)).toInt
    var vocab = vocab0.coalesce(roundParallelism)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    try {
      var dry = false
      var rounds = 0
      while (merges.size < nMerges && !dry) {
        val want = math.min(batchSize, nMerges - merges.size)
        // 4× headroom: disjointness conflicts skip candidates, and the
        // take() is a driver-side list of short strings — tiny either way.
        // Pair counting is a whole-stage-codegen DataFrame aggregation
        // (explode over adjacent struct pairs + sum(freq)) instead of the
        // old groupByKey/reduceGroups Dataset shape: no tuple encoders on
        // the shuffle, and the explicit repartition by the group key at
        // roundParallelism is reused by the aggregate (ENSURE_REQUIREMENTS
        // satisfied), so the reduce side stops running 32 near-empty tasks
        // per round (guide §2.3 narrow rows, §2.4 shared exchange).
        val top = vocab.toDF("syms", "freq")
          // fully-merged single-symbol words carry no pair — and sequence()
          // with start > stop infers step -1, so the guard is load-bearing
          .filter(org.apache.spark.sql.functions.size(col("syms")) >= 2)
          .select(explode(expr(
            """transform(sequence(1, size(syms) - 1),
              |  i -> struct(element_at(syms, i) AS l,
              |              element_at(syms, i + 1) AS r))""".stripMargin)).as("p"),
            col("freq"))
          .repartition(roundParallelism, col("p.l"), col("p.r"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("n"))
          // most frequent wins; ties break lexicographically for
          // reproducible merge tables across runs and partitionings
          .orderBy(col("n").desc, col("l"), col("r"))
          .select(col("n"), col("l"), col("r"))
          .take(want * 4)
          .map(row => (row.getLong(0), row.getString(1), row.getString(2)))
        val used = scala.collection.mutable.Set.empty[String]
        val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        for ((_, l, r) <- top if picked.size < want)
          if (!used(l) && !used(r)) { picked += ((l, r)); used += l; used += r }
        if (picked.isEmpty) dry = true
        else {
          merges ++= picked
          val sel = picked.map { case (l, r) => (l, r) -> (l + r) }.toMap
          val next = vocab.map { case (syms, freq) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              val m = if (i + 1 < syms.length) sel.get((syms(i), syms(i + 1)))
                else None
              m match {
                case Some(merged) => out += merged; i += 2 // left-to-right, non-overlapping
                case None => out += syms(i); i += 1
              }
            }
            (out.toSeq, freq)
          }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count() // materialize before dropping the parent
          vocab.unpersist(false)
          vocab = next
          rounds += 1
          // caching materializes DATA but never truncates LINEAGE: each
          // round's RDD DAG nests the previous round's, and at ~200 rounds
          // task serialization overflows the stack (measured — the r12
          // 200-merge probe crashed exactly there). Cut the chain every 8
          // committed rounds; localCheckpoint keeps partitions on
          // executors (no checkpoint dir), the right trade for a trainer
          // that re-runs cheaply on executor loss.
          if (rounds % 8 == 0) {
            val ck = vocab.localCheckpoint(true)
            vocab.unpersist(false)
            vocab = ck
          }
        }
      }
      merges.toSeq
    } finally {
      // vocab0's cache backs round 1's coalesced view (coalesce is a plan
      // transform, so unpersisting the view would be a CacheManager no-op);
      // release the root explicitly alongside the last round's cache
      vocab0.unpersist(false)
      vocab.unpersist(false)
    }
  }

  /** Greedy BPE segmentation of ONE word under a trained merge table:
    * repeatedly merge the adjacent pair with the LOWEST training rank
    * (leftmost on rank ties) until no pair is in the table — equivalent to
    * replaying the merges in training order (each left-to-right,
    * non-overlapping, exactly the trainer's own merge pass), which
    * TextAnalysisSpec pins on randomized corpora against a naive
    * sequential-replay evaluator. Driver/executor-shared core. */
  private[ops] def bpeEncodeWord(word: String,
      ranks: scala.collection.Map[(String, String), Int],
      eow: String): Seq[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    var ci = 0
    while (ci < word.length) { syms += word.substring(ci, ci + 1); ci += 1 }
    syms += eow
    var done = syms.length < 2
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; best = i } // strict < ⇒ leftmost tie
        i += 1
      }
      if (best < 0) done = true
      else {
        syms(best) = syms(best) + syms(best + 1)
        syms.remove(best + 1)
        if (syms.length < 2) done = true
      }
    }
    syms.toSeq
  }

  /** Apply a trained BPE merge table to the corpus — the tokenizer-
    * application half of [[trainBpeMerges]]: per-doc word count, BPE token
    * count, and fertility (tokens/word, the standard tokenizer-fit metric a
    * mixing decision reads per language/source). The merge table broadcasts
    * (vocab-sized, small by contract — it IS the tokenizer); documents
    * never shuffle: the encode is map-only over (id, text) and only the
    * 3-counter rows move. Per-row imperative merging is the documented
    * mapPartitions exception (a rank-greedy loop has no relational form);
    * everything around it stays in the declarative plan. */
  def bpeEncodeStats(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      idCol: String, textCol: String, merges: Seq[(String, String)],
      eow: String = "</w>", roundTo: Int = 4): DataFrame = {
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    val stats = df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rk = ranks.value
        it.map { case (id, text) =>
          var words = 0L
          var toks = 0L
          val ws = if (text == null) Array.empty[String] else text.split(" ")
          var i = 0
          while (i < ws.length) {
            if (ws(i).nonEmpty) {
              words += 1
              toks += bpeEncodeWord(ws(i), rk, eow).length.toLong
            }
            i += 1
          }
          (id, words, toks)
        }
      }
    stats.toDF(idCol, "words", "bpe_tokens")
      .withColumn("fertility",
        when(col("words") > 0,
          round(col("bpe_tokens").cast("double") / col("words"), roundTo)))
  }

  /** Top-k TF-IDF keywords per document — the classic keyword-extraction /
    * topic-tagging signal: tfidf(t,d) = tf(t,d) · ln(N / df(t)). Document
    * frequencies derive from the per-doc term counts (no second corpus
    * pass); only the 1-row corpus size broadcasts; the per-doc top-k is a
    * window over (doc, score) — rank on the ROUNDED score with a term
    * tie-break, so the cut is reproducible across engines. Returns
    * (idCol, term, rk, tfidf), k rows per doc (fewer for short docs). */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int, roundTo: Int = 6): DataFrame = {
    require(k >= 1, "need k >= 1")
    val tf = df.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).cast("double").as("_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("_n") / col("df")), roundTo))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("rk"), col("tfidf"))
  }

  /** Token-distribution divergence between two corpus slices — the
    * domain-shift signal behind mixing decisions (is the new crawl slice
    * like the corpus I tuned on?) and drift monitoring between ingest
    * batches. Unigram distributions with add-one smoothing over the UNION
    * vocabulary (so both are proper distributions on the same support and
    * every log is finite): p_a(t) = (c_a(t)+1)/(N_a+V). Returns one row:
    * token totals, union vocab size, KL(a‖b), KL(b‖a), and the symmetric
    * bounded Jensen–Shannon divergence. Shuffles carry (token, side)
    * counts only; the two totals rows broadcast — corpus text is read
    * once and never moves. */
  def tokenDivergence(df: DataFrame, textCol: String, sliceA: Column,
      roundTo: Int = 4): DataFrame = {
    val toks = df.select(sliceA.as("_a"), explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val counts = toks.groupBy("tok").agg(
      sum(when(col("_a"), 1L).otherwise(0L)).as("ca"),
      sum(when(col("_a"), 0L).otherwise(1L)).as("cb"))
    val totals = counts.agg(
      sum("ca").as("_na"), sum("cb").as("_nb"),
      count(lit(1)).cast("double").as("_v"))
    val pa = (col("ca") + 1.0) / (col("_na") + col("_v"))
    val pb = (col("cb") + 1.0) / (col("_nb") + col("_v"))
    val m = (pa + pb) / 2.0
    counts.crossJoin(broadcast(totals)).agg(
      sum("ca").cast("long").as("n_tokens_a"),
      sum("cb").cast("long").as("n_tokens_b"),
      count(lit(1)).cast("long").as("vocab"),
      round(sum(pa * log(pa / pb)), roundTo).as("kl_ab"),
      round(sum(pb * log(pb / pa)), roundTo).as("kl_ba"),
      round(sum(pa * log(pa / m)) / 2 + sum(pb * log(pb / m)) / 2, roundTo)
        .as("js_div"))
  }

  /** HTML → text extraction (the CommonCrawl-style first step): script and
    * style blocks removed whole, remaining tags become spaces, the five
    * core entities decode, whitespace collapses. Pure codegen'd regexp
    * chain — map-only, RE2-safe patterns (non-greedy + inline (?s), no
    * lookaround), so RE2-based engines apply identical semantics. Tag
    * stripping, not boilerplate removal — chrome text survives; compose
    * with [[paragraphDedup]] for boilerplate. */
  def htmlToText(html: Column): Column = {
    // (?i): tag names are case-insensitive in HTML; comments drop BEFORE
    // the tag pass so a '>' inside a comment can't split it into debris.
    // The tag pattern requires a tag-like start ([A-Za-z/!]) so unescaped
    // comparisons in prose ('5 < 6') survive — a regex extractor's
    // documented approximation of a real parser, not a full one.
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(html, "(?s)<!--.*?-->", " "),
        "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "</?[A-Za-z!][^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"), "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The document title, when an HTML `<title>` is present ('' otherwise). */
  def htmlTitle(html: Column): Column =
    regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)

  /** URL canonicalization for URL-keyed dedup/grouping: lowercase scheme +
    * authority (path/query case is significant and kept), strip default
    * ports (:80 http, :443 https), drop the fragment, remove `utm_*` and
    * `ref=` tracking params, clean the dangling separator. A documented
    * SUBSET of full RFC 3986 normalization (no percent-decoding or path
    * dot-segment removal) — the rules that collapse the big equivalence
    * classes crawl data actually contains. Map-only regexp chain, mirrored
    * byte-for-byte by the oracle (both engines scan left-to-right,
    * non-overlapping, continuing after each match). */
  def canonicalizeUrl(url: Column): Column = {
    val authority = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    val lowered = concat(
      lower(regexp_extract(url, authority, 0)),
      regexp_replace(url, authority, ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:?#]+):443(/|\\?|#|$)", "$1$2"),
      "^(http://[^/:?#]+):80(/|\\?|#|$)", "$1$2")
    val noFrag = regexp_replace(noPort, "#.*$", "")
    // trackers must start a parameter: the [?&] boundary keeps 'ref=' from
    // matching inside 'href=' or in the path (RE2 has no lookbehind, so the
    // delimiter re-emits and the cleanup passes collapse '?&'/'&&' runs
    // left by consecutive trackers)
    val noTrack = regexp_replace(noFrag, "([?&])(utm_[^&#]*|ref=[^&#]*)", "$1")
    regexp_replace(regexp_replace(regexp_replace(noTrack,
      "&&+", "&"), "\\?&", "?"), "[?&]$", "")
  }

  // ------------------------------------------- keyed ingest-store plumbing

  /** All dot-suffixes of a URL's host, lowercased, port stripped:
    * `https://A.B.example.COM:8080/x` → [a.b.example.com, b.example.com,
    * example.com, com]. The suffix set is what makes blocklist matching an
    * EQUALITY join ([[blockByDomain]]) instead of a per-row LIKE scan over
    * the whole list. */
  def domainSuffixes(url: Column): Column = {
    // authority → host: drop userinfo ('user@' — the classic blocklist
    // bypass), then the port, then trailing dots (FQDN-form hosts)
    val host = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_extract(lower(url), "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1),
          "^[^/?#]*@", ""),
        ":[0-9]+$", ""),
      "\\.+$", "")
    val labels = split(host, "\\.")
    filter(
      transform(sequence(lit(1), org.apache.spark.sql.functions.size(labels)),
        i => array_join(slice(labels, i, org.apache.spark.sql.functions.size(labels)), ".")),
      s => length(s) > 0)
  }

  /** Domain blocklist filter: drop every row whose URL host IS a blocked
    * domain or any SUBDOMAIN of one — the standard corpus-hygiene gate
    * (spam/adult/malware domain lists run to millions of entries). Rows
    * explode into their ≤ label-count host suffixes and hash-join the
    * blocklist on EQUALITY, so cost is linear in corpus + blocklist and the
    * blocklist is broadcast when small — never the per-row
    * `host LIKE '%.domain'` scan over the list that a naive filter does.
    * `blocked` carries one lowercase `domain` column; survivors return
    * with their original schema. */
  def blockByDomain(df: DataFrame, idCol: String, urlCol: String,
      blocked: DataFrame): DataFrame = {
    val hit = df.select(col(idCol), explode(domainSuffixes(col(urlCol))).as("_suf"))
      .join(blocked.select(lower(col("domain")).as("_suf")), Seq("_suf"), "left_semi")
      .select(idCol)
    df.join(hit, Seq(idCol), "left_anti")
  }

  private def segTable(name: String) = s"${name}_segs"

  /** Shared create/reset plumbing for the single-table ingest stores
    * (segment keys, model counts): one bucketed table, created over its
    * canonical LOCATION so a surviving directory re-registers after a
    * catalog loss — restart-safe the same way the vector index
    * re-registers. Returns true iff newly created. */
  private def ensureKeyedStore(spark: org.apache.spark.sql.SparkSession,
      name: String, table: String, ddl: String, bucketCol: String,
      buckets: Int): Boolean = {
    import graft.engine.WarehouseMeta
    WarehouseMeta.withBuildLock(spark, name) {
      if (spark.catalog.tableExists(table)) false
      else {
        spark.sql(
          s"""CREATE TABLE $table ($ddl) USING PARQUET
             |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO $buckets BUCKETS
             |LOCATION '${WarehouseMeta.tableLocation(spark, table).toUri}'""".stripMargin)
        true
      }
    }
  }

  /** Shared rebuild-empty plumbing — a NEW corpus state: drops the table
    * and its files AND clears the ingest commit log (the
    * writeSignatureStore rule: streaming batch ids restart with their
    * checkpoint, so stale commits from a previous corpus must not suppress
    * a new stream's appends). */
  private def resetKeyedStore(spark: org.apache.spark.sql.SparkSession,
      name: String, table: String): Unit = {
    import graft.engine.WarehouseMeta
    WarehouseMeta.withBuildLock(spark, name) {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      WarehouseMeta.deleteRecursively(WarehouseMeta.tableLocation(spark, table))
      WarehouseMeta.deleteRecursively(
        WarehouseMeta.tableLocation(spark, s"${name}_ingest_log"))
    }
  }

  /** Shared foreachBatch/AvailableNow wrapper: run `applyBatch` per
    * micro-batch, then refresh the STARTING session's relation cache (the
    * stream's clone shares the catalog but not per-session caches). */
  private def ingestStreamOf(spark: org.apache.spark.sql.SparkSession,
      docsStream: DataFrame, table: String, checkpoint: String)(
      applyBatch: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, id)
        spark.catalog.refreshTable(table)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  // ----------------------------------------------------- segment store

  /** The persisted seen-segment store behind [[applySegmentIngestBatch]]:
    * one bucketed key table, so every batch's anti-join probes
    * bucket-locally without shuffling the store. */
  def ensureSegmentStore(spark: org.apache.spark.sql.SparkSession,
      name: String, buckets: Int = 16): Boolean =
    ensureKeyedStore(spark, name, segTable(name), "key STRING", "key", buckets)

  /** Rebuild the segment store empty (see [[resetKeyedStore]] rationale). */
  def resetSegmentStore(spark: org.apache.spark.sql.SparkSession,
      name: String, buckets: Int = 16): Unit = {
    resetKeyedStore(spark, name, segTable(name))
    ensureSegmentStore(spark, name, buckets)
    ()
  }

  /** One exactly-once boilerplate-removal batch — the streaming counterpart
    * of [[paragraphDedup]] against a PERSISTED seen-segment store: the
    * batch's segments dedup within the batch (corpus-first order) AND
    * against every segment any earlier batch kept, cleaned docs land at
    * `outPath/batch=<id>`, and the new keys append to the store — all under
    * the ingest commit log, so a crash anywhere replays to the identical
    * store (the same [[graft.engine.WarehouseMeta.exactlyOnceBatch]] seam
    * the signature store and vector index use). Feeding batches in
    * ascending doc order reproduces [[paragraphDedup]] over the
    * concatenated corpus row-for-row (EventStreamsSpec pins it through
    * kill/restart + crash rollback). Returns docs landed, -1 on a
    * committed-batch replay (no-op).
    *
    * Scale shape per batch: segments shuffle once for the within-batch
    * winner election, the store probe is a bucket-local anti-join (store
    * never re-shuffles), and the append writes bucket-correct files —
    * store maintenance cost is O(batch), independent of corpus size. */
  def applySegmentIngestBatch(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, batchId: Long, idCol: String, textCol: String,
      name: String, outPath: String, window: Int = 8): Long = {
    import graft.engine.WarehouseMeta
    import org.apache.spark.sql.SaveMode
    val t = segTable(name)
    WarehouseMeta.withBuildLock(spark, name) {
      WarehouseMeta.exactlyOnceBatch(spark, s"${name}_ingest_log", batchId, Seq(t)) {
        val (out, keys) = dedupSegments(batch, idCol, textCol, window,
          seen = Some(spark.table(t)))
        out.write.mode(SaveMode.Overwrite).parquet(s"$outPath/batch=$batchId")
        // append is re-derived from (batch, store) — the store is unchanged
        // under the lock, so the derivation is deterministic vs the landed
        // output; a crash between the two is healed by the intent rollback
        keys.write.mode(SaveMode.Append).insertInto(t)
        spark.read.parquet(s"$outPath/batch=$batchId").count()
      }.getOrElse(-1L)
    }
  }

  /** The segment-dedup loop as a STREAM ([[applySegmentIngestBatch]] under
    * foreachBatch, AvailableNow): restart-safe end to end — the streaming
    * checkpoint replays uncommitted batches with identical ids, the ingest
    * log makes each store append exactly-once. */
  def segmentIngestStream(spark: org.apache.spark.sql.SparkSession,
      docsStream: DataFrame, idCol: String, textCol: String, name: String,
      outPath: String, checkpoint: String, window: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ingestStreamOf(spark, docsStream, segTable(name), checkpoint) { (b, id) =>
      applySegmentIngestBatch(b.sparkSession, b, id, idCol, textCol,
        name, outPath, window)
      ()
    }

  // ----------------------------------------------------- model store

  private def modelTable(name: String) = s"${name}_model"

  /** Create (or re-register) the persisted unigram-model store behind
    * [[applyScoreIngestBatch]]: an APPEND-ONLY bucketed (tok, n) table —
    * each batch appends its own per-token counts and reads aggregate with
    * SUM, so ingest never rewrites history; [[compactModelStore]] folds the
    * log on the operator's schedule. Same restart-survival posture as the
    * segment store. */
  def ensureModelStore(spark: org.apache.spark.sql.SparkSession,
      name: String, buckets: Int = 16): Boolean =
    ensureKeyedStore(spark, name, modelTable(name),
      "tok STRING, n BIGINT", "tok", buckets)

  /** Rebuild the model store empty and clear its ingest log (the same NEW
    * corpus-state rule as [[resetSegmentStore]]). */
  def resetModelStore(spark: org.apache.spark.sql.SparkSession,
      name: String, buckets: Int = 16): Unit = {
    resetKeyedStore(spark, name, modelTable(name))
    ensureModelStore(spark, name, buckets)
    ()
  }

  /** The store's current model as ((tok, tf), 1-row `_total`) — read-time
    * SUM over the append-only count rows, bucket-local. */
  def modelCounts(spark: org.apache.spark.sql.SparkSession,
      name: String): (DataFrame, DataFrame) = {
    val t = spark.table(modelTable(name))
    (t.groupBy("tok").agg(sum(col("n")).as("tf")),
      t.select(coalesce(sum(col("n")), lit(0L)).cast("double").as("_total")))
  }

  /** One PREQUENTIAL scoring batch — the streaming form of the corpus
    * quality-model loop: the batch scores against the model of every PRIOR
    * batch (the honest online evaluation: no batch ever sees its own
    * statistics), scores land at `outPath/batch=<id>`, and ONLY THEN the
    * batch's token counts append to the store — all under the shared
    * ingest commit log, so crash/replay cannot double-count a batch into
    * the model (double-counted tokens would silently skew every later
    * score). Batch 0 scores 0 against the empty model by the documented
    * floor. Returns docs scored, -1 on a committed-batch replay.
    *
    * Scale shape per batch: the model read is a bucket-local SUM (the
    * store shuffles nothing), scoring is the [[unigramLogProbFromCounts]]
    * token-keyed join, and the append writes bucket-correct count rows —
    * O(batch + model vocabulary), never O(corpus text). */
  def applyScoreIngestBatch(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, batchId: Long, idCol: String, textCol: String,
      name: String, outPath: String): Long = {
    import graft.engine.WarehouseMeta
    import org.apache.spark.sql.SaveMode
    val t = modelTable(name)
    WarehouseMeta.withBuildLock(spark, name) {
      WarehouseMeta.exactlyOnceBatch(spark, s"${name}_ingest_log", batchId, Seq(t)) {
        val (counts, total) = modelCounts(spark, name)
        unigramLogProbFromCounts(batch, idCol, textCol, counts, total)
          .write.mode(SaveMode.Overwrite).parquet(s"$outPath/batch=$batchId")
        batch.select(explode(split(col(textCol), " ")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("n"))
          .write.mode(SaveMode.Append).insertInto(t)
        spark.read.parquet(s"$outPath/batch=$batchId").count()
      }.getOrElse(-1L)
    }
  }

  /** The prequential loop as a STREAM ([[applyScoreIngestBatch]] under
    * foreachBatch, AvailableNow) — restart-safe like the segment loop. */
  def scoreIngestStream(spark: org.apache.spark.sql.SparkSession,
      docsStream: DataFrame, idCol: String, textCol: String, name: String,
      outPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ingestStreamOf(spark, docsStream, modelTable(name), checkpoint) { (b, id) =>
      applyScoreIngestBatch(b.sparkSession, b, id, idCol, textCol, name, outPath)
      ()
    }

  /** Fold the append-only count log into one row per token — read-path
    * hygiene after many batches; the swap is crash-recoverable
    * ([[graft.engine.WarehouseMeta.swapRewriteBucketedTable]]) and runs
    * under the same lock as ingest, never concurrently with it. */
  def compactModelStore(spark: org.apache.spark.sql.SparkSession,
      name: String, buckets: Int = 16): Unit = {
    import graft.engine.WarehouseMeta
    val t = modelTable(name)
    WarehouseMeta.withBuildLock(spark, name) {
      WarehouseMeta.rollbackStaleIntents(spark, s"${name}_ingest_log", Seq(t))
      val folded = spark.table(t).groupBy("tok").agg(sum(col("n")).as("n"))
      WarehouseMeta.swapRewriteBucketedTable(spark, t, "tok", buckets,
        "tok STRING, n BIGINT", folded, Map.empty)
    }
  }

  // ----------------------------------------------------- gate audit store

  private def gateTable(name: String) = s"${name}_gateaudit"
  private val gateAuditDdl =
    "batch_id BIGINT, n_in BIGINT, n_pass BIGINT, n_fail_words BIGINT, " +
      "n_fail_mean_len BIGINT, n_fail_alpha BIGINT, n_fail_stopwords BIGINT"

  /** Create (or re-register) the persisted gate-audit store behind
    * [[applyGateIngestBatch]]: one append-only row per ingested batch —
    * inputs, passes, and per-rule reject counts — so the curation audit
    * ("what did the gate drop, and why, over the whole ingest history")
    * reads from a table instead of re-scanning landed batches. Same
    * restart-survival posture as the segment/model stores. */
  def ensureGateStore(spark: org.apache.spark.sql.SparkSession,
      name: String, buckets: Int = 4): Boolean =
    ensureKeyedStore(spark, name, gateTable(name), gateAuditDdl, "batch_id", buckets)

  /** Rebuild the gate store empty and clear its ingest log (the same NEW
    * corpus-state rule as [[resetSegmentStore]]). */
  def resetGateStore(spark: org.apache.spark.sql.SparkSession,
      name: String, buckets: Int = 4): Unit = {
    resetKeyedStore(spark, name, gateTable(name))
    ensureGateStore(spark, name, buckets)
    ()
  }

  /** One exactly-once GATE-ON-ARRIVAL batch — [[gopherRules]] applied the
    * moment documents land: rows passing every rule land (with their full
    * original columns) at `outPath/batch=<id>`, and ONE audit row (inputs,
    * passes, per-rule reject counts) appends to the gate store — both
    * under the shared ingest commit log, so a crash anywhere replays to
    * the identical landed set and an audit history with no doubled or
    * missing batch. Feeding the same corpus through any batch split lands
    * exactly the batch pipeline's `pass_gopher` survivors and audit sums
    * (EventStreamsSpec pins it through kill/restart + crash rollback).
    * Returns docs passed, -1 on a committed-batch replay (no-op).
    *
    * Scale shape per batch: the gate is map-only codegen'd column
    * arithmetic (no shuffle — the rules frame joins back on the id key
    * within the batch only), the audit is one 7-counter aggregate row, and
    * nothing ever probes or re-shuffles prior batches — cost is O(batch),
    * independent of ingest history. */
  def applyGateIngestBatch(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, batchId: Long, idCol: String, textCol: String,
      name: String, outPath: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopwords: Int = 2,
      stopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with")): Long = {
    import graft.engine.WarehouseMeta
    import org.apache.spark.sql.SaveMode
    val t = gateTable(name)
    WarehouseMeta.withBuildLock(spark, name) {
      WarehouseMeta.exactlyOnceBatch(spark, s"${name}_ingest_log", batchId, Seq(t)) {
        val rules = gopherRules(batch, idCol, textCol, minWords, maxWords,
          minMeanWordLen, maxMeanWordLen, minAlphaFrac, minStopwords, stopwords)
        batch.join(rules.filter(col("pass_gopher")).select(col(idCol)), idCol)
          .write.mode(SaveMode.Overwrite).parquet(s"$outPath/batch=$batchId")
        // column order mirrors the DDL: insertInto binds positionally
        rules.agg(
          lit(batchId).as("batch_id"),
          count(lit(1)).as("n_in"),
          sum(when(col("pass_gopher"), 1L).otherwise(0L)).as("n_pass"),
          sum(when(!col("ok_word_count"), 1L).otherwise(0L)).as("n_fail_words"),
          sum(when(!col("ok_mean_word_len"), 1L).otherwise(0L)).as("n_fail_mean_len"),
          sum(when(!col("ok_alpha"), 1L).otherwise(0L)).as("n_fail_alpha"),
          sum(when(!col("ok_stopwords"), 1L).otherwise(0L)).as("n_fail_stopwords"))
          .write.mode(SaveMode.Append).insertInto(t)
        spark.table(t).filter(col("batch_id") === batchId)
          .select(coalesce(sum(col("n_pass")), lit(0L))).collect()(0).getLong(0)
      }.getOrElse(-1L)
    }
  }

  /** The gate-on-arrival loop as a STREAM ([[applyGateIngestBatch]] under
    * foreachBatch, AvailableNow) — restart-safe like the segment loop:
    * the streaming checkpoint replays uncommitted batches with identical
    * ids, the ingest log makes each audit append and landing
    * exactly-once. */
  def gateIngestStream(spark: org.apache.spark.sql.SparkSession,
      docsStream: DataFrame, idCol: String, textCol: String, name: String,
      outPath: String, checkpoint: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopwords: Int = 2,
      stopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    ingestStreamOf(spark, docsStream, gateTable(name), checkpoint) { (b, id) =>
      applyGateIngestBatch(b.sparkSession, b, id, idCol, textCol, name,
        outPath, minWords, maxWords, minMeanWordLen, maxMeanWordLen,
        minAlphaFrac, minStopwords, stopwords)
      ()
    }

  /** The gate store's audit history: one row per committed batch. */
  def readGateAudit(spark: org.apache.spark.sql.SparkSession,
      name: String): DataFrame = spark.table(gateTable(name))

  // ----------------------------------------------------- blocklist store

  private def blockDomainsTable(name: String) = s"${name}_domains"
  private def blockAuditTable(name: String) = s"${name}_blockaudit"

  /** Create (or re-register) the persisted domain-blocklist store behind
    * [[applyBlockIngestBatch]]: the MAINTAINED lowercase `domain` table
    * (takedowns arrive over a deployment's lifetime — the list is state,
    * not a constant) plus the per-batch audit table. Same restart-survival
    * posture as the other keyed stores. */
  def ensureBlocklistStore(spark: org.apache.spark.sql.SparkSession,
      name: String, buckets: Int = 4): Boolean = {
    val a = ensureKeyedStore(spark, name, blockDomainsTable(name),
      "domain STRING", "domain", buckets)
    val b = ensureKeyedStore(spark, name, blockAuditTable(name),
      "batch_id BIGINT, n_in BIGINT, n_blocked BIGINT, n_kept BIGINT",
      "batch_id", buckets)
    a || b
  }

  /** Rebuild both blocklist tables empty and clear the ingest log (the
    * same NEW corpus-state rule as [[resetSegmentStore]]). */
  def resetBlocklistStore(spark: org.apache.spark.sql.SparkSession,
      name: String, buckets: Int = 4): Unit = {
    resetKeyedStore(spark, name, blockDomainsTable(name))
    resetKeyedStore(spark, name, blockAuditTable(name))
    ensureBlocklistStore(spark, name, buckets)
    ()
  }

  /** Append domains to the maintained blocklist (lowercased, deduped
    * against the store) under the table set's build lock, so takedowns
    * serialize against in-flight ingest batches — a batch observes the
    * list before or after a takedown, never a torn half. */
  def addBlockedDomains(spark: org.apache.spark.sql.SparkSession,
      name: String, domains: Seq[String]): Unit = {
    import graft.engine.WarehouseMeta
    import org.apache.spark.sql.SaveMode
    WarehouseMeta.withBuildLock(spark, name) {
      import spark.implicits._
      val t = blockDomainsTable(name)
      val incoming = domains.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
      // dedup vs the store WITHOUT reading and appending the same table in
      // one plan (self-insert hazard): the collected intersection is
      // bounded by the caller's own argument size, never the store's
      val existing = spark.table(t)
        .join(incoming.toDF("domain"), Seq("domain"), "left_semi")
        .collect().map(_.getString(0)).toSet
      val fresh = incoming.filterNot(existing)
      if (fresh.nonEmpty)
        fresh.toDF("domain").write.mode(SaveMode.Append).insertInto(t)
    }
  }

  /** One exactly-once BLOCKLIST-ON-ARRIVAL batch — [[blockByDomain]]
    * against the CURRENT maintained list the moment documents land:
    * survivors (full original columns) land at `outPath/batch=<id>`, one
    * audit row (inputs, blocked, kept) appends to the audit store — both
    * under the shared ingest commit log. Gating is against the list AS OF
    * the batch's apply: a takedown landing later does not rewrite
    * already-committed batches (compose with a retroactive re-scan for
    * that); an UNcommitted crash replays under whatever list holds at
    * replay time, which is the honest semantics — the batch never
    * happened. Returns docs kept, -1 on a committed-batch replay.
    *
    * Scale shape per batch: the corpus never shuffles — suffix explosion
    * is map-side and both the semi-join (blocklist) and anti-join (hit
    * ids) broadcast at sane blocklist sizes (t22's audited plan); the
    * audit is one 4-counter row. O(batch + blocklist), independent of
    * ingest history. */
  def applyBlockIngestBatch(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, batchId: Long, idCol: String, urlCol: String,
      name: String, outPath: String): Long = {
    import graft.engine.WarehouseMeta
    import org.apache.spark.sql.SaveMode
    val t = blockAuditTable(name)
    WarehouseMeta.withBuildLock(spark, name) {
      WarehouseMeta.exactlyOnceBatch(spark, s"${name}_ingest_log", batchId, Seq(t)) {
        val kept = blockByDomain(batch, idCol, urlCol,
          spark.table(blockDomainsTable(name)))
        kept.write.mode(SaveMode.Overwrite).parquet(s"$outPath/batch=$batchId")
        val nIn = batch.count()
        val nKept = spark.read.parquet(s"$outPath/batch=$batchId").count()
        // column order mirrors the DDL: insertInto binds positionally
        spark.range(1).select(
          lit(batchId).as("batch_id"), lit(nIn).as("n_in"),
          lit(nIn - nKept).as("n_blocked"), lit(nKept).as("n_kept"))
          .write.mode(SaveMode.Append).insertInto(t)
        nKept
      }.getOrElse(-1L)
    }
  }

  /** The blocklist loop as a STREAM ([[applyBlockIngestBatch]] under
    * foreachBatch, AvailableNow) — restart-safe like the gate loop. */
  def blockIngestStream(spark: org.apache.spark.sql.SparkSession,
      docsStream: DataFrame, idCol: String, urlCol: String, name: String,
      outPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ingestStreamOf(spark, docsStream, blockAuditTable(name), checkpoint) { (b, id) =>
      applyBlockIngestBatch(b.sparkSession, b, id, idCol, urlCol, name, outPath)
      ()
    }

  /** The blocklist store's audit history: one row per committed batch. */
  def readBlockAudit(spark: org.apache.spark.sql.SparkSession,
      name: String): DataFrame = spark.table(blockAuditTable(name))

  /** RETROACTIVE takedown over committed landings — the other half of the
    * blocklist lifecycle: [[applyBlockIngestBatch]] gates arrivals against
    * the list as of their apply, and this op brings every ALREADY-LANDED
    * batch up to the CURRENT list (the right-to-be-forgotten obligation a
    * takedown actually carries). Runs under the table set's build lock, so
    * it serializes against in-flight ingest and concurrent takedowns.
    *
    * Crash-safe by stage-then-swap, never read-and-overwrite-in-place:
    * affected batches rewrite to a `.retro` staging dir first (Overwrite —
    * idempotent), then swap in via rename through a `.trash` holding dir;
    * [[healRetroSwaps]] runs first on every invocation and repairs any
    * half-swap a crash left (trash present + live dir missing → restore;
    * both present → the swap finished, drop the trash). A re-run after
    * success is a no-op (nothing left to remove).
    *
    * Scale shape: one pass over the landed corpus (a retro-scan is by
    * definition a re-scan) with t22's zero-shuffle gate per batch; only
    * batches that LOST rows rewrite — untouched batch dirs keep their
    * files byte-for-byte. Returns (batch_id, n_before, n_removed,
    * n_after) for every landed batch, removed-first. */
  def retroScanLandings(spark: org.apache.spark.sql.SparkSession,
      name: String, outPath: String, idCol: String, urlCol: String): DataFrame = {
    import graft.engine.WarehouseMeta
    import org.apache.spark.sql.SaveMode
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    WarehouseMeta.withBuildLock(spark, name) {
      val root = Paths.get(outPath)
      healRetroSwaps(root)
      val batches =
        if (!Files.isDirectory(root)) Seq.empty[Long]
        else Files.list(root).iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("batch="))
          .map(_.getFileName.toString.stripPrefix("batch=").toLong)
          .toSeq.sorted
      val blocked = spark.table(blockDomainsTable(name))
      val report = batches.map { bid =>
        val dir = s"$outPath/batch=$bid"
        val before = spark.read.parquet(dir)
        val nBefore = before.count()
        val kept = blockByDomain(before, idCol, urlCol, blocked)
        val nAfter = kept.count()
        if (nAfter < nBefore) {
          val staged = s"$outPath/.retro/batch=$bid"
          kept.write.mode(SaveMode.Overwrite).parquet(staged)
          val live = root.resolve(s"batch=$bid")
          val trash = root.resolve(s".trash-batch=$bid")
          WarehouseMeta.deleteRecursively(trash) // stale from an old run
          Files.move(live, trash, StandardCopyOption.ATOMIC_MOVE)
          Files.move(Paths.get(staged), live, StandardCopyOption.ATOMIC_MOVE)
          WarehouseMeta.deleteRecursively(trash)
        }
        (bid, nBefore, nBefore - nAfter, nAfter)
      }
      WarehouseMeta.deleteRecursively(root.resolve(".retro"))
      import spark.implicits._
      report.toDF("batch_id", "n_before", "n_removed", "n_after")
        .orderBy(col("n_removed").desc, col("batch_id"))
    }
  }

  /** Repair any half-finished [[retroScanLandings]] swap: a `.trash-batch=N`
    * with NO live `batch=N` means the crash hit between the two renames —
    * restore the original (the staged rewrite re-derives on the next scan);
    * trash alongside a live dir means the swap completed — drop the trash. */
  private def healRetroSwaps(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    if (!Files.isDirectory(root)) return
    val trashes = Files.list(root).iterator().asScala
      .filter(_.getFileName.toString.startsWith(".trash-batch=")).toList
    for (t <- trashes) {
      val live = root.resolve(t.getFileName.toString.stripPrefix(".trash-"))
      if (!Files.exists(live))
        Files.move(t, live, StandardCopyOption.ATOMIC_MOVE)
      else
        graft.engine.WarehouseMeta.deleteRecursively(t)
    }
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): each doc's log importance is
    * Σ n·(ln p_target(tok) − ln p_raw(tok)) over its token occurrences —
    * positive = looks more like the target domain than the raw corpus, the
    * signal DSIR resamples on (here with unigram features in place of the
    * paper's hashed n-grams; the shape is identical). Both models use the
    * add-one tf=1 floor for unseen tokens, so log(0) never occurs. Returns
    * (id, tokens, log_ratio·4dp).
    *
    * Scale shape: two token-keyed model aggregations (map-side partials),
    * one left join per model on the same token key, broadcast single-row
    * totals, one doc re-aggregation — all linear; both models stay
    * distributed like [[unigramLogProb]]'s. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      target: DataFrame): DataFrame = {
    // Kept as independent raw-token passes — the "derive totals/models
    // from other aggregates" restructures both measured SLOWER at sf0.1
    // (see unigramLogProb's self-trained note for the two mechanisms).
    def toks(src: DataFrame) =
      src.select(explode(split(col(textCol), " ")).as("tok"))
    val tToks = toks(target)
    val rToks = toks(df)
    val mT = tToks.groupBy("tok").agg(count(lit(1)).as("tft"))
    val mR = rToks.groupBy("tok").agg(count(lit(1)).as("tfr"))
    val totT = tToks.select(count(lit(1)).cast("double").as("_tott"))
    val totR = rToks.select(count(lit(1)).cast("double").as("_totr"))
    val docTok = df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("n"))
    // same empty-model floor as unigramLogProbFromCounts: an empty target
    // (or raw) corpus yields finite, defined ratios instead of Infinity
    docTok.join(mT, Seq("tok"), "left").join(mR, Seq("tok"), "left")
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totR))
      .groupBy(idCol).agg(
        sum(col("n")).cast("long").as("tokens"),
        round(sum(col("n") * (log(coalesce(col("tft"), lit(1L))
            / greatest(col("_tott"), lit(1.0)))
          - log(coalesce(col("tfr"), lit(1L))
            / greatest(col("_totr"), lit(1.0))))), 4).as("log_ratio"))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, appendix A —
    * public): per-document boolean flags plus the composite gate, so a
    * curation pipeline can either filter on `pass_gopher` or audit WHICH
    * rule rejected each document (the flags are the audit). Thresholds are
    * parameters; the paper's web-text defaults (50–100k words, mean word
    * length 3–10, ≥80% alphabetic words, ≥2 stop words) are the defaults
    * here, and the driver entry fixture-scales them so every flag actually
    * varies on the test corpus. One tokenization feeds every rule; all
    * rules are codegen'd higher-order column expressions — map-only, no
    * shuffle, no UDFs, so the gate composes into any scan. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopwords: Int = 2,
      stopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with")): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords, "bad word-count bounds")
    val toks = split(col(textCol), " ")
    val nWords = org.apache.spark.sql.functions.size(toks)
    val meanLen = aggregate(toks, lit(0L), (acc, x) => acc + length(x))
      .cast("double") / nWords
    val alphaFrac = org.apache.spark.sql.functions
      .size(filter(toks, x => x.rlike("^[A-Za-z]+$"))).cast("double") / nWords
    val nStop = org.apache.spark.sql.functions
      .size(filter(toks, x => x.isin(stopwords: _*)))
    val okWords = nWords >= minWords && nWords <= maxWords
    val okMean = meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen
    val okAlpha = alphaFrac >= minAlphaFrac
    val okStop = nStop >= minStopwords
    df.select(col(idCol),
      nWords.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(alphaFrac, 4).as("alpha_frac"),
      nStop.as("n_stopwords"),
      okWords.as("ok_word_count"),
      okMean.as("ok_mean_word_len"),
      okAlpha.as("ok_alpha"),
      okStop.as("ok_stopwords"),
      (okWords && okMean && okAlpha && okStop).as("pass_gopher"))
  }

  /** Compression-ratio quality signal (the RefinedWeb/Gopher-family
    * "too compressible = boilerplate, too incompressible = noise" gate):
    * DEFLATE each document's UTF-8 bytes and report the compressed/raw
    * ratio. Runs in mapPartitions with ONE Deflater per partition (reset
    * between rows — allocation, not compression, dominates small docs),
    * so the operator is map-only and shuffles nothing; downstream gates
    * filter on the ratio column. Deterministic: DEFLATE level 6 output is
    * fixed for fixed input in the JDK's zlib. Engine-only (no SQL oracle —
    * DuckDB ships no deflate); the spec pins known-compressibility
    * orderings and exact round-trip lengths instead. */
  def compressionSignals(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6, false)
        // release the native zlib buffers when the task ends — waiting for
        // the GC Cleaner leaks off-heap memory on long-lived executors
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val raw = Option(text).getOrElse("").getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var n = 0L
          while (!deflater.finished()) n += deflater.deflate(buf)
          val ratio = if (raw.length > 0) n.toDouble / raw.length else 1.0
          (id, raw.length.toLong, n, math.rint(ratio * 1e6) / 1e6)
        }
      }
      .toDF(idCol, "n_raw_bytes", "n_deflate_bytes", "deflate_ratio")
  }

  /** Context-window chunking for training-data prep: fixed `size`-token
    * chunks with `overlap` tokens shared between neighbors. Chunk starts
    * advance by `size − overlap`; the start sequence is capped so no chunk
    * begins inside the final overlap (every token is covered, no chunk is a
    * suffix-subset of its predecessor). One generator expression per doc —
    * no shuffle at all; a downstream repartition distributes chunks. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < size, s"need 0 <= overlap < size ($overlap, $size)")
    val stride = size - overlap
    val toks = split(col(textCol), " ")
    val starts = sequence(lit(0),
      greatest(org.apache.spark.sql.functions.size(toks) - overlap - 1, lit(0)), lit(stride))
    df.select(col(idCol), toks.as("toks"), explode(starts).as("start"))
      .select(col(idCol),
        (col("start") / stride).cast("int").as("chunk_id"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(size))).as("chunk"),
        least(lit(size), org.apache.spark.sql.functions.size(col("toks")) - col("start"))
          .cast("int").as("chunk_tokens"))
  }
}
