package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the text ops beyond the oracle queries: chunking coverage
  * invariants and repetition-signal arithmetic. */
class TextAnalysisSpec extends AnyFunSuite with SparkSpec {

  test("repetitionFeatures: dup-token ratio and top-token share") {
    import spark.implicits._
    val df = Seq((1L, "a a a b"), (2L, "w x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionFeatures(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L) == ((4L, 0.5, 0.75)), "4 tokens, 2 distinct, 'a' holds 3/4")
    assert(got(2L) == ((4L, 0.0, 0.25)), "all distinct")
  }

  test("vocabProfile: top-k by tf with doc frequency, ties break by token") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a b c"), (2L, "a b d"), (3L, "b c")).toDF("doc_id", "text")
    // tf: a=3 b=3 c=2 d=1; df: a=2 b=3 c=2 d=1; tie a/b at tf 3 → 'a' first
    val got = TextAnalysis.vocabProfile(df, "doc_id", "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 3L, 2L), ("b", 3L, 3L), ("c", 2L, 2L)))
  }

  test("piiRedact replaces emails/urls/phones; counts are pre-redaction") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a@b.co and c.d@e.org see https://x.io/p?q=1 call 555-123-4567"),
      (2L, "clean text only")).toDF("doc_id", "text")
    val got = TextAnalysis.piiRedact(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    assert(got(1L) == ((2, 1, 1,
      "mail <EMAIL> and <EMAIL> see <URL> call <PHONE>")))
    assert(got(2L) == ((0, 0, 0, "clean text only")))
  }

  test("packBins: next-fit contiguous bins per shard from the running budget") {
    import spark.implicits._
    // shard A: 4 docs of 3 tokens, budget 6 → exclusive cums 0,3,6,9 → bins 0,0,1,1
    // shard B: one 7-token doc overflowing the budget alone → bin 0
    val df = Seq(
      (1L, "A", "a b c"), (2L, "A", "d e f"), (3L, "A", "g h i"), (4L, "A", "j k l"),
      (5L, "B", "a b c d e f g"))
      .toDF("doc_id", "shard", "text")
    val got = TextAnalysis.packBins(df, "shard", "doc_id", "text", budget = 6)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("bin")).toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 0))
    intercept[IllegalArgumentException] {
      TextAnalysis.packBins(df, "shard", "doc_id", "text", budget = 0)
    }
  }

  test("paragraphDedup: corpus-first occurrence survives, docs reassemble in order") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d a b"), // within-doc repeat of 'a b'
      (2L, "c d x y"),     // 'c d' already owned by doc 1
      (3L, "a b"))         // all boilerplate
      .toDF("doc_id", "text")
    val got = TextAnalysis.paragraphDedup(df, "doc_id", "text", window = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((3L, 2L, "a b c d")), "first occurrences of 'a b' and 'c d'")
    assert(got(2L) == ((2L, 1L, "x y")), "'c d' deduped against doc 1")
    assert(got(3L) == ((1L, 0L, "")), "all-boilerplate doc keeps a row with ''")
  }

  test("unigramLogProb: self-trained surprisal; OOV floors at tf=1 under a reference model") {
    import spark.implicits._
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // p(a)=p(b)=2/5, p(c)=1/5: doc 1 = -ln(0.4); doc 2 = (-ln .4 - ln .2)/2
    assert(got(1L) == ((3L, 0.9163)))
    assert(got(2L) == ((2L, 1.2629)))
    val model = Seq((9L, "a a b")).toDF("doc_id", "text")
    val oov = TextAnalysis.unigramLogProb(Seq((5L, "c")).toDF("doc_id", "text"),
      "doc_id", "text", model = Some(model))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(oov == Seq((5L, 1L, 1.0986)), "-ln(1/3) with the add-one floor")
  }

  test("importanceWeights: target-likeness log ratio; OOV-to-target floors, neutral token nets 0") {
    import spark.implicits._
    val raw = Seq((1L, "a b"), (2L, "c c")).toDF("doc_id", "text")
    val target = raw.filter($"doc_id" === 1L)
    val got = TextAnalysis.importanceWeights(raw, "doc_id", "text", target)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc 1: each token ln(1/2) − ln(1/4) = ln 2 → 2·ln2 = 1.3863
    assert(got(1L) == ((2L, 1.3863)))
    // doc 2: 'c' unseen by target floors at 1/2; raw p = 2/4 → ratio 0
    assert(got(2L) == ((2L, 0.0)))
  }

  test("htmlToText: blocks drop whole, tags become spaces, entities decode once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "<p>a<br/>b</p><script>if (x<y) alert('&');</script><i>c</i>"),
      (2L, "x &amp;lt; y &#39;q&#39; &quot;r&quot;"), // &amp;lt; must NOT double-decode
      (3L, "<style>p { color: red }</style>plain"),
      (4L, "<SCRIPT>var j=1;</SCRIPT><P>Hi</P>"), // tag names are case-insensitive
      (5L, "we need 5 < 6 and x > y"),            // unescaped comparisons survive
      (6L, "<!-- a > b --><p>kept</p>")).toDF("id", "html")
    val got = df.select(col("id"), TextAnalysis.htmlToText(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "a b c", "script body (incl. its quotes/angles) drops whole")
    assert(got(2L) == "x &lt; y 'q' \"r\"",
      "&amp; decodes LAST so &amp;lt; yields literal &lt;, not <")
    assert(got(3L) == "plain")
    assert(got(4L) == "Hi", "uppercase script block drops whole, not just its tags")
    assert(got(5L) == "we need 5 < 6 and x > y", "prose comparisons are not tags")
    assert(got(6L) == "kept", "a '>' inside a comment cannot split it")
    val title = df.filter(col("id") === 1)
      .select(TextAnalysis.htmlTitle(col("html"))).head().getString(0)
    assert(title == "", "no <title> → empty string")
  }

  test("canonicalizeUrl: authority lowercases, default ports/fragments/trackers strip, path case kept") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      "HTTPS://WWW.Ex.COM:443/A/B?utm_a=1&utm_b=2&id=3#x" -> "https://www.ex.com/A/B?id=3",
      "http://ex.com:80/" -> "http://ex.com/",
      "http://ex.com:8080/p" -> "http://ex.com:8080/p", // non-default port kept
      "https://ex.com/p?ref=feed" -> "https://ex.com/p",
      "https://ex.com/p?id=1&utm_x=9" -> "https://ex.com/p?id=1",
      "https://ex.com/CaseKept?Q=UPPER" -> "https://ex.com/CaseKept?Q=UPPER",
      // 'ref=' must start a parameter: not inside href=, not in the path
      "https://ex.com/p?href=https://other&id=1" -> "https://ex.com/p?href=https://other&id=1",
      "https://ex.com/dp/B01/ref=sr_1_1?keywords=x" -> "https://ex.com/dp/B01/ref=sr_1_1?keywords=x")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((in, want) <- cases)
      assert(got(in) == want, s"$in → ${got(in)}, expected $want")
  }

  test("chunkTokens covers every token; no chunk starts inside the final overlap") {
    import spark.implicits._
    val words = (1 to 25).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkTokens(df, "doc_id", "text", size = 8, overlap = 2)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3))).sortBy(_._1)
    // stride 6, starts 0,6,12,18 → 4 chunks
    assert(chunks.length == 4)
    assert(chunks.head._2.startsWith("w1 ") && chunks.head._3 == 8)
    assert(chunks.last._2.endsWith(" w25") && chunks.last._3 == 7, "tail chunk is partial")
    // coverage: the union of chunk token sets is exactly the document
    val covered = chunks.flatMap(_._2.split(" ")).toSet
    assert(covered == words.toSet)
    // neighbors share exactly `overlap` tokens
    val c0 = chunks(0)._2.split(" ").toSet
    val c1 = chunks(1)._2.split(" ").toSet
    assert((c0 & c1).size == 2)
    // short doc → one chunk, intact
    val short = TextAnalysis.chunkTokens(
      Seq((2L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 8, 2).collect()
    assert(short.length == 1 && short.head.getString(2) == "a b c")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(df, "doc_id", "text", size = 4, overlap = 4)
    }
  }

  test("encodingQuality flags replacement chars, C1 controls, mojibake marks") {
    import spark.implicits._
    // built from escapes so no invisible damage bytes live in source:
    // one U+FFFD, two C1 controls (NEL, PU1), one A-tilde + one a-circumflex
    // mojibake mark (the classic UTF-8-read-as-latin-1 lead bytes)
    val damaged = "caf\uFFFD x\u0085 y\u0091 caf\u00C3\u00A9 z\u00E2"
    val df = Seq(
      (1L, "perfectly clean ascii text"),
      (2L, damaged),
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.encodingQuality(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5)))).toMap
    assert(got(1L) == ((0, 0, 0, 0.0)), "clean text has zero damage signals")
    val (repl, c1, moji, ratio) = got(2L)
    assert(repl == 1, "one U+FFFD")
    assert(c1 == 2, "U+0085 and U+0091 are C1 controls")
    assert(moji == 2, "one A-tilde and one a-circumflex mark")
    assert(ratio > 0.0 && ratio < 1.0)
    assert(got(3L)._4 == 0.0, "empty doc scores 0, not NaN")
  }

  test("BPE: pair counts hand-computed; merge training follows max-count with lexicographic ties, stops when dry") {
    import spark.implicits._
    val df = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val counts = TextAnalysis.bpePairCounts(df, "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts == Map(
      ("a", "a") -> 4L, ("a", "b") -> 3L, ("b", "</w>") -> 3L))
    // round 1: (a,a)=4 wins; round 2: (a,b)=3 ties (b,</w>)=3 → lexicographic;
    // round 3: after 'ab' merges, (ab,</w>)=3 beats (aa,ab)=2
    val merges = TextAnalysis.trainBpeMerges(spark, df, "text", nMerges = 3)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("ab", "</w>")))
    // requesting more merges than the corpus supports stops when dry
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val all = TextAnalysis.trainBpeMerges(spark, tiny, "text", nMerges = 5)
    assert(all == Seq(("a", "b"), ("ab", "</w>")),
      "a fully-merged vocabulary has no pairs left — training stops early")
  }

  test("BPE external parity: Sennrich et al. 2016 worked example — published merge prefix, 'lowest' → 'low est</w>'") {
    import spark.implicits._
    // The dictionary from the paper's Figure-2 snippet (Sennrich, Haddow,
    // Birch 2016, "Neural Machine Translation of Rare Words with Subword
    // Units", ACL): {'low':5, 'lower':2, 'newest':6, 'widest':3}. The
    // corpus realizes the word frequencies; the trainer collapses it back
    // to exactly that dictionary.
    val text = Seq("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
      .flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val merges = TextAnalysis.trainBpeMerges(spark,
      Seq((1L, text)).toDF("doc_id", "text"), "text", nMerges = 10)
    // the paper's published output starts (e,s), (es,t), (est,</w>),
    // (l,o), (lo,w) — our trainer reproduces that prefix. (The 9-9-9 and
    // 7-7 frequency ties inside it resolve identically under the paper
    // snippet's dict-insertion order and our documented lexicographic
    // rule; at merge 6 a 6-6-6 tie makes the two rules diverge — the
    // paper's own snippet is tie-order-unspecified there, so the pin
    // covers the tie-agreeing prefix plus the tie-robust segmentations.)
    assert(merges.take(5) == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")), s"published merge prefix, got $merges")
    // the full sequence under the documented lexicographic tie-break,
    // hand-derived (merge 6 on: ties e<n<w, ew<n, then unique maxima,
    // finally d<i<w among widest's 3-count remnants)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"), ("e", "w"), ("ew", "est</w>"),
      ("n", "ewest</w>"), ("low", "</w>"), ("d", "est</w>")))
    val ranks = merges.zipWithIndex.toMap
    // the paper's headline example (§3.2): the UNSEEN word 'lowest'
    // segments into the learned subwords 'low' + 'est</w>' — robust to
    // the tie divergence (both subwords come from the agreed prefix)
    assert(TextAnalysis.bpeEncodeWord("lowest", ranks, "</w>") ==
      Seq("low", "est</w>"))
    // seen words collapse to single symbols where training completed them
    assert(TextAnalysis.bpeEncodeWord("low", ranks, "</w>") == Seq("low</w>"))
    assert(TextAnalysis.bpeEncodeWord("newest", ranks, "</w>") == Seq("newest</w>"))
    // an unseen word sharing no learned pair stays at character level
    assert(TextAnalysis.bpeEncodeWord("wider", ranks, "</w>") ==
      Seq("w", "i", "d", "e", "r", "</w>"))
  }

  test("tfidfKeywords: hand-computed scores; rank cuts on rounded score with term tie-break") {
    import spark.implicits._
    // N=3; df: a=3 (idf 0), b=2, c=1, d=1
    val df = Seq(
      (1L, "a a b c"), (2L, "a b"), (3L, "a d d")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfKeywords(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> (r.getString(1), r.getDouble(3))).toMap
    def s(tf: Int, dfq: Int) = math.rint(tf * math.log(3.0 / dfq) * 1e6) / 1e6
    assert(got((1L, 1)) == (("c", s(1, 1))), "c: tf 1 × ln 3 beats b's ln 1.5")
    assert(got((1L, 2)) == (("b", s(1, 2))))
    // doc2: b (ln 1.5) then a (0.0) — the zero-idf term still ranks by tie rules
    assert(got((2L, 1)) == (("b", s(1, 2))) && got((2L, 2)) == (("a", 0.0)))
    assert(got((3L, 1)) == (("d", s(2, 1))), "tf 2 doubles d's score")
    // k larger than a doc's vocabulary yields only the vocabulary
    assert(TextAnalysis.tfidfKeywords(df, "doc_id", "text", k = 10)
      .filter(col("doc_id") === 2L).count() == 2)
  }

  test("domainSuffixes + blockByDomain: suffix semantics, case/port-insensitive, prefix-label trap") {
    import spark.implicits._
    val suf = Seq((1L, "HTTPS://A.B.Example.COM:8443/x?y#z")).toDF("id", "url")
      .select(TextAnalysis.domainSuffixes(col("url"))).head().getSeq[String](0)
    assert(suf == Seq("a.b.example.com", "b.example.com", "example.com", "com"))
    val docs = Seq(
      (1L, "https://ads.tracker.net/a"),          // subdomain of blocked
      (2L, "https://Tracker.NET:80/b"),           // the blocked domain itself
      (3L, "https://tracker.net.example.org/c"),  // blocked name as label PREFIX — survives
      (4L, "https://example.org/d"),
      (5L, "https://nettracker.net.safe.io/e"),   // substring, not suffix — survives
      (6L, "https://user:pw@tracker.net/f"),      // userinfo must NOT hide the host
      (7L, "https://tracker.net.:8080/g"))        // trailing-dot FQDN form still blocks
      .toDF("doc_id", "url")
    val blocked = Seq("tracker.net").toDF("domain")
    val kept = TextAnalysis.blockByDomain(docs, "doc_id", "url", blocked)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L))
  }

  test("bigramLogProb: Laplace-smoothed conditionals, hand-computed; floors for unseen") {
    import spark.implicits._
    val corpus = Seq((1L, "a b a b"), (2L, "b a c")).toDF("doc_id", "text")
    // model: c(a b)=2, c(b a)=2, c(a c)=1; contexts a=3, b=2; V=3
    val got = TextAnalysis.bigramLogProb(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc1: 2·−ln((2+1)/(3+3)) + 1·−ln((2+1)/(2+3)) over 3 bigrams
    val d1 = (2 * -math.log(3.0 / 6) + -math.log(3.0 / 5)) / 3
    // doc2: −ln(3/5) + −ln((1+1)/(3+3)) over 2
    val d2 = (-math.log(3.0 / 5) + -math.log(2.0 / 6)) / 2
    assert(got(1L) == ((3L, math.rint(d1 * 1e4) / 1e4)))
    assert(got(2L) == ((2L, math.rint(d2 * 1e4) / 1e4)))
    // reference-model path: wholly unseen bigram AND context floor at 1/V
    val fresh = Seq((9L, "x y")).toDF("doc_id", "text")
    val ref = TextAnalysis.bigramLogProb(fresh, "doc_id", "text", Some(corpus))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ref.toSeq == Seq((9L, 1L, math.rint(math.log(3.0) * 1e4) / 1e4)))
    // a doc with fewer than 2 tokens has no bigrams and no row
    val one = Seq((5L, "z")).toDF("doc_id", "text")
    assert(TextAnalysis.bigramLogProb(one, "doc_id", "text", Some(corpus)).count() == 0)
  }

  test("gopherRules: each rule flags independently; composite gate is their AND") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat of the mat and it was warm here"), // 11 words, all pass
      (2L, "the of"),                                      // too few words
      (3L, "a b c d e f g h i j"),                         // mean word len 1 < 3
      (4L, "one document that has x9 digit77 tokens the of and here"), // alpha frac 9/11 < 0.9
      (5L, "plain words without stop matches whatsoever today")) // 0 stopwords
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(df, "doc_id", "text",
        minWords = 5, maxWords = 20, minMeanWordLen = 2.0, maxMeanWordLen = 10.0,
        minAlphaFrac = 0.9, minStopwords = 2,
        stopwords = Seq("the", "a", "of", "and", "is"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
          r.getBoolean(9)))).toMap
    assert(got(1L) == ((true, true, true, true, true)))
    assert(got(2L) == ((false, true, true, true, false)), "word-count rule rejects")
    assert(got(3L) == ((true, false, true, false, false)), "mean-word-length rule rejects")
    assert(got(4L) == ((true, true, false, true, false)), "alpha-fraction rule rejects")
    assert(got(5L) == ((true, true, true, false, false)), "stopword rule rejects")
    // the numeric audit columns carry the evidence for each decision
    val row4 = TextAnalysis.gopherRules(df, "doc_id", "text",
        minAlphaFrac = 0.9, stopwords = Seq("the", "a", "of", "and", "is"))
      .filter($"doc_id" === 4L).collect().head
    assert(row4.getInt(1) == 11 && row4.getDouble(3) == math.rint(9.0 / 11 * 1e4) / 1e4)
  }

  test("compressionSignals: boilerplate compresses, exact lengths are deterministic") {
    import spark.implicits._
    val boiler = "spam ham " * 200
    val varied = (0 until 400).map(i => (i * 2654435761L).toHexString).mkString(" ")
    val df = Seq((1L, boiler), (2L, varied), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.compressionSignals(spark, df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // raw lengths are the UTF-8 byte counts
    assert(got(1L)._1 == boiler.getBytes("UTF-8").length)
    // repeated boilerplate compresses an order of magnitude harder
    assert(got(1L)._3 < 0.05, s"boilerplate ratio ${got(1L)._3}")
    assert(got(2L)._3 > 5 * got(1L)._3, "varied text is less compressible")
    assert(got(3L) == ((0L, got(3L)._2, 1.0)), "empty doc pins ratio 1.0")
    // deterministic: the exact deflate byte count matches an independent run
    val d = new java.util.zip.Deflater(6, false)
    d.setInput(boiler.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](1 << 16)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    assert(got(1L)._2 == n)
  }

  /** The trainer's own merge application: one left-to-right non-overlapping
    * pass per merge, in training order. A single pass per merge suffices —
    * merging (l,r)→lr can never create a NEW (l,r) occurrence in the same
    * pass (a new pair (x, lr) or (lr, y) has a longer right/left element
    * than r/l, so it cannot equal (l,r)). */
  private def replayEncode(word: String, merges: Seq[(String, String)],
      eow: String = "</w>"): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector :+ eow
    for ((l, r) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  test("trainBpeMergesBatched: batchSize=1 ≡ exact trainer; symbol-disjoint batch selection hand-computed") {
    import spark.implicits._
    // hand-traceable corpus: words aa×2 bb×2 cc×1.
    // round-1 pairs (n, l, r) ordered (n desc, l asc, r asc; '<' < letters):
    //   (2, a, </w>) (2, a, a) (2, b, </w>) (2, b, b) (1, c, c) (1, c, </w>)
    // batch of 3, symbol-disjoint: (a,</w>) takes {a, </w>}, so (a,a) and
    // (b,</w>) skip; (b,b) and (c,c) fit → [(a,</w>), (b,b), (c,c)]
    // round 2: aa→[a, a</w>], bb→[bb, </w>], cc→[cc, </w>] ⇒ pairs
    //   (2, a, a</w>) (2, bb, </w>) (1, cc, </w>) → [(a,a</w>), (bb,</w>)]
    val df = Seq((1L, "aa bb aa bb cc")).toDF("doc_id", "text")
    val batched = TextAnalysis.trainBpeMergesBatched(spark, df, "text",
      nMerges = 5, batchSize = 3)
    assert(batched == Seq(("a", "</w>"), ("b", "b"), ("c", "c"),
      ("a", "a</w>"), ("bb", "</w>")))
    // batchSize=1 is the exact Sennrich path — identical to trainBpeMerges
    val rnd = new scala.util.Random(777L)
    val corpus = (0 until 25).map { i =>
      (i.toLong, (0 until 6).map(_ =>
        (0 until (1 + rnd.nextInt(5))).map(_ => "abcd"(rnd.nextInt(4))).mkString)
        .mkString(" "))
    }.toDF("doc_id", "text")
    val exact = TextAnalysis.trainBpeMerges(spark, corpus, "text", nMerges = 8)
    val b1 = TextAnalysis.trainBpeMergesBatched(spark, corpus, "text",
      nMerges = 8, batchSize = 1)
    assert(exact == b1, "batchSize=1 must BE the exact trainer")
    // batched tables stay well-formed: distinct merges, and a batched-table
    // encode still reassembles every word exactly
    val b4 = TextAnalysis.trainBpeMergesBatched(spark, corpus, "text",
      nMerges = 8, batchSize = 4)
    assert(b4.distinct == b4, "no merge selected twice")
    val ranks = b4.zipWithIndex.toMap
    for (w <- Seq("aabb", "dcba", "abab"))
      assert(TextAnalysis.bpeEncodeWord(w, ranks, "</w>").mkString == w + "</w>")
  }

  /** Driver-side Sennrich reference trainer — an independent oracle for
    * the distributed path: count pairs over the word-frequency vocabulary,
    * merge the (count desc, left, right) winner, repeat. */
  private def refTrain(words: Map[String, Long], nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, f) => (w.map(_.toString).toVector :+ "</w>") -> f }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var dry = false
    while (merges.size < nMerges && !dry) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) dry = true
      else {
        val (l, r) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }._1
        merges += ((l, r))
        vocab = vocab.toSeq.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    merges.toSeq
  }

  test("trainBpeMerges ≡ driver-side Sennrich reference across lineage-checkpoint boundaries") {
    import spark.implicits._
    // enough distinct pairs for 20 exact rounds → the every-8-rounds
    // localCheckpoint lineage cut fires twice inside the run
    val rnd = new scala.util.Random(4242L)
    val corpus = (0 until 40).map { i =>
      (i.toLong, (0 until 8).map(_ =>
        (0 until (2 + rnd.nextInt(6))).map(_ => "abcdef"(rnd.nextInt(6))).mkString)
        .mkString(" "))
    }
    val freqs = corpus.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    val expected = refTrain(freqs, 20)
    assert(expected.size == 20, "fixture must support all 20 merges")
    val got = TextAnalysis.trainBpeMerges(spark,
      corpus.toDF("doc_id", "text"), "text", nMerges = 20)
    assert(got == expected,
      "distributed trainer must equal the reference merge-for-merge")
  }

  test("bpeEncodeWord: greedy lowest-rank merge ≡ sequential merge replay on randomized corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val alphabet = "abcde"
    for (trial <- 0 until 4) {
      // small alphabet + short words so pairs recur and merges chain deep
      val corpus = (0 until 30).map { i =>
        val words = (0 until (2 + rnd.nextInt(6))).map { _ =>
          (0 until (1 + rnd.nextInt(7)))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        }
        (i.toLong, words.mkString(" "))
      }
      val df = corpus.toDF("doc_id", "text")
      val merges = TextAnalysis.trainBpeMerges(spark, df, "text", nMerges = 12)
      val ranks = merges.zipWithIndex.toMap
      val words = corpus.flatMap(_._2.split(" ")).filter(_.nonEmpty).distinct
      for (w <- words) {
        val greedy = TextAnalysis.bpeEncodeWord(w, ranks, "</w>")
        val replay = replayEncode(w, merges)
        assert(greedy == replay,
          s"trial $trial word '$w': greedy $greedy != replay $replay (merges $merges)")
        assert(greedy.mkString == w + "</w>", "tokens must reassemble the word")
      }
    }
  }

  test("bpeEncodeStats: hand-built merge table gives exact word/token counts and fertility") {
    import spark.implicits._
    // ranks: (l,o)=0 → (lo,w)=1 → (low,</w>)=2.
    //   low    → l o w </w> → lo w </w> → low </w> → low</w>          = 1 token
    //   lower  → l o w e r </w> → low e r </w> (no (low,e) merge)     = 4 tokens
    //   lowest → l o w e s t </w> → low e s t </w>                    = 5 tokens
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
    val df = Seq(
      (1L, "low lower lowest"),
      (2L, "low low"),
      (3L, ""),              // empty doc: 0 words, null fertility
      (4L, "  low   low ")). // run-of-spaces artifacts don't count as words
      toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncodeStats(spark, df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got(1L) == ((3L, 10L, Some(3.3333))), "1+4+5 tokens over 3 words")
    assert(got(2L) == ((2L, 2L, Some(1.0))), "fully-merged words hit fertility 1")
    assert(got(3L) == ((0L, 0L, None)), "no words → fertility null, not NaN")
    assert(got(4L) == ((2L, 2L, Some(1.0))))
  }

  test("tokenDivergence: hand-computed add-one-smoothed KL both ways and bounded JS") {
    import spark.implicits._
    // side A: "a a b" (Na=3), side B: "a b b b" (Nb=4), union vocab V=2
    //  pa = (3/5, 2/5), pb = (1/3, 2/3)
    val df = Seq(
      (1L, "en", "a a b"),
      (2L, "de", "a b b"),
      (3L, "de", "b")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.tokenDivergence(df, "text", col("lang") === "en")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 4L, 2L)))
    val pa = Seq(3.0 / 5, 2.0 / 5)
    val pb = Seq(1.0 / 3, 2.0 / 3)
    def rnd4(x: Double) = math.rint(x * 1e4) / 1e4
    def kl(p: Seq[Double], q: Seq[Double]) =
      p.zip(q).map { case (x, y) => x * math.log(x / y) }.sum
    val m = pa.zip(pb).map { case (x, y) => (x + y) / 2 }
    assert(r.getDouble(3) == rnd4(kl(pa, pb)), "KL(a‖b)")
    assert(r.getDouble(4) == rnd4(kl(pb, pa)), "KL(b‖a)")
    assert(r.getDouble(5) == rnd4((kl(pa, m) + kl(pb, m)) / 2), "JS")
    // the hand arithmetic itself, so the pin is visibly absolute:
    assert(rnd4(kl(pa, pb)) == 0.1483 && rnd4(kl(pb, pa)) == 0.1446 &&
      rnd4((kl(pa, m) + kl(pb, m)) / 2) == 0.0362)
    // JS is symmetric and bounded by ln 2
    assert(r.getDouble(5) <= math.log(2.0))
    val rev = TextAnalysis.tokenDivergence(df, "text", col("lang") =!= "en")
      .collect().head
    assert(rev.getDouble(5) == r.getDouble(5), "JS(a,b) == JS(b,a)")
    assert((rev.getDouble(3), rev.getDouble(4)) == ((r.getDouble(4), r.getDouble(3))))
  }

}
