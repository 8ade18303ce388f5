package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the WARC raw-crawl source: length-delimited record splitting
  * (never marker-splitting), HTTP payload lifting, gzip twins, per-file
  * corruption quarantine, and the streaming parse. */
class WarcSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  test("synthetic corpus round-trips: every doc comes back as a response record; types filter; html strips to the original text") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc").toString
    val manifest = WarcFile.syntheticWarcCorpus(spark, docs, "doc_id", "text",
      dir, nFiles = 3).collect()
    assert(manifest.length == 3)
    val recs = WarcFile.read(spark, dir).cache()
    try {
      val byType = recs.groupBy("warc_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = docs.count()
      val dups = docs.filter(col("doc_id") % 7 === 0).count()
      val reqs = docs.filter(col("doc_id") % 3 === 0).count()
      assert(byType("warcinfo") == 3 && byType("response") == n + dups &&
        byType("request") == reqs && !byType.contains("invalid"),
        s"record census: $byType")
      assert(manifest.map(_.getLong(1)).sum == recs.count(),
        "writer manifest counts ≡ parsed record counts")
      // every response carries HTTP 200 + the html content type; the body
      // strips back to exactly 'Doc <id> <original text>'
      val resp = recs.filter(col("warc_type") === "response")
        .withColumn("txt", graft.ops.TextAnalysis.htmlToText(col("body").cast("string")))
      assert(resp.filter(col("http_status") =!= 200).count() == 0)
      assert(resp.filter(!col("http_content_type").startsWith("text/html")).count() == 0)
      val joined = resp
        .withColumn("doc_id", regexp_extract(col("url"), "/(?:doc|alt)/(\\d+)", 1).cast("long"))
        .join(docs, "doc_id")
        .filter(col("txt") =!= concat(lit("Doc "), col("doc_id"), lit(" "), col("text")))
      assert(joined.count() == 0, "html body must strip to the source text")
      // request records carry no http status (msgtype=request)
      assert(recs.filter(col("warc_type") === "request")
        .filter(col("http_status") === 200).count() == 0)
    } finally recs.unpersist()
  }

  test("Content-Length is the ONLY delimiter: payloads containing WARC/1.0 markers do not split records") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warctrap").toString
    // payload embeds a full fake record header — a marker-splitting parser
    // would see three records and mis-frame the second
    val trap = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n inner"
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + trap)
      .getBytes("UTF-8")
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://t.example.org/x\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
      payload ++ "\r\n\r\n".getBytes("UTF-8")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "trap.warc"), rec ++ rec)
    val got = WarcFile.read(spark, dir).collect()
    assert(got.length == 2, s"exactly two records, got ${got.length}")
    assert(got.forall(r => r.warc_type == "response" &&
      new String(r.body, "UTF-8") == trap))
  }

  test("gzip twin parses identically (multi-member member-per-file); truncated tail quarantines, earlier records survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warcgz").toString
    WarcFile.syntheticWarcCorpus(spark, docs.limit(20), "doc_id", "text",
      dir, nFiles = 1, alsoGz = true)
    val plain = WarcFile.read(spark, s"$dir/shard-0000.warc")
      .collect().sortBy(_.offset)
    val gz = WarcFile.read(spark, s"$dir/shard-0000.warc.gz")
      .collect().sortBy(_.offset)
    assert(plain.length == gz.length)
    assert(plain.zip(gz).forall { case (a, b) =>
      a.warc_type == b.warc_type && a.url == b.url &&
        java.util.Arrays.equals(a.body, b.body) })

    // truncate the plain file mid-payload: the cut record quarantines as
    // ONE invalid row at its offset, every earlier record parses intact
    val full = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "shard-0000.warc"))
    val cutAt = plain.last.offset.toInt + 40
    val tdir = java.nio.file.Files.createTempDirectory("graft_warctr").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(tdir, "cut.warc"),
      java.util.Arrays.copyOfRange(full, 0, cutAt))
    val cut = WarcFile.read(spark, tdir).collect().sortBy(_.offset)
    assert(cut.length == plain.length, "earlier records + one invalid tail")
    assert(cut.last.warc_type == "invalid" && cut.last.offset == plain.last.offset)
    assert(cut.init.map(_.url).toSeq == plain.init.map(_.url).toSeq)
  }

  test("adversarial Content-Length (huge/negative/garbage) quarantines instead of crashing the task") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warcovf").toString
    def rec(lenDecl: String): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: $lenDecl\r\n\r\n")
        .getBytes("UTF-8") ++ "tiny".getBytes("UTF-8") ++ "\r\n\r\n".getBytes("UTF-8")
    val good = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://ok.example.org/\r\nContent-Length: 2\r\n\r\nok\r\n\r\n")
      .getBytes("UTF-8")
    // a huge declared length would overflow `header + 4 + len` — the
    // record must quarantine as ONE invalid row, the earlier record parse
    for ((name, decl) <- Seq(("huge", Long.MaxValue.toString),
        ("over", "9223372036854775800"), ("neg", "-7"), ("nan", "zz"))) {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"$name.warc"), good ++ rec(decl))
      val got = WarcFile.read(spark, s"$dir/$name.warc").collect().sortBy(_.offset)
      assert(got.length == 2, s"$name: good + invalid, got ${got.length}")
      assert(got.head.url == "https://ok.example.org/" &&
        got.last.warc_type == "invalid",
        s"$name: corrupt length quarantines, earlier record survives")
    }
  }

  test("streaming parse: tail a landing dir across restarts ≡ batch parse") {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("graft_warcst")
    val src = tmp.resolve("src"); java.nio.file.Files.createDirectories(src)
    val stage = tmp.resolve("stage").toString
    val (s1, s2) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    def land(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val d = java.nio.file.Files.createTempDirectory("graft_wl").toString
      WarcFile.syntheticWarcCorpus(spark, df, "doc_id", "text", d, nFiles = 1)
      java.nio.file.Files.move(java.nio.file.Paths.get(d, "shard-0000.warc"),
        src.resolve(s"$tag.warc"))
    }
    def drain(): Unit = {
      val q = WarcFile.readStream(spark, src.toString)
        .select("file", "warc_type", "url")
        .writeStream.format("parquet")
        .option("path", stage)
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    land(s1, "f1"); drain()
    val afterOne = spark.read.parquet(stage).count()
    land(s2, "f2"); drain() // restart from checkpoint: only f2 is new
    val streamed = spark.read.parquet(stage)
      .select("warc_type", "url").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val batch = WarcFile.read(spark, src.toString)
      .select("warc_type", "url").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(streamed == batch, "stream-tailed records ≡ batch parse")
    assert(afterOne < streamed.size, "restart processed only the new file")
    graft.engine.WarehouseMeta.deleteRecursively(tmp)
  }
}
