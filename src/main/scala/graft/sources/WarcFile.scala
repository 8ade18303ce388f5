package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record. `body` is the HTTP message body for
  * `application/http` payloads (status/content-type lifted into columns),
  * the raw record payload otherwise. `warc_type = "invalid"` marks a
  * malformed tail (see [[WarcFile.parseWarc]]). */
final case class WarcRecord(
    file: String, offset: Long, warc_type: String, url: String,
    warc_date: String, record_id: String, content_length: Long,
    http_status: Int, http_content_type: String, body: Array[Byte])

/** WARC (Web ARChive, ISO 28500 — the raw-crawl interchange format Common
  * Crawl publishes) as a Spark source: the front door of an LLM data
  * pipeline. Records are length-delimited — `WARC/1.0` header lines, a
  * `Content-Length`, that many payload bytes, a blank-line separator — so
  * the parser walks each file sequentially honoring the declared lengths
  * and NEVER splits on markers that happen to appear inside a payload.
  *
  * Scale shape: one task per WARC file (crawl archives ship as ~1 GB
  * files by convention; a 100 TB crawl is ~100k files — embarrassingly
  * parallel), loaded through Spark's `binaryFile` source and record-split
  * per partition (the Multimodal decode contract: binary container
  * formats have no relational form, so this is the documented
  * `flatMap`-class exception). Gzip members decode transparently
  * (`.warc.gz` files are concatenated per-record gzip members;
  * GZIPInputStream consumes multi-member streams). Files above the
  * binaryFile 2 GB ceiling need splitting upstream — the 1 GB convention
  * exists precisely for this.
  *
  * Malformed input: a record whose header or length declaration cannot be
  * parsed poisons the REST of its file (sequential format — there is no
  * resync point that cannot also appear inside a payload), so the parser
  * emits everything up to the corruption plus one `warc_type = "invalid"`
  * row carrying the file/offset for quarantine, and moves on to the next
  * file — per-file quarantine, never a job abort. */
object WarcFile {

  /** Read every `*.warc` / `*.warc.gz` under `path` into parsed records. */
  def read(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => parseWarc(file, bytes) }
  }

  /** The same parse over a STREAMING binaryFile source — tail a crawl
    * landing directory; each new WARC file arrives as one row and splits
    * into records in its micro-batch. */
  def readStream(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // binaryFile's schema is FIXED by the format; streaming file sources
    // still demand it explicitly (no inference pass on a stream)
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => parseWarc(file, bytes) }
  }

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** Sequential record walk over one file's bytes (gunzipped first for
    * `.gz` names — offsets then index the DECOMPRESSED stream). */
  def parseWarc(file: String, raw: Array[Byte]): Iterator[WarcRecord] = {
    val bytes =
      if (file.endsWith(".gz")) try gunzipAll(raw) catch {
        case _: java.io.IOException =>
          return Iterator(WarcRecord(file, 0L, "invalid", "", "", "", -1L,
            -1, "", Array.emptyByteArray))
      }
      else raw
    new Iterator[WarcRecord] {
      private var pos = 0
      private var dead = false
      private def skipSeparators(): Unit = {
        while (pos + 1 < bytes.length &&
          bytes(pos) == '\r' && bytes(pos + 1) == '\n') pos += 2
      }
      override def hasNext: Boolean = { skipSeparators(); !dead && pos < bytes.length }
      override def next(): WarcRecord = {
        val offset = pos.toLong
        parseOne() match {
          case Some(r) => r
          case None =>
            dead = true
            WarcRecord(file, offset, "invalid", "", "", "", -1L, -1, "",
              java.util.Arrays.copyOfRange(bytes, offset.toInt,
                math.min(bytes.length, offset.toInt + 512)))
        }
      }

      /** One record at `pos`, or None on corruption (caller quarantines). */
      private def parseOne(): Option[WarcRecord] = {
        val offset = pos
        // header block: ASCII lines to the first blank line
        val blank = indexOfBlankLine(bytes, pos)
        if (blank < 0) return None
        val header = new String(bytes, pos, blank - pos, "ISO-8859-1")
        val lines = header.split("\r\n")
        if (!lines.headOption.exists(_.startsWith("WARC/"))) return None
        val kv = lines.drop(1).flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None else Some(l.substring(0, i).trim.toLowerCase ->
            l.substring(i + 1).trim)
        }.toMap
        val len = kv.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
        // overflow-safe bound: `blank + 4 + len` wraps negative for an
        // adversarial huge Content-Length and would sneak past a
        // left-side check, crashing copyOfRange instead of quarantining
        if (len < 0 || len > (bytes.length - blank - 4).toLong) return None
        val payloadStart = blank + 4 // past \r\n\r\n
        val payload = java.util.Arrays.copyOfRange(bytes, payloadStart,
          (payloadStart + len).toInt)
        pos = (payloadStart + len).toInt
        // HTTP payloads: lift the status line + Content-Type, keep the body
        val isHttp = kv.get("content-type").exists(_.startsWith("application/http"))
        val (status, httpCt, body) =
          if (!isHttp) (-1, "", payload)
          else {
            val hb = indexOfBlankLine(payload, 0)
            if (hb < 0) (-1, "", payload)
            else {
              val hl = new String(payload, 0, hb, "ISO-8859-1").split("\r\n")
              val st = hl.headOption
                .flatMap(l => "^HTTP/\\S+\\s+(\\d{3})".r.findFirstMatchIn(l))
                .map(_.group(1).toInt).getOrElse(-1)
              val ct = hl.drop(1).find(_.toLowerCase.startsWith("content-type:"))
                .map(_.substring("content-type:".length).trim).getOrElse("")
              (st, ct, java.util.Arrays.copyOfRange(payload, hb + 4, payload.length))
            }
          }
        Some(WarcRecord(file, offset.toLong,
          kv.getOrElse("warc-type", ""), kv.getOrElse("warc-target-uri", ""),
          kv.getOrElse("warc-date", ""), kv.getOrElse("warc-record-id", ""),
          len, status, httpCt, body))
      }
    }
  }

  private def indexOfBlankLine(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  // ---------------------------------------------------------------- fixture

  /** Deterministic synthetic WARC corpus over the `documents` table (the
    * established syntheticWav/Gif pattern — the container framing is real,
    * the content derives from a table the oracle can also see): one
    * `warcinfo` record per file, one HTTP `response` record per document
    * (URL keyed by `doc_id % 5` host + a `utm_source` tracking param so
    * the downstream canonicalization has work to do), a paired `request`
    * record every 3rd doc (parsers must FILTER on type, not assume all-
    * response), and a DUPLICATE response under an `/alt/` path every 7th
    * doc (exact-dedup bait). Documents shard by `doc_id % nFiles`; each
    * shard sorts by doc_id and writes one `.warc` (and one `.warc.gz`
    * twin when `alsoGz`) — a WARC file is a sequential container, so the
    * per-shard in-memory materialization is the format's own write shape,
    * sized by nFiles exactly like any archive writer. Returns a manifest
    * (file, records). */
  def syntheticWarcCorpus(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, dir: String, nFiles: Int,
      alsoGz: Boolean = false): DataFrame = {
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .groupByKey(_._1 % nFiles)
      .mapGroups { (shard, rows) =>
        val out = new java.io.ByteArrayOutputStream()
        def rec(tpe: String, id: Long, url: String, payload: Array[Byte],
            http: Boolean): Unit = {
          val hdr = (Seq("WARC/1.0", s"WARC-Type: $tpe",
            s"WARC-Record-ID: <urn:uuid:graft-$tpe-$id>",
            "WARC-Date: 2024-03-01T00:00:00Z") ++
            (if (url.nonEmpty) Seq(s"WARC-Target-URI: $url") else Nil) ++
            Seq(
              if (http) s"Content-Type: application/http;msgtype=${if (tpe == "request") "request" else "response"}"
              else "Content-Type: application/warc-fields",
              s"Content-Length: ${payload.length}", "", ""))
            .mkString("\r\n")
          out.write(hdr.getBytes("UTF-8")); out.write(payload)
          out.write("\r\n\r\n".getBytes("UTF-8"))
        }
        def httpResponse(html: String): Array[Byte] =
          ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html)
            .getBytes("UTF-8")
        rec("warcinfo", shard, "",
          s"software: graft-synthetic-warc\r\nshard: $shard\r\n".getBytes("UTF-8"),
          http = false)
        var n = 1L
        rows.toSeq.sortBy(_._1).foreach { case (id, text) =>
          val host = WarcFixture.hostFor(id)
          val url = s"https://$host/doc/$id?utm_source=warc&id=$id"
          val html = s"<html><head><title>Doc $id</title></head>" +
            s"<body><p>$text</p></body></html>"
          if (id % 3 == 0) {
            rec("request", id, url,
              ("GET /doc/" + id + " HTTP/1.1\r\nHost: " + host + "\r\n\r\n")
                .getBytes("UTF-8"), http = true)
            n += 1
          }
          rec("response", id, url, httpResponse(html), http = true); n += 1
          if (id % 7 == 0) {
            rec("response", id,
              s"https://$host/alt/$id?utm_source=warc&id=$id",
              httpResponse(html), http = true)
            n += 1
          }
        }
        val f = java.nio.file.Paths.get(dir, f"shard-$shard%04d.warc")
        java.nio.file.Files.write(f, out.toByteArray)
        if (alsoGz) {
          val gz = new java.io.ByteArrayOutputStream()
          val g = new java.util.zip.GZIPOutputStream(gz)
          g.write(out.toByteArray); g.close()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, f"shard-$shard%04d.warc.gz"),
            gz.toByteArray)
        }
        (f.toString, n)
      }
      // a writer is EAGER: run the job now, return the (nFiles-bounded)
      // manifest as a local frame
      .collect().toSeq.toDF("file", "records")
  }
}

/** Fixture rules shared by the generator, the p04 pipeline, and the
  * oracle twin (the host choice must be re-derivable in plain SQL). */
object WarcFixture {
  val hosts: Seq[String] = Seq("alpha.example.org", "beta.example.org",
    "gamma.example.com", "delta.example.net", "epsilon.example.org")
  def hostFor(id: Long): String = hosts(((id % 5) + 5).toInt % 5)
}
