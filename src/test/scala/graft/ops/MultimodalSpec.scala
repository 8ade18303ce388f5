package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The multimodal plumbing contract: schema, per-partition batch shape, and
  * plan-level transforms are real. BMP/WAV decode is REAL (zero-dependency
  * header parsers, r5); compressed formats still use the deterministic stub
  * (no codec libs in this container — see Multimodal.decodeStub). */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  /** Handcraft a 24-bit bottom-up BMP from a top-down pixel raster of
    * (r, g, b) rows. */
  private def bmp(pixels: Seq[Seq[(Int, Int, Int)]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels.head.length
    val stride = ((w * 3 + 3) / 4) * 4
    val dataSize = stride * h
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    out.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER, positive h = bottom-up
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- (h - 1) to 0 by -1) { // rows stored bottom-up
      for ((r, g, b) <- pixels(y)) out.put(b.toByte).put(g.toByte).put(r.toByte)
      for (_ <- w * 3 until stride) out.put(0.toByte) // row padding
    }
    out.array()
  }

  /** Handcraft a PCM16 WAV (RIFF/fmt/data) from interleaved samples. */
  private def wav(samples: Seq[Short], channels: Int = 1, rate: Int = 8000): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(s => out.putShort(s))
    out.array()
  }

  test("BMP decode is real: luminance grid tracks the actual pixels") {
    val white = (255, 255, 255); val black = (0, 0, 0)
    val img = bmp(Seq(Seq(white, black), Seq(black, black)))
    val (w, h, lum) = Multimodal.decodeBmp(img).get
    assert(w == 2 && h == 2)
    // top-down raster: top-left pixel first despite bottom-up storage
    assert(math.abs(lum(0) - 1.0f) < 1e-3 && lum.drop(1).forall(_ < 1e-3))

    // dim = pixel count -> one bucket per pixel; flipping one pixel moves
    // exactly that bucket
    val f1 = Multimodal.decode(img, 4)
    assert(math.abs(f1(0) - 1.0f) < 1e-3 && f1(3) < 1e-3)
    val img2 = bmp(Seq(Seq(white, black), Seq(black, white)))
    val f2 = Multimodal.decode(img2, 4)
    assert(math.abs(f2(3) - 1.0f) < 1e-3, "changed pixel must change its feature")
    assert(!f1.sameElements(f2))
  }

  test("WAV decode is real: windowed RMS tracks the actual samples") {
    val loud = Seq.fill(4)(16384.toShort) // 0.5 full-scale
    val quiet = Seq.fill(4)(0.toShort)
    val f = Multimodal.decode(wav(loud ++ quiet), 2)
    assert(math.abs(f(0) - 0.5f) < 1e-3 && f(1) < 1e-6)
    // stereo mixes down: L=0.5, R=-0.5 cancel to silence
    val st = wav(Seq(16384, -16384, 16384, -16384).map(_.toShort), channels = 2)
    val fs = Multimodal.decode(st, 1)
    assert(math.abs(fs(0)) < 1e-3)
  }

  test("BMP resize is real: nearest-neighbor pixels, valid re-encoded payload") {
    val R = (255, 0, 0); val G = (0, 255, 0); val B = (0, 0, 255)
    val W = (255, 255, 255); val K = (0, 0, 0)
    // 4x4 with quadrant markers at even coordinates — nearest-neighbor to
    // 2x2 picks exactly pixels (0,0) (2,0) (0,2) (2,2)
    val img = bmp(Seq(
      Seq(R, K, G, K),
      Seq(K, K, K, K),
      Seq(B, K, W, K),
      Seq(K, K, K, K)))
    val out = Multimodal.resizeBmp(img, maxSide = 2).get
    val (w, h, px) = Multimodal.decodeBmpPixels(out).get
    assert(w == 2 && h == 2)
    assert(px.toSeq == Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
    // under the bound: re-encoded but pixel-identical
    val same = Multimodal.resizeBmp(img, maxSide = 10).get
    assert(Multimodal.decodeBmpPixels(same).get._3.toSeq
      == Multimodal.decodeBmpPixels(img).get._3.toSeq)

    // the distributed operator resizes BMPs and passes through the rest
    val rows = spark.createDataFrame(Seq(
      Row(1L, "image", img, "image/bmp", 4, 4, null),
      Row(2L, "image", Array[Byte](1, 2, 3), "image/png", 100, 50, null)
    ).asJava, Multimodal.mediaSchema)
    val res = Multimodal.resizeImages(spark, rows, maxSide = 2)
      .collect().map(r => r.media_id -> r).toMap
    assert(res(1L).resized && res(1L).out_width == 2 && res(1L).out_height == 2)
    assert(Multimodal.decodeBmpPixels(res(1L).bytes).get._3.toSeq
      == Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
    assert(!res(2L).resized && res(2L).bytes.toSeq == Seq[Byte](1, 2, 3))
  }

  test("undecodable payloads still route to the deterministic stub") {
    val junk = Array[Byte](1, 2, 3)
    assert(Multimodal.decodeImagePixels(junk).isEmpty && Multimodal.decodeAudio(junk).isEmpty)
    assert(Multimodal.decode(junk, 4).sameElements(Multimodal.decodeStub(junk, 4)))
  }

  test("real codec payloads fail loudly instead of yielding fake features (r8)") {
    // an MP4: any size prefix + 'ftyp' box; an MP3: ID3v2 tag header
    val mp4 = Array[Byte](0, 0, 0, 0x18) ++ "ftypisom".getBytes("US-ASCII") ++ new Array[Byte](16)
    val mp3 = "ID3".getBytes("US-ASCII") ++ new Array[Byte](16)
    for (payload <- Seq(mp4, mp3)) {
      val e = intercept[UnsupportedOperationException](Multimodal.decode(payload, 4))
      assert(e.getMessage.contains("no codec"), "message must name the environmental gap")
    }
    // the sniffer must NOT claim payloads the JDK actually decodes
    val realBmp = bmp(Seq(Seq((0, 0, 0), (1, 1, 1)), Seq((2, 2, 2), (3, 3, 3))))
    assert(Multimodal.sniffUnsupportedCodec(realBmp).isEmpty)
  }

  /** Encode a top-down 0xRRGGBB raster via the JDK writer (png/gif/jpg). */
  private def jdkImage(fmt: String, w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  test("PNG and GIF decode are real: JDK readers return the exact raster") {
    val png = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000, 0x808080)
    val bytes = jdkImage("png", 3, 2, png)
    assert(Multimodal.decodeBmpPixels(bytes).isEmpty, "png must not parse as BMP")
    val (w, h, got) = Multimodal.decodeImagePixels(bytes).get
    assert(w == 3 && h == 2 && got.toSeq == png.toSeq, "png raster")
    // GIF fixture is 16x8 2-color quadrants: the JDK GIF *writer*'s LZW
    // encoder corrupts tiny rasters (verified: a 3x2 write round-trips
    // wrong through ImageIO alone), so the fixture stays above that bug —
    // the decode under test is format-side, not writer-side
    val gw = 16; val gh = 8
    val gif = Array.tabulate(gw * gh) { i =>
      if ((i / gw < 4) ^ (i % gw < 8)) 0xff0000 else 0x00ff00
    }
    val gifBytes = jdkImage("gif", gw, gh, gif)
    assert(Multimodal.decodeBmpPixels(gifBytes).isEmpty, "gif must not parse as BMP")
    val (w2, h2, got2) = Multimodal.decodeImagePixels(gifBytes).get
    assert(w2 == gw && h2 == gh && got2.toSeq == gif.toSeq, "gif raster")
    // features now track actual pixels for PNG, same as the BMP test above
    val f1 = Multimodal.decode(jdkImage("png", 2, 2,
      Array(0xffffff, 0, 0, 0)), 4)
    assert(math.abs(f1(0) - 1.0f) < 1e-3 && f1(3) < 1e-3)
    val f2 = Multimodal.decode(jdkImage("png", 2, 2,
      Array(0xffffff, 0, 0, 0xffffff)), 4)
    assert(math.abs(f2(3) - 1.0f) < 1e-3, "changed pixel must change its feature")
  }

  test("JPEG decode is real: dims exact, luminance close despite lossy codec") {
    val px = Array.fill(64)(0xc0c0c0) // flat gray survives JPEG nearly intact
    val bytes = jdkImage("jpg", 8, 8, px)
    val (w, h, got) = Multimodal.decodeImagePixels(bytes).get
    assert(w == 8 && h == 8)
    val lum = Multimodal.decodeImage(bytes).get._3
    assert(lum.forall(v => math.abs(v - 0xc0 / 255.0f) < 0.05f))
    assert(!Multimodal.decode(bytes, 4).sameElements(Multimodal.decodeStub(bytes, 4)))
  }

  test("PNG resize is real through the distributed operator; output lossless") {
    // same quadrant-marker raster as the BMP resize test, as a PNG
    val px = Array(
      0xff0000, 0, 0x00ff00, 0,
      0, 0, 0, 0,
      0x0000ff, 0, 0xffffff, 0,
      0, 0, 0, 0)
    val png = jdkImage("png", 4, 4, px)
    val rows = spark.createDataFrame(Seq(
      Row(1L, "image", png, "image/png", 4, 4, null),
      Row(2L, "image", Array[Byte](1, 2, 3), "image/mp4ish", 0, 0, null)
    ).asJava, Multimodal.mediaSchema)
    val res = Multimodal.resizeImages(spark, rows, maxSide = 2)
      .collect().map(r => r.media_id -> r).toMap
    assert(res(1L).resized && res(1L).out_width == 2 && res(1L).out_height == 2)
    // re-encoded as PNG (lossless): the nearest-neighbor picks are exact
    assert(Multimodal.decodeImagePixels(res(1L).bytes).get._3.toSeq
      == Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
    assert(!res(2L).resized)
  }

  test("non-PCM16 audio decodes through the javax.sound fallback") {
    // 8-bit unsigned PCM WAV: the header parser rejects it (bits != 16),
    // AudioSystem converts it. 4 samples at full/zero amplitude.
    val dataSize = 4
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000)
      .putInt(8000).putShort(1).putShort(8)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    b.put(255.toByte).put(255.toByte).put(128.toByte).put(128.toByte) // loud, loud, mid, mid
    val bytes = b.array()
    assert(Multimodal.decodeWav(bytes).isEmpty, "PCM16 parser must reject 8-bit")
    val (rate, samples) = Multimodal.decodeAudio(bytes).get
    assert(rate == 8000 && samples.length == 4)
    // unsigned 8-bit: 255 ≈ full positive, 128 ≈ zero
    assert(samples(0) > 0.9f && math.abs(samples(2)) < 0.02f)
    // end-to-end: resample routes through the fallback too
    val out = Multimodal.resampleWav(bytes, 4000).get
    val (r2, s2) = Multimodal.decodeWav(out).get
    assert(r2 == 4000 && s2.length == 2)
  }

  test("WAV resample is real: nearest-sample values at the new rate") {
    // 8 samples at 8000 Hz: ramp 0..7 (scaled small to dodge clamping)
    val ramp = (0 until 8).map(i => (i * 100).toShort)
    val in = wav(ramp, channels = 1, rate = 8000)
    // downsample 2x: every second sample survives
    val down = Multimodal.resampleWav(in, 4000).get
    val (r1, s1) = Multimodal.decodeWav(down).get
    assert(r1 == 4000 && s1.length == 4)
    assert(s1.map(v => math.round(v * 32767)).toSeq == Seq(0, 200, 400, 600))
    // upsample 2x: samples duplicate
    val up = Multimodal.resampleWav(in, 16000).get
    val (r2, s2) = Multimodal.decodeWav(up).get
    assert(r2 == 16000 && s2.length == 16)
    assert(math.round(s2(0) * 32767) == 0 && math.round(s2(2) * 32767) == 100)

    // distributed operator: resamples WAVs, passes through the rest
    val rows = spark.createDataFrame(Seq(
      Row(1L, "audio", in, "audio/wav", null, null, 1L),
      Row(2L, "audio", Array[Byte](9, 9), "audio/mp3", null, null, 1L)
    ).asJava, Multimodal.mediaSchema)
    val res = Multimodal.resampleAudio(spark, rows, targetRate = 4000)
      .collect().map(r => r.media_id -> r).toMap
    assert(res(1L).resampled && res(1L).out_rate == 4000 && res(1L).n_samples == 4)
    assert(!res(2L).resampled && res(2L).bytes.toSeq == Seq[Byte](9, 9))
  }

  test("malformed headers return None instead of crashing (r5 review fixes)") {
    // BMP with biHeight = Int.MinValue: abs() stays negative — must not
    // reach the array allocation
    val evilBmp = bmp(Seq(Seq((1, 2, 3))))
    val bb = java.nio.ByteBuffer.wrap(evilBmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, Int.MinValue)
    assert(Multimodal.decodeBmp(evilBmp).isEmpty)

    // WAV whose data chunk declares a near-Int.MaxValue size: the bounds
    // check must fail (long arithmetic), not wrap negative and allocate GBs
    val evilWav = wav(Seq(1, 2, 3, 4).map(_.toShort))
    val wb = java.nio.ByteBuffer.wrap(evilWav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wb.putInt(40, Int.MaxValue - 8) // 'data' chunk size field
    assert(Multimodal.decodeWav(evilWav).isEmpty)
  }

  private def mediaDf = spark.createDataFrame(Seq(
    Row(1L, "image", Array[Byte](1, 2, 3), "image/png", 4000, 1000, null),
    Row(2L, "image", Array[Byte](10, 20), "image/jpeg", 100, 50, null),
    Row(3L, "video", null, "video/mp4", 1920, 1080, 2500L),
    Row(4L, "audio", Array[Byte](-1, -2), "audio/wav", null, null, 1000L)
  ).asJava, Multimodal.mediaSchema)

  test("feature extraction runs per-partition over binary payloads") {
    val feats = Multimodal.extractFeatures(spark, mediaDf, dim = 4).collect()
    assert(feats.length == 4)
    val f1 = feats.find(_.media_id == 1L).get
    assert(f1.n_bytes == 3 && f1.feature.length == 4)
    // deterministic stub: byte k contributes (k & 0xff)/255 to slot k % dim
    assert(math.abs(f1.feature(0) - 1 / 255.0f) < 1e-6)
    val f3 = feats.find(_.media_id == 3L).get
    assert(f3.n_bytes == 0 && f3.feature.forall(_ == 0.0f))
  }

  test("feature extraction is end-to-end REAL for WAV payloads through Spark") {
    val payload = wav(Seq.fill(4)(16384.toShort) ++ Seq.fill(4)(0.toShort))
    val df = spark.createDataFrame(Seq(
      Row(7L, "audio", payload, "audio/wav", null, null, 1L)
    ).asJava, Multimodal.mediaSchema)
    val f = Multimodal.extractFeatures(spark, df, dim = 2).collect().head
    assert(f.media_id == 7L && f.n_bytes == payload.length)
    // real decode: windowed RMS of the actual samples, not the byte stub
    assert(math.abs(f.feature(0) - 0.5f) < 1e-3 && f.feature(1) < 1e-6)
  }

  test("perceptual hash: resized/re-encoded copies pair with originals, distinct images don't") {
    // smooth deterministic patterns: grid averages survive resampling, so a
    // resized/re-encoded copy hashes near its original while a different
    // pattern flips ~half the gradient signs
    def gray(v: Double) = { val c = math.max(0, math.min(255, v.toInt)); (c << 16) | (c << 8) | c }
    def pattern(w: Int, h: Int, f: (Int, Int) => Double): Array[Int] =
      Array.tabulate(w * h)(i => gray(f(i % w, i / w)))
    val w = 72; val h = 56
    val pxA = pattern(w, h, (x, y) => 128 + 100 * math.sin(x * 0.35) * math.cos(y * 0.3))
    val pxB = pattern(w, h, (x, y) => 128 + 100 * math.sin(x * 0.9 + 2) * math.cos(y * 0.7 + 1))
    val bmpA = Multimodal.encodeBmp(w, h, pxA)
    val pngA = jdkImage("png", w, h, pxA)
    val jpgA = jdkImage("jpg", w, h, pxA)
    val resizedA = Multimodal.resizeImage(bmpA, 36).get
    val bmpB = Multimodal.encodeBmp(w, h, pxB)

    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dA = Multimodal.dHash64(bmpA).get
    assert(Multimodal.dHash64(pngA).get == dA, "lossless re-encode → identical dHash")
    assert(ham(dA, Multimodal.dHash64(resizedA).get) <= 10, "2x downscale within threshold")
    assert(ham(dA, Multimodal.dHash64(jpgA).get) <= 10, "lossy jpeg within threshold")
    assert(ham(dA, Multimodal.dHash64(bmpB).get) > 10, "distinct image separates")
    assert(ham(Multimodal.aHash64(bmpA).get, Multimodal.aHash64(resizedA).get) <= 10,
      "aHash tolerates the resize too")

    // distributed candidate pairs: copies pair transitively, the distinct
    // image and the undecodable payload never appear
    val media = spark.createDataFrame(Seq(
      (1L, bmpA), (2L, resizedA), (3L, jpgA), (4L, bmpB), (5L, mp3Fixture)))
      .toDF("media_id", "bytes")
    val pairs = Multimodal.imageDupPairs(spark, media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"copies pair; distinct/undecodable don't: $pairs")
    // the quarantine channel names the refused row
    val statuses = Multimodal.perceptualHashes(spark, media)
      .collect().map(p => p.media_id -> p.status).toMap
    assert(statuses(5L) == "undecodable" && statuses(1L) == "ok")
  }

  test("resize plan computes bounded output dims without touching pixels") {
    val out: Map[Long, (Int, Int)] = Multimodal.resizePlan(mediaDf, maxSide = 1000)
      .select("media_id", "out_width", "out_height")
      .collect().flatMap(r =>
        if (r.isNullAt(1)) None
        else Some(r.getLong(0) -> ((r.getInt(1), r.getInt(2))))).toMap
    assert(out(1L) == ((1000, 250)))
    assert(out(2L) == ((100, 50)), "already under the bound: untouched")
  }

  test("frame sampling explodes one row per sampled timestamp") {
    val frames = Multimodal.frameSamplePlan(mediaDf, everyMs = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(frames.toSet == Set((3L, 0L), (3L, 1000L), (3L, 2000L)))
  }

  // hand-assembled container fixtures: header bytes only, no codec payloads
  private def mp3Fixture: Array[Byte] = {
    // ID3v2 tag (syncsafe size 0) + MPEG1 Layer III 128 kbps 44100 Hz
    // joint-stereo frame header + 1000 junk bytes
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 0)
    val frame = Array(0xFF, 0xFB, 0x90, 0x64).map(_.toByte)
    id3 ++ frame ++ Array.fill[Byte](1000)(0x55)
  }
  private def mp4Fixture: Array[Byte] = {
    def be(i: Int) = Array((i >> 24).toByte, (i >> 16).toByte, (i >> 8).toByte, i.toByte)
    val ftyp = be(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be(0)
    // mvhd v0: version/flags, ctime, mtime, timescale=1000, duration=5000
    val mvhdBody = be(0) ++ be(0) ++ be(0) ++ be(1000) ++ be(5000)
    val mvhd = be(8 + mvhdBody.length) ++ "mvhd".getBytes ++ mvhdBody
    val traks = be(8) ++ "trak".getBytes ++ be(8) ++ "trak".getBytes
    val moov = be(8 + mvhd.length + traks.length) ++ "moov".getBytes ++ mvhd ++ traks
    ftyp ++ moov
  }
  private def flacFixture: Array[Byte] = {
    // STREAMINFO: rate 44100, stereo, 441000 total samples (10 s)
    val si = new Array[Byte](34)
    si(10) = 0x0A; si(11) = 0xC4.toByte; si(12) = (0x40 | (1 << 1)).toByte
    si(13) = 0x00
    si(14) = 0x00; si(15) = 0x06; si(16) = 0xBA.toByte; si(17) = 0xA8.toByte
    "fLaC".getBytes ++ Array[Byte](0, 0, 0, 34) ++ si
  }

  private def oggFixture(idPacket: Array[Byte], granule: Long): Array[Byte] = {
    def page(gran: Long, payload: Array[Byte]): Array[Byte] = {
      val h = new Array[Byte](28)
      "OggS".getBytes.copyToArray(h, 0)
      h(5) = 2 // BOS flag on the first page; harmless on the last
      var g = gran
      for (i <- 0 until 8) { h(6 + i) = (g & 0xff).toByte; g >>= 8 }
      h(26) = 1; h(27) = payload.length.toByte
      h ++ payload
    }
    page(0L, idPacket) ++ page(granule, Array[Byte](0))
  }
  private def le32(v: Int) =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  test("ogg metadata: vorbis/opus id headers + last-page granule duration") {
    val vorbisId = Array[Byte](1) ++ "vorbis".getBytes ++ le32(0) ++
      Array[Byte](2) ++ le32(44100) ++ Array.fill[Byte](12)(0)
    val v = Multimodal.containerMetadata(oggFixture(vorbisId, granule = 441000L)).get
    assert(v.container == "ogg/vorbis" && v.channels.contains(2)
      && v.sample_rate.contains(44100) && v.duration_ms.contains(10000L))

    val opusId = "OpusHead".getBytes ++ Array[Byte](1, 2) ++
      Array[Byte](0, 0) ++ le32(48000) ++ Array.fill[Byte](3)(0)
    val o = Multimodal.containerMetadata(oggFixture(opusId, granule = 96000L)).get
    assert(o.container == "ogg/opus" && o.channels.contains(2)
      && o.duration_ms.contains(2000L), "opus granule clock is 48 kHz")
  }

  test("webm metadata: EBML walk yields doctype, duration, track count") {
    def idBytes(id: Long): Array[Byte] = {
      val n = (java.lang.Long.numberOfTrailingZeros(java.lang.Long.highestOneBit(id)) / 8) + 1
      (0 until n).reverse.map(i => ((id >> (8 * i)) & 0xff).toByte).toArray
    }
    def el(id: Long, body: Array[Byte]): Array[Byte] =
      idBytes(id) ++ Array((0x80 | body.length).toByte) ++ body
    val durBits = java.lang.Double.doubleToLongBits(5000.0)
    val dur8 = (0 until 8).reverse.map(i => ((durBits >> (8 * i)) & 0xff).toByte).toArray
    val scale3 = Array(0x0F.toByte, 0x42.toByte, 0x40.toByte) // 1_000_000 ns
    val fixture =
      el(0x1A45DFA3L, el(0x4282L, "webm".getBytes)) ++
      el(0x18538067L,
        el(0x1549A966L, el(0x2AD7B1L, scale3) ++ el(0x4489L, dur8)) ++
        el(0x1654AE6BL, el(0xAEL, Array[Byte](0)) ++ el(0xAEL, Array[Byte](0))))
    val m = Multimodal.containerMetadata(fixture).get
    assert(m.container == "matroska/webm", m.toString)
    assert(m.duration_ms.contains(5000L), "Duration x TimestampScale -> ms")
    assert(m.tracks.contains(2))
  }

  test("container metadata: real header parsing for the codecs decode() refuses") {
    val mp3 = Multimodal.containerMetadata(mp3Fixture).get
    assert(mp3.container == "mp3" && mp3.bitrate_kbps.contains(128)
      && mp3.sample_rate.contains(44100) && mp3.channels.contains(2))
    // CBR estimate: (4 + 1000 frame+junk bytes) * 8 bits / 128 kbps = 62 ms
    assert(mp3.duration_ms.contains(62L))

    val mp4 = Multimodal.containerMetadata(mp4Fixture).get
    assert(mp4.container == "mp4" && mp4.brand.contains("isom"))
    assert(mp4.duration_ms.contains(5000L), "mvhd duration/timescale -> ms")
    assert(mp4.tracks.contains(2))

    val flac = Multimodal.containerMetadata(flacFixture).get
    assert(flac.container == "flac" && flac.sample_rate.contains(44100)
      && flac.channels.contains(2) && flac.duration_ms.contains(10000L))

    assert(Multimodal.containerMetadata("not media at all".getBytes).isEmpty)
  }

  test("distributed metadata extraction: known containers parsed, rest flagged unknown") {
    val df = spark.createDataFrame(Seq(
      Row(1L, "audio", mp3Fixture, null, null, null, null),
      Row(2L, "video", mp4Fixture, null, null, null, null),
      Row(3L, "audio", "junk-payload".getBytes, null, null, null, null)
    ).asJava, Multimodal.mediaSchema)
    val got = Multimodal.extractContainerMetadata(spark, df)
      .collect().map(m => m.media_id -> m).toMap
    assert(got(1L).container == "mp3" && got(1L).bitrate_kbps.contains(128))
    assert(got(2L).container == "mp4" && got(2L).duration_ms.contains(5000L))
    assert(got(3L).container == "unknown" && got(3L).n_bytes == 12L)
  }

  test("mvhd v1 (64-bit) duration reads timescale@+20 / duration@+24 (r9 fix)") {
    def be(i: Int) = Array((i >> 24).toByte, (i >> 16).toByte, (i >> 8).toByte, i.toByte)
    def be8(v: Long) = (0 until 8).reverse.map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    val ftyp = be(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be(0)
    // mvhd v1: version(1)=1/flags(3), ctime(8), mtime(8), timescale(4)=1000,
    // duration(8)=5_000_000_000 ms-scale ticks (needs all 64 bits)
    val mvhdBody = Array[Byte](1, 0, 0, 0) ++ be8(0L) ++ be8(0L) ++
      be(1000) ++ be8(5000000000L)
    val mvhd = be(8 + mvhdBody.length) ++ "mvhd".getBytes ++ mvhdBody
    val moov = be(8 + mvhd.length) ++ "moov".getBytes ++ mvhd
    val m = Multimodal.containerMetadata(ftyp ++ moov).get
    assert(m.container == "mp4")
    assert(m.duration_ms.contains(5000000000L), s"v1 duration@+24: ${m.duration_ms}")
  }

  test("truncated/corrupt payloads with valid magic degrade to None, never throw (r9 fix)") {
    // valid ftyp magic, then a moov whose declared box runs past the payload
    def be(i: Int) = Array((i >> 24).toByte, (i >> 16).toByte, (i >> 8).toByte, i.toByte)
    val corruptMp4 = be(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be(0) ++
      be(4096) ++ "moov".getBytes ++ be(64) ++ "mvhd".getBytes // bodies missing
    // FLAC magic but truncated before STREAMINFO ends is caught by the length
    // guard; an Ogg first page declaring segments past the end is not
    val corruptOgg = "OggS".getBytes ++ new Array[Byte](22) ++ Array[Byte](40)
    // EBML magic followed by garbage vints/sizes
    val corruptMkv = Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte) ++
      Array.fill[Byte](12)(0xff.toByte)
    for (payload <- Seq(corruptMp4, corruptOgg, corruptMkv)) {
      val got = Multimodal.containerMetadata(payload) // must not throw
      assert(got.isEmpty || got.nonEmpty) // reachable = no exception escaped
    }
    // and through the distributed operator: corrupt rows become "unknown"-or-
    // parsed, the job always completes
    val df = spark.createDataFrame(Seq(
      Row(1L, "video", corruptMp4, null, null, null, null),
      Row(2L, "audio", corruptOgg, null, null, null, null),
      Row(3L, "video", corruptMkv, null, null, null, null)
    ).asJava, Multimodal.mediaSchema)
    val got = Multimodal.extractContainerMetadata(spark, df).collect()
    assert(got.length == 3)
  }

  test("MPEG Layer II frames use the Layer II bitrate table (r9 fix)") {
    // MPEG1 Layer II: sync 0xFF 0xFD (version 3, layer 2, no CRC),
    // bitrate idx 0x9 -> 160 kbps in L2 (would be 128 in the L3 table),
    // 44100 Hz, stereo
    val frame = Array(0xFF, 0xFD, 0x90, 0x44).map(_.toByte)
    val m = Multimodal.containerMetadata(frame ++ Array.fill[Byte](1000)(0x55)).get
    assert(m.container == "mp2", m.toString)
    assert(m.bitrate_kbps.contains(160), s"L2 table: ${m.bitrate_kbps}")
    assert(m.sample_rate.contains(44100))
  }

  test("extractFeatures quarantines unsupported codecs per row, not per job (r9 fix)") {
    val mp3 = "ID3".getBytes("US-ASCII") ++ new Array[Byte](16)
    val wavPayload = wav(Seq.fill(8)(16384.toShort))
    val df = spark.createDataFrame(Seq(
      Row(1L, "audio", mp3, "audio/mpeg", null, null, null),
      Row(2L, "audio", wavPayload, "audio/wav", null, null, null)
    ).asJava, Multimodal.mediaSchema)
    // the job completes despite the refused MP3 row
    val feats = Multimodal.extractFeatures(spark, df, dim = 2)
      .collect().map(f => f.media_id -> f).toMap
    val bad = feats(1L)
    assert(bad.status == "unsupported_codec" && bad.feature.isEmpty)
    assert(bad.error.exists(_.contains("no codec")), "refusal message preserved per row")
    val good = feats(2L)
    assert(good.status == "ok" && good.error.isEmpty && good.feature.length == 2)
  }

  test("AVI: avih header yields duration/streams; sniffed as unsupported; WAV RIFF untouched") {
    def le(i: Int) = Array(i.toByte, (i >> 8).toByte, (i >> 16).toByte, (i >> 24).toByte)
    // RIFF('AVI ') LIST('hdrl') avih: 40000 us/frame, 250 frames, 2 streams
    val avih = "avih".getBytes ++ le(56) ++
      le(40000) ++ le(0) ++ le(0) ++ le(0) ++ // usPerFrame, maxBps, pad, flags
      le(250) ++ le(0) ++ le(2) ++ le(0) ++   // totalFrames, initial, streams, sugBuf
      le(320) ++ le(240) ++ Array.fill[Byte](16)(0) // w, h, reserved
    val hdrl = "LIST".getBytes ++ le(4 + avih.length) ++ "hdrl".getBytes ++ avih
    val avi = "RIFF".getBytes ++ le(4 + hdrl.length) ++ "AVI ".getBytes ++ hdrl
    assert(Multimodal.sniffUnsupportedCodec(avi).contains("AVI (RIFF)"),
      "compressed AVI must be refused by decode, never stub-faked")
    val m = Multimodal.containerMetadata(avi).get
    assert(m.container == "avi")
    assert(m.duration_ms.contains(10000L), s"250 frames x 40ms: ${m.duration_ms}")
    assert(m.tracks.contains(2))
    // truncated right after the avih fourcc: degrades, never throws
    val truncated = avi.take(avi.indexOfSlice("avih".getBytes) + 6)
    assert(Multimodal.containerMetadata(truncated).isEmpty)
    // a PCM WAV is ALSO RIFF — it stays decodable, not sniffed-unsupported
    val wav = Multimodal.encodeWav(8000, Array.fill(80)(0.1f))
    assert(Multimodal.sniffUnsupportedCodec(wav).isEmpty,
      "WAV RIFF must keep decoding for real")
    assert(Multimodal.decodeWav(wav).exists(_._2.length == 80))
  }

  test("synthetic BMP corpus: within-group near-dups pair, cross-group images don't (r11 m01 fixture)") {
    import spark.implicits._
    val ids = (0L until 16L).toDF("doc_id")
    val media = Multimodal.syntheticBmpCorpus(spark, ids, "doc_id")
    // every payload is a REAL decodable BMP
    val decoded = media.collect().map(r => (r.getLong(0),
      Multimodal.decodeBmpPixels(r.getAs[Array[Byte]](1))))
    assert(decoded.forall(_._2.exists { case (w, h, px) => w == 16 && h == 16 && px.length == 256 }))
    val pairs = Multimodal.imageDupPairs(spark, media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val withinGroup = (for {
      a <- 0L until 16L; b <- (a + 1) until 16L; if a / 4 == b / 4
    } yield (a, b)).toSet
    assert(pairs == withinGroup,
      s"expected exactly the 4-blocks' within-group pairs: got ${pairs.size}, want ${withinGroup.size}")
  }

  test("synthetic WAV corpus: real decodable PCM16, deterministic, resamples clean (m02 fixture)") {
    import spark.implicits._
    val ids = (0L to 7L).toDF("doc_id")
    val corpus = Multimodal.syntheticWavCorpus(spark, ids, "doc_id",
      rate = 8000, nSamples = 800)
    val rows = corpus.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(rows.size == 8)
    // bytes are REAL RIFF/PCM16 the library's own decoder reads back
    val (rate, samples) = Multimodal.decodeWav(rows(3L)).get
    assert(rate == 8000 && samples.length == 800)
    assert(samples.exists(v => math.abs(v) > 0.3), "a sine is present, not silence")
    // deterministic: regeneration is byte-identical
    val again = Multimodal.syntheticWavCorpus(spark, ids, "doc_id",
      rate = 8000, nSamples = 800).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(rows.forall { case (id, b) => java.util.Arrays.equals(b, again(id)) })
    // the m02 path: every row resamples to half the rate and length
    val out = Multimodal.resampleAudio(spark,
        corpus.withColumn("kind", org.apache.spark.sql.functions.lit("wav")), 4000)
      .collect()
    assert(out.length == 8 && out.forall(m =>
      m.resampled && m.out_rate == 4000 && m.n_samples == 400))
  }

  test("GIF animation round-trip is real: frames, delays, and gray pixels survive encode→decode") {
    val w = 12; val h = 10
    val frames = (0 until 3).map { f =>
      Array.tabulate(w * h) { i => val v = (i * 7 + f * 40) % 256; (v << 16) | (v << 8) | v }
    }
    val bytes = Multimodal.encodeGifAnimation(w, h, frames, delayCs = 25)
    assert(bytes.take(6).map(_.toChar).mkString == "GIF89a")
    val (dw, dh, decoded, delays) = Multimodal.decodeVideoFrames(bytes).get
    assert(dw == w && dh == h && decoded.length == 3)
    assert(delays == Seq(25, 25, 25))
    // gray values are exact: the fixed 256-gray palette never quantizes
    frames.indices.foreach { f =>
      assert(decoded(f).sameElements(frames(f)), s"frame $f pixels changed")
    }
    // non-GIF payloads return None, never throw
    assert(Multimodal.decodeVideoFrames(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeVideoFrames(Multimodal.encodeWav(8000, Array(0.1f))).isEmpty)
  }

  test("video frame sampling: uniform slots, container-delay timestamps, per-row quarantine (m03)") {
    import spark.implicits._
    val good = Multimodal.encodeGifAnimation(16, 16,
      (0 until 6).map(f => Array.fill(256)((f * 40 << 16) | (f * 40 << 8) | f * 40)), delayCs = 10)
    val media = Seq((1L, good), (2L, Array[Byte](9, 9, 9))).toDF("media_id", "bytes")
    val rows = Multimodal.sampleVideoFrames(spark, media, targetFrames = 4).collect()
    val ok = rows.filter(_.status == "ok").sortBy(_.slot)
    // 6 frames sampled at 4 slots → indices j*6/4 = 0,1,3,4; ts = idx*100ms
    assert(ok.map(_.media_id).forall(_ == 1L))
    assert(ok.map(f => (f.slot, f.frame_idx, f.ts_ms)).toSeq ==
      Seq((0, 0, 0L), (1, 1, 100L), (2, 3, 300L), (3, 4, 400L)))
    assert(ok.forall(f => f.width == 16 && f.height == 16))
    val bad = rows.filter(_.status == "undecodable")
    assert(bad.length == 1 && bad.head.media_id == 2L && bad.head.slot == -1)
  }

  test("synthetic GIF corpus: deterministic real animations; within-group videos pair on every slot (m04)") {
    import spark.implicits._
    val ids = (0L until 16L).toDF("doc_id")
    val media = Multimodal.syntheticGifCorpus(spark, ids, "doc_id")
    val rows = media.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(rows.size == 16)
    // every payload is a REAL 6-frame animation the library decodes back
    val (w, h, frames, delays) = Multimodal.decodeVideoFrames(rows(5L)).get
    assert(w == 16 && h == 16 && frames.length == 6 && delays.forall(_ == 10))
    // deterministic: regeneration is byte-identical
    val again = Multimodal.syntheticGifCorpus(spark, ids, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(rows.forall { case (id, b) => java.util.Arrays.equals(b, again(id)) })
    // near-dup structure: exactly the within-4-block pairs, matched on all 4 slots
    val pairs = Multimodal.videoDupPairs(spark, media).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val withinGroup = (for {
      a <- 0L until 16L; b <- (a + 1) until 16L; if a / 4 == b / 4
    } yield (a, b)).toSet
    assert(pairs.keySet == withinGroup,
      s"expected exactly the 4-blocks' within-group pairs: got ${pairs.size}, want ${withinGroup.size}")
    assert(pairs.values.forall(_ == 4L), "group members should match on every sampled slot")
  }

  test("synthetic container corpus: real headers parse to their id-keyed parameters (m06)") {
    import spark.implicits._
    val ids = (0L until 8L).toDF("doc_id")
    val media = Multimodal.syntheticContainerCorpus(spark, ids, "doc_id")
    val got = Multimodal.extractContainerMetadata(spark, media)
      .collect().map(m => m.media_id -> m).toMap
    assert(got(0L).container == "flac" && got(0L).duration_ms.contains(1000L)
      && got(0L).sample_rate.contains(44100) && got(0L).channels.contains(2))
    assert(got(4L).container == "flac" && got(4L).duration_ms.contains(5000L),
      "duration keys off the id")
    assert(got(1L).container == "mp4" && got(1L).brand.contains("isom")
      && got(1L).duration_ms.contains(500L) && got(1L).tracks.contains(2))
    assert(got(5L).container == "mp4" && got(5L).duration_ms.contains(1500L))
    assert(got(2L).container == "mp3" && got(2L).bitrate_kbps.contains(128)
      && got(2L).sample_rate.contains(44100))
    assert(got(3L).container == "unknown" && got(3L).n_bytes > 0)
    // deterministic: regeneration is byte-identical
    val again = Multimodal.syntheticContainerCorpus(spark, ids, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val first = media.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(first.forall { case (id, b) => java.util.Arrays.equals(b, again(id)) })
  }

  test("audio fingerprint: gain-invariant, energy-order-driven, decode-robust") {
    // a two-tone signal on probe bins: the louder tone's band must win its
    // adjacent comparisons, and scaling every sample (gain) changes nothing
    val bins = Multimodal.fingerprintBins(8000)
    val n = 4096
    def tone(k: Int, amp: Double) =
      Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * k * i / n)).toFloat)
    def mix(a: Array[Float], b: Array[Float]) =
      Array.tabulate(n)(i => a(i) + b(i))
    val loudLow = mix(tone(bins(10), 0.4), tone(bins(11), 0.1))
    val fp1 = Multimodal.audioFingerprint64(8000, loudLow)
    assert((fp1 & (1L << 10)) == 0L, "bit 10 clear: band 11 quieter than band 10")
    val loudHigh = mix(tone(bins(10), 0.1), tone(bins(11), 0.4))
    val fp2 = Multimodal.audioFingerprint64(8000, loudHigh)
    assert((fp2 & (1L << 10)) != 0L, "bit 10 set: band 11 louder than band 10")
    // gain-invariance and decode-robustness need every band POPULATED —
    // empty bands compare quantization noise against quantization noise,
    // which no fingerprint can stabilize (that's why the tone corpus fills
    // the whole ladder): a full 65-tone signal with distinct amplitudes
    val full = Array.tabulate(4096) { i =>
      bins.zipWithIndex.map { case (k, j) =>
        (0.003 + 0.0003 * ((j * 29) % 64)) * math.sin(2 * math.Pi * k * i / n)
      }.sum.toFloat
    }
    val fpFull = Multimodal.audioFingerprint64(8000, full)
    // uniform gain preserves every energy ORDER comparison
    assert(Multimodal.audioFingerprint64(8000, full.map(_ * 0.5f)) == fpFull)
    // the fingerprint survives the library's own encode→decode round trip
    // (PCM16 quantization must not flip populated-band sign comparisons)
    val decoded = Multimodal.decodeWav(Multimodal.encodeWav(8000, full)).get
    assert(Multimodal.audioFingerprint64(8000, decoded._2) == fpFull)
  }

  test("synthetic tone corpus: real WAVs, deterministic; within-group audio pairs exactly (m05)") {
    import spark.implicits._
    val ids = (0L until 16L).toDF("doc_id")
    val media = Multimodal.syntheticToneCorpus(spark, ids, "doc_id")
    val rows = media.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(rows.size == 16)
    // every payload is a REAL PCM16 WAV the library decodes back
    val (rate, samples) = Multimodal.decodeWav(rows(7L)).get
    assert(rate == 8000 && samples.length == 4096)
    // deterministic: regeneration is byte-identical
    val again = Multimodal.syntheticToneCorpus(spark, ids, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(rows.forall { case (id, b) => java.util.Arrays.equals(b, again(id)) })
    // near-dup structure: exactly the within-4-block pairs
    val withBad = media.unionByName(
      Seq((99L, Array[Byte](1, 2, 3))).toDF("media_id", "bytes"))
    val fps = Multimodal.audioFingerprints(spark, withBad).collect()
    assert(fps.count(_.status == "undecodable") == 1, "quarantine row for junk bytes")
    // an extreme sample rate (<65 probe bins under Nyquist) quarantines too
    val extreme = Seq((100L, Multimodal.encodeWav(192000, Array.fill(4096)(0.1f))))
      .toDF("media_id", "bytes")
    assert(Multimodal.audioFingerprints(spark, extreme).collect()
      .forall(_.status == "undecodable"), "192 kHz quarantines, never crashes the task")
    val pairs = Multimodal.audioDupPairs(spark, withBad)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val withinGroup = (for {
      a <- 0L until 16L; b <- (a + 1) until 16L; if a / 4 == b / 4
    } yield (a, b)).toSet
    assert(pairs == withinGroup,
      s"expected exactly the 4-blocks' within-group pairs: got ${pairs.size}, want ${withinGroup.size}")
  }
}
