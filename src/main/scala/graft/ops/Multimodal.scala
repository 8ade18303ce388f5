package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (brief: image/audio/video as opaque binary +
  * typed metadata). The Spark-side contract — schema, partition-friendly
  * batch shape, per-partition decode loop — is real and tested.
  *
  * Decode status (r5): images are decoded FOR REAL — BMP (24-bit BI_RGB) by
  * a zero-copy header parser, and PNG/JPEG/GIF by the JDK's own
  * `javax.imageio` readers (part of `java.desktop`, zero external
  * dependencies, headless-safe). Audio is real for PCM16 WAV via the header
  * parser, with a `javax.sound.sampled` fallback that converts any
  * JDK-readable encoding (PCM8/24/32, float, a-law/µ-law WAV, AIFF, AU) to
  * PCM16. Only true video/compressed-audio codecs (MP4/MP3/...) remain on
  * `decodeStub` — the JDK has no decoder for them; swap the stub for a real
  * decoder (JNI/FFI or a Pandas-UDF equivalent) without touching the
  * pipeline shape.
  */
object Multimodal {

  // ImageIO's default scratch cache is a temp FILE per read — pure overhead
  // for byte-array payloads decoded executor-side. Headless is forced so a
  // mis-provisioned DISPLAY on a cluster node can't make AWT try to connect.
  private lazy val imageIoReady: Boolean = {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

  /** Canonical multimodal row: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  final case class MediaFeature(media_id: Long, kind: String,
      n_bytes: Long, feature: Array[Float],
      status: String = "ok", error: Option[String] = None)

  /** === STUB === deterministic fake "decode + feature extract": real
    * implementations replace this function body only. Produces a fixed-length
    * feature from the payload bytes so downstream code (similarity search,
    * dedup on features) is exercisable end-to-end. */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { out(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    }
    out
  }

  // ------------------------------------------------- real header decoders

  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** REAL decode of a 24-bit uncompressed BMP (BITMAPINFOHEADER, BI_RGB):
    * (width, height, top-down raster of 0xRRGGBB ints). Handles the
    * bottom-up row order and 4-byte row padding; negative biHeight
    * (top-down files) handled too. None on anything that isn't a
    * well-formed 24-bit BI_RGB BMP. */
  def decodeBmpPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    try {
      val dataOffset = leInt(bytes, 10)
      val width = leInt(bytes, 18)
      val rawHeight = leInt(bytes, 22)
      val bottomUp = rawHeight > 0
      val height = math.abs(rawHeight)
      val bpp = leShort(bytes, 28)
      val compression = leInt(bytes, 30)
      // height <= 0 (not == 0): abs(Int.MinValue) is still negative, and a
      // negative height would otherwise reach the array allocation
      if (width <= 0 || height <= 0 || bpp != 24 || compression != 0) return None
      // stride in LONG: width near Int.MaxValue overflows `width * 3` and a
      // negative stride would pass the size guard below and reach the
      // allocation (r5 review fix). The guard also bounds width·height: a
      // payload can't be well-formed unless all pixel bytes fit in it, so
      // width*height*3 ≤ bytes.length < 2³¹ keeps the Int allocation safe.
      val strideL = ((width.toLong * 3 + 3) / 4) * 4
      if (dataOffset < 54 || dataOffset.toLong + strideL * height > bytes.length) return None
      val stride = strideL.toInt
      val px = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val srcRow = if (bottomUp) height - 1 - y else y
        val rowOff = dataOffset + srcRow * stride
        var x = 0
        while (x < width) {
          val o = rowOff + x * 3 // pixel order on disk is B, G, R
          px(y * width + x) = ((bytes(o + 2) & 0xff) << 16) |
            ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
          x += 1
        }
        y += 1
      }
      Some((width, height, px))
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** REAL decode of PNG/JPEG/GIF (and anything else the JDK ships a reader
    * for) via `javax.imageio`: (width, height, top-down 0xRRGGBB raster).
    * Alpha is dropped so the raster shape matches [[decodeBmpPixels]].
    * None when no installed reader claims the payload. */
  def decodeJdkPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 8 || !imageIoReady) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue) return None
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var i = 0
      while (i < px.length) { px(i) &= 0xffffff; i += 1 }
      Some((w, h, px))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Format-dispatched pixel decode: the zero-copy BMP parser first (BMP is
    * the bulk-storage format this pipeline re-encodes to), then the JDK
    * readers for PNG/JPEG/GIF. */
  def decodeImagePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeBmpPixels(bytes).orElse(decodeJdkPixels(bytes))

  private def luminance(px: Array[Int]): Array[Float] = {
    val lum = new Array[Float](px.length)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      lum(i) = (0.299f * ((p >> 16) & 0xff) + 0.587f * ((p >> 8) & 0xff) +
        0.114f * (p & 0xff)) / 255.0f
      i += 1
    }
    lum
  }

  /** Luminance view of [[decodeBmpPixels]]: values in [0,1], top-down. */
  def decodeBmp(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    decodeBmpPixels(bytes).map { case (w, h, px) => (w, h, luminance(px)) }

  /** Luminance view of [[decodeImagePixels]] — real for BMP/PNG/JPEG/GIF. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    decodeImagePixels(bytes).map { case (w, h, px) => (w, h, luminance(px)) }

  /** Encode a top-down 0xRRGGBB raster as a 24-bit bottom-up BI_RGB BMP. */
  def encodeBmp(width: Int, height: Int, px: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && px.length == width * height, "bad raster")
    val stride = ((width * 3 + 3) / 4) * 4
    val out = java.nio.ByteBuffer.allocate(54 + stride * height)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + stride * height)
      .putInt(0).putInt(54)
    out.putInt(40).putInt(width).putInt(height) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0)
      .putInt(stride * height).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) { // rows bottom-up
      var x = 0
      while (x < width) {
        val p = px(y * width + x)
        out.put((p & 0xff).toByte).put(((p >> 8) & 0xff).toByte)
          .put(((p >> 16) & 0xff).toByte)
        x += 1
      }
      var pad = width * 3
      while (pad < stride) { out.put(0.toByte); pad += 1 }
      y -= 1
    }
    out.array()
  }

  /** Nearest-neighbor resample of a top-down raster so the longer side is
    * at most `maxSide` (never upscales; same scale rule as [[resizePlan]]). */
  private def nnResize(w: Int, h: Int, px: Array[Int], maxSide: Int): (Int, Int, Array[Int]) = {
    val long = math.max(w, h)
    if (long <= maxSide) (w, h, px)
    else {
      val scale = maxSide.toDouble / long
      val ow = math.max(1, math.round(w * scale).toInt)
      val oh = math.max(1, math.round(h * scale).toInt)
      val out = new Array[Int](ow * oh)
      var y = 0
      while (y < oh) {
        val sy = math.min(h - 1, y * h / oh)
        var x = 0
        while (x < ow) {
          out(y * ow + x) = px(sy * w + math.min(w - 1, x * w / ow))
          x += 1
        }
        y += 1
      }
      (ow, oh, out)
    }
  }

  /** Encode a top-down 0xRRGGBB raster as PNG via the JDK writer (lossless —
    * a [[decodeImagePixels]] round-trip returns the identical raster). */
  def encodePng(width: Int, height: Int, px: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && px.length == width * height, "bad raster")
    require(imageIoReady)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, px, 0, width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL nearest-neighbor resize of a 24-bit BMP so the longer side is at
    * most `maxSide` (never upscales). Returns a valid BMP payload; None for
    * anything [[decodeBmpPixels]] can't read. Same scale rule as
    * [[resizePlan]]. */
  def resizeBmp(bytes: Array[Byte], maxSide: Int): Option[Array[Byte]] =
    decodeBmpPixels(bytes).map { case (w, h, px) =>
      val (ow, oh, out) = nnResize(w, h, px, maxSide)
      encodeBmp(ow, oh, out)
    }

  /** REAL resize for any decodable image: BMP payloads re-encode as BMP
    * (cheap fixed-layout writer), JDK-decoded formats (PNG/JPEG/GIF)
    * re-encode as lossless PNG — resized JPEGs don't take another
    * generation loss. None when nothing can decode the payload. */
  def resizeImage(bytes: Array[Byte], maxSide: Int): Option[Array[Byte]] =
    decodeBmpPixels(bytes) match {
      case Some((w, h, px)) =>
        val (ow, oh, out) = nnResize(w, h, px, maxSide)
        Some(encodeBmp(ow, oh, out))
      case None => decodeJdkPixels(bytes).map { case (w, h, px) =>
        val (ow, oh, out) = nnResize(w, h, px, maxSide)
        encodePng(ow, oh, out)
      }
    }

  /** REAL decode of a PCM16 WAV: walks the RIFF chunk list, requires
    * fmt.audioFormat = 1 (PCM) and 16 bits/sample, mixes interleaved
    * channels down to mono. Returns (sampleRate, samples in [-1,1]). */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Float])] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    try {
      var o = 12
      var fmtOk = false
      var channels = 1
      var rate = 0
      var data: Option[(Int, Int)] = None // (offset, size)
      while (o + 8 <= bytes.length && (data.isEmpty || !fmtOk)) {
        val id = new String(bytes, o, 4, "US-ASCII")
        val size = leInt(bytes, o + 4)
        // long arithmetic: a near-Int.MaxValue declared size must fail the
        // bounds check, not wrap negative and reach a huge allocation
        if (size < 0 || o + 8L + size > bytes.length) return None
        if (id == "fmt ") {
          if (size < 16) return None
          val audioFormat = leShort(bytes, o + 8)
          channels = leShort(bytes, o + 10) max 1
          rate = leInt(bytes, o + 12)
          val bits = leShort(bytes, o + 22)
          if (audioFormat != 1 || bits != 16) return None
          fmtOk = true
        } else if (id == "data") data = Some((o + 8, size))
        o += 8 + size + (size & 1) // chunks are word-aligned
      }
      (data, fmtOk) match {
        case (Some((off, size)), true) =>
          val frameBytes = 2 * channels
          val nFrames = size / frameBytes
          val samples = new Array[Float](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0.0f
            var c = 0
            while (c < channels) {
              acc += leShort(bytes, off + f * frameBytes + c * 2).toShort / 32768.0f
              c += 1
            }
            samples(f) = acc / channels
            f += 1
          }
          Some((rate, samples))
        case _ => None
      }
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** REAL decode of any audio the JDK can read (PCM8/24/32 and float WAV,
    * a-law/µ-law, AIFF, AU) via `javax.sound.sampled`, converting to signed
    * PCM16 and mixing to mono. Fallback behind the faster PCM16 parser. */
  def decodeJdkAudio(bytes: Array[Byte]): Option[(Int, Array[Float])] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        val rate = math.round(src.getSampleRate)
        if (rate <= 0) return None
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          2 * src.getChannels, src.getSampleRate, false) // little-endian
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        try {
          val raw = pcm.readAllBytes()
          val channels = src.getChannels max 1
          val frameBytes = 2 * channels
          val nFrames = raw.length / frameBytes
          val samples = new Array[Float](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0.0f
            var c = 0
            while (c < channels) {
              acc += leShort(raw, f * frameBytes + c * 2).toShort / 32768.0f
              c += 1
            }
            samples(f) = acc / channels
            f += 1
          }
          Some((rate, samples))
        } finally pcm.close()
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Format-dispatched audio decode: the zero-copy PCM16 parser first, then
    * the JDK converters for every other JDK-readable encoding. */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Array[Float])] =
    decodeWav(bytes).orElse(decodeJdkAudio(bytes))

  /** Encode mono [-1,1] samples as a PCM16 WAV at `rate` Hz. */
  def encodeWav(rate: Int, samples: Array[Float]): Array[Byte] = {
    require(rate > 0, "bad rate")
    val dataSize = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate)
      .putInt(rate * 2).putShort(2).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) {
      val clamped = math.max(-1.0f, math.min(1.0f, samples(i)))
      out.putShort(math.round(clamped * 32767.0f).toShort)
      i += 1
    }
    out.array()
  }

  /** REAL nearest-sample resample of a PCM16 WAV to `targetRate` (stereo is
    * mixed down by the decode). Returns a valid mono PCM16 WAV; None for
    * anything [[decodeWav]] can't read. Nearest-sample (not windowed-sinc)
    * is the deterministic zero-dependency baseline — swap the inner loop
    * for a real resampler without touching the contract. */
  def resampleWav(bytes: Array[Byte], targetRate: Int): Option[Array[Byte]] = {
    require(targetRate > 0, "bad target rate")
    decodeAudio(bytes).map { case (rate, samples) =>
      if (rate == targetRate) encodeWav(rate, samples)
      else {
        val n = math.max(1, (samples.length.toLong * targetRate / rate).toInt)
        val out = new Array[Float](n)
        var j = 0
        while (j < n) {
          out(j) = samples(math.min(samples.length - 1,
            (j.toLong * rate / targetRate).toInt))
          j += 1
        }
        encodeWav(targetRate, out)
      }
    }
  }

  final case class ResampledMedia(media_id: Long, kind: String, resampled: Boolean,
      out_rate: Int, n_samples: Int, bytes: Array[Byte])

  /** Distributed audio resample over the binary column: REAL sample work
    * for any JDK-readable audio (PCM16 fast path + [[decodeJdkAudio]]
    * fallback), passthrough for formats the JDK can't decode (MP3/...).
    * Output is always mono PCM16 WAV. Same per-partition batch shape as
    * [[extractFeatures]]. */
  def resampleAudio(spark: SparkSession, media: DataFrame, targetRate: Int): Dataset[ResampledMedia] = {
    import spark.implicits._
    media.select("media_id", "kind", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          resampleWav(bytes, targetRate) match {
            case Some(out) =>
              val (rate, samples) = decodeWav(out).get // own encoder: always readable
              ResampledMedia(id, kind, resampled = true, rate, samples.length, out)
            case None => ResampledMedia(id, kind, resampled = false, -1, -1, bytes)
          }
        }
      }
  }

  /** Pool a raster/sample stream into `dim` equal buckets: mean for
    * luminance, RMS for audio energy. Deterministic ordered folds. */
  private def pool(values: Array[Float], dim: Int, rms: Boolean): Array[Float] = {
    val out = new Array[Float](dim)
    val n = values.length
    if (n == 0) return out
    var b = 0
    while (b < dim) {
      val lo = (b.toLong * n / dim).toInt
      val hi = ((b + 1).toLong * n / dim).toInt
      if (hi > lo) {
        var acc = 0.0; var i = lo
        while (i < hi) { val v = values(i); acc += (if (rms) v * v else v); i += 1 }
        val m = acc / (hi - lo)
        out(b) = (if (rms) math.sqrt(m) else m).toFloat
      }
      b += 1
    }
    out
  }

  /** Container-magic sniff for codec families the JDK cannot decode. A
    * payload carrying one of these signatures is REAL compressed media —
    * handing it to [[decodeStub]] would return plausible-looking garbage
    * features, which is strictly worse than failing. Returns the format
    * name, or None for anything unrecognized (synthetic test payloads,
    * truncated blobs) where the stub's deterministic fake remains the
    * honest "no decoder claimed this" placeholder. */
  def sniffUnsupportedCodec(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 12) return None
    def ascii(o: Int, s: String) = s.indices.forall(i => bytes(o + i) == s(i).toByte)
    if (ascii(0, "ID3")) Some("MP3 (ID3)")
    // MPEG audio frame sync: 11 set bits, then a valid (non-reserved) version
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xe0) == 0xe0 && (bytes(1) & 0x18) != 0x08)
      Some("MP3/MPEG-audio")
    else if (ascii(4, "ftyp")) Some("MP4/ISO-BMFF")
    else if (ascii(0, "OggS")) Some("Ogg")
    else if (ascii(0, "fLaC")) Some("FLAC")
    else if ((bytes(0) & 0xff) == 0x1a && (bytes(1) & 0xff) == 0x45 &&
      (bytes(2) & 0xff) == 0xdf && (bytes(3) & 0xff) == 0xa3) Some("Matroska/WebM")
    // RIFF with the AVI fourcc (NOT WAVE — PCM WAV decodes for real above)
    else if (ascii(0, "RIFF") && ascii(8, "AVI ")) Some("AVI (RIFF)")
    else None
  }

  /** Format-dispatched decode: real for BMP/PNG/JPEG/GIF (pooled luminance
    * grid) and any JDK-readable audio (pooled RMS energy). Payloads that
    * sniff as a REAL codec this environment cannot decode (MP3/MP4/Ogg/
    * FLAC/WebM — the JDK ships no decoder and the container has no codec
    * libraries) fail loudly instead of producing garbage vectors (r8);
    * `decodeStub` only covers payloads no decoder OR sniffer claims. */
  def decode(bytes: Array[Byte], dim: Int): Array[Float] =
    decodeImage(bytes).map { case (_, _, lum) => pool(lum, dim, rms = false) }
      .orElse(decodeAudio(bytes).map { case (_, samples) => pool(samples, dim, rms = true) })
      .getOrElse {
        sniffUnsupportedCodec(bytes).foreach { fmt =>
          throw new UnsupportedOperationException(
            s"payload is $fmt, and no codec for it exists in this environment " +
              "(JDK imageio/sound only — no MP3/MP4-class decoder is installed). " +
              "Refusing to emit fake features for real media; plug a real decoder " +
              "into Multimodal.decode (JNI/FFI or a Pandas-UDF equivalent) to " +
              "process this payload.")
        }
        decodeStub(bytes, dim)
      }

  /** Per-partition decode/feature-extract over the opaque binary column —
    * the `mapInPandas`-equivalent batch shape for a JVM pipeline: one
    * decoder context per partition, streaming iterator, no row-at-a-time
    * UDF overhead.
    *
    * [[decode]]'s loud refusal of undecodable real codecs is quarantined
    * PER ROW here (status = "unsupported_codec", empty feature, message in
    * `error`) instead of failing the task: at corpus scale one stray MP3
    * must not kill a 100 TB batch job, but the refusal stays visible and
    * filterable downstream (r9 advice fix). */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("media_id", "kind", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec contexts, models)
        it.map { case (id, kind, bytes) =>
          val n = if (bytes == null) 0L else bytes.length.toLong
          try MediaFeature(id, kind, n, decode(bytes, dim))
          catch {
            case e: UnsupportedOperationException =>
              MediaFeature(id, kind, n, Array.empty[Float],
                status = "unsupported_codec", error = Some(e.getMessage))
          }
        }
      }
  }

  final case class ResizedMedia(media_id: Long, kind: String, resized: Boolean,
      out_width: Int, out_height: Int, bytes: Array[Byte])

  /** Distributed image resize over the binary column: REAL pixel work for
    * BMP/PNG/JPEG/GIF payloads ([[resizeImage]]), passthrough
    * (resized = false, dims −1) for anything undecodable. Same
    * per-partition batch shape as [[extractFeatures]]. */
  def resizeImages(spark: SparkSession, media: DataFrame, maxSide: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select("media_id", "kind", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          resizeImage(bytes, maxSide) match {
            case Some(out) =>
              val (w, h, _) = decodeImagePixels(out).get // own encoders: always readable
              ResizedMedia(id, kind, resized = true, w, h, out)
            case None => ResizedMedia(id, kind, resized = false, -1, -1, bytes)
          }
        }
      }
  }

  // ------------------------------------ perceptual hashing (image near-dup)

  /** Average-pooled luminance grid (gw × gh): each cell is the MEAN
    * luminance of its pixel block, so the grid is invariant to uniform
    * resampling by construction — the property that makes a resized or
    * re-encoded copy hash near its original. Pure JDK math over the real
    * decoded raster ([[decodeImage]]). */
  private def lumaGrid(w: Int, h: Int, lum: Array[Float],
      gw: Int, gh: Int): Array[Float] = {
    val out = new Array[Float](gw * gh)
    var gy = 0
    while (gy < gh) {
      val y0 = gy * h / gh; val y1 = math.max(y0 + 1, (gy + 1) * h / gh)
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw; val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += lum(y * w + x); x += 1 }
          y += 1
        }
        out(gy * gw + gx) = (s / ((y1 - y0).toLong * (x1 - x0))).toFloat
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** 64-bit difference hash (dHash): 9×8 luminance grid, bit (row, col) set
    * when cell (row, col) < cell (row, col+1) — horizontal gradient signs,
    * the standard robust-to-resize/re-encode perceptual fingerprint. None
    * for undecodable payloads. */
  def dHash64(bytes: Array[Byte]): Option[Long] =
    decodeImage(bytes).map { case (w, h, lum) => dHashFromLum(w, h, lum) }

  private def dHashFromLum(w: Int, h: Int, lum: Array[Float]): Long = {
    val g = lumaGrid(w, h, lum, 9, 8)
    var hash = 0L
    var row = 0
    while (row < 8) {
      var c = 0
      while (c < 8) {
        if (g(row * 9 + c) < g(row * 9 + c + 1)) hash |= 1L << (row * 8 + c)
        c += 1
      }
      row += 1
    }
    hash
  }

  /** 64-bit average hash (aHash): 8×8 grid, bit set when the cell exceeds
    * the grid mean — dHash's cruder, more tolerant sibling. */
  def aHash64(bytes: Array[Byte]): Option[Long] =
    decodeImage(bytes).map { case (w, h, lum) => aHashFromLum(w, h, lum) }

  private def aHashFromLum(w: Int, h: Int, lum: Array[Float]): Long = {
    val g = lumaGrid(w, h, lum, 8, 8)
    val mean = g.sum / 64.0f
    var hash = 0L
    var i = 0
    while (i < 64) { if (g(i) > mean) hash |= 1L << i; i += 1 }
    hash
  }

  final case class ImagePHash(media_id: Long, status: String,
      dhash: Long, ahash: Long)

  /** Per-partition perceptual hashing over the binary column — the
    * [[extractFeatures]] batch shape producing (media_id, dhash, ahash),
    * with undecodable payloads quarantined per row (status), never killing
    * the task. Map-only: each row's hash derives from its own bytes. */
  def perceptualHashes(spark: SparkSession, media: DataFrame): Dataset[ImagePHash] = {
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // ONE decode feeds both hashes (r11): decode dominates per-row cost
        // and the old (dHash64, aHash64) pair decoded every payload twice
        it.map { case (id, bytes) =>
          decodeImage(bytes) match {
            case Some((w, h, lum)) =>
              ImagePHash(id, "ok", dHashFromLum(w, h, lum), aHashFromLum(w, h, lum))
            case None => ImagePHash(id, "undecodable", 0L, 0L)
          }
        }
      }
  }

  private def mix64(x0: Long): Long = { // splitmix64 finalizer (public constant)
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic BMP corpus derived from an id column — the media
    * fixture that drives the REAL encode→decode→dHash→band-join path where
    * the shipped test tables carry no binary media (the m01 driver entry;
    * MultimodalSpec pins the pair structure). Ids in the same `groupSize`
    * block render the same splitmix-seeded grayscale raster, except each
    * non-base member whitens one distinct pixel — so every block is a
    * near-dup cluster under dHash (a few flipped gradient bits) while
    * distinct blocks differ in ~32 of 64 bits. mapPartitions keeps pixel
    * buffers off the shuffle: only (media_id, bytes) rows leave the task,
    * exactly the multimodal decode contract. */
  def syntheticBmpCorpus(spark: SparkSession, ids: DataFrame, idCol: String,
      groupSize: Int = 4, side: Int = 16): DataFrame = {
    import spark.implicits._
    require(groupSize >= 1 && side >= 9, "need >=9px for a stable 9x8 dHash grid")
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val group = id / groupSize
        val member = (id % groupSize).toInt
        val px = new Array[Int](side * side)
        var i = 0
        while (i < px.length) {
          val v = (mix64(group * 0x10001L + i) & 0xff).toInt
          px(i) = (v << 16) | (v << 8) | v
          i += 1
        }
        if (member > 0) px(member) = 0xffffff
        (id, encodeBmp(side, side, px))
      }
    }.toDF("media_id", "bytes")
  }

  /** Deterministic DECODABLE PCM16 WAV corpus from ids — the audio twin of
    * [[syntheticBmpCorpus]]: each id renders an id-keyed sine (220 Hz +
    * id-dependent offset) plus seeded splitmix noise at `rate`, through the
    * library's own [[encodeWav]], so the driver exercises
    * encode → REAL RIFF/PCM16 decode → polyphase-free linear resample
    * end-to-end on real waveform bytes. */
  def syntheticWavCorpus(spark: SparkSession, ids: DataFrame, idCol: String,
      rate: Int = 8000, nSamples: Int = 800): DataFrame = {
    import spark.implicits._
    require(rate > 0 && nSamples > 0, "need a positive rate and length")
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val samples = new Array[Float](nSamples)
        val hz = 220.0 + (id % 16) * 20.0
        var i = 0
        while (i < nSamples) {
          val noise = ((mix64(id * 0x9E3779B9L + i) & 0xffff) / 65536.0f - 0.5f) * 0.1f
          samples(i) =
            (0.5 * math.sin(2 * math.Pi * hz * i / rate)).toFloat + noise
          i += 1
        }
        (id, encodeWav(rate, samples))
      }
    }.toDF("media_id", "bytes")
  }

  /** Image near-dup candidate pairs over REAL decoded pixels: 64-bit dHash
    * per image (map-only decode), then Hamming band-blocking via the SAME
    * machinery as text SimHash ([[graft.ops.Dedup.hammingBandPairs]]) —
    * complete recall for maxHamming ≤ bands − 1, shuffles carry
    * (id, 64-bit hash) only, never pixels. A resized or re-encoded copy
    * lands within a few flipped bits of its original (the grid is
    * resampling-invariant); unrelated images differ in ~32 bits.
    * maxHamming 10 is the standard dHash dup threshold; the blocking is
    * 4 bands of 16-bit slices with radius-2 probing (complete recall for
    * h ≤ 11 by generalized pigeonhole) — NOT 16 exact 4-bit bands, whose
    * 16-value bucket space degenerates to ~n² candidates at corpus scale
    * (measured: r11 ScaleProbe, 500k hashes). */
  def imageDupPairs(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 10, bands: Int = 4, probeRadius: Int = 2): DataFrame = {
    val hashes = perceptualHashes(spark, media)
      .filter(col("status") === "ok")
      .select(col("media_id").as("id"), col("dhash").as("hash"))
    Dedup.hammingBandPairs(hashes, bits = 64, maxHamming, bands, probeRadius)
  }

  /** Plan-level resize contract: metadata transform only — computes bounded
    * output dims without touching pixels (pushdown-friendly select shape);
    * [[resizeImages]] is the operator that actually moves pixels. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.withColumn("scale",
        when(greatest(col("width"), col("height")) > maxSide,
          lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
          .otherwise(lit(1.0)))
      // round, not floor: the FP ratio can undershoot by 1 ulp, which floor
      // would turn into a long side of maxSide-1
      .withColumn("out_width", round(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", round(col("height") * col("scale")).cast("int"))

  // ---------------------------------------------- container metadata (no codec)

  /** Parsed container metadata — everything here comes from HEADER bytes
    * (frame headers, box trees, STREAMINFO), never from decoding samples,
    * so it works for exactly the codecs [[decode]] honestly refuses.
    * Unknown fields are None; `n_bytes` is always real. */
  final case class MediaMeta(media_id: Long, container: String, n_bytes: Long,
      duration_ms: Option[Long], sample_rate: Option[Int], channels: Option[Int],
      bitrate_kbps: Option[Int], tracks: Option[Int], brand: Option[String])

  private def beInt(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def beLong(b: Array[Byte], o: Int): Long =
    (beInt(b, o) << 32) | beInt(b, o + 4)

  // MPEG-1/2 audio header bitrate tables, all three layers (public
  // ISO 11172-3 / 13818-3 values); index 0 = "free format", 15 = reserved.
  private val mp3BitrateV1L1 =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, 0)
  private val mp3BitrateV1L2 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 0)
  private val mp3BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val mp3BitrateV2L1 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, 0)
  private val mp3BitrateV2L23 = // MPEG-2/2.5 share one table for Layers II+III
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
  private val mp3Rates = Array(44100, 48000, 32000, 0) // MPEG1; /2 for MPEG2, /4 for 2.5

  /** MP3: skip any ID3v2 tag (syncsafe size), parse the first MPEG audio
    * frame header; duration is the CBR estimate (audio bytes × 8 / bitrate)
    * — the honest bound header bytes can give without walking every frame. */
  private def mp3Meta(bytes: Array[Byte]): Option[MediaMeta] = {
    var off = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3')
      off = 10 + (((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f))
    // scan forward to the first frame sync (tag padding / junk tolerated)
    while (off + 4 <= bytes.length &&
      !((bytes(off) & 0xff) == 0xff && (bytes(off + 1) & 0xe0) == 0xe0)) off += 1
    if (off + 4 > bytes.length) return None
    val b1 = bytes(off + 1) & 0xff; val b2 = bytes(off + 2) & 0xff; val b3 = bytes(off + 3) & 0xff
    val versionBits = (b1 >> 3) & 0x3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    val layerBits = (b1 >> 1) & 0x3   // 3=Layer I, 2=Layer II, 1=Layer III
    if (versionBits == 1 || layerBits == 0) return None
    val brIdx = (b2 >> 4) & 0xf; val srIdx = (b2 >> 2) & 0x3
    if (srIdx == 3 || brIdx == 0 || brIdx == 15) return None
    // per-layer bitrate table — applying the L3 table to L1/L2 frames would
    // silently misreport bitrate and CBR duration (r9 advice fix)
    val kbps = (versionBits, layerBits) match {
      case (3, 3) => mp3BitrateV1L1(brIdx)
      case (3, 2) => mp3BitrateV1L2(brIdx)
      case (3, _) => mp3BitrateV1L3(brIdx)
      case (_, 3) => mp3BitrateV2L1(brIdx)
      case _      => mp3BitrateV2L23(brIdx)
    }
    val rate = versionBits match {
      case 3 => mp3Rates(srIdx)
      case 2 => mp3Rates(srIdx) / 2
      case _ => mp3Rates(srIdx) / 4
    }
    val channels = if (((b3 >> 6) & 0x3) == 3) 1 else 2
    val container = layerBits match {
      case 3 => "mp1"
      case 2 => "mp2"
      case _ => "mp3"
    }
    val audioBytes = (bytes.length - off).toLong
    Some(MediaMeta(0L, container, bytes.length.toLong,
      Some(audioBytes * 8 / kbps), Some(rate), Some(channels), Some(kbps), None, None))
  }

  /** ISO-BMFF (MP4/MOV/M4A): walk the top-level box tree for `ftyp` (major
    * brand) and `moov`, then `mvhd` (timescale+duration, v0/v1) and `trak`
    * count inside it. Box sizes are big-endian; size 1 = 64-bit largesize. */
  private def mp4Meta(bytes: Array[Byte]): Option[MediaMeta] = {
    def boxes(from: Long, until: Long): Iterator[(String, Long, Long)] =
      new Iterator[(String, Long, Long)] {
        var o = from
        def hasNext: Boolean = o + 8 <= until
        def next(): (String, Long, Long) = {
          val sz0 = beInt(bytes, o.toInt)
          val tpe = new String(bytes, o.toInt + 4, 4, "ISO-8859-1")
          val (hdr, sz) =
            if (sz0 == 1 && o + 16 <= until) (16L, beLong(bytes, o.toInt + 8))
            else (8L, if (sz0 == 0) until - o else sz0)
          val body = o + hdr
          o += math.max(sz, hdr) // guard zero/corrupt sizes from looping
          (tpe, body, math.min(o, until))
        }
      }
    if (bytes.length < 12 || new String(bytes, 4, 4, "ISO-8859-1") != "ftyp") return None
    var brand: Option[String] = None
    var dur: Option[Long] = None
    var tracks = 0
    boxes(0L, bytes.length.toLong).foreach {
      case ("ftyp", body, _) =>
        brand = Some(new String(bytes, body.toInt, 4, "ISO-8859-1").trim)
      case ("moov", body, end) =>
        boxes(body, end).foreach {
          case ("mvhd", b, _) =>
            val v = bytes(b.toInt) & 0xff
            // v1 layout (ISO 14496-12): version/flags(4) + creation(8) +
            // modification(8) + timescale(4 @+20) + duration(8 @+24)
            val (ts, d) =
              if (v == 1) (beInt(bytes, b.toInt + 20), beLong(bytes, b.toInt + 24))
              else (beInt(bytes, b.toInt + 12), beInt(bytes, b.toInt + 16))
            if (ts > 0) dur = Some(d * 1000L / ts)
          case ("trak", _, _) => tracks += 1
          case _ =>
        }
      case _ =>
    }
    Some(MediaMeta(0L, "mp4", bytes.length.toLong, dur, None, None, None,
      if (tracks > 0) Some(tracks) else None, brand))
  }

  /** FLAC: STREAMINFO is the mandatory first metadata block — sample rate
    * (20 bits), channels (3 bits + 1), total samples (36 bits) at fixed bit
    * offsets; duration = samples / rate. */
  private def flacMeta(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 42 || new String(bytes, 0, 4, "ISO-8859-1") != "fLaC") return None
    val b = 8 // block header (4) after the magic; STREAMINFO body starts here
    val rate = ((bytes(b + 10) & 0xff) << 12) | ((bytes(b + 11) & 0xff) << 4) |
      ((bytes(b + 12) & 0xf0) >> 4)
    val channels = ((bytes(b + 12) & 0x0e) >> 1) + 1
    val totalSamples = ((bytes(b + 13) & 0x0fL) << 32) | (beInt(bytes, b + 14) & 0xffffffffL)
    if (rate == 0) return None
    Some(MediaMeta(0L, "flac", bytes.length.toLong,
      Some(totalSamples * 1000L / rate), Some(rate), Some(channels), None, None, None))
  }

  private def leLong(b: Array[Byte], o: Int): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
    v
  }

  /** Ogg: the identification header rides the first page's payload
    * (`\x01vorbis` → channels + rate; `OpusHead` → channels, 48 kHz granule
    * clock); stream duration comes from the LAST page's granule position
    * (sample count by spec). The last-page scan searches for the final
    * `OggS` capture pattern — an in-payload false positive would misread
    * granule, so this is documented as an estimate, like MP3's CBR math. */
  private def oggMeta(bytes: Array[Byte]): Option[MediaMeta] = {
    def ascii(o: Int, s: String) =
      o + s.length <= bytes.length && s.indices.forall(i => bytes(o + i) == s(i).toByte)
    if (!ascii(0, "OggS") || bytes.length < 28) return None
    val nsegs = bytes(26) & 0xff
    val payload = 27 + nsegs
    var brand = "ogg"; var rate: Option[Int] = None; var channels: Option[Int] = None
    var granuleRate = 0L
    if (ascii(payload, "\u0001vorbis")) {
      brand = "ogg/vorbis"
      channels = Some(bytes(payload + 11) & 0xff)
      val r = leInt(bytes, payload + 12)
      if (r > 0) { rate = Some(r); granuleRate = r.toLong }
    } else if (ascii(payload, "OpusHead")) {
      brand = "ogg/opus"
      channels = Some(bytes(payload + 9) & 0xff)
      rate = Some(leInt(bytes, payload + 12)) // original input rate (informative)
      granuleRate = 48000L // Opus granule clock is 48 kHz regardless of rate
    }
    var last = -1; var o = bytes.length - 27
    while (o >= 0 && last < 0) { if (ascii(o, "OggS")) last = o; o -= 1 }
    val dur =
      if (last >= 0 && granuleRate > 0 && last + 14 <= bytes.length) {
        val granule = leLong(bytes, last + 6)
        if (granule >= 0) Some(granule * 1000L / granuleRate) else None
      } else None
    Some(MediaMeta(0L, brand, bytes.length.toLong, dur, rate, channels, None, None, None))
  }

  /** Matroska/WebM (EBML): vint-walk the element tree — DocType from the
    * EBML header, then Segment → Info → TimestampScale (uint ns, default
    * 10^6) and Duration (float, in scale units) → milliseconds. Track count
    * from Tracks → TrackEntry. Element IDs keep their marker bit; sizes
    * strip it (the spec's asymmetry, easy to get wrong). */
  private def mkvMeta(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 8 || (bytes(0) & 0xff) != 0x1a || (bytes(1) & 0xff) != 0x45 ||
      (bytes(2) & 0xff) != 0xdf || (bytes(3) & 0xff) != 0xa3) return None
    // returns (value, bytesConsumed); keepMarker for IDs, not for sizes
    def vint(o: Int, keepMarker: Boolean): Option[(Long, Int)] = {
      if (o >= bytes.length) return None
      val first = bytes(o) & 0xff
      if (first == 0) return None
      val len = Integer.numberOfLeadingZeros(first) - 23 // 1..8
      if (o + len > bytes.length) return None
      var v = if (keepMarker) first.toLong else (first & ((1 << (8 - len)) - 1)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (bytes(o + i) & 0xffL); i += 1 }
      Some((v, len))
    }
    def uintAt(o: Int, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (bytes(o + i) & 0xffL); i += 1 }
      v
    }
    var docType: Option[String] = None
    var scaleNs = 1000000L
    var durScaled: Option[Double] = None
    var tracks = 0
    def walk(from: Int, until: Int, inInfo: Boolean, inTracks: Boolean): Unit = {
      var o = from
      while (o < until) {
        val id = vint(o, keepMarker = true).getOrElse(return)
        val sz = vint(o + id._2, keepMarker = false).getOrElse(return)
        val body = o + id._2 + sz._2
        val end = math.min(until, body + math.min(sz._1, Int.MaxValue).toInt)
        id._1 match {
          case 0x1A45DFA3L => walk(body, end, inInfo = false, inTracks = false) // EBML header
          case 0x4282L => docType = Some(new String(bytes, body, (end - body), "ISO-8859-1"))
          case 0x18538067L => walk(body, end, inInfo = false, inTracks = false) // Segment
          case 0x1549A966L => walk(body, end, inInfo = true, inTracks = false)  // Info
          case 0x1654AE6BL => walk(body, end, inInfo = false, inTracks = true)  // Tracks
          case 0x2AD7B1L if inInfo => scaleNs = uintAt(body, end - body)
          case 0x4489L if inInfo =>
            durScaled = Some((end - body) match {
              case 4 => java.lang.Float.intBitsToFloat(uintAt(body, 4).toInt).toDouble
              case _ => java.lang.Double.longBitsToDouble(uintAt(body, 8))
            })
          case 0xAEL if inTracks => tracks += 1
          case _ =>
        }
        o = end
      }
    }
    walk(0, bytes.length, inInfo = false, inTracks = false)
    val dur = durScaled.collect { case d if scaleNs > 0 => (d * scaleNs / 1e6).round }
    Some(MediaMeta(0L, docType.map(t => s"matroska/$t").getOrElse("matroska"),
      bytes.length.toLong, dur, None, None, None,
      if (tracks > 0) Some(tracks) else None, docType))
  }

  /** RIFF AVI main header (`avih` chunk inside the `hdrl` LIST; all fields
    * little-endian per the RIFF convention): frame period × frame count →
    * duration, `dwStreams` → track count. The chunk is located by a bounded
    * forward scan (≤512 bytes) rather than a strict LIST walk — real AVI
    * muxers pad the header area, and the scan cannot false-positive inside
    * media data because it never leaves the header region. */
  private def aviMeta(bytes: Array[Byte]): Option[MediaMeta] = {
    def ascii(o: Int, s: String) = o + s.length <= bytes.length &&
      s.indices.forall(i => bytes(o + i) == s(i).toByte)
    if (!(ascii(0, "RIFF") && ascii(8, "AVI "))) return None
    val limit = math.max(0, math.min(bytes.length - 4, 512))
    (12 until limit).find(o => ascii(o, "avih")).flatMap { o =>
      val body = o + 8 // fourcc + chunk size
      if (body + 28 > bytes.length) None
      else {
        val usPerFrame = leInt(bytes, body)
        val totalFrames = leInt(bytes, body + 16)
        val streams = leInt(bytes, body + 24)
        val dur =
          if (usPerFrame > 0 && totalFrames > 0)
            Some(totalFrames.toLong * usPerFrame / 1000L) // Int×Int overflows real AVIs
          else None
        Some(MediaMeta(0L, "avi", bytes.length.toLong, dur, None, None, None,
          Some(streams), None))
      }
    }
  }

  /** Container metadata WITHOUT decoding: real header/box parsing for EVERY
    * codec family [[decode]] refuses (MP3, ISO-BMFF, FLAC, Ogg Vorbis/Opus,
    * Matroska/WebM, AVI), None for payloads no sniffer claims. This is the
    * 100 TB-pipeline ordering: metadata filters (duration/bitrate/track
    * gates) run over every row as cheap byte parsing; expensive sample
    * decode runs only on survivors. */
  def containerMetadata(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null || bytes.length < 12) return None
    // the sub-parsers read untrusted bytes past a magic check; a truncated or
    // corrupt payload with valid magic must degrade to None ("unknown" row),
    // never throw out of a mapPartitions and fail the whole job (r9 advice
    // fix — one bad row must not kill a 100 TB batch)
    def safe(p: => Option[MediaMeta]): Option[MediaMeta] =
      try p catch { case scala.util.control.NonFatal(_) => None }
    safe(mp4Meta(bytes))
      .orElse(safe(mp3Meta(bytes).filter(_ => sniffUnsupportedCodec(bytes).exists(_.startsWith("MP3")))))
      .orElse(safe(flacMeta(bytes)))
      .orElse(safe(oggMeta(bytes)))
      .orElse(safe(mkvMeta(bytes)))
      .orElse(safe(aviMeta(bytes)))
  }

  /** Distributed metadata extraction over the binary column — same
    * per-partition batch shape as [[extractFeatures]]; rows whose payload is
    * no known container yield container = "unknown" with byte size only. */
  def extractContainerMetadata(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          containerMetadata(bytes).map(_.copy(media_id = id)).getOrElse(
            MediaMeta(id, "unknown", if (bytes == null) 0L else bytes.length.toLong,
              None, None, None, None, None, None))
        }
      }
  }

  /** Frame sampling plan for video rows: one output row per sampled frame
    * timestamp (explode of a generated sequence — a Generator, not a loop). */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video" && col("duration_ms").isNotNull)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .select("media_id", "frame_ms")

  // ------------------------------------------- video (multi-frame) pixel path

  /** 256-entry grayscale palette — synthetic video frames are written as
    * TYPE_BYTE_INDEXED against this fixed palette so the GIF writer never
    * has to quantize: encode → decode round-trips gray values exactly. */
  private lazy val grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate[Byte](256)(i => i.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Encode frames (top-down 0xRRGGBB rasters, equal dims) as a REAL
    * animated GIF89a via the JDK's own sequence writer, with a per-frame
    * GraphicControlExtension carrying `delayCs` (centiseconds — GIF's
    * native tick). The output is a standard animation any GIF decoder
    * plays; [[decodeVideoFrames]] reads the same bytes back including the
    * per-frame delays. Rasters are palettized against the fixed gray ramp
    * (videos here are luminance fixtures; dHash only reads luminance). */
  def encodeGifAnimation(width: Int, height: Int, frames: Seq[Array[Int]],
      delayCs: Int): Array[Byte] = {
    require(imageIoReady && frames.nonEmpty && delayCs >= 0, "bad animation")
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { px =>
        require(px.length == width * height, "raster/dims mismatch")
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var i = 0
        while (i < px.length) {
          // luminance of the RGB pixel → gray palette index
          val r = (px(i) >>> 16) & 0xff; val g = (px(i) >>> 8) & 0xff; val b = px(i) & 0xff
          raster.setSample(i % width, i / width, 0,
            math.round(0.299f * r + 0.587f * g + 0.114f * b))
          i += 1
        }
        val spec = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
        val meta = writer.getDefaultImageMetadata(spec, writer.getDefaultWriteParam)
        val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
        val root = meta.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        def node(name: String) = new javax.imageio.metadata.IIOMetadataNode(name)
        // the default metadata carries NO LocalColorTable, so the sequence
        // writer would fall back to the stream's default 216-color global
        // palette and silently re-map every gray (measured: this round) —
        // embed the exact gray ramp per frame. DTD child order is
        // ImageDescriptor, LocalColorTable, GraphicControlExtension, …
        Seq("LocalColorTable", "GraphicControlExtension").foreach { t =>
          // IIOMetadataNode.getElementsByTagName returns a SNAPSHOT list —
          // removing from it never shrinks getLength; detach each item
          // from its own parent instead
          val old = root.getElementsByTagName(t)
          (0 until old.getLength).map(old.item).foreach { n =>
            val p = n.getParentNode
            if (p != null) p.removeChild(n)
          }
        }
        val lct = node("LocalColorTable")
        lct.setAttribute("sizeOfLocalColorTable", "256")
        lct.setAttribute("sortFlag", "FALSE")
        (0 until 256).foreach { v =>
          val e = node("ColorTableEntry")
          e.setAttribute("index", v.toString)
          e.setAttribute("red", v.toString)
          e.setAttribute("green", v.toString)
          e.setAttribute("blue", v.toString)
          lct.appendChild(e)
        }
        val gce = node("GraphicControlExtension")
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", delayCs.toString)
        val descs = root.getElementsByTagName("ImageDescriptor")
        val anchor = if (descs.getLength > 0) descs.item(0).getNextSibling else null
        root.insertBefore(lct, anchor)
        root.insertBefore(gce, anchor)
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** REAL multi-frame decode of an animated GIF: every frame is composited
    * onto the running canvas at its ImageDescriptor offset (disposal "none"
    * semantics — the common animation case; restore-to-background/previous
    * are not honored), and each frame's GraphicControlExtension delay is
    * returned in centiseconds (0 when absent). Canvas dims come from frame
    * 0. Returns None for anything that is not a JDK-readable GIF. */
  def decodeVideoFrames(bytes: Array[Byte]): Option[(Int, Int, Seq[Array[Int]], Seq[Int])] = {
    if (bytes == null || bytes.length < 6 || !imageIoReady) return None
    if (!(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        if (n <= 0) return None
        val w = reader.getWidth(0); val h = reader.getHeight(0)
        val canvas = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val gfx = canvas.createGraphics()
        val frames = Vector.newBuilder[Array[Int]]
        val delays = Vector.newBuilder[Int]
        var i = 0
        while (i < n) {
          val frame = reader.read(i)
          var left = 0; var top = 0; var delayCs = 0
          val meta = reader.getImageMetadata(i)
          val root = meta.getAsTree(meta.getNativeMetadataFormatName)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val desc = root.getElementsByTagName("ImageDescriptor")
          if (desc.getLength > 0) {
            val d = desc.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            left = d.getAttribute("imageLeftPosition").toInt
            top = d.getAttribute("imageTopPosition").toInt
          }
          val gce = root.getElementsByTagName("GraphicControlExtension")
          if (gce.getLength > 0)
            delayCs = gce.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
              .getAttribute("delayTime").toInt
          gfx.drawImage(frame, left, top, null)
          frames += canvas.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xffffff)
          delays += delayCs
          i += 1
        }
        gfx.dispose()
        Some((w, h, frames.result(), delays.result()))
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  final case class VideoFrame(media_id: Long, frame_idx: Int, slot: Int,
      ts_ms: Long, width: Int, height: Int, dhash: Long, status: String)

  /** Distributed uniform frame sampling over the binary video column: REAL
    * multi-frame decode ([[decodeVideoFrames]]), then `targetFrames` evenly
    * spaced frames per video (all frames when the video is shorter), each
    * hashed with the SAME 64-bit dHash as the still-image path and stamped
    * with its timestamp from the container's own per-frame delays. One row
    * per sampled frame; undecodable payloads yield a single quarantine row
    * (status = "undecodable") instead of failing the task — the multimodal
    * per-row quarantine contract. Pixels never leave the task: only
    * (id, slot, ts, 64-bit hash) rows exist downstream. */
  def sampleVideoFrames(spark: SparkSession, media: DataFrame,
      targetFrames: Int): Dataset[VideoFrame] = {
    import spark.implicits._
    require(targetFrames >= 1, "need targetFrames >= 1")
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeVideoFrames(bytes) match {
            case Some((w, h, frames, delays)) =>
              val n = frames.length
              val startMs = delays.scanLeft(0L)((acc, d) => acc + d * 10L)
              val take = math.min(targetFrames, n)
              (0 until take).map { j =>
                val idx = (j.toLong * n / take).toInt // strictly increasing for take <= n
                val lum = luminance(frames(idx))
                VideoFrame(id, idx, j, startMs(idx), w, h,
                  dHashFromLum(w, h, lum), "ok")
              }
            case None =>
              Seq(VideoFrame(id, -1, -1, -1L, -1, -1, 0L, "undecodable"))
          }
        }
      }
  }

  /** Video near-dup pairs from temporally-aligned sampled frames: two
    * videos are candidates when the SAME sample slot's dHashes fall within
    * `maxHamming` bits, and a pair survives with ≥ `minMatchingSlots` such
    * slots. Blocking reuses [[graft.ops.Dedup.hammingBandPairs]] verbatim —
    * the frame key packs (video, slot) into one long (slot < 1024 by
    * construction: slots are bounded by `targetFrames`), so the shuffle
    * stays 16 bytes/row and per-slot alignment is a residual filter on the
    * packed ids, never a second join. A re-encoded or lightly-edited copy
    * matches on most slots; unrelated videos share none. */
  def videoDupPairs(spark: SparkSession, media: DataFrame,
      targetFrames: Int = 4, maxHamming: Int = 10,
      bands: Int = 4, probeRadius: Int = 2,
      minMatchingSlots: Int = 2): DataFrame = {
    require(targetFrames >= 1 && targetFrames <= 1024, "targetFrames bounds the slot count")
    require(minMatchingSlots >= 1 && minMatchingSlots <= targetFrames,
      "minMatchingSlots must be within the sampled slot count")
    // The slot rides IN the band-bucket key (hammingBandPairs keyCols)
    // instead of the old pack-into-id + post-join pmod filter: cross-slot
    // candidates — which the residual filter discarded anyway — are never
    // generated, so the band join's output and Hamming verifies shrink by
    // the slot fan-out (r16 opt, guide §3.3). Same pair set by
    // construction: a pair survived before iff both frames shared the slot.
    val frames = sampleVideoFrames(spark, media, targetFrames)
      .filter(col("status") === "ok")
      .select(col("media_id").as("id"), col("slot"), col("dhash").as("hash"))
    Dedup.hammingBandPairs(frames, bits = 64, maxHamming, bands, probeRadius,
        keyCols = Seq("slot"))
      .select(col("id_a").as("video_a"), col("id_b").as("video_b"))
      .groupBy("video_a", "video_b")
      .agg(count(lit(1)).as("matching_slots"))
      .filter(col("matching_slots") >= minMatchingSlots)
  }

  /** Deterministic animated-GIF corpus from ids — the video member of the
    * synthetic media trio ([[syntheticBmpCorpus]], [[syntheticWavCorpus]]):
    * ids in one `groupSize` block share per-slot base rasters (splitmix
    * seeded by (group, frame)), each non-base member whitening one
    * member-distinct pixel per frame — every block is a near-dup cluster on
    * EVERY sample slot, distinct blocks differ by ~32 dHash bits per slot.
    * Encoded through the library's own [[encodeGifAnimation]] so the driver
    * exercises encode → REAL multi-frame GIF decode → per-slot dHash →
    * band join end-to-end on real animation bytes. */
  def syntheticGifCorpus(spark: SparkSession, ids: DataFrame, idCol: String,
      groupSize: Int = 4, side: Int = 16, nFrames: Int = 6,
      delayCs: Int = 10): DataFrame = {
    import spark.implicits._
    require(groupSize >= 1 && side >= 9 && nFrames >= 1, "bad corpus params")
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val group = id / groupSize
        val member = (id % groupSize).toInt
        val frames = (0 until nFrames).map { f =>
          val px = new Array[Int](side * side)
          var i = 0
          while (i < px.length) {
            val v = (mix64((group * 131 + f) * 0x10001L + i) & 0xff).toInt
            px(i) = (v << 16) | (v << 8) | v
            i += 1
          }
          if (member > 0) px(member) = 0xffffff
          px
        }
        (id, encodeGifAnimation(side, side, frames, delayCs))
      }
    }.toDF("media_id", "bytes")
  }

  /** Deterministic container-header corpus — the metadata fixture (m06):
    * ids rotate through REAL minimal FLAC (STREAMINFO, id-keyed duration),
    * MP4 (ftyp + moov/mvhd, id-keyed duration, two traks), MP3 (ID3 +
    * MPEG1 Layer III 128 kbps frame header + id-keyed payload → id-keyed
    * CBR duration estimate) and deliberate junk — every dispatch arm of
    * [[extractContainerMetadata]] including the quarantine one. Headers
    * follow the public container layouts byte-for-byte. */
  def syntheticContainerCorpus(spark: SparkSession, ids: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      def be(i: Int) = Array((i >> 24).toByte, (i >> 16).toByte, (i >> 8).toByte, i.toByte)
      it.map { id =>
        val bytes = (id % 4) match {
          case 0 => // FLAC: 44100 Hz stereo, (id%20+1) seconds of samples
            val total = (id % 20 + 1) * 44100L
            val si = new Array[Byte](34)
            si(10) = 0x0A; si(11) = 0xC4.toByte // rate 44100 in 20 bits
            si(12) = (0x40 | (1 << 1)).toByte   // rate low nibble, 2 channels
            si(13) = ((total >> 32) & 0x0f).toByte
            be((total & 0xffffffffL).toInt).copyToArray(si, 14)
            "fLaC".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 34) ++ si
          case 1 => // MP4: mvhd v0, timescale 1000, duration (id%30+1)*250 ms
            val ftyp = be(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be(0)
            val mvhdBody = be(0) ++ be(0) ++ be(0) ++ be(1000) ++ be(((id % 30) + 1).toInt * 250)
            val mvhd = be(8 + mvhdBody.length) ++ "mvhd".getBytes ++ mvhdBody
            val traks = be(8) ++ "trak".getBytes ++ be(8) ++ "trak".getBytes
            ftyp ++ be(8 + mvhd.length + traks.length) ++ "moov".getBytes ++ mvhd ++ traks
          case 2 => // MP3: ID3v2 + 128 kbps 44.1 kHz frame + id-keyed payload
            val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 0)
            val frame = Array(0xFF, 0xFB, 0x90, 0x64).map(_.toByte)
            id3 ++ frame ++ Array.fill[Byte](((id % 5) + 1).toInt * 200)(0x55)
          case _ => s"junk-payload-$id".getBytes("UTF-8")
        }
        (id, bytes)
      }
    }.toDF("media_id", "bytes")
  }

  // ------------------------------------------------- audio fingerprint (m05)

  /** Analysis window for [[audioFingerprint64]]: fixed 4096 samples, so the
    * probe frequencies are exact DFT bins (integer k ⇒ ladder tones are
    * orthogonal over the window — zero spectral leakage between probes). */
  private val FpWindow = 4096

  /** Probe-frequency ladder: 65 log-spaced INTEGER DFT bins between
    * ~300 Hz and min(3000, 0.45·rate) Hz — the Haitsma–Kálmán band layout
    * (ISMIR 2002, public) with bins instead of filterbanks, rounded up to
    * strictly increasing so adjacent probes never coincide. */
  private[ops] def fingerprintBins(rate: Int): Array[Int] = {
    val kLo = math.max(1, math.ceil(300.0 * FpWindow / rate).toInt)
    val kHi = math.min(FpWindow / 2 - 1,
      math.floor(math.min(3000.0, 0.45 * rate) * FpWindow / rate).toInt)
    require(kHi >= kLo + 64, s"rate $rate leaves <65 probe bins in [$kLo,$kHi]")
    val bins = Array.tabulate(65)(j =>
      math.round(kLo * math.pow(kHi.toDouble / kLo, j / 64.0)).toInt)
    var j = 1
    while (j < 65) { if (bins(j) <= bins(j - 1)) bins(j) = bins(j - 1) + 1; j += 1 }
    bins
  }

  /** Goertzel energy at DFT bin `k` over the first `n` samples — O(n) per
    * probe, no FFT dependency; n is capped by the caller at [[FpWindow]]. */
  private def goertzelEnergy(samples: Array[Float], n: Int, k: Int): Double = {
    val w = 2.0 * math.Pi * k / FpWindow
    val cw = 2.0 * math.cos(w)
    var s1 = 0.0; var s2 = 0.0
    var i = 0
    while (i < n) {
      val s0 = samples(i) + cw * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - cw * s1 * s2
  }

  /** 64-bit audio fingerprint: Goertzel energies at the 65-bin probe ladder
    * over the first [[FpWindow]] samples, bit j set when band j+1 carries
    * more energy than band j — the sign-of-spectral-slope fingerprint
    * (Haitsma–Kálmán), robust to uniform gain, re-encoding, and PCM16
    * quantization because only energy ORDER matters. Same 64-bit contract
    * as the image dHash, so blocking reuses the one Hamming band join. */
  def audioFingerprint64(rate: Int, samples: Array[Float]): Long = {
    val bins = fingerprintBins(rate)
    val n = math.min(samples.length, FpWindow)
    val e = bins.map(goertzelEnergy(samples, n, _))
    var fp = 0L
    var j = 0
    while (j < 64) { if (e(j + 1) > e(j)) fp |= 1L << j; j += 1 }
    fp
  }

  final case class AudioFp(media_id: Long, status: String, fp: Long)

  /** Per-partition audio fingerprinting over the binary column — the
    * [[perceptualHashes]] batch shape for sound: decode ([[decodeAudio]]:
    * PCM16 fast path, JDK converters behind it), fingerprint, quarantine
    * undecodable rows per-row. Map-only; waveforms never leave the task —
    * only (media_id, 64-bit fp) rows exist downstream. */
  def audioFingerprints(spark: SparkSession, media: DataFrame): Dataset[AudioFp] = {
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeAudio(bytes) match {
            case Some((rate, samples)) if samples.nonEmpty =>
              // quarantine, never crash: an extreme sample rate can leave
              // fewer than 65 probe bins under Nyquist (fingerprintBins
              // requires the full ladder)
              scala.util.Try(audioFingerprint64(rate, samples))
                .fold(_ => AudioFp(id, "undecodable", 0L), AudioFp(id, "ok", _))
            case _ => AudioFp(id, "undecodable", 0L)
          }
        }
      }
  }

  /** Audio near-dup candidate pairs over REAL decoded waveforms: 64-bit
    * spectral-sign fingerprint per clip, then the SAME Hamming band
    * machinery as images (m01) and text SimHash (d07) —
    * [[graft.ops.Dedup.hammingBandPairs]], 4×16-bit bands with radius-2
    * probing (complete recall for hamming ≤ 11). A re-encoded, resampled,
    * or gain-shifted copy keeps its energy ordering and lands within a few
    * bits; unrelated audio differs in ~32. Shuffles carry 16 bytes/row. */
  def audioDupPairs(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 10, bands: Int = 4, probeRadius: Int = 2): DataFrame = {
    val fps = audioFingerprints(spark, media)
      .filter(col("status") === "ok")
      .select(col("media_id").as("id"), col("fp").as("hash"))
    Dedup.hammingBandPairs(fps, bits = 64, maxHamming, bands, probeRadius)
  }

  /** Deterministic tone-ladder WAV corpus — the audio near-dup fixture
    * (the trio's [[syntheticBmpCorpus]] analog for m05): every id in a
    * `groupSize` block synthesizes the SAME 65-tone mix, one tone per
    * fingerprint probe bin with a group-seeded 64-level amplitude ladder
    * (energy ORDER across adjacent bins ⇒ the fingerprint bits), plus a
    * tiny id-seeded noise floor — so block members land within a few
    * fingerprint bits (only exact amplitude ties flip) while distinct
    * blocks differ in ~32. Tones sit ON the probe bins, so the synthesis
    * is orthogonal to the analysis: each probe's energy is (N·a/2)² exactly
    * and the pair structure is provable, not tuned. Encoded through the
    * library's own [[encodeWav]] — the driver exercises synth → REAL
    * PCM16 decode → Goertzel → band join end-to-end. */
  def syntheticToneCorpus(spark: SparkSession, ids: DataFrame, idCol: String,
      groupSize: Int = 4, rate: Int = 8000): DataFrame = {
    import spark.implicits._
    require(groupSize >= 1, "bad corpus params")
    val bins = fingerprintBins(rate)
    // The 65-tone mix is GROUP-keyed (amps seed on id / groupSize); only the
    // tiny noise floor is id-keyed. Co-locate and order each group's members
    // (one slim shuffle of longs + an in-partition long sort) so the 65×4096
    // mul-add accumulation — the dominant term of the synthesis, measured
    // r16 opt: the synth stage was ~50 CPU-s at sf0.1 — runs once per GROUP
    // and members reuse the base signal; per-id work drops to the noise add
    // + WAV encode. Bit-identical output: acc·scale was already identical
    // across members, it is now computed once instead of groupSize times
    // (guide §1.2 step 2 — per-task work, after the job shape is right).
    ids.select(col(idCol).cast("long").as("_tid"))
      .repartition(expr(s"_tid div $groupSize")) // integer floor-div group key
      .sortWithinPartitions("_tid")
      .as[Long].mapPartitions { it =>
      // the 65×4096 tone matrix is id-independent — synthesize it ONCE per
      // partition (266k sins) instead of per clip (sin dominated the naive
      // loop: ~13G transcendental calls across a 50k-doc fixture)
      val tones = Array.tabulate(65, FpWindow)((j, i) =>
        math.sin(2.0 * math.Pi * bins(j) * i / FpWindow))
      var curGroup = Long.MinValue
      val base = new Array[Double](FpWindow)
      it.map { id =>
        val group = id / groupSize
        if (group != curGroup) {
          // 64 amplitude levels, min adjacent-level energy gap far above the
          // noise floor (ties at p=1/64 per adjacent pair are the only
          // within-group bit flips)
          val amps = Array.tabulate(65)(j =>
            0.15 + 0.0125 * ((mix64(group * 131L + j) >>> 8) & 63L))
          val scale = 0.8 / amps.sum
          var i = 0
          while (i < FpWindow) {
            var acc = 0.0
            var j = 0
            while (j < 65) {
              acc += amps(j) * tones(j)(i)
              j += 1
            }
            base(i) = acc * scale
            i += 1
          }
          curGroup = group
        }
        val samples = new Array[Float](FpWindow)
        var i = 0
        while (i < FpWindow) {
          val noise = ((mix64(id * 0x9E3779B9L + i) & 0xffff) / 65536.0 - 0.5) * 0.002
          samples(i) = (base(i) + noise).toFloat
          i += 1
        }
        (id, encodeWav(rate, samples))
      }
    }.toDF("media_id", "bytes")
  }
}
