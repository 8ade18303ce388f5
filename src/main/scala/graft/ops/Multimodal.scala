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
      n_bytes: Long, feature: Array[Float])

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
    * UDF overhead. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("media_id", "kind", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec contexts, models)
        it.map { case (id, kind, bytes) =>
          MediaFeature(id, kind,
            if (bytes == null) 0L else bytes.length.toLong,
            decode(bytes, dim))
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

  /** Frame sampling plan for video rows: one output row per sampled frame
    * timestamp (explode of a generated sequence — a Generator, not a loop). */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video" && col("duration_ms").isNotNull)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .select("media_id", "frame_ms")
}
