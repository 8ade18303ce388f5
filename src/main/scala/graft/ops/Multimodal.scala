package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (brief: image/audio/video as opaque binary +
  * typed metadata). The Spark-side contract — schema, partition-friendly
  * batch shape, per-partition decode loop — is real and tested; the actual
  * media decode is STUBBED (`decodeStub`) because no image/audio codec
  * libraries exist in this container. Swap `decodeStub` for a real decoder
  * (JNI/FFI or a Pandas-UDF equivalent) without touching the pipeline shape.
  */
object Multimodal {

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
            decodeStub(bytes, dim))
        }
      }
  }

  /** Image resize contract (stub): metadata transform is real, pixel work is
    * the stubbed part. Demonstrates pushdown-friendly select shape. */
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
