package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The multimodal plumbing contract: schema, per-partition batch shape, and
  * plan-level transforms are real; the decode itself is a deterministic stub
  * (no codec libs in this container — see Multimodal.decodeStub). */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

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
}
