package graft

import graft.multimodal.Multimodal

/** Binary-column plumbing: schema, batch shape, deterministic stub
  * features, frame sampling.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("media table schema and payload round-trip") {
    val media = Multimodal.mediaTable(spark, dir)
    val first = media.orderBy($"media_id").head()
    assert(first.payload.nonEmpty)
    assert(Set("image", "audio", "video").contains(first.kind))
  }

  test("feature extraction is deterministic, fixed-dim, normalized") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir)).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.features.length == Multimodal.FeatureDim)
      val s = f.features.sum
      assert(math.abs(s - 1.0f) < 1e-3, s"histogram should sum to ~1, got $s")
    }
    // pure function: same payload → same features
    val f2 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir)).collect()
    assert(feats.sortBy(_.media_id).map(_.features.toSeq).toSeq ==
      f2.sortBy(_.media_id).map(_.features.toSeq).toSeq)
  }

  test("frame sampling emits bounded deterministic frames") {
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(spark, dir)).collect()
    assert(frames.nonEmpty)
    val byMedia = frames.groupBy(_.getLong(0))
    byMedia.values.foreach(fs => assert(fs.length <= 4))
  }
}
