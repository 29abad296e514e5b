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

  test("frame histogram counts are the stub decoder's features, un-normalized") {
    val media = Multimodal.mediaTable(spark, dir).filter(_.media_id < 20).collect()
    assert(media.nonEmpty)
    val hist = Multimodal.frameHist(spark, dir, maxMedia = 20L)
      .as[(Long, Int, Int, Long)].collect()
      .groupBy(t => (t._1, t._2)).view
      .mapValues(_.sortBy(_._3).map(_._4)).toMap
    media.foreach { m =>
      m.payload.grouped(64).take(4).zipWithIndex.foreach { case (chunk, f) =>
        val feats = Multimodal.decodeStub(chunk)
        val counts = hist((m.media_id, f))
        val n = math.max(chunk.length, 1).toFloat
        assert(counts.sum == chunk.length)
        (0 until Multimodal.FeatureDim).foreach { j =>
          assert(feats(j) == counts(j) / n, s"media ${m.media_id} frame $f bucket $j")
        }
      }
    }
  }

  test("frame sampling emits bounded deterministic frames") {
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(spark, dir)).collect()
    assert(frames.nonEmpty)
    val byMedia = frames.groupBy(_.getLong(0))
    byMedia.values.foreach(fs => assert(fs.length <= 4))
  }
}
