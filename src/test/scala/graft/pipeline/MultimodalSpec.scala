package graft.pipeline

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("synthesized media round-trips through mapPartitions feature extraction") {
    val media = Multimodal.synthesize(spark, 30)
    val feats = Multimodal.extractFeatures(media, frameStride = 5).collect()
    assert(feats.length == 30)
    // payload is a sha256 digest rendered to binary — 32 bytes each
    assert(feats.forall(_.n_bytes > 0))
    // frame sampling: every 5th frame of meta_frames
    val f7 = feats.find(_.media_id == 7L).get
    assert(f7.sampled_frames == (0 until 8 by 5)) // id 7 → meta_frames 8
  }

  test("feature extraction is deterministic (stable checksums)") {
    val a = Multimodal.extractFeatures(Multimodal.synthesize(spark, 10)).collect()
      .map(f => f.media_id -> f.checksum).toMap
    val b = Multimodal.extractFeatures(Multimodal.synthesize(spark, 10)).collect()
      .map(f => f.media_id -> f.checksum).toMap
    assert(a == b)
  }

  test("resize clamps to maxDim preserving aspect ratio and payload") {
    val media = Multimodal.synthesize(spark, 100)
    val resized = Multimodal.resize(media, maxDim = 32).collect()
    val orig = media.collect().map(r => r.media_id -> r).toMap
    resized.foreach { r =>
      assert(math.max(r.meta_width, r.meta_height) <= 32)
      val o = orig(r.media_id)
      assert(r.payload.sameElements(o.payload)) // payload untouched
      if (math.max(o.meta_width, o.meta_height) <= 32)
        assert(r.meta_width == o.meta_width && r.meta_height == o.meta_height)
    }
  }

  test("featureStats aggregates per kind") {
    val stats = Multimodal.featureStats(
      Multimodal.extractFeatures(Multimodal.synthesize(spark, 30)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("image" -> 10L, "audio" -> 10L, "video" -> 10L))
  }
}
