package graft.pipeline

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def fixtureBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/fixture_12x8.png")
    try in.readAllBytes() finally in.close()
  }

  test("synthesized media round-trips through mapPartitions feature extraction") {
    val media = Multimodal.synthesize(spark, 30)
    val feats = Multimodal.extractFeatures(media, frameStride = 5).collect()
    assert(feats.length == 30)
    assert(feats.forall(_.n_bytes > 0))
    // video (no pure-JVM codec): FakeCodec path, declared frames, not decoded
    val f2 = feats.find(_.media_id == 2L).get // id 2 → video, meta_frames 3
    assert(!f2.decoded && f2.sampled_frames == (0 until 3 by 5))
    // audio: REAL WAV decode — frames come from the RIFF header (160/frame)
    val f7 = feats.find(_.media_id == 7L).get // id 7 → audio, meta_frames 8
    assert(f7.decoded && f7.sample_rate == 8000.0)
    assert(f7.sampled_frames == (0 until 8 * 160 by 5))
    // image: REAL PNG decode — dims come from the IHDR, luma from the raster
    val f0 = feats.find(_.media_id == 0L).get // id 0 → image, 16×16
    assert(f0.decoded && f0.width == 16 && f0.height == 16)
    assert(f0.mean_luma > 0.0 && f0.mean_luma < 255.0)
  }

  test("checked-in PNG fixture decodes: real dims override declared metadata") {
    import spark.implicits._
    val row = Multimodal.MediaRow(42L, "image", fixtureBytes, 1, 1, 1)
    val feats = Multimodal.extractFeatures(Seq(row).toDS()).collect().head
    assert(feats.decoded)
    assert(feats.width == 12 && feats.height == 8) // from the bytes, not the (1,1) metadata
    assert(feats.mean_luma > 0.0 && feats.mean_luma < 255.0)
    // corrupt payload degrades to the metadata path, never throws
    val bad = Multimodal.MediaRow(43L, "image", Array[Byte](1, 2, 3), 9, 9, 1)
    val badFeats = Multimodal.extractFeatures(Seq(bad).toDS()).collect().head
    assert(!badFeats.decoded && badFeats.width == 9)
  }

  test("feature extraction is deterministic (stable checksums)") {
    val a = Multimodal.extractFeatures(Multimodal.synthesize(spark, 10)).collect()
      .map(f => f.media_id -> f.checksum).toMap
    val b = Multimodal.extractFeatures(Multimodal.synthesize(spark, 10)).collect()
      .map(f => f.media_id -> f.checksum).toMap
    assert(a == b)
  }

  test("resize: images resample for real; non-decodable rows clamp metadata") {
    import spark.implicits._
    val media = Multimodal.synthesize(spark, 30)
    val resized = Multimodal.resize(media, maxDim = 32).collect()
    val orig = media.collect().map(r => r.media_id -> r).toMap
    resized.foreach { r =>
      assert(math.max(r.meta_width, r.meta_height) <= 32)
      if (r.kind != "image") assert(r.payload.sameElements(orig(r.media_id).payload))
    }
    // a genuinely oversized image: payload re-encodes, and RE-DECODING the
    // new payload confirms the raster itself shrank (not just the metadata)
    val big = Multimodal.MediaRow(7L, "image", Multimodal.ImageCodec.encodePng(7L, 64, 40), 64, 40, 1)
    val out = Multimodal.resize(Seq(big).toDS(), maxDim = 16).collect().head
    assert(out.meta_width == 16 && out.meta_height == 10)
    assert(!out.payload.sameElements(big.payload))
    val redecoded = Multimodal.ImageCodec.decode(out.payload).get
    assert(redecoded.getWidth == 16 && redecoded.getHeight == 10)
  }

  test("featureStats aggregates per kind with decode counts") {
    val stats = Multimodal.featureStats(
      Multimodal.extractFeatures(Multimodal.synthesize(spark, 30)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(stats.view.mapValues(_._1).toMap ==
      Map("image" -> 10L, "audio" -> 10L, "video" -> 10L))
    // every image and audio payload decoded for real; video never does
    assert(stats("image")._2 == 10L && stats("audio")._2 == 10L && stats("video")._2 == 0L)
  }
}
