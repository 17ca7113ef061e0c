package graft.multimodal

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  test("decode/meta plumbing round-trips the synthetic header") {
    val meta = Multimodal.decodeMeta(Multimodal.syntheticMedia(spark, 100)).collect()
    assert(meta.length == 100)
    assert(meta.forall(r => Set("image", "audio", "video").contains(r.getAs[String]("kind"))))
    assert(meta.forall(r => r.getAs[Int]("width") >= 16))
  }

  test("malformed blobs are isolated, not fatal") {
    val sps = spark; import sps.implicits._
    val bad = spark.createDataset(Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, Multimodal.encodeFake("image", 8, 8, 1, Array.fill(16)(7.toByte))))).toDF("media_id", "blob")
    val meta = Multimodal.decodeMeta(bad).collect()
    assert(meta.length == 1 && meta.head.getAs[Long]("media_id") == 2L)
  }

  test("frame sampling emits stride-spaced frames for videos only") {
    val frames = Multimodal.sampleFrames(Multimodal.syntheticMedia(spark, 200), stride = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[Int]("frame_index") % 4 == 0))
    val meta = Multimodal.decodeMeta(Multimodal.syntheticMedia(spark, 200))
      .filter("kind = 'video'").count()
    val mediaWithFrames = frames.map(_.getAs[Long]("media_id")).distinct.length
    assert(mediaWithFrames == meta)
  }

  test("features are L1-normalized histograms with fixed batch shape") {
    val f = Multimodal.features(Multimodal.syntheticMedia(spark, 50)).collect()
    assert(f.length == 50)
    f.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.length == 16)
      assert(math.abs(v.sum - 1.0) < 1e-3)
    }
  }

  test("resize re-encodes every decodable blob at the target dimensions") {
    val resized = Multimodal.resize(Multimodal.syntheticMedia(spark, 100), 32, 32)
    val meta = Multimodal.decodeMeta(resized).collect()
    assert(meta.length == 100)
    assert(meta.forall(r => r.getAs[Int]("width") == 32 && r.getAs[Int]("height") == 32))
    // payload budget scales with the pixel ratio; frames preserved
    val orig = Multimodal.decodeMeta(Multimodal.syntheticMedia(spark, 100)).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Int]("n_frames")).toMap
    assert(meta.forall(r => r.getAs[Int]("n_frames") == orig(r.getAs[Long]("media_id"))))
  }
}
