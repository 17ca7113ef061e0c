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

  test("image blobs are REAL PNGs: ImageIO round-trip with exact pixels") {
    val sps = spark; import sps.implicits._
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, x * 0x110000 + y * 0x88)
    val png = Multimodal.encodePng(img)
    assert(Multimodal.isImageBlob(png))
    val meta = Multimodal.decodeMeta(
      spark.createDataset(Seq((7L, png))).toDF("media_id", "blob")).collect()
    assert(meta.length == 1)
    assert(meta.head.getAs[Int]("width") == 4 && meta.head.getAs[Int]("height") == 2)
    val back = Multimodal.decodeImage(png).get
    for (y <- 0 until 2; x <- 0 until 4)
      assert((back.getRGB(x, y) & 0xffffff) == (x * 0x110000 + y * 0x88), s"pixel ($x,$y)")
  }

  test("real resize: nearest-neighbor pixels are exactly the integer-math source picks") {
    val sps = spark; import sps.implicits._
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, (y * 4 + x) * 0x010101)
    val df = spark.createDataset(Seq((1L, Multimodal.encodePng(img)))).toDF("media_id", "blob")
    val out = Multimodal.resize(df, 2, 2).collect()
    val small = Multimodal.decodeImage(out.head.getAs[Array[Byte]]("blob")).get
    assert(small.getWidth == 2 && small.getHeight == 2)
    // src index = x*4/2, y*4/2 -> pixels (0,0),(2,0),(0,2),(2,2) = 0,2,8,10
    assert((small.getRGB(0, 0) & 0xffffff) == 0x000000)
    assert((small.getRGB(1, 0) & 0xffffff) == 0x020202)
    assert((small.getRGB(0, 1) & 0xffffff) == 0x080808)
    assert((small.getRGB(1, 1) & 0xffffff) == 0x0a0a0a)
  }

  test("truncated PNG bytes are isolated like any malformed blob") {
    val sps = spark; import sps.implicits._
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val png = Multimodal.encodePng(img)
    val rows = Seq((1L, png.take(20)), (2L, png))
    val meta = Multimodal.decodeMeta(spark.createDataset(rows).toDF("media_id", "blob")).collect()
    assert(meta.map(_.getAs[Long]("media_id")).toSet == Set(2L))
  }

  test("image features come from pixel luminance (uniform image -> one bucket)") {
    val sps = spark; import sps.implicits._
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0xffffff) // lum 255 -> bucket 15
    val f = Multimodal.features(
      spark.createDataset(Seq((1L, Multimodal.encodePng(img)))).toDF("media_id", "blob")).collect()
    val v = f.head.getSeq[Float](1)
    assert(v(15) == 1.0f && v.take(15).forall(_ == 0.0f), v.mkString(","))
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
