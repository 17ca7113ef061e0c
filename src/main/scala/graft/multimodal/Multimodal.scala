package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Rng

/** Multimodal columns: image/audio/video ride as opaque `binary` columns
  * with typed metadata. The Spark-side plumbing — schema, batching,
  * partitioning, operator signatures — is real throughout.
  *
  * Codec layer: IMAGES are REAL (JDK `javax.imageio`, headless-safe —
  * PNG/JPEG/BMP/GIF decode, nearest-neighbor pixel resampling with pure
  * integer math, luminance features from actual pixels). Audio/video codecs
  * do not exist in the JDK, so those kinds remain behind the deterministic
  * fake container (`GRFT` header) — the swap-in point for an FFmpeg-style
  * binding is [[decode]], one function.
  */
object Multimodal {

  final case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int, n_frames: Int, n_bytes: Long)
  final case class MediaFeature(media_id: Long, feature: Array[Float])
  final case class Frame(media_id: Long, frame_index: Int, payload: Array[Byte])

  /** synthetic container (audio/video stand-in):
    * magic "GRFT" + kind byte + width/height/frames (LE ints) */
  private val Magic = Array[Byte]('G', 'R', 'F', 'T')

  def encodeFake(kind: String, width: Int, height: Int, frames: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 1 + 12 + payload.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic).put(kind.head.toByte).putInt(width).putInt(height).putInt(frames).put(payload)
    bb.array()
  }

  /** True if the blob leads with a magic the JDK image reader handles. */
  def isImageBlob(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 && (
      (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') ||
      (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) || // JPEG
      (bytes(0) == 'B' && bytes(1) == 'M') ||                 // BMP
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'))

  /** REAL image decode (JDK ImageIO). Corrupt/truncated input → None. */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!isImageBlob(bytes)) None
    else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Throwable => None }

  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a blob of either family to metadata: real image formats via
    * ImageIO, the GRFT container for (stub) audio/video. Malformed input
    * yields None (error-isolation like every other extractor here). */
  def decode(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null) return None
    if (isImageBlob(bytes))
      return decodeImage(bytes).map(img =>
        MediaMeta(-1, "image", img.getWidth, img.getHeight, 1, bytes.length.toLong))
    if (bytes.length < 17 || !bytes.take(4).sameElements(Magic)) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(4)
    val kind = bb.get().toChar match {
      case 'i' => "image"; case 'a' => "audio"; case 'v' => "video"; case _ => "unknown"
    }
    Some(MediaMeta(-1, kind, bb.getInt(), bb.getInt(), bb.getInt(), bytes.length.toLong))
  }

  /** Backwards-compatible alias (pre-ImageIO name). */
  def decodeStub(bytes: Array[Byte]): Option[MediaMeta] = decode(bytes)

  /** deterministic synthetic media table: (media_id, kind, blob). Image rows
    * are REAL PNGs (deterministic pixels); audio/video are GRFT containers. */
  def syntheticMedia(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val rng = Rng.at(0xABCL, i)
      val kind = Vector("image", "audio", "video")(rng.nextInt(3))
      val w = 16 + rng.nextInt(64); val h = 16 + rng.nextInt(64)
      if (kind == "image") {
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rng.nextInt(0x1000000)); x += 1 }
          y += 1
        }
        (i, kind, encodePng(img))
      } else {
        val frames = if (kind == "video") 1 + rng.nextInt(30) else 1
        val payload = Array.fill((w * h / 8) max 16)(rng.nextLong().toByte)
        (i, kind, encodeFake(kind, w, h, frames, payload))
      }
    }).toDF("media_id", "kind", "blob")
  }

  /** decode metadata for every blob — batched narrow pass, nulls isolated */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        decode(blob).map(m => m.copy(media_id = id))
      }).toDF()
  }

  /** Feature vector per blob (fixed 16-dim batch shape, L1-normalized):
    * REAL pixel-luminance histogram for images; byte histogram for the
    * stubbed audio/video containers. */
  def features(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val hist = new Array[Float](16)
        decodeImage(blob) match {
          case Some(img) =>
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                // integer luminance (Rec.601 weights scaled by 256) → bucket
                val lum = (((rgb >> 16) & 0xff) * 77 + ((rgb >> 8) & 0xff) * 150 +
                  (rgb & 0xff) * 29) >> 8
                hist(lum >> 4) += 1f
                x += 1
              }
              y += 1
            }
          case None =>
            blob.foreach(b => hist((b & 0xff) >> 4) += 1f)
        }
        val s = hist.sum
        if (s > 0) { var i = 0; while (i < 16) { hist(i) /= s; i += 1 } }
        MediaFeature(id, hist)
      }).toDF()
  }

  /** Nearest-neighbor pixel resample — pure integer source-index math, so
    * the result is deterministic across JVMs (no Graphics2D rendering
    * hints). */
  def resizeImage(img: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.getHeight / h).toInt
      var x = 0
      while (x < w) {
        out.setRGB(x, y, img.getRGB((x.toLong * img.getWidth / w).toInt, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** resize to (w, h): REAL nearest-neighbor resample + PNG re-encode for
    * image blobs; for the stubbed containers, the header is re-encoded with
    * the target dimensions and the payload resampled to the proportional
    * byte budget. Undecodable blobs are dropped, mirroring decodeMeta's
    * error isolation. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        decodeImage(blob) match {
          case Some(img) =>
            Some((id, "image", encodePng(resizeImage(img, w, h))))
          case None =>
            decode(blob).filter(_ => blob.length >= 17).map { m =>
              val payload = blob.drop(17)
              val resampled = if (payload.isEmpty) payload else {
                val outLen = math.max(16, (payload.length.toLong * (w.toLong * h) /
                  math.max(1L, m.width.toLong * m.height)).toInt)
                Array.tabulate(outLen) { j =>
                  payload(((j.toLong * payload.length) / outLen).toInt)
                }
              }
              (id, m.kind, encodeFake(m.kind, w, h, m.n_frames, resampled))
            }
        }
      }).toDF("media_id", "kind", "blob")
  }

  /** frame sampling for video blobs: every `stride`-th fixed-size chunk of
    * the payload stands in for a decoded frame (video codecs stay stubbed —
    * none exist in the JDK). */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        decode(blob) match {
          case Some(m) if m.kind == "video" && m.n_frames > 0 =>
            val payload = blob.drop(17)
            val frameSize = math.max(1, payload.length / m.n_frames)
            (0 until m.n_frames by stride).map { f =>
              Frame(id, f, payload.slice(f * frameSize, math.min(payload.length, (f + 1) * frameSize)))
            }
          case _ => Nil
        }
      }).toDF()
  }
}
