package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Rng

/** Multimodal columns: image/audio/video ride as opaque `binary` columns
  * with typed metadata. The Spark-side plumbing — schema, batching,
  * partitioning, operator signatures — is real; the codec layer is STUBBED
  * (this container has no image/audio libraries) behind deterministic fakes
  * that parse a fixed synthetic header, so every operator is testable and
  * the swap-in point for a real decoder is a single function.
  */
object Multimodal {

  final case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int, n_frames: Int, n_bytes: Long)
  final case class MediaFeature(media_id: Long, feature: Array[Float])
  final case class Frame(media_id: Long, frame_index: Int, payload: Array[Byte])

  /** synthetic header: magic "GRFT" + kind byte + width/height/frames (LE ints) */
  private val Magic = Array[Byte]('G', 'R', 'F', 'T')

  def encodeFake(kind: String, width: Int, height: Int, frames: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 1 + 12 + payload.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic).put(kind.head.toByte).putInt(width).putInt(height).putInt(frames).put(payload)
    bb.array()
  }

  /** STUB decode — replace with a real codec binding when available.
    * Deterministic: pure function of the bytes; malformed input yields null
    * (error-isolation like every other extractor in this engine). */
  def decodeStub(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null || bytes.length < 17 || !bytes.take(4).sameElements(Magic)) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(4)
    val kind = bb.get().toChar match {
      case 'i' => "image"; case 'a' => "audio"; case 'v' => "video"; case _ => "unknown"
    }
    Some(MediaMeta(-1, kind, bb.getInt(), bb.getInt(), bb.getInt(), bytes.length.toLong))
  }

  /** deterministic synthetic media table: (media_id, kind, blob) */
  def syntheticMedia(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val rng = Rng.at(0xABCL, i)
      val kind = Vector("image", "audio", "video")(rng.nextInt(3))
      val w = 16 + rng.nextInt(64); val h = 16 + rng.nextInt(64)
      val frames = if (kind == "video") 1 + rng.nextInt(30) else 1
      val payload = Array.fill((w * h / 8) max 16)(rng.nextLong().toByte)
      (i, kind, encodeFake(kind, w, h, frames, payload))
    }).toDF("media_id", "kind", "blob")
  }

  /** decode metadata for every blob — batched narrow pass, nulls isolated */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        decodeStub(blob).map(m => m.copy(media_id = id))
      }).toDF()
  }

  /** byte-histogram feature (16 buckets, L1-normalized) — the stand-in for a
    * real embedding/feature extractor; batch shape (one vector per row). */
  def features(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val hist = new Array[Float](16)
        blob.foreach(b => hist((b & 0xff) >> 4) += 1f)
        val s = hist.sum
        if (s > 0) { var i = 0; while (i < 16) { hist(i) /= s; i += 1 } }
        MediaFeature(id, hist)
      }).toDF()
  }

  /** resize to (w, h): re-encodes the header with the target dimensions and
    * resamples the payload to the proportional byte budget (nearest-byte —
    * the stand-in for a real pixel resampler; the swap-in point is this one
    * function body). Undecodable blobs are dropped, mirroring decodeMeta's
    * error isolation. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        decodeStub(blob).map { m =>
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
      }).toDF("media_id", "kind", "blob")
  }

  /** frame sampling for video blobs: every `stride`-th fixed-size chunk of
    * the payload stands in for a decoded frame. */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, blob) =>
        decodeStub(blob) match {
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
