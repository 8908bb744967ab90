package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed batch-wise with typed mapPartitions (the
  * Scala analog of mapInPandas — one decoder instance per partition, rows
  * streamed through it).
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `FakeCodec` parses a deterministic 16-byte header instead of
  * decoding real media. Everything around it — schema, binary handling,
  * per-partition batching, output shape — is the real production plumbing;
  * swapping FakeCodec for a JNI/javacv decoder changes no signatures.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  case class ImageMeta(media_id: Long, width: Int, height: Int, channels: Int,
                       bytes_len: Int)

  case class FrameSample(media_id: Long, frame_idx: Int, ts_ms: Long)

  /** STUB codec: header = magic(4) | width(4) | height(4) | channels(4),
    * big-endian. A real decoder replaces exactly this object (???-grade
    * stand-in, clearly marked).
    */
  object FakeCodec {
    val Magic = 0x47524654 // "GRFT"

    def encodeHeader(width: Int, height: Int, channels: Int, payload: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + payload)
      bb.putInt(Magic).putInt(width).putInt(height).putInt(channels)
      bb.array()
    }

    def decode(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
      if (bytes.length < 16) return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
      if (bb.getInt() != Magic) None
      else Some((bb.getInt(), bb.getInt(), bb.getInt()))
    }
  }

  /** Deterministic synthetic media table for tests/bench. */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val rnd = new scala.util.Random(seed ^ id)
      val (w, h) = (16 + rnd.nextInt(64), 16 + rnd.nextInt(64))
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      MediaRow(id, kind, FakeCodec.encodeHeader(w, h, 3, rnd.nextInt(64)))
    }
  }

  /** Decode image metadata batch-wise; undecodable rows are dropped (a
    * production pipeline would route them to a quarantine sink).
    */
  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder instance (stateful codecs initialize here)
      rows.flatMap { r =>
        FakeCodec.decode(r.bytes).map { case (w, h, c) =>
          ImageMeta(r.media_id, w, h, c, r.bytes.length)
        }
      }
    }
  }

  /** Resize plan: target box while preserving aspect ratio (pure metadata
    * math; the pixel work lives behind the codec stub).
    */
  def resizePlan(meta: Dataset[ImageMeta], maxSide: Int): DataFrame =
    meta.toDF().select(col("media_id"), col("width"), col("height"),
      when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
        .otherwise(lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
        .as("scale"))

  /** Deterministic frame sampling for video rows: `fps`-spaced indices of a
    * fake 10s clip.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      (0L until 10000L by everyMs).zipWithIndex.map { case (ts, i) =>
        FrameSample(r.media_id, i, ts)
      }
    }
  }
}
