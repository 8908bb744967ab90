package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decodeImageMeta roundtrips the stub codec header and drops garbage") {
    val spark2 = spark
    import spark2.implicits._
    val good = Multimodal.MediaRow(1L, "image", Multimodal.FakeCodec.encodeHeader(32, 24, 3, 10))
    val bad = Multimodal.MediaRow(2L, "image", Array[Byte](1, 2, 3))
    val wrongMagic = Multimodal.MediaRow(3L, "image", Array.fill[Byte](16)(0))
    val meta = Multimodal.decodeImageMeta(
      spark.createDataset(Seq(good, bad, wrongMagic))).collect()
    assert(meta.length === 1)
    assert(meta.head === Multimodal.ImageMeta(1L, 32, 24, 3, 26))
  }

  test("synthetic media decodes end-to-end; resize plan scales only large sides") {
    val media = Multimodal.syntheticMedia(spark, 90)
    val meta = Multimodal.decodeImageMeta(media)
    assert(meta.count() === 90L)
    val plan = Multimodal.resizePlan(meta, 32).collect()
    plan.foreach { r =>
      val (w, h, s) = (r.getInt(1), r.getInt(2), r.getDouble(3))
      if (math.max(w, h) <= 32) assert(s === 1.0)
      else assert(approx(s, 32.0 / math.max(w, h)))
    }
  }

  test("frame sampling emits deterministic frame indices for video rows") {
    val media = Multimodal.syntheticMedia(spark, 9)
    val frames = Multimodal.sampleFrames(media, 2500).collect()
    val perVideo = frames.groupBy(_.media_id)
    assert(perVideo.keySet === Set(2L, 5L, 8L)) // id % 3 == 2 -> video
    perVideo.values.foreach(f => assert(f.map(_.ts_ms).sorted.toSeq === Seq(0L, 2500L, 5000L, 7500L)))
  }
}
