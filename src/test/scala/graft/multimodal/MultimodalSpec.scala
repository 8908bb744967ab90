package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private val pix3x2 = Array[Byte](
    10, 20, 30, 40, 50, 60, 70, 80, 90, // row 0: three RGB pixels
    100, 110, 120, -126, -116, -106, -96, -86, -76) // row 1 (130.. as signed bytes)
  private val img3x2 = Codecs.Image(3, 2, 3, pix3x2)

  test("BMP: golden header bytes, pixel-exact roundtrip, garbage rejected") {
    val enc = Codecs.Bmp.encode(img3x2)
    // golden header facts: magic, 54-byte offset, 40-byte DIB, 3x2, 24bpp,
    // BI_RGB, rows padded to 12 bytes -> file 54 + 24
    assert(enc.length === 54 + 2 * 12)
    assert(enc(0) === 'B'.toByte && enc(1) === 'M'.toByte)
    val bb = java.nio.ByteBuffer.wrap(enc).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(10) === 54 && bb.getInt(14) === 40)
    assert(bb.getInt(18) === 3 && bb.getInt(22) === 2)
    assert((bb.getShort(28) & 0xFFFF) === 24 && bb.getInt(30) === 0)
    // bottom-up + BGR: first stored pixel is row 1 pixel 0 = RGB(100,110,120)
    assert(enc(54) === 120.toByte && enc(55) === 110.toByte && enc(56) === 100.toByte)
    val dec = Codecs.Bmp.decode(enc).get
    assert(dec.width === 3 && dec.height === 2 && dec.channels === 3)
    assert(dec.pixels.toSeq === pix3x2.toSeq)
    assert(Codecs.Bmp.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Codecs.Bmp.decode("BMxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx".getBytes).isEmpty)
  }

  test("PPM: roundtrip, comment-tolerant header, P5 gray, truncated raster rejected") {
    val enc = Codecs.Ppm.encode(img3x2)
    assert(Codecs.Ppm.decode(enc).get.pixels.toSeq === pix3x2.toSeq)
    val withComment = ("P6\n# a comment\n 3  2\n255\n".getBytes("US-ASCII") ++ pix3x2)
    val dec = Codecs.Ppm.decode(withComment).get
    assert(dec.width === 3 && dec.height === 2 && dec.pixels.toSeq === pix3x2.toSeq)
    val gray = Codecs.Ppm.decode("P5\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4)).get
    assert(gray.channels === 1 && gray.pixels.toSeq === Seq[Byte](1, 2, 3, 4))
    assert(Codecs.Ppm.decode("P6\n3 2\n255\n".getBytes("US-ASCII") ++ pix3x2.take(5)).isEmpty)
  }

  test("PNG: roundtrip through every filter type, RGBA/gray, CRC + truncation rejected") {
    // all five filters across rows (height 5): None, Sub, Up, Average, Paeth
    val tall = Codecs.Image(3, 5, 3, Array.tabulate(45)(i => ((i * 37 + 11) % 256).toByte))
    val enc = Codecs.Png.encode(tall, filterForRow = y => y % 5)
    val dec = Codecs.Png.decode(enc).get
    assert(dec.width === 3 && dec.height === 5 && dec.channels === 3)
    assert(dec.pixels.toSeq === tall.pixels.toSeq)
    // default filter choice roundtrips too
    assert(Codecs.Png.decode(Codecs.Png.encode(img3x2)).get.pixels.toSeq === pix3x2.toSeq)
    // RGBA and gray color types
    val rgba = Codecs.Image(2, 2, 4, Array.tabulate(16)(i => (i * 15).toByte))
    assert(Codecs.Png.decode(Codecs.Png.encode(rgba)).get === rgba ||
      Codecs.Png.decode(Codecs.Png.encode(rgba)).get.pixels.toSeq === rgba.pixels.toSeq)
    val gray = Codecs.Image(4, 3, 1, Array.tabulate(12)(i => (200 - i * 9).toByte))
    assert(Codecs.Png.decode(Codecs.Png.encode(gray)).get.pixels.toSeq === gray.pixels.toSeq)
    // a flipped bit inside IDAT breaks the chunk CRC -> rejected
    val corrupt = enc.clone()
    corrupt(8 + 25 + 12) = (corrupt(8 + 25 + 12) ^ 0x40).toByte // inside IDAT payload
    assert(Codecs.Png.decode(corrupt).isEmpty)
    // truncated stream (IEND never seen) -> rejected
    assert(Codecs.Png.decode(enc.dropRight(13)).isEmpty)
    assert(Codecs.Png.decode("not a png at all".getBytes).isEmpty)
  }

  test("PNG: sniffImage dispatches on the 0x89 'P' signature") {
    val enc = Codecs.Png.encode(img3x2)
    assert(Codecs.sniffImage(enc).get.pixels.toSeq === pix3x2.toSeq)
  }

  test("GIF: bit-lossless indexed roundtrip; JPEG: exact dims + bounded pixel error; sniff dispatch") {
    // GIF through an explicit IndexColorModel is lossless under 256 colors
    val palettePix = Array.tabulate(8 * 6 * 3) { i =>
      val p = i / 3 // all three channels equal -> 8 distinct gray colors
      ((p % 8) * 36).toByte
    }
    val gifImg = Codecs.Image(8, 6, 3, palettePix)
    val gifBytes = Codecs.Jdk.encodeGif(gifImg)
    assert(gifBytes(0) === 'G'.toByte && gifBytes(1) === 'I'.toByte && gifBytes(2) === 'F'.toByte)
    val gifDec = Codecs.Jdk.decode(gifBytes).get
    assert(gifDec.width === 8 && gifDec.height === 6 && gifDec.channels === 3)
    assert(gifDec.pixels.toSeq === palettePix.toSeq)
    assert(Codecs.sniffImage(gifBytes).get.pixels.toSeq === palettePix.toSeq)
    // >256 distinct colors rejected rather than silently quantized
    val manyPix = new Array[Byte](32 * 32 * 3)
    for (p <- 0 until 1024) {
      manyPix(p * 3) = (p & 0xFF).toByte; manyPix(p * 3 + 1) = ((p >> 8) & 0xFF).toByte
    }
    assertThrows[IllegalArgumentException](
      Codecs.Jdk.encodeGif(Codecs.Image(32, 32, 3, manyPix)))

    // JPEG is lossy: dims/channels exact, per-sample mean error bounded
    val w = 48; val h = 32
    val src = Array.tabulate(w * h * 3)(i => ((i * 7 + 11) % 256).toByte)
    val jpgBytes = Codecs.Jdk.encodeJpeg(Codecs.Image(w, h, 3, src))
    assert(jpgBytes(0) === 0xFF.toByte && jpgBytes(1) === 0xD8.toByte)
    val jpgDec = Codecs.Jdk.decode(jpgBytes).get
    assert(jpgDec.width === w && jpgDec.height === h && jpgDec.channels === 3)
    val mae = src.indices.map(i => math.abs((src(i) & 0xFF) - (jpgDec.pixels(i) & 0xFF))).sum
      .toDouble / src.length
    assert(mae <= 32.0, s"JPEG mean abs error $mae")
    assert(Codecs.sniffImage(jpgBytes).get.width === w)
    // garbage rejected
    assert(Codecs.Jdk.decode("definitely not an image".getBytes).isEmpty)
  }

  test("WAV: PCM roundtrip, unknown chunks skipped, non-PCM rejected") {
    val samples = Array.tabulate(96)(i => (i * 100 - 4800).toShort)
    val enc = Codecs.Wav.encode(2, 16000, samples)
    val a = Codecs.Wav.decode(enc).get
    assert(a === Codecs.Audio(2, 16000, 16, 48)) // 96 samples / 2 channels
    // splice an unknown LIST chunk between fmt and data
    val lst = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = enc.take(36) ++ lst ++ enc.drop(36)
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8) // fix RIFF size
    assert(Codecs.Wav.decode(spliced).get === a)
    val nonPcm = enc.clone()
    java.nio.ByteBuffer.wrap(nonPcm).order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(20, 3)
    assert(Codecs.Wav.decode(nonPcm).isEmpty)
  }

  test("Y4M: frame-walk roundtrip (C444), C420 frame size, truncated stream rejected") {
    val frames = (0 until 4).map(f => Array.tabulate(8 * 6 * 3)(i => (f + i).toByte))
    val enc = Codecs.Y4m.encode(8, 6, 4, 1, frames)
    assert(Codecs.Y4m.decode(enc).get === Codecs.Video(8, 6, 4, 1, 4))
    val c420 = "YUV4MPEG2 W4 H4 F30:1 C420\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes("US-ASCII") ++ new Array[Byte](4 * 4 + 2 * 2 * 2)
    assert(Codecs.Y4m.decode(c420).get === Codecs.Video(4, 4, 30, 1, 1))
    assert(Codecs.Y4m.decode(enc.dropRight(1)).isEmpty)
  }

  test("nearest-neighbor resize: exact pixels on a 2x downscale") {
    val img = Codecs.Image(4, 4, 3, Array.tabulate(48)(_.toByte))
    val small = Codecs.resizeNearest(img, 2, 2)
    assert(small.width === 2 && small.height === 2)
    // sample points (0,0),(2,0),(0,2),(2,2) of the source
    assert(small.pixels.toSeq === Seq(0, 1, 2, 6, 7, 8, 24, 25, 26, 30, 31, 32).map(_.toByte))
  }

  test("synthetic media decodes end-to-end with real codecs; px_sum proves raster decode") {
    val media = Multimodal.syntheticMedia(spark, 90)
    val meta = Multimodal.decodeImageMeta(media).collect()
    assert(meta.length === 30) // id % 3 == 0 rows are images
    assert(meta.map(_.format).toSet === Set("bmp", "ppm", "png", "jpeg", "gif"))
    meta.foreach { m =>
      m.format match {
        case "gif" => // 16-gray palette raster, lossless indexed encode
          val want = (0 until m.width * m.height)
            .map(p => 3L * (((m.media_id * 31 + p * 7) % 16) * 17)).sum
          assert(m.px_sum === want, s"media ${m.media_id} (gif)")
        case "jpeg" => // lossy DCT: the sum survives within a small bound
          val want = (0 until m.width * m.height * 3)
            .map(i => ((m.media_id * 31 + i * 7) % 256)).sum
          assert(math.abs(m.px_sum - want) <= 0.10 * want,
            s"media ${m.media_id} (jpeg): $want vs ${m.px_sum}")
        case _ => // lossless: pixel i = (id*31 + i*7) % 256 — recompute exactly
          val want = (0 until m.width * m.height * 3)
            .map(i => ((m.media_id * 31 + i * 7) % 256)).sum
          assert(m.px_sum === want, s"media ${m.media_id}")
      }
    }
    val audio = Multimodal.decodeAudioMeta(media).collect()
    assert(audio.length === 30 && audio.forall(a => a.n_frames * a.channels === 256 * a.channels))
    val video = Multimodal.decodeVideoMeta(media).collect()
    assert(video.length === 30 && video.forall(v => v.n_frames >= 3 && v.fps_num === 4))
  }

  test("resize plan scales only large sides") {
    val meta = Multimodal.decodeImageMeta(Multimodal.syntheticMedia(spark, 90))
    val plan = Multimodal.resizePlan(meta, 32).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val (w, h, s) = (r.getInt(1), r.getInt(2), r.getDouble(3))
      if (math.max(w, h) <= 32) assert(s === 1.0)
      else assert(approx(s, 32.0 / math.max(w, h)))
    }
  }

  test("frame sampling follows each clip's decoded duration and rate") {
    val media = Multimodal.syntheticMedia(spark, 9)
    val frames = Multimodal.sampleFrames(media, 300).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId.keySet === Set(2L, 5L, 8L)) // id % 3 == 2 -> video
    val metas = Multimodal.decodeVideoMeta(media).collect().map(v => v.media_id -> v).toMap
    byId.foreach { case (id, fs) =>
      val v = metas(id)
      val durMs = v.n_frames.toLong * 1000L * v.fps_den / v.fps_num
      assert(fs.map(_.ts_ms).sorted.toSeq === (0L until durMs by 300L).toSeq)
      fs.foreach(f => assert(f.frame_idx === (f.ts_ms * v.fps_num / (1000L * v.fps_den)).toInt
        && f.frame_idx < v.n_frames))
    }
  }
}
