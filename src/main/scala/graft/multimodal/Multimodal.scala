package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Pure-JVM media codecs — no native libraries, no dependencies, fully
  * deterministic. These are REAL decoders (header validation + pixel/sample
  * payload parsing):
  *   - BMP (24/32-bit BI_RGB, bottom-up or top-down), PPM/PGM (P6/P5) and
  *     PNG (zlib inflate + full scanline unfiltering) for images — decoded
  *     to row-major top-down RGB(A)/gray bytes,
  *   - WAV (RIFF PCM, chunk-walking, word-aligned) for audio,
  *   - Y4M (YUV4MPEG2, C444/C420) for video — frame count from the actual
  *     stream, not an assumed clip length.
  * plus JPEG (lossy DCT + Huffman) and GIF (LZW over a palette) through
  * the JDK's bundled `javax.imageio` plugins (`Codecs.Jdk`) — still zero
  * external dependencies. Audio/video entropy codecs (MP3/H.264) stay out
  * of scope in this container; swapping in a JNI/javacv decoder changes
  * no signatures.
  */
object Codecs {

  /** Decoded image: row-major, top-down, interleaved channels (RGB, RGBA
    * or single-channel gray), one byte per sample.
    */
  case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  case class Audio(channels: Int, sampleRate: Int, bitsPerSample: Int, frames: Int)

  case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int, frames: Int)

  /** Windows bitmap, the classic uncompressed interchange format:
    * BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (>= 40 bytes), BI_RGB
    * only, 24- or 32-bit, rows padded to 4-byte boundaries, stored
    * bottom-up when the height field is positive.
    */
  object Bmp {
    def encode(img: Image): Array[Byte] = {
      require(img.channels == 3, "BMP encoder emits 24-bit RGB")
      val rowSize = (img.width * 3 + 3) / 4 * 4
      val dataSize = rowSize * img.height
      val bb = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize).putInt(0).putInt(54)
      bb.putInt(40).putInt(img.width).putInt(img.height)
        .putShort(1).putShort(24).putInt(0).putInt(dataSize)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = img.height - 1
      while (y >= 0) { // bottom-up, BGR
        var x = 0
        while (x < img.width) {
          val i = (y * img.width + x) * 3
          bb.put(img.pixels(i + 2)).put(img.pixels(i + 1)).put(img.pixels(i))
          x += 1
        }
        var p = img.width * 3
        while (p < rowSize) { bb.put(0.toByte); p += 1 }
        y -= 1
      }
      bb.array()
    }

    def decode(bytes: Array[Byte]): Option[Image] = {
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val dataOffset = bb.getInt(10)
      val dibSize = bb.getInt(14)
      val width = bb.getInt(18)
      val heightRaw = bb.getInt(22)
      val bpp = bb.getShort(28) & 0xFFFF
      val compression = bb.getInt(30)
      if (dibSize < 40 || compression != 0 || (bpp != 24 && bpp != 32) ||
        width <= 0 || heightRaw == 0 || dataOffset < 54) return None
      val bottomUp = heightRaw > 0
      val height = math.abs(heightRaw)
      val ch = bpp / 8
      val rowSize = (width * ch + 3) / 4 * 4
      if (dataOffset.toLong + rowSize.toLong * height > bytes.length) return None
      val out = new Array[Byte](width * height * ch)
      var y = 0
      while (y < height) {
        val srcRow = dataOffset + (if (bottomUp) height - 1 - y else y) * rowSize
        var x = 0
        while (x < width) {
          val s = srcRow + x * ch
          val d = (y * width + x) * ch
          out(d) = bytes(s + 2); out(d + 1) = bytes(s + 1); out(d + 2) = bytes(s) // BGR(A) -> RGB(A)
          if (ch == 4) out(d + 3) = bytes(s + 3)
          x += 1
        }
        y += 1
      }
      Some(Image(width, height, ch, out))
    }
  }

  /** Netpbm binary formats: P6 (RGB) and P5 (gray), maxval < 256. Header
    * tokens are whitespace-separated with `#` comments allowed.
    */
  object Ppm {
    def encode(img: Image): Array[Byte] = {
      require(img.channels == 3 || img.channels == 1)
      val magic = if (img.channels == 3) "P6" else "P5"
      s"$magic\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII") ++ img.pixels
    }

    def decode(bytes: Array[Byte]): Option[Image] = {
      if (bytes.length < 2 || bytes(0) != 'P') return None
      val ch = bytes(1).toChar match {
        case '6' => 3
        case '5' => 1
        case _ => return None
      }
      var pos = 2
      def nextInt(): Int = {
        while (pos < bytes.length &&
          (Character.isWhitespace(bytes(pos)) || bytes(pos) == '#')) {
          if (bytes(pos) == '#') while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          else pos += 1
        }
        val start = pos
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') pos += 1
        if (pos == start) -1 else new String(bytes, start, pos - start, "US-ASCII").toInt
      }
      val w = nextInt(); val h = nextInt(); val mx = nextInt()
      pos += 1 // exactly one whitespace byte after maxval, then raster
      if (w <= 0 || h <= 0 || mx <= 0 || mx > 255 ||
        pos + w.toLong * h * ch > bytes.length) return None
      Some(Image(w, h, ch, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * ch)))
    }
  }

  /** PNG (ISO/IEC 15948) — a REAL compressed format, decoded entirely with
    * the JDK: chunk walk with CRC-32 verification, zlib IDAT inflate
    * (`java.util.zip.Inflater`), and per-scanline unfiltering (None / Sub /
    * Up / Average / Paeth). Supported: 8-bit depth, color types 0 (gray),
    * 2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace. The encoder emits
    * zlib-deflated scanlines with a caller-selectable per-row filter
    * (default: Sub on row 0, Up below — the cheap differential pair), so
    * roundtrip tests exercise the unfilter paths.
    */
  object Png {
    private val SIG = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    private def crc(typ: Array[Byte], data: Array[Byte]): Int = {
      val c = new java.util.zip.CRC32()
      c.update(typ); c.update(data)
      c.getValue.toInt
    }

    private def chunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
      val t = typ.getBytes("US-ASCII")
      val bb = ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(t).put(data).putInt(crc(t, data))
      out.write(bb.array())
    }

    private def colorType(channels: Int): Int = channels match {
      case 1 => 0
      case 2 => 4
      case 3 => 2
      case 4 => 6
      case _ => -1
    }

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    def encode(img: Image, filterForRow: Int => Int = y => if (y == 0) 1 else 2): Array[Byte] = {
      val ct = colorType(img.channels)
      require(ct >= 0, s"unsupported channel count ${img.channels}")
      val ch = img.channels
      val stride = img.width * ch
      val raw = new Array[Byte]((stride + 1) * img.height)
      var y = 0
      while (y < img.height) {
        val ft = filterForRow(y)
        require(ft >= 0 && ft <= 4, s"filter $ft")
        raw(y * (stride + 1)) = ft.toByte
        var x = 0
        while (x < stride) {
          val cur = img.pixels(y * stride + x) & 0xFF
          val left = if (x >= ch) img.pixels(y * stride + x - ch) & 0xFF else 0
          val up = if (y > 0) img.pixels((y - 1) * stride + x) & 0xFF else 0
          val ul = if (y > 0 && x >= ch) img.pixels((y - 1) * stride + x - ch) & 0xFF else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val zout = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
      defl.end()
      val out = new java.io.ByteArrayOutputStream()
      out.write(SIG)
      val ihdr = ByteBuffer.allocate(13)
        .putInt(img.width).putInt(img.height)
        .put(8.toByte).put(ct.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      chunk(out, "IHDR", ihdr.array())
      chunk(out, "IDAT", zout.toByteArray)
      chunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): Option[Image] = {
      if (bytes.length < SIG.length + 12 || !bytes.startsWith(SIG)) return None
      val bb = ByteBuffer.wrap(bytes)
      var pos = SIG.length
      var w = -1; var h = -1; var ch = -1
      val idat = new java.io.ByteArrayOutputStream()
      var ended = false
      while (!ended && pos + 12 <= bytes.length) {
        val len = bb.getInt(pos)
        if (len < 0 || pos + 12L + len > bytes.length) return None
        val typ = new String(bytes, pos + 4, 4, "US-ASCII")
        val data = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        if (bb.getInt(pos + 8 + len) != crc(typ.getBytes("US-ASCII"), data)) return None
        typ match {
          case "IHDR" =>
            if (len != 13) return None
            w = bb.getInt(pos + 8); h = bb.getInt(pos + 12)
            val bitDepth = bytes(pos + 16) & 0xFF
            ch = (bytes(pos + 17) & 0xFF) match {
              case 0 => 1
              case 2 => 3
              case 4 => 2
              case 6 => 4
              case _ => return None
            }
            // compression 0, filter 0, no interlace, 8-bit only
            if (bitDepth != 8 || bytes(pos + 18) != 0 || bytes(pos + 19) != 0 ||
              bytes(pos + 20) != 0) return None
          case "IDAT" => idat.write(data)
          case "IEND" => ended = true
          case _ => () // ancillary chunks (tEXt, pHYs, ...) skipped
        }
        pos += 12 + len
      }
      if (!ended || w <= 0 || h <= 0 || ch < 0) return None
      val stride = w * ch
      val raw = new Array[Byte]((stride + 1) * h)
      val infl = new java.util.zip.Inflater()
      infl.setInput(idat.toByteArray)
      var got = 0
      try {
        while (got < raw.length && !infl.finished()) {
          val n = infl.inflate(raw, got, raw.length - got)
          if (n == 0 && infl.needsInput()) return None // truncated stream
          got += n
        }
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally infl.end()
      if (got < raw.length) return None
      val out = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val ft = raw(y * (stride + 1)) & 0xFF
        if (ft > 4) return None
        var x = 0
        while (x < stride) {
          val v = raw(y * (stride + 1) + 1 + x) & 0xFF
          val left = if (x >= ch) out(y * stride + x - ch) & 0xFF else 0
          val up = if (y > 0) out((y - 1) * stride + x) & 0xFF else 0
          val ul = if (y > 0 && x >= ch) out((y - 1) * stride + x - ch) & 0xFF else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          out(y * stride + x) = ((v + pred) & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      Some(Image(w, h, ch, out))
    }
  }

  /** RIFF/WAVE PCM: walks the chunk list (word-aligned sizes, unknown
    * chunks like LIST skipped), requires an audioFormat=1 fmt chunk and a
    * data chunk; frames = dataLen / (channels * bytesPerSample).
    */
  object Wav {
    def encode(channels: Int, sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataSize = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(channels.toShort)
        .putInt(sampleRate).putInt(sampleRate * channels * 2)
        .putShort((channels * 2).toShort).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
      samples.foreach(bb.putShort)
      bb.array()
    }

    private def tag(bytes: Array[Byte], pos: Int, t: String): Boolean =
      bytes.length >= pos + 4 && new String(bytes, pos, 4, "US-ASCII") == t

    def decode(bytes: Array[Byte]): Option[Audio] = {
      if (bytes.length < 12 || !tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE")) return None
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var fmt: Option[(Int, Int, Int)] = None
      var dataLen = -1
      while (pos + 8 <= bytes.length) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val sz = bb.getInt(pos + 4)
        if (sz < 0 || pos + 8 + sz.toLong > bytes.length) return None
        id match {
          case "fmt " if sz >= 16 =>
            if ((bb.getShort(pos + 8) & 0xFFFF) != 1) return None // PCM only
            fmt = Some((bb.getShort(pos + 10) & 0xFFFF, bb.getInt(pos + 12),
              bb.getShort(pos + 22) & 0xFFFF))
          case "data" => dataLen = sz
          case _ => () // LIST/INFO/etc: skip
        }
        pos += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      fmt.collect {
        case (ch, rate, bits) if dataLen >= 0 && ch > 0 && bits >= 8 && bits % 8 == 0 =>
          Audio(ch, rate, bits, dataLen / (ch * bits / 8))
      }
    }
  }

  /** YUV4MPEG2: ASCII stream header (`YUV4MPEG2 W.. H.. F..:.. ... C..\n`)
    * followed by `FRAME...\n` + raw planar frames. C444 and C420 plane
    * sizes supported; frame count comes from walking the actual stream.
    */
  object Y4m {
    def encode(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
               frames: Seq[Array[Byte]]): Array[Byte] = {
      frames.foreach(f => require(f.length == width * height * 3, "C444 frames"))
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C444\n".getBytes("US-ASCII"))
      val fh = "FRAME\n".getBytes("US-ASCII")
      frames.foreach { f => out.write(fh); out.write(f) }
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): Option[Video] = {
      val magic = "YUV4MPEG2"
      if (bytes.length < magic.length ||
        new String(bytes, 0, magic.length, "US-ASCII") != magic) return None
      var nl = 0
      while (nl < bytes.length && bytes(nl) != '\n') nl += 1
      if (nl >= bytes.length) return None
      val params = new String(bytes, 0, nl, "US-ASCII").split(" ").drop(1)
      var w = -1; var h = -1; var fn = 25; var fd = 1; var c = "420"
      params.foreach { p =>
        if (p.nonEmpty) p.charAt(0) match {
          case 'W' => w = p.drop(1).toInt
          case 'H' => h = p.drop(1).toInt
          case 'F' => val parts = p.drop(1).split(":"); fn = parts(0).toInt; fd = parts(1).toInt
          case 'C' => c = p.drop(1)
          case _ => ()
        }
      }
      if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
      val frameSize = c match {
        case s if s.startsWith("444") => w * h * 3
        case s if s.startsWith("420") => w * h + 2 * ((w + 1) / 2) * ((h + 1) / 2)
        case _ => return None
      }
      var pos = nl + 1
      var frames = 0
      while (pos < bytes.length) {
        if (!new String(bytes, pos, math.min(5, bytes.length - pos), "US-ASCII").startsWith("FRAME"))
          return None
        while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        pos += 1 + frameSize
        if (pos > bytes.length) return None
        frames += 1
      }
      Some(Video(w, h, fn, fd, frames))
    }
  }

  /** Entropy-coded raster formats via the JDK's bundled `javax.imageio`
    * plugins (Java SE standard, present in every JRE — not an external
    * dependency): JPEG (lossy DCT + Huffman) and GIF (LZW over a color
    * palette). Decode normalizes any color model to the row-major RGB /
    * gray layout the rest of the pipeline uses. JPEG is lossy, so its
    * tests pin dimensions exactly and the pixel sum within a tolerance;
    * GIF encode goes through an explicit `IndexColorModel` and is
    * bit-lossless for images with <= 256 distinct colors.
    */
  object Jdk {
    javax.imageio.ImageIO.setUseCache(false) // keep codecs purely in-memory

    private def toImage(bi: java.awt.image.BufferedImage): Image = {
      val w = bi.getWidth; val h = bi.getHeight
      val ch = if (bi.getColorModel.getNumColorComponents == 1) 1 else 3
      val out = new Array[Byte](w * h * ch)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        bi.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          if (ch == 1) out(y * w + x) = (p & 0xFF).toByte
          else {
            val d = (y * w + x) * 3
            out(d) = ((p >>> 16) & 0xFF).toByte
            out(d + 1) = ((p >>> 8) & 0xFF).toByte
            out(d + 2) = (p & 0xFF).toByte
          }
          x += 1
        }
        y += 1
      }
      Image(w, h, ch, out)
    }

    def decode(bytes: Array[Byte]): Option[Image] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        .map(toImage)
      catch { case _: java.io.IOException => None }

    private def toBufferedRgb(img: Image): java.awt.image.BufferedImage = {
      require(img.channels == 3, "JDK encoders take RGB")
      val bi = new java.awt.image.BufferedImage(img.width, img.height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val i = (y * img.width + x) * 3
          bi.setRGB(x, y, ((img.pixels(i) & 0xFF) << 16) |
            ((img.pixels(i + 1) & 0xFF) << 8) | (img.pixels(i + 2) & 0xFF))
          x += 1
        }
        y += 1
      }
      bi
    }

    def encodeJpeg(img: Image, quality: Float = 0.9f): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      try writer.write(null, new javax.imageio.IIOImage(toBufferedRgb(img), null, null), p)
      finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    /** Palette-indexed GIF encode: collects the image's distinct colors
      * into an `IndexColorModel` (first-seen order, so the palette is
      * deterministic) — lossless by construction under 256 colors.
      */
    def encodeGif(img: Image): Array[Byte] = {
      require(img.channels == 3, "GIF encoder takes RGB")
      val colors = new java.util.LinkedHashMap[Integer, Integer]()
      val idx = new Array[Byte](img.width * img.height)
      var p = 0
      while (p < idx.length) {
        val i = p * 3
        val rgb = ((img.pixels(i) & 0xFF) << 16) |
          ((img.pixels(i + 1) & 0xFF) << 8) | (img.pixels(i + 2) & 0xFF)
        var slot = colors.getOrDefault(rgb, -1)
        if (slot < 0) {
          slot = colors.size()
          require(slot < 256, "GIF needs <= 256 distinct colors")
          colors.put(rgb, slot)
        }
        idx(p) = slot.toByte
        p += 1
      }
      val n = colors.size()
      val r = new Array[Byte](n); val g = new Array[Byte](n); val b = new Array[Byte](n)
      val it = colors.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next(); val rgb = e.getKey.intValue(); val slot = e.getValue.intValue()
        r(slot) = ((rgb >>> 16) & 0xFF).toByte
        g(slot) = ((rgb >>> 8) & 0xFF).toByte
        b(slot) = (rgb & 0xFF).toByte
      }
      val icm = new java.awt.image.IndexColorModel(8, n, r, g, b)
      val bi = new java.awt.image.BufferedImage(img.width, img.height,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      bi.getRaster.setDataElements(0, 0, img.width, img.height, idx)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "gif", bos)
      bos.toByteArray
    }
  }

  /** Dispatch an image payload on its magic bytes. */
  def sniffImage(bytes: Array[Byte]): Option[Image] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') Bmp.decode(bytes)
    else if (bytes.length >= 2 && bytes(0) == 0x89.toByte && bytes(1) == 'P') Png.decode(bytes)
    else if (bytes.length >= 3 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) Jdk.decode(bytes)
    else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') Jdk.decode(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'P') Ppm.decode(bytes)
    else None

  /** Nearest-neighbor resize of a decoded image (pure pixel math; the
    * resample kernel a production pipeline would swap for area/bicubic).
    */
  def resizeNearest(img: Image, outW: Int, outH: Int): Image = {
    require(outW > 0 && outH > 0)
    val out = new Array[Byte](outW * outH * img.channels)
    var y = 0
    while (y < outH) {
      val sy = math.min(img.height - 1, y * img.height / outH)
      var x = 0
      while (x < outW) {
        val sx = math.min(img.width - 1, x * img.width / outW)
        var c = 0
        while (c < img.channels) {
          out((y * outW + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(outW, outH, img.channels, out)
  }
}

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed batch-wise with typed mapPartitions (the
  * Scala analog of mapInPandas — one decoder instance per partition, rows
  * streamed through it). Decoding is REAL (graft.multimodal.Codecs):
  * BMP/PPM/PNG/JPEG/GIF rasters, WAV PCM chunks, Y4M frame streams — all
  * JVM-only (hand-rolled or the JDK's bundled imageio plugins).
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  /** px_sum = sum of unsigned pixel bytes — a payload checksum proving the
    * raster was actually decoded, not just the header.
    */
  case class ImageMeta(media_id: Long, format: String, width: Int, height: Int,
                       channels: Int, bytes_len: Int, px_sum: Long)

  case class AudioMeta(media_id: Long, channels: Int, sample_rate: Int,
                       bits_per_sample: Int, n_frames: Int)

  case class VideoMeta(media_id: Long, width: Int, height: Int,
                       fps_num: Int, fps_den: Int, n_frames: Int)

  case class FrameSample(media_id: Long, frame_idx: Int, ts_ms: Long)

  /** Deterministic synthetic media table for tests/bench: REAL encoded
    * bytes — BMP or PPM images, PCM WAV audio, Y4M video — derived purely
    * from (seed, id).
    */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val rnd = new scala.util.Random(seed ^ id)
      (id % 3) match {
        case 0 =>
          val (w, h) = (16 + rnd.nextInt(64), 16 + rnd.nextInt(64))
          val encCase = (id / 3) % 5
          val enc = if (encCase == 3) {
            // GIF: 16-gray palette so the indexed encode is bit-lossless
            val pix = new Array[Byte](w * h * 3)
            var p = 0
            while (p < w * h) {
              val v = (((id * 31 + p * 7) % 16) * 17).toByte
              pix(p * 3) = v; pix(p * 3 + 1) = v; pix(p * 3 + 2) = v
              p += 1
            }
            Codecs.Jdk.encodeGif(Codecs.Image(w, h, 3, pix))
          } else {
            val pix = Array.tabulate(w * h * 3)(i => ((id * 31 + i * 7) % 256).toByte)
            val img = Codecs.Image(w, h, 3, pix)
            encCase match {
              case 0 => Codecs.Bmp.encode(img)
              case 1 => Codecs.Ppm.encode(img)
              case 2 => Codecs.Png.encode(img)
              case _ => Codecs.Jdk.encodeJpeg(img) // lossy: tests bound px_sum
            }
          }
          MediaRow(id, "image", enc)
        case 1 =>
          val channels = 1 + rnd.nextInt(2)
          val rate = Seq(8000, 16000)(rnd.nextInt(2))
          val samples = Array.tabulate(256 * channels)(i => ((id * 131 + i * 17) % 4096 - 2048).toShort)
          MediaRow(id, "audio", Codecs.Wav.encode(channels, rate, samples))
        case _ =>
          val (w, h) = (8 + 2 * rnd.nextInt(5), 6 + 2 * rnd.nextInt(4))
          val nFrames = 3 + rnd.nextInt(5)
          val frames = (0 until nFrames).map(f =>
            Array.tabulate(w * h * 3)(i => ((id * 17 + f * 101 + i) % 256).toByte))
          MediaRow(id, "video", Codecs.Y4m.encode(w, h, 4, 1, frames))
      }
    }
  }

  /** SQL-replicable twin of [[syntheticMedia]]: same row shapes and the
    * same REAL codecs, but every parameter (width, height, channels,
    * sample rate, frame count) and every pixel/sample is closed-form
    * modular arithmetic in (id) instead of scala.util.Random draws — so an
    * ANSI SQL oracle can recompute the decoded metadata (dimensions,
    * px_sum payload checksums, frame-sample times) WITHOUT decoding,
    * putting the real decode pipeline's outputs under the cross-engine
    * hash (the same twin device as d_minhash_pairs_md5). Images rotate
    * over the lossless codecs only (BMP/PPM/PNG/16-gray GIF) so px_sum is
    * formula-exact; the lossy JPEG leg stays covered by
    * [[syntheticMedia]]'s bounded goldens in MultimodalSpec.
    */
  def syntheticMediaSql(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      (id % 3) match {
        case 0 =>
          val w = 16 + ((id * 7919) % 64).toInt
          val h = 16 + ((id * 104729) % 64).toInt
          val encCase = (id / 3) % 4
          val enc = if (encCase == 3) {
            val pix = new Array[Byte](w * h * 3)
            var p = 0
            while (p < w * h) {
              val v = (((id * 31 + p * 7) % 16) * 17).toByte
              pix(p * 3) = v; pix(p * 3 + 1) = v; pix(p * 3 + 2) = v
              p += 1
            }
            Codecs.Jdk.encodeGif(Codecs.Image(w, h, 3, pix))
          } else {
            val pix = Array.tabulate(w * h * 3)(i => ((id * 31 + i * 7) % 256).toByte)
            val img = Codecs.Image(w, h, 3, pix)
            encCase match {
              case 0 => Codecs.Bmp.encode(img)
              case 1 => Codecs.Ppm.encode(img)
              case _ => Codecs.Png.encode(img)
            }
          }
          MediaRow(id, "image", enc)
        case 1 =>
          val channels = 1 + (id % 2).toInt
          val rate = if ((id / 3) % 2 == 0) 8000 else 16000
          val samples = Array.tabulate(256 * channels)(i =>
            ((id * 131 + i * 17) % 4096 - 2048).toShort)
          MediaRow(id, "audio", Codecs.Wav.encode(channels, rate, samples))
        case _ =>
          val w = 8 + 2 * ((id * 11) % 5).toInt
          val h = 6 + 2 * ((id * 5) % 4).toInt
          val nFrames = 3 + ((id * 3) % 5).toInt
          val frames = (0 until nFrames).map(f =>
            Array.tabulate(w * h * 3)(i => ((id * 17 + f * 101 + i) % 256).toByte))
          MediaRow(id, "video", Codecs.Y4m.encode(w, h, 4, 1, frames))
      }
    }
  }

  /** Decode image metadata batch-wise; undecodable rows are dropped (a
    * production pipeline would route them to a quarantine sink).
    */
  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder scope (stateful codecs initialize here)
      rows.flatMap { r =>
        Codecs.sniffImage(r.bytes).map { img =>
          var s = 0L
          var i = 0
          while (i < img.pixels.length) { s += img.pixels(i) & 0xFF; i += 1 }
          val fmt = if (r.bytes(0) == 'B') "bmp"
            else if (r.bytes(0) == 0x89.toByte) "png"
            else if (r.bytes(0) == 0xFF.toByte) "jpeg"
            else if (r.bytes(0) == 'G') "gif"
            else "ppm"
          ImageMeta(r.media_id, fmt, img.width, img.height, img.channels, r.bytes.length, s)
        }
      }
    }
  }

  /** Decode WAV audio metadata batch-wise (PCM chunk walk). */
  def decodeAudioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Codecs.Wav.decode(r.bytes).map(a =>
        AudioMeta(r.media_id, a.channels, a.sampleRate, a.bitsPerSample, a.frames))
    })
  }

  /** Decode Y4M video metadata batch-wise (frame-stream walk). */
  def decodeVideoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Codecs.Y4m.decode(r.bytes).map(v =>
        VideoMeta(r.media_id, v.width, v.height, v.fpsNum, v.fpsDen, v.frames))
    })
  }

  /** Resize plan: target box while preserving aspect ratio (metadata math;
    * `Codecs.resizeNearest` does the actual pixel work when applied).
    */
  def resizePlan(meta: Dataset[ImageMeta], maxSide: Int): DataFrame =
    meta.toDF().select(col("media_id"), col("width"), col("height"),
      when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
        .otherwise(lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
        .as("scale"))

  /** Deterministic frame sampling for video rows at `everyMs` spacing over
    * each clip's REAL duration (frame count and rate from the decoded Y4M
    * stream): frame_idx = floor(ts * fps / 1000).
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Codecs.Y4m.decode(r.bytes).toSeq.flatMap { v =>
        val durMs = v.frames.toLong * 1000L * v.fpsDen / v.fpsNum
        (0L until durMs by everyMs).map { ts =>
          FrameSample(r.media_id, (ts * v.fpsNum / (1000L * v.fpsDen)).toInt, ts)
        }
      }
    })
  }
}
