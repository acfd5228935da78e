package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater}

class MediaCodecsSpec extends AnyFunSuite {
  import MediaCodecs._

  // ------------------------------------------------------------------ WAV

  test("WAV PCM16 round-trip: header facts and exact square sum") {
    val samples = Array.tabulate(480)(i => ((i * 37) % 2001 - 1000).toShort)
    val info = decodeWav(encodeWavPcm16(8000, samples))
    assert(info == WavInfo(1, 8000, 16, 480, samples.map(s => s.toLong * s).sum))
  }

  test("WAV stereo: nSamples counts frames, not interleaved values") {
    val samples = Array.tabulate(100)(i => i.toShort) // 50 L/R frames
    val info = decodeWav(encodeWavPcm16(44100, samples, channels = 2))
    assert(info.channels == 2 && info.nSamples == 50)
  }

  test("WAV unknown chunks are skipped (LIST between fmt and data)") {
    val base = encodeWavPcm16(16000, Array[Short](1, 2, 3))
    // splice a LIST chunk (le size 4, body "INFO") after fmt, which ends at offset 36
    val listChunk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.take(36) ++ listChunk ++ base.drop(36)
    assert(decodeWav(spliced).sqSum == 1 + 4 + 9)
  }

  test("WAV rejects non-PCM and truncated input") {
    assertThrows[IllegalArgumentException](decodeWav("RIFFxxxxJUNK".getBytes))
    val float32 = encodeWavPcm16(8000, Array[Short](1))
    float32(20) = 3 // audioFormat = IEEE float
    assertThrows[IllegalArgumentException](decodeWav(float32))
  }

  // ------------------------------------------------------------------ BMP

  test("BMP 24bpp round-trip with padded rows (w=5: stride 16, not 15)") {
    val enc = encodeBmp24(5, 3, (x, y) => (x * 10, y * 20, x + y))
    val info = decodeBmp(enc)
    val expectSum = (for { x <- 0 until 5; y <- 0 until 3 } yield (x * 10) + (y * 20) + (x + y)).sum
    assert(info == BmpInfo(5, 3, 24, expectSum.toLong))
    assert(enc.length == 54 + 16 * 3) // padding present but excluded from the sum
  }

  test("BMP rejects non-BMP and compressed variants") {
    assertThrows[IllegalArgumentException](decodeBmp(Array.fill[Byte](60)(7)))
    val enc = encodeBmp24(2, 2, (_, _) => (1, 2, 3))
    enc(30) = 1 // BI_RLE8 compression flag
    assertThrows[IllegalArgumentException](decodeBmp(enc))
  }

  // ------------------------------------------------------------------ PNG

  test("PNG RGB round-trip (filter None path)") {
    val enc = encodePngRgb(7, 4, (x, y) => ((x * 3) % 256, (y * 5) % 256, (x + y) % 256))
    val info = decodePng(enc)
    val expectSum = (for { x <- 0 until 7; y <- 0 until 4 }
      yield (x * 3) % 256 + (y * 5) % 256 + (x + y) % 256).sum
    assert(info == PngInfo(7, 4, 8, 2, expectSum.toLong))
  }

  /** Build a PNG from pre-filtered raw scanline bytes (filter byte + data
    * per row) so every filter type's unfilter path is exercised.
    */
  private def pngFromRaw(w: Int, h: Int, colorType: Int, raw: Array[Byte]): Array[Byte] = {
    def chunk(typ: String, body: Array[Byte]): Array[Byte] = {
      val buf = ByteBuffer.allocate(12 + body.length)
      buf.putInt(body.length).put(typ.getBytes("US-ASCII")).put(body)
      val crc = new CRC32
      crc.update(typ.getBytes("US-ASCII")); crc.update(body)
      buf.putInt(crc.getValue.toInt).array()
    }
    val ihdr = ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val deflater = new Deflater(); deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) out.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++ chunk("IEND", Array.empty)
  }

  test("PNG Sub/Up/Average/Paeth filters unfilter correctly (grayscale)") {
    // 3x4 grayscale, target pixels row-major:
    val px = Array(
      Array(10, 20, 30),
      Array(15, 25, 35),
      Array(100, 200, 44),
      Array(90, 180, 60))
    // row 0: Sub     → raw = cur - left
    // row 1: Up      → raw = cur - up
    // row 2: Average → raw = cur - floor((left+up)/2)
    // row 3: Paeth   → raw = cur - paeth(left, up, upleft)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new java.io.ByteArrayOutputStream()
    raw.write(1); px(0).zipWithIndex.foreach { case (v, i) =>
      raw.write((v - (if (i > 0) px(0)(i - 1) else 0)) & 0xff) }
    raw.write(2); px(1).zipWithIndex.foreach { case (v, i) => raw.write((v - px(0)(i)) & 0xff) }
    raw.write(3); px(2).zipWithIndex.foreach { case (v, i) =>
      raw.write((v - ((if (i > 0) px(2)(i - 1) else 0) + px(1)(i)) / 2) & 0xff) }
    raw.write(4); px(3).zipWithIndex.foreach { case (v, i) =>
      raw.write((v - paeth(if (i > 0) px(3)(i - 1) else 0, px(2)(i),
        if (i > 0) px(2)(i - 1) else 0)) & 0xff) }
    val info = decodePng(pngFromRaw(3, 4, colorType = 0, raw.toByteArray))
    assert(info == PngInfo(3, 4, 8, 0, px.flatten.sum.toLong))
  }

  test("PNG RGBA: alpha bytes excluded from the pixel sum") {
    // 2x1 RGBA, filter None: pixels (1,2,3,alpha=200), (4,5,6,alpha=100)
    val raw = Array[Byte](0, 1, 2, 3, 200.toByte, 4, 5, 6, 100.toByte)
    val info = decodePng(pngFromRaw(2, 1, colorType = 6, raw))
    assert(info == PngInfo(2, 1, 8, 6, 1 + 2 + 3 + 4 + 5 + 6))
  }

  test("PNG corrupted CRC is rejected") {
    val enc = encodePngRgb(3, 3, (_, _) => (9, 9, 9))
    enc(20) = (enc(20) ^ 0xff).toByte // flip a byte inside IHDR body
    assertThrows[IllegalArgumentException](decodePng(enc))
  }

  // ----------------------------------------------------------- properties

  test("codec round-trips hold for arbitrary dims and content (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import org.scalacheck.Test.{check, Parameters}
    val params = Parameters.default.withMinSuccessfulTests(40)

    val wavProp = forAll(Gen.choose(0, 600), Gen.choose(1L, Long.MaxValue)) { (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val info = decodeWav(encodeWavPcm16(16000, samples))
      info.nSamples == n.toLong &&
        info.sqSum == samples.map(s => s.toLong * s).sum
    }
    val imgGen = for {
      w <- Gen.choose(1, 40); h <- Gen.choose(1, 40); seed <- Gen.choose(1L, Long.MaxValue)
    } yield (w, h, seed)
    def pixels(w: Int, h: Int, seed: Long): (Int, Int) => (Int, Int, Int) = {
      val rnd = new scala.util.Random(seed)
      val data = Array.fill(h, w)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      (x, y) => data(y)(x)
    }
    def sum3(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Long =
      (for { y <- 0 until h; x <- 0 until w; v = px(x, y) } yield (v._1 + v._2 + v._3).toLong).sum
    val bmpProp = forAll(imgGen) { case (w, h, seed) =>
      val px = pixels(w, h, seed)
      val info = decodeBmp(encodeBmp24(w, h, px))
      info.width == w && info.height == h && info.pixSum == sum3(w, h, px)
    }
    val pngProp = forAll(imgGen) { case (w, h, seed) =>
      val px = pixels(w, h, seed)
      val info = decodePng(encodePngRgb(w, h, px))
      info.width == w && info.height == h && info.pixSum == sum3(w, h, px)
    }
    for ((name, p) <- Seq(("wav", wavProp), ("bmp", bmpProp), ("png", pngProp))) {
      val res = check(params, p)
      assert(res.passed, s"$name round-trip property failed: ${res.status}")
    }
  }

  // -------------------------------------------------------------- dispatch

  test("decodeAny sniffs magic bytes and degrades unknown formats to a stub row") {
    val wav = decodeAny(1, encodeWavPcm16(8000, Array[Short](3)))
    assert(wav.format == "wav" && wav.content_sum == 9)
    val bmp = decodeAny(2, encodeBmp24(2, 2, (_, _) => (1, 1, 1)))
    assert(bmp.format == "bmp" && bmp.n_units == 4 && bmp.content_sum == 12)
    val png = decodeAny(3, encodePngRgb(2, 2, (_, _) => (2, 2, 2)))
    assert(png.format == "png" && png.content_sum == 24)
    val unknown = decodeAny(4, Array[Byte](1, 2, 3))
    assert(unknown.format == "unknown" && unknown.n_units == 3)
  }

  test("WAV odd-size data chunk skips both the leftover byte and the RIFF pad") {
    // data chunk of declared size 7 (3 shorts + 1 stray byte, + 1 RIFF
    // pad on the wire), followed by a LIST chunk the walk must land on
    val base = encodeWavPcm16(8000, Array[Short](1, 2, 3))
    val buf = ByteBuffer.allocate(base.length + 2 + 12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(base, 0, 40)                        // RIFF + fmt + "data" tag
    buf.putInt(7)                               // odd data size
    buf.put(base, 44, 6)                        // the 3 samples
    buf.put(9.toByte)                           // stray 7th data byte
    buf.put(0.toByte)                           // RIFF pad
    buf.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    val bytes = java.util.Arrays.copyOf(buf.array(), buf.position())
    val info = decodeWav(bytes)
    assert(info.sqSum == 1 + 4 + 9) // walk survived the odd chunk + pad
  }

  test("PNG with a truncated deflate stream is corrupt, not an infinite loop") {
    // valid signature + IHDR, IDAT holding half a deflate stream (CRCs valid)
    val full = encodePngRgb(16, 16, (x, y) => (x, y, 7))
    // find the IDAT chunk and rebuild it with its body cut in half
    val buf = ByteBuffer.wrap(full)
    buf.position(8)
    val out = new java.io.ByteArrayOutputStream()
    out.write(full, 0, 8)
    var done = false
    while (!done && buf.remaining() >= 12) {
      val len = buf.getInt; val typ = new Array[Byte](4); buf.get(typ)
      val body = new Array[Byte](len); buf.get(body); buf.getInt
      val t = new String(typ, "US-ASCII")
      val newBody = if (t == "IDAT") body.take(body.length / 2) else body
      val crc = new CRC32; crc.update(typ); crc.update(newBody)
      val cb = ByteBuffer.allocate(12 + newBody.length)
        .putInt(newBody.length).put(typ).put(newBody).putInt(crc.getValue.toInt)
      out.write(cb.array())
      if (t == "IEND") done = true
    }
    val res = decodeAny(9, out.toByteArray) // must return, not hang
    assert(res.format == "corrupt")
  }

  test("JPEG round-trip via javax.imageio: exact dims/channels, pixel sum within tolerance") {
    // lossy codec: dims and band count must be EXACT; the decoded pixel
    // sum approximates the pre-encode sum. Measured worst case for this
    // gradient family is 0.36/pixel at quality 0.95 — assert a 2/pixel
    // bound here (tighter than the 8/pixel oracle gate in q_media_decode)
    for ((w, h, seed) <- Seq((16, 11, 3L), (4, 3, 107L), (9, 7, 251L))) {
      val pix = (x: Int, y: Int) => ((seed + 7 * x + 11 * y) % 256).toInt
      val bytes = encodeJpegGray(w, h, pix)
      assert(bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      val j = decodeJpeg(bytes)
      assert(j.width == w && j.height == h && j.channels == 1)
      val expected = (for (y <- 0 until h; x <- 0 until w) yield pix(x, y).toLong).sum
      assert(math.abs(j.pixSum - expected) <= 2L * w * h,
        s"jpeg sum ${j.pixSum} vs expected $expected for ${w}x$h seed=$seed")
    }
  }

  test("decodeAny sniffs JPEG magic and quarantines truncated JPEG as corrupt") {
    val ok = decodeAny(7, encodeJpegGray(8, 5, (x, y) => (x * 31 + y * 7) % 256))
    assert(ok.format == "jpeg" && ok.width == 8 && ok.height == 5 && ok.n_units == 40L)
    val cut = encodeJpegGray(8, 5, (x, y) => (x * 31 + y * 7) % 256).take(24)
    assert(decodeAny(8, cut).format == "corrupt")
  }

  test("real resize: raster formats scale to maxDim with aspect kept, mean preserved, no upscale") {
    val pix = (x: Int, y: Int) => { val v = (40 + x + 2 * y) % 256; (v, v, v) }
    val srcs = Seq(
      "png" -> encodePngRgb(100, 60, pix),
      "bmp" -> encodeBmp24(100, 60, pix),
      "jpeg" -> encodeJpegGray(100, 60, (x, y) => pix(x, y)._1))
    for ((fmt, bytes) <- srcs) {
      val r = resizeImage(bytes, maxDim = 50).getOrElse(fail(s"$fmt must be resizable"))
      assert(r.width == 50 && r.height == 30, s"$fmt resized to ${r.width}x${r.height}")
      assert(r.format == "png")
      val out = decodePng(r.bytes) // output must itself decode losslessly
      assert(out.width == 50 && out.height == 30 && out.colorType == 2)
      // bilinear downscale preserves the mean brightness closely
      val meanOut = out.pixSum.toDouble / (out.width * out.height * 3)
      val meanIn = (for (y <- 0 until 60; x <- 0 until 100) yield pix(x, y)._1).sum / 6000.0
      assert(math.abs(meanOut - meanIn) <= 8.0, s"$fmt mean $meanOut vs $meanIn")
    }
    // small images are re-encoded but never upscaled
    val small = resizeImage(encodePngRgb(8, 5, pix), maxDim = 50).get
    assert(small.width == 8 && small.height == 5)
    // non-images are not silently mangled — callers get None and fall back
    assert(resizeImage(encodeWavPcm16(8000, Array[Short](1, 2, 3)), 50).isEmpty)
  }

  test("animated GIF round-trip: frame count, dims, exact palette-faithful pixel sums") {
    def v(f: Int, x: Int, y: Int): Int = (f * 37 + 7 * x + 11 * y) % 256
    val gif = encodeGifGrayFrames(9, 6, 4, v)
    val info = decodeGif(gif)
    assert(info.width == 9 && info.height == 6 && info.nFrames == 4)
    // exact: gray palette writes values verbatim; decoded RGB sums to 3*v
    val expected = 3L * (for (f <- 0 until 4; y <- 0 until 6; x <- 0 until 9) yield v(f, x, y)).sum
    assert(info.pixSum == expected, s"${info.pixSum} vs $expected")
    // frame count probe decodes no pixels but agrees
    assert(gifFrameCount(gif) == 4)
    // sniff dispatch: n_units = pixels across all frames
    val any = decodeAny(7, gif)
    assert(any.format == "gif" && any.n_units == 9L * 6 * 4 && any.content_sum == expected)
  }

  test("sampled GIF frame decode equals the full decode on the sampled subset") {
    def v(f: Int, x: Int, y: Int): Int = (f * 19 + 3 * x + 5 * y) % 256
    val gif = encodeGifGrayFrames(5, 4, 7, v)
    val sampled = decodeGifFrames(gif, Seq(0, 2, 4, 6, 99, -1)) // out-of-range skipped
    assert(sampled.map(_._1) == Seq(0, 2, 4, 6))
    sampled.foreach { case (i, w, h, s) =>
      assert(w == 5 && h == 4)
      val exp = 3L * (for (y <- 0 until 4; x <- 0 until 5) yield v(i, x, y)).sum
      assert(s == exp, s"frame $i: $s vs $exp")
    }
  }

  test("decodeAny quarantines malformed blobs as 'corrupt' instead of throwing") {
    // truncated WAV (valid magic, body cut mid-header)
    val wav = decodeAny(1, encodeWavPcm16(8000, Array[Short](1, 2, 3)).take(20))
    assert(wav.format == "corrupt" && wav.n_units == 20)
    // PNG with a flipped byte (CRC failure)
    val png = encodePngRgb(3, 3, (_, _) => (1, 1, 1))
    png(20) = (png(20) ^ 0xff).toByte
    assert(decodeAny(2, png).format == "corrupt")
    // BMP header claiming more rows than the buffer holds
    val bmp = encodeBmp24(4, 2, (_, _) => (1, 1, 1))
    java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, 999)
    assert(decodeAny(3, bmp).format == "corrupt")
  }
}
