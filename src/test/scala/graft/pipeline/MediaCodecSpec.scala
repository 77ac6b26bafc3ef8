package graft.pipeline

import graft.SparkSpec

/** The REAL decode contract: handcrafted PPM and BMP byte streams (built
  * here from the format specs, not by any library) must decode to the same
  * pixels, hash container-independently, and flow through the shared
  * batched-decode pipeline alongside non-image payloads.
  */
class MediaCodecSpec extends SparkSpec {
  import spark.implicits._
  import MediaCodec._

  /** 2x2 test image: row-major RGB = red, green / blue, white. */
  private val px2x2: Array[Byte] = Array(
    255, 0, 0,   0, 255, 0,
    0, 0, 255,   255, 255, 255).map(_.toByte)

  private def ppm2x2(header: String = "P6\n2 2\n255\n"): Array[Byte] =
    header.getBytes("US-ASCII") ++ px2x2

  /** Build a 24bpp BMP of the given row-major RGB pixels, exercising the
    * row padding (width 2 -> 8-byte rows) and row order for real.
    */
  private def bmp(width: Int, height: Int, rgb: Array[Byte], topDown: Boolean = false): Array[Byte] = {
    val rowBytes = ((width * 3 + 3) / 4) * 4
    val pixelOffset = 54
    val size = pixelOffset + rowBytes * height
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(pixelOffset)
    b.putInt(40).putInt(width).putInt(if (topDown) -height else height)
      .putShort(1).putShort(24).putInt(0).putInt(rowBytes * height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    val out = b.array()
    for (row <- 0 until height; x <- 0 until width) {
      val srcRow = if (topDown) row else height - 1 - row
      val dst = pixelOffset + row * rowBytes + 3 * x
      out(dst) = rgb(3 * (srcRow * width + x) + 2)     // B
      out(dst + 1) = rgb(3 * (srcRow * width + x) + 1) // G
      out(dst + 2) = rgb(3 * (srcRow * width + x))     // R
    }
    out
  }

  test("PPM decode: header variants (comments, multi-whitespace) and exact pixels") {
    val plain = decodePpm(ppm2x2())
    assert(plain.width == 2 && plain.height == 2)
    assert(plain.rgb.toSeq == px2x2.toSeq)
    val commented = decodePpm(ppm2x2("P6\n# a comment\n 2\t2 # trailing\n255\n"))
    assert(commented == plain.copy(rgb = commented.rgb) && commented.rgb.toSeq == px2x2.toSeq)
  }

  test("PPM decode: strict rejects (truncated pixels, bad maxval, wrong magic)") {
    intercept[IllegalArgumentException](decodePpm(ppm2x2().dropRight(1)))
    intercept[IllegalArgumentException](decodePpm(ppm2x2("P6\n2 2\n70000\n"))) // > 16-bit
    // maxval > 255 means TWO bytes per sample: the 12 one-byte pixels are
    // now a truncated payload, not a valid image
    intercept[IllegalArgumentException](decodePpm(ppm2x2("P6\n2 2\n65535\n")))
    intercept[IllegalArgumentException](decodePpm("P5\n2 2\n255\n".getBytes ++ px2x2))
  }

  test("PPM decode: 16-bit samples (maxval > 255) normalize via v*255/maxval, MSB first") {
    def be16(vs: Int*): Array[Byte] =
      vs.flatMap(v => Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)).toArray
    // maxval 65535: normalization is exactly v div 257
    val img = decodePpm("P6\n1 1\n65535\n".getBytes("US-ASCII") ++ be16(65535, 0, 32770))
    assert(img.rgb.toSeq == Seq(255, 0, 127).map(_.toByte))
    // non-canonical maxval: 299 * 255 / 300 truncates to 254
    val odd = decodePpm("P6\n1 1\n300\n".getBytes("US-ASCII") ++ be16(299, 300, 0))
    assert(odd.rgb.toSeq == Seq(254, 255, 0).map(_.toByte))
    // a sample above maxval is corrupt data, not something to clamp
    intercept[IllegalArgumentException](
      decodePpm("P6\n1 1\n300\n".getBytes("US-ASCII") ++ be16(301, 0, 0)))
    // truncated mid-sample (odd byte count) rejects
    intercept[IllegalArgumentException](
      decodePpm("P6\n1 1\n65535\n".getBytes("US-ASCII") ++ be16(65535, 0, 32770).dropRight(1)))
  }

  test("PGM decode: grayscale P5 replicates to R=G=B; 16-bit, dispatch, strict rejects") {
    def be16(vs: Int*): Array[Byte] =
      vs.flatMap(v => Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)).toArray
    val gray = Array(0, 127, 128, 255).map(_.toByte)
    val img = decodePgm("P5\n# gray\n2 2\n255\n".getBytes("US-ASCII") ++ gray)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == gray.toSeq.flatMap(g => Seq(g, g, g)))
    // rgbSum of a replicated gray pixel is exactly 3*g — the identity the
    // mm_real_gray oracle's odd-parity branch recomputes
    assert((0 until 4).forall(i => img.rgbSum(i) == 3 * (gray(i) & 0xff)))
    // 16-bit samples: maxval 65535 normalizes v div 257, MSB first
    val deep = decodePgm("P5\n2 1\n65535\n".getBytes("US-ASCII") ++ be16(65535, 514))
    assert(deep.rgb.toSeq == Seq(255, 255, 255, 2, 2, 2).map(_.toByte))
    // unified sniff + decode dispatch routes P5 to the PGM decoder
    assert(MediaCodec.sniff(img.rgb.take(0) ++ "P5\nx".getBytes("US-ASCII")).contains("pgm"))
    assert(MediaCodec.decode("P5\n2 2\n255\n".getBytes("US-ASCII") ++ gray).rgb.toSeq == img.rgb.toSeq)
    // strict rejects: truncated pixels, wrong magic, sample above maxval,
    // hostile dimensions (shared Long-math guard with P6)
    intercept[IllegalArgumentException](decodePgm("P5\n2 2\n255\n".getBytes("US-ASCII") ++ gray.dropRight(1)))
    intercept[IllegalArgumentException](decodePgm("P6\n2 2\n255\n".getBytes("US-ASCII") ++ gray))
    intercept[IllegalArgumentException](decodePgm("P5\n1 1\n300\n".getBytes("US-ASCII") ++ be16(301)))
    intercept[IllegalArgumentException](decodePgm("P5\n65536 65536\n255\n".getBytes("US-ASCII") ++ gray))
  }

  test("BMP decode: bottom-up and top-down both normalize to the PPM pixels") {
    val fromPpm = decodePpm(ppm2x2())
    val up = decodeBmp(bmp(2, 2, px2x2))
    val down = decodeBmp(bmp(2, 2, px2x2, topDown = true))
    assert(up.width == 2 && up.height == 2)
    assert(up.rgb.toSeq == fromPpm.rgb.toSeq, "bottom-up BMP must match PPM pixels")
    assert(down.rgb.toSeq == fromPpm.rgb.toSeq, "top-down BMP must match PPM pixels")
  }

  test("BMP decode: 32bpp BGRA quads, alpha ignored, top-down and bottom-up") {
    // 2x2 top-down: pixels (R,G,B,A) rows [(1,2,3,9),(4,5,6,9)],[(7,8,10,9),(11,12,13,9)]
    def px(r: Int, g: Int, b: Int) = Seq(b.toByte, g.toByte, r.toByte, 9.toByte)
    val rows = Seq(px(1, 2, 3) ++ px(4, 5, 6), px(7, 8, 10) ++ px(11, 12, 13))
    def file(topDown: Boolean) = {
      val b = java.nio.ByteBuffer.allocate(54 + 16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(70).putInt(0).putInt(54)
      b.putInt(40).putInt(2).putInt(if (topDown) -2 else 2)
        .putShort(1).putShort(32).putInt(0).putInt(16).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      (if (topDown) rows else rows.reverse).foreach(r => b.put(r.toArray))
      b.array()
    }
    val expect = Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13)
    assert(decodeBmp(file(topDown = true)).rgb.toSeq == expect)
    assert(decodeBmp(file(topDown = false)).rgb.toSeq == expect)
  }

  test("BMP decode: 8bpp palette indexing, row padding, biClrUsed=0 means 256, bad index rejects") {
    // 2x2 bottom-up, 3-color palette, width 2 -> 4-byte padded index rows
    def file(nClrUsed: Int, idx: Seq[Int]) = {
      val nPal = 3
      val b = java.nio.ByteBuffer.allocate(54 + 4 * nPal + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54 + 4 * nPal + 8).putInt(0).putInt(54 + 4 * nPal)
      b.putInt(40).putInt(2).putInt(2)
        .putShort(1).putShort(8).putInt(0).putInt(8).putInt(2835).putInt(2835)
        .putInt(nClrUsed).putInt(0)
      // palette entries are B,G,R,reserved
      b.put(Array[Byte](30, 20, 10, 0)) // color 0 -> RGB (10,20,30)
      b.put(Array[Byte](60, 50, 40, 0)) // color 1 -> RGB (40,50,60)
      b.put(Array[Byte](90, 80, 70, 0)) // color 2 -> RGB (70,80,90)
      // bottom-up rows with 2 pad bytes each: file rows are [row1, row0]
      b.put(Array[Byte](idx(2).toByte, idx(3).toByte, 99.toByte, 99.toByte))
      b.put(Array[Byte](idx(0).toByte, idx(1).toByte, 99.toByte, 99.toByte))
      b.array()
    }
    val got = decodeBmp(file(3, Seq(0, 1, 2, 0)))
    assert(got.rgb.toSeq == Seq[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 10, 20, 30))
    // biClrUsed = 0 means a full 256-entry table must fit -> this file rejects
    intercept[IllegalArgumentException](decodeBmp(file(0, Seq(0, 1, 2, 0))))
    // an index beyond biClrUsed rejects instead of reading stray bytes
    intercept[IllegalArgumentException](decodeBmp(file(3, Seq(0, 1, 2, 3))))
  }

  test("BMP decode: strict rejects (unsupported bpp, compressed)") {
    val good = bmp(2, 2, px2x2)
    val bpp16 = good.clone(); bpp16(28) = 16 // 16bpp bitfields: genuinely unsupported
    intercept[IllegalArgumentException](decodeBmp(bpp16))
    val rle = good.clone(); rle(30) = 1
    intercept[IllegalArgumentException](decodeBmp(rle))
  }

  test("encodePpm round-trips and sniff dispatches by magic") {
    val img = decodeBmp(bmp(2, 2, px2x2))
    val rt = decodePpm(encodePpm(img))
    assert(rt.width == img.width && rt.height == img.height)
    assert(rt.rgb.toSeq == img.rgb.toSeq)
    assert(sniff(ppm2x2()).contains("ppm"))
    assert(sniff(bmp(2, 2, px2x2)).contains("bmp"))
    assert(sniff("just some text".getBytes).isEmpty)
  }

  test("ahash64 is container-independent and resize-tolerant") {
    val rnd = new scala.util.Random(11)
    val w = 16; val h = 16
    val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
    val img = RasterImage(w, h, rgb)
    assert(ahash64(decodePpm(encodePpm(img))) == ahash64(decodeBmp(bmp(w, h, rgb))),
      "same pixels in PPM and BMP containers must hash identically")
    // nearest-neighbor 2x upscale pools back onto the same 8x8 grid cells
    val big = RasterImage(2 * w, 2 * h, Array.tabulate(2 * w * 2 * h * 3) { i =>
      val p = i / 3; val c = i % 3
      val y = p / (2 * w); val x = p % (2 * w)
      rgb(3 * ((y / 2) * w + x / 2) + c)
    })
    val ham = java.lang.Long.bitCount(ahash64(img) ^ ahash64(big))
    assert(ham <= 3, s"2x nearest-neighbor upscale must stay a near-dup: hamming $ham")
  }

  test("bandedLuma: exact integer band sums with one division") {
    val rnd = new scala.util.Random(23)
    val rgb = Array.fill(8 * 8 * 3)(rnd.nextInt(256).toByte)
    val img = RasterImage(8, 8, rgb)
    val got = bandedLuma(img)
    assert(got.length == Multimodal.FeatureDim)
    val expected = (0 until 8).map { k =>
      val sum = (8 * k until 8 * (k + 1)).map(img.rgbSum).map(_.toLong).sum
      (sum / 6120.0).toFloat
    }
    assert(got.toSeq == expected)
  }

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
    b.array() // allocate() zero-fills, so odd bodies get their pad byte
  }

  private def fmtBody(tag: Int = 1, channels: Int = 1, rate: Int = 8000, bits: Int = 8) = {
    val b = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putShort(tag.toShort).putShort(channels.toShort).putInt(rate).putInt(rate * channels)
      .putShort(channels.toShort).putShort(bits.toShort)
    b.array()
  }

  private def riff(chunks: Array[Byte]*): Array[Byte] = {
    val body = chunks.flatten.toArray
    val b = java.nio.ByteBuffer.allocate(12 + body.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(4 + body.length).put("WAVE".getBytes).put(body)
    b.array()
  }

  test("WAV decode: chunk walk skips LIST and odd-size junk, parses fmt, takes data") {
    val samples = Array.tabulate(16)(i => (100 + 7 * i).toByte)
    val wav = riff(
      chunk("LIST", "INFOsomething".getBytes), // 13 bytes: odd → padded
      chunk("fmt ", fmtBody()),
      chunk("junk", Array[Byte](1, 2, 3)),     // odd again
      chunk("data", samples))
    val got = decodeWav(wav)
    assert(got.sampleRate == 8000)
    assert(got.samples.toSeq == samples.map(_ & 0xff).toSeq)
    // the constant builder parses through the same decoder
    val canonical = wavHeader(16) ++ samples
    assert(decodeWav(canonical).samples.toSeq == samples.map(_ & 0xff).toSeq)
  }

  test("WAV decode: 16-bit little-endian signed, mono") {
    val values = Seq(0, 1, -1, 32767, -32768, 256, -257, 12345)
    val data = values.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
    val got = decodeWav(riff(chunk("fmt ", fmtBody(bits = 16)), chunk("data", data)))
    assert(got.bits == 16)
    assert(got.samples.toSeq == values)
    // full-scale amplitude for 16-bit is |s| / 32768
    assert(got.amplitude(3) == 32767 && got.amplitude(4) == 32768)
  }

  test("WAV decode: stereo downmixes with the exact floor mean (L+R) >> 1") {
    // 8-bit stereo: frames (100, 101) and (0, 255) -> 100, 127
    val d8 = Array[Byte](100, 101, 0, 255.toByte)
    assert(decodeWav(riff(chunk("fmt ", fmtBody(channels = 2)), chunk("data", d8)))
      .samples.toSeq == Seq(100, 127))
    // 16-bit stereo: (-3, 2) -> floor(-1/2) = -1 (the sign-sensitive case),
    // (1000, 2001) -> 1500
    val d16 = Seq(-3, 2, 1000, 2001)
      .flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
    assert(decodeWav(riff(chunk("fmt ", fmtBody(channels = 2, bits = 16)), chunk("data", d16)))
      .samples.toSeq == Seq(-1, 1500))
  }

  test("WAV decode: 24-bit little-endian signed, mono and stereo downmix") {
    val values = Seq(0, 1, -1, 8388607, -8388608, 65536, -65537, 1234567)
    def le24(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
    val data = values.flatMap(le24).toArray
    val got = decodeWav(riff(chunk("fmt ", fmtBody(bits = 24)), chunk("data", data)))
    assert(got.bits == 24)
    assert(got.samples.toSeq == values)
    assert(got.fullScale == 8388608.0)
    assert(got.amplitude(3) == 8388607 && got.amplitude(4) == 8388608)
    // stereo (-3, 2) -> floor(-1/2) = -1 (sign-sensitive), (100000, 200001) -> 150000
    val d2 = Seq(-3, 2, 100000, 200001).flatMap(le24).toArray
    assert(decodeWav(riff(chunk("fmt ", fmtBody(channels = 2, bits = 24)), chunk("data", d2)))
      .samples.toSeq == Seq(-1, 150000))
  }

  test("WAV decode: float32 (tag 3) quantizes to the 16-bit grid exactly") {
    def leF(f: Float) = {
      val b = java.lang.Float.floatToIntBits(f)
      Seq((b & 0xff).toByte, ((b >> 8) & 0xff).toByte, ((b >> 16) & 0xff).toByte,
        ((b >> 24) & 0xff).toByte)
    }
    // clamp at both rails, trunc toward zero both signs, denormals -> 0
    val fs = Seq(1.0f, -1.0f, 0.5f, -0.5f, 0.25f, 0.1f, -0.1f, 1.9999999f,
      java.lang.Float.MIN_VALUE, -java.lang.Float.MIN_VALUE, 0.0f, -0.0f)
    val expect = Seq(32767, -32768, 16384, -16384, 8192, 3276, -3276, 32767, 0, 0, 0, 0)
    val data = fs.flatMap(leF).toArray
    val got = decodeWav(riff(chunk("fmt ", fmtBody(tag = 3, bits = 32)), chunk("data", data)))
    assert(got.bits == 32)
    assert(got.fullScale == 32768.0)
    assert(got.samples.toSeq == expect)
    // stereo floats quantize per channel FIRST, then integer floor mean:
    // (0.5, 0.25) -> (16384 + 8192) >> 1 = 12288
    val d2 = Seq(0.5f, 0.25f).flatMap(leF).toArray
    assert(decodeWav(riff(chunk("fmt ", fmtBody(tag = 3, channels = 2, bits = 32)),
      chunk("data", d2))).samples.toSeq == Seq(12288))
    // a real float WAV's fact chunk between fmt and data is walked over
    val fact = chunk("fact", Array[Byte](2, 0, 0, 0))
    assert(decodeWav(riff(chunk("fmt ", fmtBody(tag = 3, bits = 32)), fact,
      chunk("data", Seq(0.5f, -0.5f).flatMap(leF).toArray))).samples.toSeq == Seq(16384, -16384))
    // non-finite samples reject loudly
    intercept[IllegalArgumentException](
      decodeWav(riff(chunk("fmt ", fmtBody(tag = 3, bits = 32)),
        chunk("data", leF(java.lang.Float.NaN).toArray))))
    intercept[IllegalArgumentException](
      decodeWav(riff(chunk("fmt ", fmtBody(tag = 3, bits = 32)),
        chunk("data", leF(java.lang.Float.POSITIVE_INFINITY).toArray))))
  }

  test("WAV decode: IMA-ADPCM (tag 17) — state machine vs reference fold, rails, blocks") {
    def adpcmFmt(blockAlign: Int, spb: Int) = {
      val b = java.nio.ByteBuffer.allocate(20).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(0x11).putShort(1).putInt(8000).putInt(4000)
        .putShort(blockAlign.toShort).putShort(4).putShort(2).putShort(spb.toShort)
      b.array()
    }
    def blockOf(pred0: Int, idx0: Int, nibbles: Seq[Int]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 + nibbles.size / 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(pred0.toShort).put(idx0.toByte).put(0.toByte)
      nibbles.grouped(2).foreach { case Seq(lo, hi) => b.put((lo | (hi << 4)).toByte) }
      b.array()
    }
    // independent reference spelling of the public IMA algorithm
    val steps = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25,
      28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
      130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
      449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
      1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660,
      4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
      11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)
    def ref(pred0: Int, idx0: Int, nibbles: Seq[Int]): Seq[Int] = {
      var pred = pred0; var idx = idx0
      pred0 +: nibbles.map { n =>
        val st = steps(idx)
        var d = st / 8
        if ((n & 1) != 0) d += st / 4
        if ((n & 2) != 0) d += st / 2
        if ((n & 4) != 0) d += st
        pred = math.max(-32768, math.min(32767, if ((n & 8) != 0) pred - d else pred + d))
        idx = math.max(0, math.min(88, idx + Seq(-1, -1, -1, -1, 2, 4, 6, 8)(n & 7)))
        pred
      }
    }
    val rnd = new scala.util.Random(11)
    val n1 = Seq.fill(16)(rnd.nextInt(16))
    val n2 = Seq.fill(16)(rnd.nextInt(16))
    // two blocks: the second's header resets predictor AND index
    val wav = riff(chunk("fmt ", adpcmFmt(12, 17)),
      chunk("data", blockOf(-3, 20, n1) ++ blockOf(1000, 60, n2)))
    val got = decodeWav(wav)
    assert(got.bits == 16)
    assert(got.samples.toSeq == ref(-3, 20, n1) ++ ref(1000, 60, n2))
    // rails: from near the top at max step, an all-add nibble pins at 32767
    val railed = decodeWav(riff(chunk("fmt ", adpcmFmt(5, 3)),
      chunk("data", blockOf(32700, 88, Seq(7, 7)))))
    assert(railed.samples.toSeq == Seq(32700, 32767, 32767))
    // rejects: stereo ADPCM, out-of-range step index, missing extension
    intercept[IllegalArgumentException](decodeWav(riff(
      chunk("fmt ", { val f = adpcmFmt(12, 17); f(2) = 2; f }),
      chunk("data", blockOf(0, 0, n1) ++ blockOf(0, 0, n1)))))
    intercept[IllegalArgumentException](decodeWav(riff(chunk("fmt ", adpcmFmt(12, 17)),
      chunk("data", blockOf(0, 89, n1)))))
    intercept[IllegalArgumentException](decodeWav(riff(
      chunk("fmt ", adpcmFmt(12, 17).take(16)), chunk("data", blockOf(0, 0, n1)))))
  }

  test("WAV decode: G.711 mu-law and A-law expand to the known reference values") {
    import MediaCodec.{alawToLinear, ulawToLinear}
    // canonical G.711 table anchors: zero codes, both rails, small values
    assert(ulawToLinear(0xFF) == 0 && ulawToLinear(0x7F) == 0)
    assert(ulawToLinear(0x00) == -32124 && ulawToLinear(0x80) == 32124)
    assert(alawToLinear(0x55) == -8 && alawToLinear(0xD5) == 8)
    assert(alawToLinear(0x2A) == -32256 && alawToLinear(0xAA) == 32256)
    // through the WAV container: tag 7 / tag 6 dispatch onto the 16-bit grid
    def fmt(tag: Int) = {
      val b = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(tag.toShort).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
      b.array()
    }
    val data = Array[Byte](0x00, 0xFF.toByte, 0x80.toByte)
    val mu = decodeWav(riff(chunk("fmt ", fmt(7)), chunk("data", data)))
    assert(mu.bits == 16 && mu.samples.toSeq == Seq(-32124, 0, 32124))
    val al = decodeWav(riff(chunk("fmt ", fmt(6)), chunk("data", Array[Byte](0x55, 0x2A, 0xAA.toByte))))
    assert(al.bits == 16 && al.samples.toSeq == Seq(-8, -32256, 32256))
    // G.711 with a non-8-bit header is malformed
    intercept[IllegalArgumentException](
      decodeWav(riff(chunk("fmt ", fmtBody(tag = 7, bits = 16)), chunk("data", data))))
  }

  test("WAV decode: strict rejects (12-bit, 3-channel, compressed tag, ragged data, missing data)") {
    val samples = Array.fill(8)(5.toByte)
    intercept[IllegalArgumentException](
      decodeWav(riff(chunk("fmt ", fmtBody(bits = 12)), chunk("data", samples))))
    intercept[IllegalArgumentException](
      decodeWav(riff(chunk("fmt ", fmtBody(channels = 3)), chunk("data", samples))))
    intercept[IllegalArgumentException]( // ADPCM (tag 2): compressed, genuinely unsupported
      decodeWav(riff(chunk("fmt ", fmtBody(tag = 2)), chunk("data", samples))))
    intercept[IllegalArgumentException]( // float must be 32-bit: a tag-3/16-bit header is malformed
      decodeWav(riff(chunk("fmt ", fmtBody(tag = 3, bits = 16)), chunk("data", samples))))
    // 16-bit stereo frames are 4 bytes: a 6-byte data chunk is torn mid-frame
    intercept[IllegalArgumentException](
      decodeWav(riff(chunk("fmt ", fmtBody(channels = 2, bits = 16)),
        chunk("data", Array.fill(6)(1.toByte)))))
    intercept[IllegalArgumentException](decodeWav(riff(chunk("fmt ", fmtBody()))))
    // data before fmt is malformed, not silently accepted
    intercept[IllegalArgumentException](
      decodeWav(riff(chunk("data", samples), chunk("fmt ", fmtBody()))))
  }

  test("bandedAmplitude: exact integer |s-128| sums with one division") {
    val rnd = new scala.util.Random(31)
    val samples = Array.fill(192)(rnd.nextInt(256).toByte)
    val got = bandedAmplitude(PcmAudio(8000, samples))
    val expected = (0 until 8).map { k =>
      val sum = (24 * k until 24 * (k + 1)).map(i => math.abs((samples(i) & 0xff) - 128)).sum
      (sum.toLong / (128.0 * 24)).toFloat
    }
    assert(got.toSeq == expected)
  }

  test("Y4M decode: header params, frame-marker walk (with per-frame params), planar Y extraction") {
    val rnd = new scala.util.Random(37)
    val f0 = Array.fill(2 * 2 * 3)(rnd.nextInt(256).toByte)
    val f1 = Array.fill(2 * 2 * 3)(rnd.nextInt(256).toByte)
    val y4m = "YUV4MPEG2 W2 H2 F30:1 Ip A1:1 C444 Xextension\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes ++ f0 ++ "FRAME Ifoo\n".getBytes ++ f1
    val clip = decodeY4m(y4m)
    assert(clip.width == 2 && clip.height == 2 && clip.frames.length == 2)
    assert(clip.frames(0).toSeq == f0.toSeq && clip.frames(1).toSeq == f1.toSeq)
    assert(clip.yPlane(1).toSeq == f1.take(4).toSeq, "Y plane is the first w*h bytes")
    // the constant builder parses through the same decoder
    assert(decodeY4m(y4mHeader(2, 2) ++ "FRAME\n".getBytes ++ f0).frames.length == 1)
  }

  test("Y4M decode: C420 frames normalize to C444 via nearest-neighbor chroma upsampling") {
    // 2x2 C420 frame: 4 Y + 1 U + 1 V = 6 bytes; the single chroma sample
    // must cover all four full-resolution pixels
    val f2 = Array[Byte](10, 20, 30, 40, 77, 99.toByte)
    val c2 = decodeY4m(y4mHeader(2, 2, "C420") ++ "FRAME\n".getBytes ++ f2)
    assert(c2.yPlane(0).toSeq == Seq[Byte](10, 20, 30, 40))
    assert(c2.uPlane(0).toSeq == Seq.fill(4)(77.toByte))
    assert(c2.vPlane(0).toSeq == Seq.fill(4)(99.toByte))
    // 4x4 C420: quarter-plane sample (x>>1, y>>1) pins the 2x2 block
    // pattern (a transposed or off-by-one upsampler fails here)
    val y16 = Array.tabulate(16)(i => i.toByte)
    val u4 = Array[Byte](1, 2, 3, 4)
    val v4 = Array[Byte](5, 6, 7, 8)
    val c4 = decodeY4m(y4mHeader(4, 4, "C420jpeg") ++ "FRAME\n".getBytes ++ y16 ++ u4 ++ v4)
    assert(c4.uPlane(0).toSeq == Seq[Byte](1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
    assert(c4.vPlane(0).toSeq == Seq[Byte](5, 5, 6, 6, 5, 5, 6, 6, 7, 7, 8, 8, 7, 7, 8, 8))
    // no C param -> the spec's C420jpeg default, now decoded (not rejected)
    val cd = decodeY4m("YUV4MPEG2 W2 H2\n".getBytes ++ "FRAME\n".getBytes ++ f2)
    assert(cd.uPlane(0).toSeq == Seq.fill(4)(77.toByte))
  }

  test("Y4M decode: C422 and C411 normalize to C444 by horizontal nearest upsampling") {
    // C422 2x2: Y = [10 20 / 30 40], U column [70, 80], V column [90, 100]
    val y422 = Array[Byte](10, 20, 30, 40)
    val c422 = decodeY4m(y4mHeader(2, 2, "C422") ++ "FRAME\n".getBytes ++
      y422 ++ Array[Byte](70, 80, 90, 100))
    assert(c422.yPlane(0).toSeq == y422.toSeq)
    assert(c422.uPlane(0).toSeq == Seq[Byte](70, 70, 80, 80)) // row-replicated pairs
    assert(c422.vPlane(0).toSeq == Seq[Byte](90, 90, 100, 100))
    // C411 4x1: one chroma sample per row of 4
    val y411 = Array[Byte](1, 2, 3, 4)
    val c411 = decodeY4m(y4mHeader(4, 1, "C411") ++ "FRAME\n".getBytes ++
      y411 ++ Array[Byte](55, 66))
    assert(c411.uPlane(0).toSeq == Seq.fill(4)(55.toByte))
    assert(c411.vPlane(0).toSeq == Seq.fill(4)(66.toByte))
  }

  test("Y4M decode: strict rejects (mono, odd C420/C422 dims, truncated frame, junk between frames)") {
    val f = Array.fill(12)(9.toByte)
    intercept[IllegalArgumentException]( // mono has no chroma: reject, don't invent
      decodeY4m("YUV4MPEG2 W2 H2 Cmono\n".getBytes ++ "FRAME\n".getBytes ++ f))
    intercept[IllegalArgumentException]( // half-res chroma needs even dims
      decodeY4m("YUV4MPEG2 W3 H2 C420\n".getBytes ++ "FRAME\n".getBytes ++ f))
    intercept[IllegalArgumentException]( // half-WIDTH chroma needs even width
      decodeY4m("YUV4MPEG2 W3 H2 C422\n".getBytes ++ "FRAME\n".getBytes ++ f))
    intercept[IllegalArgumentException](
      decodeY4m(y4mHeader(2, 2) ++ "FRAME\n".getBytes ++ f.take(7)))
    intercept[IllegalArgumentException](
      decodeY4m(y4mHeader(2, 2) ++ "JUNK!\n".getBytes ++ f))
    intercept[IllegalArgumentException](decodeY4m("YUV4MPEG2 H2 C444\n".getBytes))
  }

  test("Y4M header-only stream is valid zero-frame video; decoder featurizes it as zeros") {
    val headerOnly = y4mHeader(2, 2)
    assert(decodeY4m(headerOnly).frames.isEmpty)
    val got = BatchedDecode.decodeFeatures(
      spark.createDataset(Seq(MediaRow(9L, "video", headerOnly)))).collect()
    assert(got.head.feature.toSeq == Seq.fill(Multimodal.FeatureDim)(0f),
      "zero-frame clip must featurize as the zero vector, not crash the task")
  }

  test("BMP hostile headers reject instead of overflowing") {
    val good = bmp(2, 2, px2x2)
    val badOffset = good.clone()
    badOffset(10) = 0xff.toByte; badOffset(11) = 0xff.toByte
    badOffset(12) = 0xff.toByte; badOffset(13) = 0xff.toByte // negative le32
    intercept[IllegalArgumentException](decodeBmp(badOffset))
    val hugeWidth = good.clone()
    hugeWidth(18) = 0xab.toByte; hugeWidth(19) = 0xaa.toByte
    hugeWidth(20) = 0xaa.toByte; hugeWidth(21) = 0x2a.toByte // width*3 overflows int
    intercept[IllegalArgumentException](decodeBmp(hugeWidth))
  }

  test("PPM/Y4M hostile headers reject as truncated instead of Int-overflowing to garbage") {
    // P6 65536 65536: width*height*3 wraps to 0 in Int math — must reject loudly
    intercept[IllegalArgumentException](decodePpm("P6\n65536 65536\n255\n\u0000".getBytes("US-ASCII")))
    // Y4M 65536x65536: 3*w*h wraps in Int math the same way
    intercept[IllegalArgumentException](
      decodeY4m("YUV4MPEG2 W65536 H65536 C444\nFRAME\n\u0000".getBytes("US-ASCII")))
    // BMP with both dims near Int.MaxValue: rowBytes*height overflows LONG —
    // the divide-form bound must still reject with the documented exception
    val good = bmp(2, 2, px2x2)
    val hugeBoth = good.clone()
    for (o <- Seq(18, 22)) { // width and height = 0x7ffffffe
      hugeBoth(o) = 0xfe.toByte; hugeBoth(o + 1) = 0xff.toByte
      hugeBoth(o + 2) = 0xff.toByte; hugeBoth(o + 3) = 0x7f.toByte
    }
    intercept[IllegalArgumentException](decodeBmp(hugeBoth))
  }

  test("Y4M malformed numeric parameters reject with IllegalArgumentException, not NumberFormatException") {
    for (hdr <- Seq("YUV4MPEG2 W H2 C444\n", "YUV4MPEG2 Wabc H2 C444\n",
        "YUV4MPEG2 W-2 H2 C444\n", "YUV4MPEG2 W99999999999 H2 C444\n"))
      intercept[IllegalArgumentException](decodeY4m(hdr.getBytes("US-ASCII")))
  }

  test("resize: box-average downscale is the exact integer mean; upscale is nearest; same-size is identity") {
    // 4x4 grayscale ramp: pixel p has value 16*p in all channels
    val ramp = RasterImage(4, 4, Array.tabulate(48)(i => (16 * (i / 3)).toByte))
    val down = resize(ramp, 2, 2)
    // target (0,0) averages source pixels 0,1,4,5 -> (0+16+64+80)/4 = 40
    val expect = Seq(
      (0 + 16 + 64 + 80) / 4, (32 + 48 + 96 + 112) / 4,
      (128 + 144 + 192 + 208) / 4, (160 + 176 + 224 + 240) / 4)
    assert(down.rgb.grouped(3).map(g => g(0) & 0xff).toSeq == expect)
    assert(down.rgb.grouped(3).forall(g => g(0) == g(1) && g(1) == g(2)))
    // upscale 2x2 -> 4x4 replicates each source pixel (nearest-neighbor)
    val up = resize(decodePpm(ppm2x2()), 4, 4)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3)
      assert(up.rgb(3 * (y * 4 + x) + c) == px2x2(3 * ((y / 2) * 2 + x / 2) + c))
    // same-size resize is the identity (boxes of exactly one pixel)
    assert(resize(ramp, 4, 4).rgb.toSeq == ramp.rgb.toSeq)
  }

  test("binaryFile source: a directory of media blobs decodes through the typed pipeline") {
    import java.nio.file.{Files, Paths}
    val d = Files.createTempDirectory("graft_media_files")
    val ppmBytes = ppm2x2()
    val wavBytes = wavHeader(16) ++ Array.tabulate(16)(i => (90 + 5 * i).toByte)
    val junk = "no magic here".getBytes("UTF-8")
    Files.write(Paths.get(d.toString, "7.ppm"), ppmBytes)
    Files.write(Paths.get(d.toString, "8.wav"), wavBytes)
    Files.write(Paths.get(d.toString, "9.bin"), junk)
    // landing dirs are never clean: marker/readme files whose names don't
    // match <digits>.<ext> must be SKIPPED, not null-doc_id-crash the task
    Files.write(Paths.get(d.toString, "_SUCCESS"), Array.emptyByteArray)
    Files.write(Paths.get(d.toString, "readme.txt"), "notes".getBytes("UTF-8"))
    val rows = MediaFiles.read(spark, d.toString).collect()
      .map(r => r.doc_id -> ((r.media_type, r.payload.toSeq))).toMap
    assert(rows.keySet == Set(7L, 8L, 9L))
    assert(rows(7L) == (("ppm", ppmBytes.toSeq)))
    assert(rows(8L)._1 == "wav")
    val feats = BatchedDecode.decodeFeatures(MediaFiles.read(spark, d.toString))
      .collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(feats(7L) == bandedLuma(decodePpm(ppmBytes)).toSeq,
      "a .ppm blob landed as a file must REALLY decode")
    assert(feats(8L) == bandedAmplitude(decodeWav(wavBytes)).toSeq)
    assert(feats(9L) == (new BatchedDecode.StubDecoder).decode(junk).toSeq)
  }

  private def png(width: Int, height: Int, colorType: Int, pixels: Array[Byte],
      filters: Int => Int = _ => 0, palette: Array[Byte] = null,
      interlaced: Boolean = false): Array[Byte] =
    MediaCodecSpec.pngFile(width, height, colorType, pixels, filters, palette, interlaced)

  test("PNG decode: real zlib, all five row filters invert exactly (RGB)") {
    val rnd = new scala.util.Random(41)
    val px = Array.fill(5 * 4 * 3)(rnd.nextInt(256).toByte)
    for (f <- 0 to 4) {
      val got = decodePng(png(5, 4, 2, px, filters = _ => f))
      assert(got.width == 5 && got.height == 4)
      assert(got.rgb.toSeq == px.toSeq, s"filter $f must invert exactly")
    }
    // mixed per-row filters in one image (each row references the prior
    // RECONSTRUCTED row, the order-sensitive case)
    val mixed = decodePng(png(5, 4, 2, px, filters = r => r % 5))
    assert(mixed.rgb.toSeq == px.toSeq)
  }

  test("PNG decode: gray replicates, RGBA drops alpha, palette indexes PLTE") {
    val gray = Array[Byte](10, 20, 30, 40)
    assert(decodePng(png(2, 2, 0, gray, filters = _ => 1)).rgb.toSeq ==
      Seq[Byte](10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40))
    val rgba = Array[Byte](1, 2, 3, 99, 4, 5, 6, 98, 7, 8, 9, 97, 10, 11, 12, 96)
    assert(decodePng(png(2, 2, 6, rgba, filters = _ => 4)).rgb.toSeq ==
      Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
    val pal = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90)
    assert(decodePng(png(2, 2, 3, Array[Byte](0, 1, 2, 0), palette = pal)).rgb.toSeq ==
      Seq[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 10, 20, 30))
    // index beyond the palette rejects
    intercept[IllegalArgumentException](
      decodePng(png(2, 2, 3, Array[Byte](0, 1, 2, 3), palette = pal)))
  }

  test("BMP decode: BI_RLE8 runs, padded literals, EOL/EOB framing, delta reject") {
    // 4x2 palette image: palette entry q = (q, 2q, 3q) in BGRA order
    val pal = Array.tabulate(4)(q => Array(3 * q, 2 * q, q, 0)).flatten.map(_.toByte)
    def file(stream: Array[Byte]) =
      MediaCodec.bmpHeader(4, 2, 8, nColors = 4, compression = 1,
        dataBytes = stream.length) ++ pal ++ stream
    // bottom row: run of 3 x idx2 + run of 1 x idx0; top row: literal of 3
    // (odd -> one pad byte) + run of 1 x idx3
    val stream = Array[Byte](3, 2, 1, 0, 0, 0, // runs + EOL
      0, 3, 1, 2, 3, 0, // literal 3: idx 1,2,3 + pad
      1, 3, 0, 0, // run 1 x idx3 + EOL
      0, 1) // EOB
    val img = MediaCodec.decode(file(stream))
    def rgbOf(q: Int) = Seq(q, 2 * q, 3 * q) // palette is BGR on disk
    val want = (Seq(1, 2, 3, 3) ++ Seq(2, 2, 2, 0)).flatMap(rgbOf) // top row first
    assert(img.rgb.map(_ & 0xff).toSeq == want)
    // delta escape and truncated stream are named rejects
    intercept[IllegalArgumentException](
      MediaCodec.decode(file(Array[Byte](0, 2, 1, 1, 0, 1))))
    intercept[IllegalArgumentException](
      MediaCodec.decode(file(Array[Byte](3, 2, 0, 0))))
    // a run past the row end is a reject, not a wrap
    intercept[IllegalArgumentException](
      MediaCodec.decode(file(Array[Byte](5, 1, 0, 1))))
  }

  test("PBM decode: MSB-first packed bits, 1=black, per-row byte padding") {
    // 12x2: row = 2 bytes (12 bits + 4 pad). Pad bits set to 1 must be
    // IGNORED — a contiguous-bit reader would shear row 1.
    val bits = Array[Byte](0xA5.toByte, 0x5F.toByte, 0x3C.toByte, 0xCF.toByte)
    val img = MediaCodec.decode("P4\n12 2\n".getBytes("US-ASCII") ++ bits)
    assert(img.width == 12 && img.height == 2)
    def row(b0: Int, b1: Int): Seq[Int] =
      (0 until 12).map(x => if (((if (x < 8) b0 >> (7 - x) else b1 >> (15 - x)) & 1) == 1) 0 else 255)
    val want = (row(0xA5, 0x5F) ++ row(0x3C, 0xCF)).flatMap(v => Seq(v, v, v))
    assert(img.rgb.map(_ & 0xff).toSeq == want)
    intercept[IllegalArgumentException]( // truncated bit rows
      MediaCodec.decode("P4\n12 2\n".getBytes("US-ASCII") ++ bits.take(3)))
  }

  test("PNG decode: Adam7 interlace, all seven passes, mixed filters (RGB)") {
    // 9x5 makes every pass non-empty and non-trivially sized; per-pass
    // mixed filters mean a scatter or pass-geometry bug shears pixels
    val px = Array.tabulate(9 * 5 * 3)(i => ((i * 7 + 3) % 251).toByte)
    val got = decodePng(png(9, 5, 2, px, filters = r => r % 5, interlaced = true))
    assert(got.width == 9 && got.height == 5)
    assert(got.rgb.toSeq == px.toSeq, "Adam7 must reassemble exactly")
    // 2x2: passes 2-5 are EMPTY (zero-size dimensions contribute no bytes)
    val gray = Array[Byte](10, 60, 110, 160.toByte)
    assert(decodePng(png(2, 2, 0, gray, filters = _ => 1, interlaced = true)).rgb.toSeq ==
      gray.flatMap(g => Seq(g, g, g)).toSeq)
    // palette-indexed interlaced: the scatter happens pre-palette
    val pal = Array.tabulate(48)(i => (i * 5).toByte)
    assert(decodePng(png(3, 3, 3, Array[Byte](0, 5, 10, 1, 6, 11, 2, 7, 12),
      palette = pal, interlaced = true)).rgb.toSeq ==
      Seq(0, 5, 10, 1, 6, 11, 2, 7, 12).flatMap(i => pal.slice(3 * i, 3 * i + 3).toSeq))
  }

  test("PNG decode: 16-bit gray against ImageIO's own writer; v*255/65535 normalization") {
    // TYPE_USHORT_GRAY writes a genuine depth-16 color-type-0 PNG — the
    // JDK as the independent production encoder, like the JPEG/GIF specs
    val w = 6; val h = 3
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val samples = Array.tabulate(w * h)(i => (i * 4099 + 257) % 65536)
    img.getRaster.setSamples(0, 0, w, h, 0, samples)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val got = MediaCodec.decodePng(bos.toByteArray)
    assert(got.width == w && got.height == h)
    // TYPE_USHORT_GRAY carries a linear-gray color space whose PNG encoding
    // keeps the raw sample; each decodes to v/257 replicated across RGB
    val expect = samples.flatMap { v => val g = (v / 257).toByte; Seq(g, g, g) }
    assert(got.rgb.toSeq == expect.toSeq)
  }

  test("PNG decode: 16-bit filters stride two bytes per sample (gray + RGB, all filters)") {
    val rnd = new scala.util.Random(43)
    // gray 5x4: every filter type; left-neighbor now sits 2 bytes back
    val gray16 = Array.fill(5 * 4 * 2)(rnd.nextInt(256).toByte)
    val gotG = decodePng(png16(5, 4, 0, gray16, filters = r => r % 5))
    val expG = (0 until 20).flatMap { p =>
      val v = ((gray16(2 * p) & 0xff) << 8) | (gray16(2 * p + 1) & 0xff)
      val g = (v / 257).toByte; Seq(g, g, g)
    }
    assert(gotG.rgb.toSeq == expG)
    // RGB 3x3: stride is 6 bytes; a channels-stride bug shears the colors
    val rgb16 = Array.fill(3 * 3 * 6)(rnd.nextInt(256).toByte)
    val gotC = decodePng(png16(3, 3, 2, rgb16, filters = r => 4 - (r % 5)))
    val expC = (0 until 27).map { s =>
      (((rgb16(2 * s) & 0xff) << 8 | (rgb16(2 * s + 1) & 0xff)) / 257).toByte
    }
    assert(gotC.rgb.toSeq == expC)
    // 16-bit palette does not exist in the spec -> named reject
    val e = intercept[IllegalArgumentException](
      decodePng(png16(2, 2, 3, Array.fill(8)(1.toByte))))
    assert(e.getMessage.contains("bit depth"))
  }

  private def png16(width: Int, height: Int, colorType: Int, pixels: Array[Byte],
      filters: Int => Int = _ => 0): Array[Byte] =
    MediaCodecSpec.pngFile(width, height, colorType, pixels, filters, depth = 16)

  test("PNG decode: strict rejects (bad CRC, truncated zlib, geometry lies)") {
    val px = Array.fill(2 * 2 * 3)(7.toByte)
    val good = png(2, 2, 2, px)
    assert(decodePng(good).rgb.toSeq == px.toSeq)
    val badCrc = good.clone(); badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 1).toByte
    intercept[IllegalArgumentException](decodePng(badCrc)) // IEND CRC flipped
    // flip a byte INSIDE the IDAT payload: its CRC catches the corruption
    val badIdat = good.clone(); badIdat(8 + 25 + 8 + 2) = (badIdat(8 + 25 + 8 + 2) ^ 0x40).toByte
    intercept[IllegalArgumentException](decodePng(badIdat))
    // IHDR says 2x3 but the stream holds 2x2 rows -> short pixel stream
    intercept[IllegalArgumentException] {
      val taller = png(2, 3, 2, Array.fill(2 * 3 * 3)(7.toByte))
      val lie = good.clone() // keep good's IDAT, patch dims from taller's IHDR
      System.arraycopy(taller, 8, lie, 8, 25)
      decodePng(lie)
    }
    intercept[IllegalArgumentException](decodePng(good.take(40))) // truncated file
    // hostile IHDR dims: 65536x65536 RGBA wraps (rowLen+1)*height in Int
    // math — must hit the named "too large" reject, like every sibling
    val huge = {
      def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      def chunk(tag: String, body: Array[Byte]) = {
        val crc = new java.util.zip.CRC32()
        crc.update(tag.getBytes("US-ASCII")); crc.update(body)
        be32(body.length) ++ tag.getBytes("US-ASCII") ++ body ++ be32(crc.getValue.toInt)
      }
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        chunk("IHDR", be32(65536) ++ be32(65536) ++ Array[Byte](8, 6, 0, 0, 0)) ++
        chunk("IEND", Array.empty[Byte])
    }
    val e = intercept[IllegalArgumentException](decodePng(huge))
    assert(e.getMessage.contains("too large"))
  }

  test("sniffing decoder: real parse for rasters, stub for everything else, through one pipeline") {
    val textPayload = "not an image at all, just bytes".getBytes("UTF-8")
    val pcm = Array.tabulate(24)(i => (110 + 3 * i).toByte)
    val rows = Seq(
      MediaRow(1L, "image", ppm2x2("P6\n8 8\n255\n".replace("8 8", "2 2"))),
      MediaRow(2L, "image", bmp(2, 2, px2x2)),
      MediaRow(3L, "audio", textPayload),
      MediaRow(4L, "audio", wavHeader(24) ++ pcm))
    val got = BatchedDecode.decodeFeatures(spark.createDataset(rows), batchSize = 2)
      .collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    val real = bandedLuma(decodePpm(ppm2x2())).toSeq
    assert(got(1L) == real, "PPM payload must be REALLY decoded")
    assert(got(2L) == real, "BMP payload must decode to the same features as its PPM twin")
    assert(got(3L) == (new BatchedDecode.StubDecoder).decode(textPayload).toSeq,
      "non-raster payloads fall back to the stub featurizer")
    assert(got(4L) == bandedAmplitude(PcmAudio(8000, pcm)).toSeq,
      "WAV payload must be REALLY decoded to PCM amplitude bands")
  }

  // ---- EXIF orientation normalization (mm_ahash_oriented) ----

  /** 2x3 asymmetric gray raster (every pixel distinct), as single-channel
    * values replicated to RGB: rows (10 20 30 / 40 50 60).
    */
  private def gray(vals: Array[Int], w: Int, h: Int): RasterImage =
    RasterImage(w, h, vals.flatMap(v => Array(v, v, v)).map(_.toByte))

  private def grayVals(img: RasterImage): Seq[Int] =
    (0 until img.pixelCount).map(i => img.rgb(3 * i) & 0xff)

  test("applyOrientation: all eight EXIF transforms, spec-derived goldens") {
    val src = gray(Array(10, 20, 30, 40, 50, 60), 3, 2)
    // EXIF 2.3 tag 0x0112: where stored row 0 / column 0 appear visually
    val expect = Map(
      1 -> ((3, 2), Seq(10, 20, 30, 40, 50, 60)), // top/left: identity
      2 -> ((3, 2), Seq(30, 20, 10, 60, 50, 40)), // top/right: mirror H
      3 -> ((3, 2), Seq(60, 50, 40, 30, 20, 10)), // bottom/right: rot 180
      4 -> ((3, 2), Seq(40, 50, 60, 10, 20, 30)), // bottom/left: mirror V
      5 -> ((2, 3), Seq(10, 40, 20, 50, 30, 60)), // left/top: transpose
      6 -> ((2, 3), Seq(40, 10, 50, 20, 60, 30)), // right/top: rot 90 CW
      7 -> ((2, 3), Seq(60, 30, 50, 20, 40, 10)), // right/bottom: transverse
      8 -> ((2, 3), Seq(30, 60, 20, 50, 10, 40))) // left/bottom: rot 90 CCW
    for ((o, ((w, h), vals)) <- expect) {
      val got = applyOrientation(src, o)
      assert((got.width, got.height) == (w, h), s"orientation $o dims")
      assert(grayVals(got) == vals, s"orientation $o pixels")
    }
    intercept[IllegalArgumentException](applyOrientation(src, 0))
    intercept[IllegalArgumentException](applyOrientation(src, 9))
  }

  test("orientationOf: APP1 tag read, absence means 1, malformed rejects") {
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def app1(o: Int): String =
      "FFE10022" + "457869660000" + "49492A0008000000" + "0100" +
        "1201" + "0300" + "01000000" + "%02X000000".format(o) + "00000000"
    for (o <- 1 to 8)
      assert(Exif.orientationOf(hexBytes("FFD8" + app1(o) + "FFD9")) == o)
    // JPEG with no APP1 at all: orientation 1, not a reject
    assert(Exif.orientationOf(hexBytes("FFD8FFDA0000")) == 1)
    // non-JPEG/TIFF payloads carry no EXIF: orientation 1
    assert(Exif.orientationOf(ppm2x2()) == 1)
    assert(Exif.orientationOf("hello".getBytes) == 1)
    // bare little-endian TIFF with the tag
    assert(Exif.orientationOf(hexBytes(
      "49492A0008000000" + "0100" + "1201" + "0300" + "01000000" +
        "06000000" + "00000000")) == 6)
    // PRESENT but out-of-range orientation rejects loudly
    intercept[IllegalArgumentException](
      Exif.orientationOf(hexBytes("FFD8" + app1(9) + "FFD9")))
  }

  test("planted rotations collapse: one hash per document across orientations 1/3/6/8") {
    val rows = Multimodal.ahashOriented(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (id, vs) =>
      assert(vs.map(_._2).sorted.toSeq == Seq(1, 3, 6, 8), s"doc $id variants")
      assert(vs.map(_._3).distinct.length == 1,
        s"doc $id: orientations hash apart: ${vs.mkString(", ")}")
    }
    // and the hashes genuinely differ across documents (not a constant)
    assert(byDoc.values.map(_.head._3).toSeq.distinct.length > 1)
  }

  test("orientedAhash64 equals plain ahash64 when metadata is absent") {
    val ppm = ppm2x2()
    assert(orientedAhash64(ppm) == ahash64(decode(ppm)))
  }
}

/** Shared with MediaCodecProps: build a REAL PNG — per-row filter bytes,
  * genuine zlib (Deflater: dynamic/fixed blocks, not stored), correct
  * CRCs. `filters(r)` picks each row's filter type; filtering is the
  * spec's forward direction so the decoder must invert it exactly.
  */
object MediaCodecSpec {
  def pngFile(width: Int, height: Int, colorType: Int, pixels: Array[Byte],
      filters: Int => Int = _ => 0, palette: Array[Byte] = null,
      interlaced: Boolean = false, depth: Int = 8): Array[Byte] = {
    val ch = (colorType match { case 2 => 3; case 6 => 4; case _ => 1 }) * (depth / 8)
    /** Forward-filter one sub-image's rows (the spec direction). */
    def filterRows(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val rowLen = w * ch
      val raw = new Array[Byte]((rowLen + 1) * h)
      for (r <- 0 until h) {
        val f = filters(r)
        raw(r * (rowLen + 1)) = f.toByte
        for (i <- 0 until rowLen) {
          val x = px(r * rowLen + i) & 0xff
          val a = if (i >= ch) px(r * rowLen + i - ch) & 0xff else 0
          val b = if (r > 0) px((r - 1) * rowLen + i) & 0xff else 0
          val c = if (r > 0 && i >= ch) px((r - 1) * rowLen + i - ch) & 0xff else 0
          val filtered = f match {
            case 0 => x
            case 1 => x - a
            case 2 => x - b
            case 3 => x - (a + b) / 2
            case 4 =>
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          }
          raw(r * (rowLen + 1) + 1 + i) = (filtered & 0xff).toByte
        }
      }
      raw
    }
    val raw: Array[Byte] =
      if (!interlaced) filterRows(pixels, width, height)
      else {
        // Adam7: extract each pass's sub-image, filter it independently
        val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
        passes.flatMap { case (x0, y0, dx, dy) =>
          val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
          val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
          if (pw == 0 || ph == 0) Array.emptyByteArray
          else {
            val sub = new Array[Byte](pw * ph * ch)
            for (r <- 0 until ph; i <- 0 until pw; c <- 0 until ch)
              sub((r * pw + i) * ch + c) =
                pixels(((y0 + r * dy) * width + (x0 + i * dx)) * ch + c)
            filterRows(sub, pw, ph)
          }
        }.toArray
      }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    val zlen = deflater.deflate(zbuf); deflater.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      val b = java.nio.ByteBuffer.allocate(12 + data.length)
      b.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
        .putInt(crc.getValue.toInt)
      b.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(width).putInt(height)
      .put(depth.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte)
      .put((if (interlaced) 1 else 0).toByte).array()
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++
      (if (palette != null) chunk("PLTE", palette) else Array.emptyByteArray) ++
      chunk("IDAT", zbuf.take(zlen)) ++ chunk("IEND", Array.emptyByteArray)
  }
}
