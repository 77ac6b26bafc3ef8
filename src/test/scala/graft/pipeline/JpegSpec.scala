package graft.pipeline

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

/** JPEG decoder against (a) a test-side DC-only encoder — exact
  * expected pixels by construction, covering Huffman categories, EXTEND,
  * predictor chaining, restart markers, byte stuffing, and 4:2:0
  * interleave/upsampling — and (b) the JDK's own ImageIO JPEG codec, an
  * independent production implementation (real AC coefficients, real
  * quant tables; baseline AND its default 10-scan progressive script),
  * compared within the cross-decoder IDCT tolerance. Plus the
  * strict-reject contract (truncation, marker garbage).
  */
class JpegSpec extends AnyFunSuite {
  import MediaCodec.{decodeJpeg, jpegHeader}

  /** Entropy-coded scan for DC-only data units: `mcus` lists, per MCU, the
    * (componentIndex, dcValue) data units in interleave order. Chained
    * per-component predictors, RSTn every `dri` MCUs, spec 1-bit padding,
    * 0xFF00 stuffing — an independent second implementation of the bit
    * layout the SQL fixture emitter produces.
    */
  private def dcOnlyScan(mcus: Seq[Seq[(Int, Int)]], dri: Int): Array[Byte] = {
    val bits = new StringBuilder
    val out = new java.io.ByteArrayOutputStream()
    def flush(): Unit = {
      while (bits.length % 8 != 0) bits.append('1')
      bits.toString.grouped(8).foreach { g =>
        val v = Integer.parseInt(g, 2)
        out.write(v)
        if (v == 0xff) out.write(0x00)
      }
      bits.clear()
    }
    val pred = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    var rst = 0
    for ((mcu, i) <- mcus.zipWithIndex) {
      if (dri > 0 && i > 0 && i % dri == 0) {
        flush()
        out.write(0xff); out.write(0xd0 + rst)
        rst = (rst + 1) % 8
        pred.clear()
      }
      for ((comp, dc) <- mcu) {
        val diff = dc - pred(comp)
        pred(comp) = dc
        val cat = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        bits.append(MediaCodec.JpegDcLumCodes(cat))
        if (cat > 0) {
          val v = if (diff > 0) diff else diff + (1 << cat) - 1
          val s = Integer.toBinaryString(v)
          bits.append("0" * (cat - s.length)).append(s)
        }
        bits.append("1010") // EOB
      }
    }
    flush()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  test("gray DC-only blocks decode to exact flat pixels (multi-column MCU order)") {
    // 4x2 blocks of 8x8: MCU order must be row-major
    val vals = Seq(0, 255, 17, 128, 200, 1, 99, 254)
    val scan = dcOnlyScan(vals.map(v => Seq(0 -> (v - 128))), dri = 0)
    val img = decodeJpeg(jpegHeader(32, 16, 0) ++ scan)
    assert(img.width == 32 && img.height == 16)
    for (y <- 0 until 16; x <- 0 until 32) {
      val block = (y / 8) * 4 + (x / 8)
      assert((img.rgb((y * 32 + x) * 3) & 0xff) == vals(block), s"($x,$y)")
    }
  }

  test("restart markers: predictors reset, marker sequence verified, exact decode") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(24)(rnd.nextInt(256))
    val scan = dcOnlyScan(vals.map(v => Seq(0 -> (v - 128))), dri = 5)
    val img = decodeJpeg(jpegHeader(8, 8 * 24, 5) ++ scan)
    for (k <- vals.indices)
      assert((img.rgb(k * 8 * 8 * 3) & 0xff) == vals(k), s"block $k")
    // a wrong restart-sequence number is a strict reject
    val bad = (jpegHeader(8, 8 * 24, 5) ++ scan).clone()
    val i = bad.indexOfSlice(Array(0xff.toByte, 0xd0.toByte))
    assert(i > 0)
    bad(i + 1) = 0xd3.toByte
    val e = intercept[IllegalArgumentException](decodeJpeg(bad))
    assert(e.getMessage.contains("RST"))
  }

  test("4:2:0 color: interleaved MCUs, replicated chroma upsampling, pinned BT.601") {
    // 32x16 = two 16x16 MCUs; per MCU: 4 Y units + Cb + Cr, all DC-only
    val y = Seq(Seq(40, 90, 140, 190), Seq(200, 10, 60, 250)) // per-MCU Y blocks
    val cb = Seq(100, 180); val cr = Seq(60, 140)
    val mcus = (0 until 2).map { m =>
      y(m).map(v => 0 -> (v - 128)) ++ Seq(1 -> (cb(m) - 128), 2 -> (cr(m) - 128))
    }
    val hdr = jpegHeader(32, 16, 0, Seq((2, 2), (1, 1), (1, 1)))
    val img = decodeJpeg(hdr ++ dcOnlyScan(mcus, 0))
    def clamp(d: Double): Int = { val v = math.round(d).toInt; math.max(0, math.min(255, v)) }
    for (py <- 0 until 16; px <- 0 until 32) {
      val m = px / 16
      val yv = y(m)((py / 8) * 2 + (px % 16) / 8).toDouble
      val pb = cb(m) - 128.0; val pr = cr(m) - 128.0
      val o = (py * 32 + px) * 3
      assert((img.rgb(o) & 0xff) == clamp(yv + 1.402 * pr), s"R($px,$py)")
      assert((img.rgb(o + 1) & 0xff) == clamp(yv - 0.344136 * pb - 0.714136 * pr), s"G($px,$py)")
      assert((img.rgb(o + 2) & 0xff) == clamp(yv + 1.772 * pb), s"B($px,$py)")
    }
  }

  private def imageioJpeg(img: BufferedImage, progressive: Boolean = false): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    if (progressive) p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  test("round-trips ImageIO-encoded grayscale: real AC coefficients, real quant tables") {
    val img = new BufferedImage(96, 64, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 64; x <- 0 until 96)
      img.getRaster.setSample(x, y, 0, (x * 2 + y + (x * y % 13)) % 256)
    val jpg = imageioJpeg(img)
    val ours = decodeJpeg(jpg)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(ours.width == 96 && ours.height == 64)
    var maxDiff = 0
    for (y <- 0 until 64; x <- 0 until 96) {
      val d = math.abs((ours.rgb((y * 96 + x) * 3) & 0xff) - ref.getRaster.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d)
    }
    // two spec-compliant IDCTs may differ by 1 each vs the reference
    assert(maxDiff <= 2, s"max per-pixel diff $maxDiff")
  }

  test("round-trips ImageIO-encoded color at constant chroma (upsampler-invariant)") {
    // r=g=b content → Cb=Cr≈128 everywhere, so fancy-vs-nearest chroma
    // upsampling cannot diverge and the comparison isolates Y + conversion
    val img = new BufferedImage(64, 48, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 48; x <- 0 until 64) {
      val g = (x * 3 + y * 2 + (x * y) % 7) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val jpg = imageioJpeg(img)
    val ours = decodeJpeg(jpg)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    var maxDiff = 0
    for (y <- 0 until 48; x <- 0 until 64; c <- 0 until 3) {
      val r = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((ours.rgb((y * 64 + x) * 3 + c) & 0xff) - r)
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 3, s"max per-pixel diff $maxDiff")
  }

  test("progressive grayscale: ImageIO's multi-scan script decodes within IDCT tolerance") {
    // the JDK writer's default progressive script exercises every scan
    // kind: interleaved DC first + refinement, per-band AC first with EOB
    // runs, and AC refinement with successive approximation
    val img = new BufferedImage(96, 64, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 64; x <- 0 until 96)
      img.getRaster.setSample(x, y, 0, (x * 2 + y + (x * y % 13)) % 256)
    val jpg = imageioJpeg(img, progressive = true)
    // really progressive: the stream must carry SOF2 and >1 SOS
    assert(jpg.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2))
    assert(jpg.sliding(2).count(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda) > 1)
    val ours = decodeJpeg(jpg)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    var maxDiff = 0
    for (y <- 0 until 64; x <- 0 until 96) {
      val d = math.abs((ours.rgb((y * 96 + x) * 3) & 0xff) - ref.getRaster.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 2, s"max per-pixel diff $maxDiff")
  }

  test("progressive color at constant chroma decodes within IDCT tolerance") {
    val img = new BufferedImage(64, 48, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 48; x <- 0 until 64) {
      val g = (x * 3 + y * 2 + (x * y) % 7) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val jpg = imageioJpeg(img, progressive = true)
    val ours = decodeJpeg(jpg)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    var maxDiff = 0
    for (y <- 0 until 48; x <- 0 until 64; c <- 0 until 3) {
      val r = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((ours.rgb((y * 64 + x) * 3 + c) & 0xff) - r)
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 3, s"max per-pixel diff $maxDiff")
  }

  test("progressive 4:2:0 at non-MCU dims: unpadded AC-scan geometry, padded storage") {
    // 67x45 is not a multiple of the 16x16 MCU: the luma AC scans must
    // step ceil(67/8)x  ceil(45/8) = 9x6 blocks while storage is the
    // padded 10x6 grid — an off-by-one in either direction shears rows
    val img = new BufferedImage(67, 45, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 45; x <- 0 until 67) {
      val g = (x * 5 + y * 3 + (x * y) % 11) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val jpg = imageioJpeg(img, progressive = true)
    val ours = decodeJpeg(jpg)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    var maxDiff = 0
    for (y <- 0 until 45; x <- 0 until 67; c <- 0 until 3) {
      val r = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((ours.rgb((y * 67 + x) * 3 + c) & 0xff) - r)
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 3, s"max per-pixel diff $maxDiff")
  }

  test("strict rejects: truncation, garbage, missing EOI") {
    val vals = Seq(10, 250, 130, 66)
    val good = jpegHeader(8, 32, 0) ++ dcOnlyScan(vals.map(v => Seq(0 -> (v - 128))), 0)
    intercept[IllegalArgumentException](decodeJpeg(good.dropRight(6))) // cut mid-scan
    intercept[IllegalArgumentException](decodeJpeg(good.take(2) ++ Array.fill(20)(0x41.toByte)))
    intercept[IllegalArgumentException](decodeJpeg(Array[Byte](1, 2, 3)))
    // sanity: the untouched stream decodes
    assert(decodeJpeg(good).pixelCount == 8 * 32)
  }
}
