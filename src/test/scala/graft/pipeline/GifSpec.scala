package graft.pipeline

import java.awt.image.{BufferedImage, IndexColorModel}

import org.scalatest.funsuite.AnyFunSuite

/** GIF decoder against the JDK's own ImageIO GIF WRITER — an independent
  * production LZW encoder (real variable-width codes, real clear usage) —
  * plus hand-built streams for the byte-aligned profile and the KwKwK
  * self-reference, and the strict-reject contract.
  */
class GifSpec extends AnyFunSuite {
  import MediaCodec.decodeGif

  /** Lossless GIF bytes for an indexed image via ImageIO. */
  private def imageioGif(w: Int, h: Int, palette: Array[Int], idx: Array[Byte]): Array[Byte] = {
    val r = palette.map(c => ((c >> 16) & 0xff).toByte)
    val g = palette.map(c => ((c >> 8) & 0xff).toByte)
    val b = palette.map(c => (c & 0xff).toByte)
    val cm = new IndexColorModel(8, palette.length, r, g, b)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
    img.getRaster.setDataElements(0, 0, w, h, idx)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    bos.toByteArray
  }

  private def deterministicImage(w: Int, h: Int, colors: Int): (Array[Int], Array[Byte]) = {
    val palette = Array.tabulate(colors)(i => (i * 37 % 256 << 16) | (255 - i % 256 << 8) | (i * 11 % 256))
    val idx = Array.tabulate(w * h)(p => ((p * 31 + p / w * 7 + (p * p % 89)) % colors).toByte)
    (palette, idx)
  }

  test("round-trips ImageIO-encoded GIFs: real LZW width growth across 9->12 bit codes") {
    for ((w, h, colors) <- Seq((8, 4, 16), (64, 64, 200), (128, 96, 256))) {
      val (palette, idx) = deterministicImage(w, h, colors)
      val img = decodeGif(imageioGif(w, h, palette, idx))
      assert(img.width == w && img.height == h)
      val expected = idx.flatMap { i =>
        val c = palette(i & 0xff)
        Array(((c >> 16) & 0xff).toByte, ((c >> 8) & 0xff).toByte, (c & 0xff).toByte)
      }
      assert(img.rgb.toSeq == expected.toSeq, s"${w}x$h/$colors")
    }
  }

  test("dictionary-filling image exercises the deferred-clear / 12-bit regime") {
    // 256 colors, 48k pixels with low repetition -> the dictionary fills;
    // whatever the encoder does at full (defer or clear), decode must invert
    val (palette, idx) = deterministicImage(256, 192, 256)
    val img = decodeGif(imageioGif(256, 192, palette, idx))
    assert(img.rgb.length == 256 * 192 * 3)
    val probe = Seq(0, 12345, 49151).map(p => img.rgb(3 * p))
    val expect = Seq(0, 12345, 49151).map(p => ((palette(idx(p) & 0xff) >> 16) & 0xff).toByte)
    assert(probe == expect)
  }

  /** Hand-built GIF: header, 4-entry GCT, one full-frame image. */
  private def handGif(w: Int, h: Int, mcs: Int, data: Array[Byte],
      gctBits: Int = 1, ipacked: Int = 0x00): Array[Byte] = {
    val gctEntries = 1 << (gctBits + 1)
    val gct = Array.tabulate(gctEntries * 3)(i => (i * 40 % 256).toByte)
    val lsd = Array[Byte]((w & 0xff).toByte, (w >> 8).toByte, (h & 0xff).toByte, (h >> 8).toByte,
      (0x80 | gctBits).toByte, 0, 0)
    val desc = Array[Byte](0x2C, 0, 0, 0, 0, (w & 0xff).toByte, (w >> 8).toByte,
      (h & 0xff).toByte, (h >> 8).toByte, ipacked.toByte)
    val sub = Array[Byte](mcs.toByte, data.length.toByte) ++ data ++ Array[Byte](0, 0x3B)
    "GIF89a".getBytes("US-ASCII") ++ lsd ++ gct ++ desc ++ sub
  }

  private def packLsb(codes: Seq[(Int, Int)]): Array[Byte] = { // (code, width)
    val bits = codes.flatMap { case (c, w) => (0 until w).map(i => (c >> i) & 1) }
    bits.grouped(8).map(g => g.zipWithIndex.map { case (b, i) => b << i }.sum.toByte).toArray
  }

  test("KwKwK self-referential code decodes (the code-equals-next-slot case)") {
    // mcs=2: clear=4, end=5; stream: clear, literal 2, code 6 (== next slot:
    // expands to 2,2), end -> pixels [2, 2, 2] as a 3x1 image
    val data = packLsb(Seq((4, 3), (2, 3), (6, 3), (5, 3)))
    val img = decodeGif(handGif(3, 1, 2, data))
    // palette entry 2 = bytes (6*40, 7*40, 8*40)
    assert(img.rgb.toSeq == Seq(240, 280 % 256, 320 % 256, 240, 280 % 256, 320 % 256,
      240, 280 % 256, 320 % 256).map(_.toByte))
  }

  test("byte-aligned mcs=7 profile (the SQL fixture shape): clear + literals + end") {
    // 4 pixels, 128-entry table needs gctBits=6
    val data = Array[Byte](0x80.toByte, 1, 2, 3, 4, 0x81.toByte)
    val img = decodeGif(handGif(4, 1, 7, data, gctBits = 6))
    assert(img.width == 4 && img.rgb.toSeq ==
      (1 to 4).flatMap(i => Seq(3 * i * 40 % 256, (3 * i + 1) * 40 % 256, (3 * i + 2) * 40 % 256))
        .map(_.toByte).toSeq)
  }

  test("strict rejects: sub-rectangle, truncation, geometry lies, hostile dims") {
    val good = handGif(3, 1, 2, packLsb(Seq((4, 3), (2, 3), (6, 3), (5, 3))))
    assert(decodeGif(good).width == 3)
    // truncated LZW data (end code missing, bits run out)
    intercept[IllegalArgumentException](
      decodeGif(handGif(3, 1, 2, packLsb(Seq((4, 3), (2, 3))))))
    // pixel stream shorter than the image (end arrives early)
    intercept[IllegalArgumentException](
      decodeGif(handGif(5, 1, 2, packLsb(Seq((4, 3), (2, 3), (6, 3), (5, 3))))))
    // pixel stream longer than the image
    intercept[IllegalArgumentException](
      decodeGif(handGif(2, 1, 2, packLsb(Seq((4, 3), (2, 3), (6, 3), (5, 3))))))
    // truncated file
    intercept[IllegalArgumentException](decodeGif(good.take(20)))
    // trailer before any image
    intercept[IllegalArgumentException](
      decodeGif("GIF89a".getBytes("US-ASCII") ++
        Array[Byte](3, 0, 1, 0, 0, 0, 0, 0x3B)))
    // hostile dims: 65535x65535 -> named too-large reject, no wrap
    val e = intercept[IllegalArgumentException](
      decodeGif("GIF89a".getBytes("US-ASCII") ++
        Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0x2C)))
    assert(e.getMessage.contains("too large"))
  }

  test("interlaced row remap: four-pass order lands rows at 0,4,2,6,1,3,5,7") {
    // 1x8, pixels 1..8 in stream order; display row order(s) receives
    // stream row s, so the display column reads [1,5,3,6,2,7,4,8]
    val data = Array[Byte](0x80.toByte, 1, 2, 3, 4, 5, 6, 7, 8, 0x81.toByte)
    val img = decodeGif(handGif(1, 8, 7, data, gctBits = 6, ipacked = 0x40))
    val reds = (0 until 8).map(r => img.rgb(3 * r) & 0xff)
    assert(reds == Seq(1, 5, 3, 6, 2, 7, 4, 8).map(q => (3 * q * 40) % 256))
  }

  test("sub-rectangle animation delta frames reject by name") {
    val base = handGif(3, 1, 2, packLsb(Seq((4, 3), (2, 3), (6, 3), (5, 3))))
    // patch the image descriptor's left coordinate (offset: 6 hdr + 7 lsd +
    // 12 gct = 25; desc left at 25+1)
    val patched = base.clone(); patched(26) = 1
    val e = intercept[IllegalArgumentException](decodeGif(patched))
    assert(e.getMessage.contains("sub-rectangle"))
  }

  test("sniffing decode() dispatches GIF like every other raster") {
    val (palette, idx) = deterministicImage(8, 4, 16)
    val viaSniff = MediaCodec.decode(imageioGif(8, 4, palette, idx))
    assert(viaSniff.width == 8 && viaSniff.height == 4)
  }
}
