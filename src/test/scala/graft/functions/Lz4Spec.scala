package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The lz4_inflate kernel against lz4-java's own frame COMPRESSOR (real
  * compressed blocks, the arm the SQL fixture can't emit), a hand-built
  * stored-block frame (an independent second implementation of the SQL
  * emitter's bit layout), multi-frame concatenation, and the reject
  * matrix.
  */
class Lz4Spec extends AnyFunSuite {
  import Lz4Inflate.inflate

  private val text = ("the quick brown fox jumps over the lazy dog, " * 40).getBytes("UTF-8")

  test("lz4_deflate kernel: lossless, compressed, content-checksummed") {
    val comp = Lz4Deflate.deflate(text)
    assert(comp.length < text.length) // real compression happened
    assert(inflate(comp).toSeq == text.toSeq)
    // content checksum must catch a mid-block bit flip
    val corrupt = comp.clone()
    corrupt(comp.length / 2) = (corrupt(comp.length / 2) ^ 0x10).toByte
    intercept[IllegalArgumentException](inflate(corrupt))
  }

  test("multi-frame streams concatenate (.lz4 cat semantics)") {
    val f1 = Lz4Deflate.deflate("first|".getBytes)
    val f2 = Lz4Deflate.deflate("second".getBytes)
    assert(new String(inflate(f1 ++ f2), "UTF-8") == "first|second")
  }

  /** Hand-built frame of stored (uncompressed) blocks — an independent
    * second implementation of the SQL emitter's bit layout, including the
    * real xxHash32 header-checksum byte.
    */
  private def storedFrame(blocks: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x04); out.write(0x22); out.write(0x4d); out.write(0x18) // magic LE
    val flg = 0x60; val bd = 0x40 // v01 + block-independence; 64 KB
    val hc = (net.jpountz.xxhash.XXHashFactory.fastestInstance().hash32()
      .hash(Array(flg.toByte, bd.toByte), 0, 2, 0) >> 8) & 0xFF
    out.write(flg); out.write(bd); out.write(hc)
    blocks.foreach { b =>
      val v = 0x80000000 | b.length // high bit = uncompressed
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write(v >>> 24)
      out.write(b, 0, b.length)
    }
    out.write(0); out.write(0); out.write(0); out.write(0) // end mark
    out.toByteArray
  }

  test("hand-built stored-block frame decodes exactly (the SQL emitter's shape)") {
    val b1 = Array.tabulate(48)(i => (i * 5 + 7).toByte)
    val b2 = Array.tabulate(16)(i => (i * 11 + 3).toByte)
    assert(inflate(storedFrame(Seq(b1, b2))).toSeq == (b1 ++ b2).toSeq)
  }

  test("rejects: bad magic, bad header checksum, truncated frame, garbage") {
    val comp = Lz4Deflate.deflate(text)
    val badMagic = comp.clone(); badMagic(0) = 0x05
    intercept[IllegalArgumentException](inflate(badMagic))
    val badHc = storedFrame(Seq(Array.tabulate(8)(_.toByte)))
    badHc(6) = (badHc(6) ^ 0x7f).toByte // descriptor checksum byte
    intercept[IllegalArgumentException](inflate(badHc))
    intercept[IllegalArgumentException](inflate(comp.dropRight(6)))
    intercept[IllegalArgumentException](inflate("definitely not lz4".getBytes))
  }

  test("empty input yields empty output (zero frames)") {
    assert(inflate(Array.emptyByteArray).isEmpty)
  }
}
