package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The zstd_inflate kernel against zstd-jni's own COMPRESSOR (real
  * entropy-coded blocks, the arm the SQL fixture can't emit), hand-built
  * RAW/RLE frames (the emitter's shape, decoded by the independent native
  * machine), multi-frame concatenation, and the reject matrix.
  */
class ZstdInflateSpec extends AnyFunSuite {
  import ZstdInflate.inflate

  private val text = ("the quick brown fox jumps over the lazy dog, " * 40).getBytes("UTF-8")

  test("round-trips zstd-jni compressed frames (real compressed blocks)") {
    val comp = com.github.luben.zstd.Zstd.compress(text, 3)
    assert(comp.length < text.length) // actually compressed
    assert(inflate(comp).toSeq == text.toSeq)
  }

  test("zstd_deflate kernel: lossless, checksummed, and corruption-detectable") {
    val comp = ZstdDeflate.deflate(text)
    assert(comp.length < text.length)
    assert(inflate(comp).toSeq == text.toSeq)
    // the deflate kernel must emit a frame checksum: a mid-block bit flip
    // in entropy-coded literals can otherwise decode to silent garbage
    val corrupt = comp.clone()
    corrupt(comp.length / 2) = (corrupt(comp.length / 2) ^ 0x10).toByte
    intercept[IllegalArgumentException](inflate(corrupt))
  }

  test("multi-frame streams concatenate (zstd cat semantics)") {
    val f1 = com.github.luben.zstd.Zstd.compress("first|".getBytes, 1)
    val f2 = com.github.luben.zstd.Zstd.compress("second".getBytes, 19)
    assert(new String(inflate(f1 ++ f2), "UTF-8") == "first|second")
  }

  /** Hand-built single-segment frame: RAW block + last RLE block — an
    * independent second implementation of the SQL emitter's bit layout.
    */
  private def rawRleFrame(raw: Array[Byte], rleByte: Byte, rleLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x28); out.write(0xb5); out.write(0x2f); out.write(0xfd) // magic LE
    out.write(0x20) // FHD: single segment, 1-byte FCS
    out.write(raw.length + rleLen) // content size
    val rawHdr = raw.length << 3 // not last, type RAW
    out.write(rawHdr & 0xff); out.write((rawHdr >> 8) & 0xff); out.write(rawHdr >> 16)
    out.write(raw, 0, raw.length)
    val rleHdr = 3 | (rleLen << 3) // last, type RLE
    out.write(rleHdr & 0xff); out.write((rleHdr >> 8) & 0xff); out.write(rleHdr >> 16)
    out.write(rleByte)
    out.toByteArray
  }

  test("hand-built RAW + RLE frame decodes exactly (the SQL emitter's shape)") {
    val raw = Array.tabulate(48)(i => (i * 5 + 7).toByte)
    val got = inflate(rawRleFrame(raw, 0x61, 16))
    assert(got.toSeq == (raw ++ Array.fill(16)(0x61.toByte)).toSeq)
  }

  test("rejects: bad magic, truncated frame, corrupt checksummed block, garbage") {
    val comp = com.github.luben.zstd.Zstd.compress(text, 3)
    val badMagic = comp.clone(); badMagic(0) = 0x29
    intercept[IllegalArgumentException](inflate(badMagic))
    intercept[IllegalArgumentException](inflate(comp.dropRight(8)))
    // payload corruption is only GUARANTEED caught under a frame checksum
    // (a flip inside entropy-coded literals can decode to plausible bytes);
    // XXH64 content checksums are what real .zst corpora ship with
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    val checked = try { ctx.setLevel(3).setChecksum(true); ctx.compress(text) }
      finally ctx.close()
    val corrupt = checked.clone()
    corrupt(checked.length / 2) = (corrupt(checked.length / 2) ^ 0x55).toByte
    intercept[IllegalArgumentException](inflate(corrupt))
    intercept[IllegalArgumentException](inflate("definitely not zstd".getBytes))
  }

  test("empty input yields empty output (zero frames)") {
    assert(inflate(Array.emptyByteArray).isEmpty)
  }
}
