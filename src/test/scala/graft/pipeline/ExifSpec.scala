package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** The TIFF/EXIF walk against an INDEPENDENT ByteBuffer-based builder
  * (explicit ByteOrder, not the SQL skeleton's hex assembly): both
  * endians, inline vs offset values, the JPEG APP1 wrap behind decoy
  * segments, and the reject matrix.
  */
class ExifSpec extends AnyFunSuite {

  /** Independent EXIF builder: IFD0 {Make, Model, Orientation, ExifPtr},
    * ExifIFD {DateTimeOriginal, PixelXDimension}. Data area directly
    * after the IFDs; offsets computed, not copied from the parser.
    */
  private def tiff(big: Boolean, make: String, model: String,
      orientation: Int, dt: String, pixelX: Long): Array[Byte] = {
    val order = if (big) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val makeB = (make + "\u0000").getBytes("US-ASCII")
    val modelB = (model + "\u0000").getBytes("US-ASCII")
    val dtB = (dt + "\u0000").getBytes("US-ASCII")
    val ifd0Ofs = 8
    val exifOfs = ifd0Ofs + 2 + 4 * 12 + 4
    val dataOfs = exifOfs + 2 + 2 * 12 + 4
    val buf = ByteBuffer.allocate(dataOfs + makeB.length + modelB.length + dtB.length)
      .order(order)
    buf.put(if (big) 'M'.toByte else 'I'.toByte).put(if (big) 'M'.toByte else 'I'.toByte)
    buf.putShort(42).putInt(ifd0Ofs)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3) { buf.putShort(value.toShort); buf.putShort(0) }
      else buf.putInt(value)
    }
    buf.putShort(4)
    entry(0x010f, 2, makeB.length, dataOfs)
    entry(0x0110, 2, modelB.length, dataOfs + makeB.length)
    entry(0x0112, 3, 1, orientation)
    entry(0x8769, 4, 1, exifOfs)
    buf.putInt(0)
    buf.putShort(2)
    entry(0x9003, 2, dtB.length, dataOfs + makeB.length + modelB.length)
    entry(0xa002, 4, 1, pixelX.toInt)
    buf.putInt(0)
    buf.put(makeB).put(modelB).put(dtB)
    buf.array()
  }

  private def jpegWrap(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
    bos.write(Array[Byte](0xff.toByte, 0xe0.toByte, 0, 6, 1, 2, 3, 4)) // decoy APP0
    val app1 = "Exif\u0000\u0000".getBytes("US-ASCII") ++ payload
    val len = app1.length + 2
    bos.write(Array[Byte](0xff.toByte, 0xe1.toByte, (len >> 8).toByte, (len & 0xff).toByte))
    bos.write(app1)
    bos.write(Array[Byte](0xff.toByte, 0xda.toByte, 0, 2)) // SOS: walk must have stopped
    bos.toByteArray
  }

  private val sample = ("Canon", "EOS R5", 6, "2023:12:25 08:30:00", 8192L)

  test("bare TIFF, both endians: all six fields round-trip") {
    for (big <- Seq(false, true)) {
      val m = Exif.parse(tiff(big, sample._1, sample._2, sample._3, sample._4, sample._5))
      assert(m == Exif.ExifMeta(big, "Canon", "EOS R5", 6, "2023:12:25 08:30:00", 8192L))
    }
  }

  test("JPEG APP1 wrap: decoy APP0 skipped, big-endian segment lengths, MM TIFF inside") {
    val m = Exif.parse(jpegWrap(tiff(big = true, sample._1, sample._2, sample._3, sample._4, sample._5)))
    assert(m.bigEndian && m.make == "Canon" && m.pixelX == 8192L)
  }

  test("standalone markers (TEM) before APP1 have no length field and are skipped") {
    val wrapped = jpegWrap(tiff(big = false, sample._1, sample._2, sample._3, sample._4, sample._5))
    // splice a standalone TEM marker right after SOI
    val spliced = wrapped.take(2) ++ Array[Byte](0xff.toByte, 0x01) ++ wrapped.drop(2)
    assert(Exif.parse(spliced).make == "Canon")
  }

  test("ASCII values stop at the first NUL inside the declared count (padding)") {
    // rebuild make with declared count 12 (NUL-padded) via the fixture's own query path:
    // easiest honest check — a make whose count includes padding parses to the short string
    val padded = tiff(big = false, "ab\u0000\u0000\u0000", "m", 1, "2020:01:01 00:00:00", 1L)
    assert(Exif.parse(padded).make == "ab")
  }

  test("reject matrix: BOM, magic, truncation, bad offset, unterminated string, no APP1, tag order") {
    val good = tiff(big = false, sample._1, sample._2, sample._3, sample._4, sample._5)
    val badBom = good.clone(); badBom(0) = 'X'.toByte
    intercept[Exception](Exif.parse(badBom))
    val badMagic = good.clone(); badMagic(2) = 7
    intercept[Exception](Exif.parse(badMagic))
    intercept[Exception](Exif.parse(good.take(40))) // truncated IFD0
    val badOfs = good.clone()
    // Make entry's value offset (first entry, value field at 8 + 2 + 8) -> out of bounds
    badOfs(18) = 0xff.toByte; badOfs(19) = 0xff.toByte
    intercept[Exception](Exif.parse(badOfs))
    val unterminated = good.clone()
    java.util.Arrays.fill(unterminated, unterminated.length - 1, unterminated.length, 'x'.toByte)
    intercept[Exception](Exif.parse(unterminated))
    intercept[Exception](Exif.parse(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe0.toByte, 0, 4, 9, 9))) // JPEG with no APP1
    val disorder = good.clone()
    // swap the first two IFD0 entries (12 bytes each at offset 10)
    val tmp = disorder.slice(10, 22)
    System.arraycopy(disorder, 22, disorder, 10, 12)
    System.arraycopy(tmp, 0, disorder, 22, 12)
    intercept[Exception](Exif.parse(disorder))
  }
}
