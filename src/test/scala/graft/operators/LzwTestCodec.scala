package graft.operators

/** Test-side LZW ENCODER (the §7.4.4 TIFF variant the production
  * decoder reads): MSB-first packing, 9→12-bit widths growing one code
  * early (`EarlyChange` 1), clear at start and on table overflow, EOD
  * at the end. Independent of the production code — its 9-bit output
  * for "AAABBB" is pinned against a BY-HAND packing in PdfSpec, and
  * PdfProps mirrors it against the decoder across the width
  * boundaries.
  */
object LzwTestCodec {

  def encode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8
      }
    }
    val dict = scala.collection.mutable.Map.empty[String, Int]
    var next = 258
    def reset(): Unit = { dict.clear(); next = 258; width = 9 }
    emit(256) // initial clear
    var w = ""
    def codeOf(s: String): Int =
      if (s.length == 1) s.charAt(0).toInt else dict(s)
    def keyed(b: Byte): Char = (b & 0xff).toChar
    data.foreach { b =>
      val wb = w + keyed(b)
      if (wb.length == 1 || dict.contains(wb)) w = wb
      else {
        emit(codeOf(w))
        if (next == 4096) { emit(256); reset() }
        else {
          dict(wb) = next
          next += 1
          if (next + earlyChange >= (1 << width) && width < 12) width += 1
        }
        w = keyed(b).toString
      }
    }
    if (w.nonEmpty) emit(codeOf(w))
    emit(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }
}
