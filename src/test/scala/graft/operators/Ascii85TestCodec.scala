package graft.operators

/** Test-side ASCII85 ENCODER mirror (ISO 32000-1 §7.4.3 / btoa): 4-byte
  * big-endian groups to 5 base-85 `!`..`u` digits, all-zero FULL groups
  * as `z`, a final partial group of n bytes zero-padded and emitted as
  * its top n+1 digits, closed with `~>`. Written independently of the
  * production decoder ([[Pdf]]'s `ascii85Decode`) so neither side can
  * hide the other's bugs — the [[LzwTestCodec]] discipline.
  */
object Ascii85TestCodec {

  def encode(data: Array[Byte], zShortcut: Boolean = true): Array[Byte] = {
    val out = new StringBuilder
    var i = 0
    while (i + 4 <= data.length) {
      val v = ((data(i) & 0xffL) << 24) | ((data(i + 1) & 0xffL) << 16) |
        ((data(i + 2) & 0xffL) << 8) | (data(i + 3) & 0xffL)
      if (v == 0 && zShortcut) out.append('z')
      else appendDigits(out, v, 5)
      i += 4
    }
    val rem = data.length - i
    if (rem > 0) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (if (j < rem) data(i + j) & 0xffL else 0L); j += 1 }
      appendDigits(out, v, rem + 1)
    }
    out.append("~>")
    out.toString.getBytes("US-ASCII")
  }

  private def appendDigits(out: StringBuilder, v: Long, keep: Int): Unit = {
    val d = new Array[Int](5)
    var x = v
    var k = 4
    while (k >= 0) { d(k) = (x % 85).toInt; x /= 85; k -= 1 }
    (0 until keep).foreach(k => out.append(('!' + d(k)).toChar))
  }
}
