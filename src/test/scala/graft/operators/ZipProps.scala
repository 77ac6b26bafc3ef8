package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck invariants for the ZIP walk ([[PdfProps]] is the
  * template). ZipSpec pins known grammar cases; this sweeps the space
  * with an INDEPENDENT test-side encoder (LFH + central directory +
  * EOCD laid out HERE with real CRC-32s and real raw-Deflater members):
  * any entry list round-trips through the in-memory walk with STORED
  * and DEFLATE members mixed freely and directory entries skipped; an
  * EOCD comment still frames; and the reject matrix stays loud under
  * CRC corruption.
  */
object ZipProps extends Properties("zip") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val nameGen: Gen[String] = for {
    n <- Gen.choose(1, 30)
    cs <- Gen.listOfN(n, Gen.oneOf((('a' to 'z') ++ ('0' to '9') ++ "._-").toSeq))
  } yield cs.mkString
  private val payloadGen: Gen[Array[Byte]] = Gen.choose(0, 700)
    .flatMap(n => Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte)).map(_.toArray))
  // (name, payload, deflate?, directory?)
  private val entryGen: Gen[(String, Array[Byte], Boolean, Boolean)] = for {
    name <- nameGen
    data <- payloadGen
    defl <- Gen.oneOf(true, false)
    isDir <- Gen.frequency(5 -> false, 1 -> true)
  } yield (name, data, defl, isDir)
  private val entriesGen: Gen[List[(String, Array[Byte], Boolean, Boolean)]] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, entryGen))

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def rawDeflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val bo = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
    d.end()
    bo.toByteArray
  }

  /** Independent encoder: per entry an LFH + member data, then the
    * central directory, then the EOCD (optionally with a comment).
    */
  private def encode(entries: Seq[(String, Array[Byte], Boolean, Boolean)],
      comment: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val cd = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name0, data0, defl, isDir) =>
      val name = if (isDir) name0 + "/" else name0
      val data = if (isDir) Array.emptyByteArray else data0
      val crc = { val c = new java.util.zip.CRC32; c.update(data); c.getValue }
      val stored = if (defl && !isDir) rawDeflate(data) else data
      val method = if (defl && !isDir) 8 else 0
      val nb = name.getBytes("US-ASCII")
      val lho = out.size()
      out.write(le32(0x04034b50L)); out.write(le16(20)); out.write(le16(0))
      out.write(le16(method)); out.write(le16(0)); out.write(le16(0))
      out.write(le32(crc)); out.write(le32(stored.length)); out.write(le32(data.length))
      out.write(le16(nb.length)); out.write(le16(0)); out.write(nb)
      out.write(stored)
      cd.write(le32(0x02014b50L)); cd.write(le16(20)); cd.write(le16(20)); cd.write(le16(0))
      cd.write(le16(method)); cd.write(le16(0)); cd.write(le16(0))
      cd.write(le32(crc)); cd.write(le32(stored.length)); cd.write(le32(data.length))
      cd.write(le16(nb.length)); cd.write(le16(0)); cd.write(le16(0))
      cd.write(le16(0)); cd.write(le16(0)); cd.write(le32(0))
      cd.write(le32(lho)); cd.write(nb)
    }
    val cdOff = out.size()
    val cdBytes = cd.toByteArray
    out.write(cdBytes)
    val cb = comment.getBytes("US-ASCII")
    out.write(le32(0x06054b50L)); out.write(le16(0)); out.write(le16(0))
    out.write(le16(entries.length)); out.write(le16(entries.length))
    out.write(le32(cdBytes.length)); out.write(le32(cdOff))
    out.write(le16(cb.length)); out.write(cb)
    out.toByteArray
  }

  private def files(entries: Seq[(String, Array[Byte], Boolean, Boolean)]): Seq[(String, Seq[Byte])] =
    entries.collect { case (n, d, _, false) => (n, d.toSeq) }

  property("writer -> walk round-trips any STORED/DEFLATE mix; directories skip") =
    forAll(entriesGen) { entries =>
      Zip.entries(encode(entries)).map { case (n, d) => (n, d.toSeq) } == files(entries)
    }

  property("an EOCD comment (up to real lengths) still frames the directory") =
    forAll(entriesGen, Gen.choose(0, 200)) { (entries, n) =>
      val withComment = encode(entries, comment = "c" * n)
      Zip.entries(withComment).map { case (e, d) => (e, d.toSeq) } == files(entries)
    }

  property("seekable file walk == in-memory walk on any entry mix") =
    forAll(entriesGen) { entries =>
      val enc = encode(entries)
      val tmp = java.nio.file.Files.createTempFile("graft_zipprops", ".zip")
      try {
        java.nio.file.Files.write(tmp, enc)
        val path = new org.apache.hadoop.fs.Path(tmp.toUri)
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val seeked = Zip.entriesFromFile(fs, path)
          .map { case (n, d) => (n, d.toSeq) }.toSeq
        seeked == files(entries)
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }

  property("reject-matrix stability: a corrupted member CRC stays loud") =
    forAll(entriesGen.suchThat(_.exists(e => !e._4))) { entries =>
      val enc = encode(entries)
      // flip one bit of the FIRST member's central-directory CRC field:
      // the CD starts at the EOCD's cdOff pointer, CRC sits at +16
      val eocdOff = {
        var p = enc.length - 22
        while (!((enc(p) & 0xff) == 0x50 && (enc(p + 1) & 0xff) == 0x4b &&
          (enc(p + 2) & 0xff) == 0x05 && (enc(p + 3) & 0xff) == 0x06)) p -= 1
        p
      }
      val cdOff = (enc(eocdOff + 16) & 0xff) | ((enc(eocdOff + 17) & 0xff) << 8) |
        ((enc(eocdOff + 18) & 0xff) << 16) | ((enc(eocdOff + 19) & 0xff) << 24)
      // first FILE record: walk records until one whose name has no '/'
      var rec = cdOff
      var done = false
      var loud = false
      while (!done) {
        val nameLen = (enc(rec + 28) & 0xff) | ((enc(rec + 29) & 0xff) << 8)
        val extraLen = (enc(rec + 30) & 0xff) | ((enc(rec + 31) & 0xff) << 8)
        val cmtLen = (enc(rec + 32) & 0xff) | ((enc(rec + 33) & 0xff) << 8)
        val name = new String(enc, rec + 46, nameLen, "US-ASCII")
        if (!name.endsWith("/")) {
          val bad = enc.clone()
          bad(rec + 16) = (bad(rec + 16) ^ 0x01).toByte
          loud =
            try { Zip.entries(bad); false }
            catch { case e: IllegalArgumentException => e.getMessage.contains("CRC") }
          done = true
        } else rec += 46 + nameLen + extraLen + cmtLen
      }
      loud
    }
}
