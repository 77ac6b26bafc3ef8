package graft.operators

import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** The zip central-directory walk against the JDK's own
  * `ZipOutputStream` — an independent production writer whose DEFLATED
  * members on a non-seekable sink use data descriptors (flag bit 3,
  * zeroed local sizes), exactly the shape that breaks naive forward
  * scanners — plus STORED members, directory skipping, archive comments,
  * and the reject matrix.
  */
class ZipSpec extends AnyFunSuite {

  private val a = "first member payload".getBytes("UTF-8")
  private val b = Array.tabulate(3000)(i => (i * 7 + 3).toByte) // compresses

  private def jdkZip(comment: String = null,
      storedFirst: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    if (comment != null) z.setComment(comment)
    if (storedFirst) {
      val e = new ZipEntry("a.txt")
      e.setMethod(ZipEntry.STORED)
      e.setSize(a.length); e.setCompressedSize(a.length)
      val c = new CRC32; c.update(a); e.setCrc(c.getValue)
      z.putNextEntry(e); z.write(a); z.closeEntry()
    } else {
      z.putNextEntry(new ZipEntry("a.txt")); z.write(a); z.closeEntry()
    }
    z.putNextEntry(new ZipEntry("dir/")); z.closeEntry()
    z.putNextEntry(new ZipEntry("dir/b.bin")); z.write(b); z.closeEntry()
    z.close()
    bos.toByteArray
  }

  test("entries: DEFLATED members with data descriptors inflate and CRC-verify") {
    val es = Zip.entries(jdkZip())
    assert(es.map(_._1) == IndexedSeq("a.txt", "dir/b.bin")) // directory skipped
    assert(es(0)._2.toSeq == a.toSeq && es(1)._2.toSeq == b.toSeq)
  }

  test("entries: STORED members, archive comment behind the EOCD") {
    val es = Zip.entries(jdkZip(comment = "corpus drop 2026-08", storedFirst = true))
    assert(es.map(_._1) == IndexedSeq("a.txt", "dir/b.bin"))
    assert(es(0)._2.toSeq == a.toSeq)
  }

  test("rejects: corrupted member, truncated tail, garbage, flipped CRC") {
    val zip = jdkZip()
    intercept[IllegalArgumentException](Zip.entries(zip.dropRight(10))) // EOCD gone
    intercept[IllegalArgumentException](Zip.entries("PK but not a zip".getBytes))
    // flip a byte inside b's deflate stream -> inflate or CRC must throw
    val dataStart = 30 + "a.txt".length
    val corrupt = zip.clone()
    corrupt(dataStart + 2) = (corrupt(dataStart + 2) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](Zip.entries(corrupt))
    assert(e.getMessage.contains("zip:"))
  }

  /** Hand-assembled ZIP64 archive (classic LFHs; central records with
    * sentinel csize/usize/lho + id-0x0001 extra; EOCD64 + locator;
    * sentinel classic EOCD) — an INDEPENDENT construction of the layout
    * the SQL fixture builds, so the parser is pinned from two sides.
    */
  private def zip64Of(members: (String, Array[Byte])*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    def w64(v: Long): Unit = (0 until 8).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    val offs = scala.collection.mutable.Buffer[Long]()
    members.foreach { case (n, d) =>
      offs += bos.size.toLong
      w32(0x04034b50L); w16(20); w16(0); w16(0); w16(0); w16(0x21)
      val c = new CRC32; c.update(d); w32(c.getValue)
      w32(d.length.toLong); w32(d.length.toLong); w16(n.length); w16(0)
      bos.write(n.getBytes("UTF-8")); bos.write(d)
    }
    val cdOff = bos.size.toLong
    members.zip(offs).foreach { case ((n, d), off) =>
      w32(0x02014b50L); w16(45); w16(45); w16(0); w16(0); w16(0); w16(0x21)
      val c = new CRC32; c.update(d); w32(c.getValue)
      w32(0xffffffffL); w32(0xffffffffL) // csize, usize -> extra field
      w16(n.length); w16(28); w16(0); w16(0); w16(0); w32(0)
      w32(0xffffffffL) // lho -> extra field
      bos.write(n.getBytes("UTF-8"))
      w16(1); w16(24); w64(d.length.toLong); w64(d.length.toLong); w64(off)
    }
    val cdSize = bos.size - cdOff
    val eocd64Off = bos.size.toLong
    w32(0x06064b50L); w64(44); w16(45); w16(45); w32(0); w32(0)
    w64(members.size.toLong); w64(members.size.toLong); w64(cdSize); w64(cdOff)
    w32(0x07064b50L); w32(0); w64(eocd64Off); w32(1)
    w32(0x06054b50L); w16(0); w16(0); w16(0xffff); w16(0xffff)
    w32(0xffffffffL); w32(0xffffffffL); w16(0)
    bos.toByteArray
  }

  test("zip64: locator chase + EOCD64 + extra-field overrides parse; JDK ZipFile agrees") {
    val m1 = "zip64 member one".getBytes("UTF-8")
    val m2 = Array.tabulate(512)(i => (i * 31 + 5).toByte)
    val zip = zip64Of("a.txt" -> m1, "b.bin" -> m2)
    val es = Zip.entries(zip)
    assert(es.map(_._1) == IndexedSeq("a.txt", "b.bin"))
    assert(es(0)._2.toSeq == m1.toSeq && es(1)._2.toSeq == m2.toSeq)
    // the JDK's own ZIP64-aware reader must see the identical member set
    val f = java.nio.file.Files.createTempFile("graft_zip64", ".zip")
    java.nio.file.Files.write(f, zip)
    val zf = new java.util.zip.ZipFile(f.toFile)
    try {
      import scala.jdk.CollectionConverters._
      val jdk = zf.entries().asScala.map { e =>
        e.getName -> zf.getInputStream(e).readAllBytes().toSeq
      }.toMap
      assert(jdk == Map("a.txt" -> m1.toSeq, "b.bin" -> m2.toSeq))
    } finally { zf.close(); java.nio.file.Files.delete(f) }
  }

  test("zip64 property: random member sets round-trip through entries, the seekable walk, and the JDK") {
    val rnd = new scala.util.Random(47)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
    for (trial <- 1 to 25) {
      val members = (0 until (1 + rnd.nextInt(6))).map { i =>
        val n = rnd.nextInt(2000)
        (s"m${trial}_$i.bin", Array.fill(n)(rnd.nextInt(256).toByte))
      }
      val zip = zip64Of(members: _*)
      val want = members.map { case (n, d) => n -> d.toSeq }
      assert(Zip.entries(zip).map { case (n, d) => n -> d.toSeq } == want,
        s"in-memory walk diverged on trial $trial")
      val f = java.nio.file.Files.createTempFile(s"graft_z64p$trial", ".zip")
      java.nio.file.Files.write(f, zip)
      try {
        assert(Zip.entriesFromFile(fs, new org.apache.hadoop.fs.Path(f.toString))
          .map { case (n, d) => n -> d.toSeq }.toSeq == want,
          s"seekable walk diverged on trial $trial")
        val zf = new java.util.zip.ZipFile(f.toFile)
        try {
          import scala.jdk.CollectionConverters._
          val jdk = zf.entries().asScala
            .map(e => e.getName -> zf.getInputStream(e).readAllBytes().toSeq).toSeq
          assert(jdk == want, s"JDK reader diverged on trial $trial")
        } finally zf.close()
      } finally java.nio.file.Files.delete(f)
    }
  }

  test("zip64 rejects: multi-disk locator, corrupt EOCD64, sentinels without locator") {
    val zip = zip64Of("a.txt" -> "payload".getBytes("UTF-8"))
    val locOff = zip.length - 22 - 20
    val multiDisk = zip.clone()
    multiDisk(locOff + 16) = 2 // total disks = 2
    val e1 = intercept[IllegalArgumentException](Zip.entries(multiDisk))
    assert(e1.getMessage.contains("multi-disk"))
    val badSig = zip.clone()
    badSig(locOff + 8) = 0 // EOCD64 offset now points at a non-EOCD64 byte
    val e2 = intercept[IllegalArgumentException](Zip.entries(badSig))
    assert(e2.getMessage.contains("zip64"))
    val noLocator = zip.clone()
    noLocator(locOff + 3) = 0 // break the locator signature
    val e3 = intercept[IllegalArgumentException](Zip.entries(noLocator))
    assert(e3.getMessage.contains("sentinel EOCD fields with no zip64 locator"))
  }

  test("entriesFromFile: the seekable walk equals the in-memory walk (classic + zip64)") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_zip_seek")
    val classic = jdkZip(comment = "tail window must still find the EOCD")
    val z64 = zip64Of("a.txt" -> "seekable member".getBytes("UTF-8"),
      "b.bin" -> Array.tabulate(700)(i => (i * 13 + 1).toByte))
    Files.write(Paths.get(dir.toString, "1.zip"), classic)
    Files.write(Paths.get(dir.toString, "2.zip"), z64)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
    def byPath(n: String) =
      Zip.entriesFromFile(fs, new org.apache.hadoop.fs.Path(dir.toString, n))
        .map { case (nm, d) => nm -> d.toSeq }.toSeq
    assert(byPath("1.zip") == Zip.entries(classic).map { case (n, d) => n -> d.toSeq })
    assert(byPath("2.zip") == Zip.entries(z64).map { case (n, d) => n -> d.toSeq })
    // corruption through the file path rejects with the same named errors
    val corrupt = classic.clone()
    corrupt(30 + "a.txt".length + 2) = (corrupt(30 + "a.txt".length + 2) ^ 0x40).toByte
    Files.write(Paths.get(dir.toString, "3.zip"), corrupt)
    val e = intercept[IllegalArgumentException](byPath("3.zip"))
    assert(e.getMessage.contains("zip:"))
  }

  test("docsFromPaths: the huge-archive front door matches docsFromFiles row for row") {
    val spark = graft.SparkSpec.session
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_zip_paths")
    def zipOf(members: (String, String)*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new ZipOutputStream(bos)
      members.foreach { case (n, t) =>
        z.putNextEntry(new ZipEntry(n)); z.write(t.getBytes("UTF-8")); z.closeEntry()
      }
      z.close(); bos.toByteArray
    }
    Files.write(Paths.get(dir.toString, "5.zip"),
      zipOf("readme.md" -> "skip", "one.txt" -> "erstes dokument",
        "two.txt" -> "zweites dokument 😀"))
    Files.write(Paths.get(dir.toString, "6.zip"),
      zip64Of("z64.txt" -> "zip64 bucket member".getBytes("UTF-8")))
    Files.write(Paths.get(dir.toString, "_SUCCESS"), Array.emptyByteArray)
    Files.write(Paths.get(dir.toString, "notes.txt"), "not an archive".getBytes)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val byPath = rows(Zip.docsFromPaths(spark, dir.toString))
    val byBytes = rows(Zip.docsFromFiles(
      spark.read.format("binaryFile").option("pathGlobFilter", "*.zip").load(dir.toString)))
    assert(byPath == byBytes && byPath.size == 3)
  }

  test("dataset-drop front door: .zip archives stream through CorpusIngest like documents") {
    val spark = graft.SparkSpec.session
    import java.nio.file.{Files, Paths}
    def zipOf(members: (String, String)*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new ZipOutputStream(bos)
      members.foreach { case (n, t) =>
        z.putNextEntry(new ZipEntry(n)); z.write(t.getBytes("UTF-8")); z.closeEntry()
      }
      z.close(); bos.toByteArray
    }
    val blobDir = Files.createTempDirectory("graft_zip_drop")
    val outDir = Files.createTempDirectory("graft_zip_out").toString
    val ckpt = Files.createTempDirectory("graft_zip_ckpt").toString
    Files.write(Paths.get(blobDir.toString, "7.zip"),
      zipOf("manifest.json" -> "{}", "one.txt" -> "the quick brown fox document",
        "two.txt" -> "ein anderes dokument mit text"))
    val q = graft.streaming.CorpusIngest.start(
      Zip.docStream(spark, blobDir.toString), "/root/testdata/sf0.001", outDir, ckpt)
    try {
      q.processAllAvailable()
      Files.write(Paths.get(blobDir.toString, "8.zip"), // second wave
        zipOf("three.txt" -> "a later archive drop with one document"))
      Files.write(Paths.get(blobDir.toString, "readme.txt"), "not an archive".getBytes)
      q.processAllAvailable()
    } finally q.stop()
    // the stream must land exactly what the batch twin produces on the
    // same parsed documents (manifest.json and readme.txt contribute nothing)
    val batchDocs = Zip.docsFromFiles(
      spark.read.format("binaryFile").option("pathGlobFilter", "*.zip").load(blobDir.toString))
    assert(batchDocs.count() == 3)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(spark.read.parquet(s"$outDir/chunks").drop("batch_id")) ==
      rows(graft.pipeline.TrainPrep.chunkDocsOf(batchDocs)))
  }

  test("docsFromFiles: .txt members become documents; doc_id = fileId<<24 | index") {
    val spark = graft.SparkSpec.session
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_zip_bucket")
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("readme.md")); z.write("nope".getBytes); z.closeEntry()
    z.putNextEntry(new ZipEntry("one.txt")); z.write("erstes dokument".getBytes); z.closeEntry()
    z.putNextEntry(new ZipEntry("two.txt"))
    z.write("zweites dokument 😀".getBytes("UTF-8")); z.closeEntry()
    z.close()
    Files.write(Paths.get(dir.toString, "5.zip"), bos.toByteArray)
    val docs = Zip.docsFromFiles(spark.read.format("binaryFile").load(dir.toString))
      .orderBy("doc_id").collect()
    assert(docs.map(r => (r.getLong(0), r.getString(3))).toSeq == Seq(
      ((5L << 24) | 1, "one.txt"), ((5L << 24) | 2, "two.txt")))
    assert(docs(1).getLong(4) == "zweites dokument ".length + 1)
  }
}
