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
