package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Ascii85TestCodec

/** r18 optimization guards for the fixture-emitter kernels: `adler32` must
  * equal the arithmetic prefix-sum identity the SQL folds computed
  * (s1 = 1+Σb, s2 = n+Σ(n−j)·b_j, both mod 65521), and `ascii85_armor`
  * must equal the independently written test-side encoder mirror —
  * including the padded-tail geometry — so the retired interpreted SQL
  * walks and the new codegen'd kernels are pinned value-identical.
  */
class EmitterKernelSpec extends SparkSpec {

  private val rng = new scala.util.Random(181)

  private def refAdler(bytes: Array[Byte]): Long = {
    val n = bytes.length
    var s1 = 1L
    var s2 = n.toLong
    var j = 0
    while (j < n) {
      val b = bytes(j) & 0xffL
      s1 += b
      s2 += (n - j) * b
      j += 1
    }
    (s2 % 65521) * 65536 + (s1 % 65521)
  }

  test("adler32 kernel == arithmetic prefix-sum fold (and the JDK zlib value)") {
    for (len <- Seq(0, 1, 63, 330, 4096)) {
      val bytes = Array.fill[Byte](len)(rng.nextInt().toByte)
      assert(Adler32Fn.checksum(bytes) == refAdler(bytes), s"len $len")
    }
  }

  test("ascii85_armor kernel == independent test-side mirror (no z, no EOD)") {
    for (len <- Seq(1, 2, 3, 4, 5, 341, 343)) {
      val bytes = Array.fill[Byte](len)(rng.nextInt().toByte)
      val mirror = new String(Ascii85TestCodec.encode(bytes, zShortcut = false),
        "US-ASCII").stripSuffix("~>")
      assert(Ascii85Armor.armor(bytes).toString == mirror, s"len $len")
    }
    // all-zero groups must emit straight '!!!!!' digits, never 'z'
    assert(Ascii85Armor.armor(Array[Byte](0, 0, 0, 0)).toString == "!!!!!")
  }

  test("kernels through SQL/codegen match the direct calls") {
    import spark.implicits._
    val payloads = Seq.fill(8)(Array.fill[Byte](rng.nextInt(400) + 1)(rng.nextInt().toByte))
    val got = payloads.map(Tuple1(_)).toDF("b")
      .select(expr("adler32(b)").as("a"), expr("ascii85_armor(b)").as("s"))
      .collect()
    payloads.zip(got).foreach { case (p, r) =>
      assert(r.getLong(0) == Adler32Fn.checksum(p))
      assert(r.getString(1) == Ascii85Armor.armor(p).toString)
    }
  }

  // ---- retired interpreted SQL chains, kept here verbatim as the parity
  // ---- reference for the jpeg/gif/ahash kernels (r18 emitter rewrite)

  private val dcCodes =
    graft.pipeline.MediaCodec.JpegDcLumCodes.map(c => s"'$c'").mkString(", ")

  /** The retired baseline-DC scan chain (`jpegDcPayload` pre-r18),
    * parameterized by the stored-index permutation SQL.
    */
  private def oldBaselineScan(docs: org.apache.spark.sql.DataFrame,
      nBlocks: Int, rst: Int, idx: String => String): org.apache.spark.sql.DataFrame = {
    def b(k: String) = s"cast(conv(substring(h, (${idx(k)}) * 2 + 1, 2), 16, 10) as int)"
    def pack(p: String) =
      s"""array_join(transform(sequence(0, cast(length($p) / 8 as int) - 1),
            i -> if(conv(substring($p, i * 8 + 1, 8), 2, 10) = '255', 'FF00',
                    lpad(hex(cast(conv(substring($p, i * 8 + 1, 8), 2, 10) as bigint)), 2, '0'))),
          '')"""
    val segs = (0 until nBlocks / rst).map { s =>
      (s"bits$s", s"array_join(slice(blockbits, ${s * rst + 1}, $rst), '')")
    }
    var df = docs
      .withColumn("diffs", expr(
        s"transform(sequence(0, ${nBlocks - 1}), k -> ${b("k")} - if(k % $rst = 0, 128, ${b("k - 1")}))"))
      .withColumn("cats", expr(
        "transform(diffs, d -> if(d = 0, 0, length(bin(cast(abs(d) as bigint)))))"))
      .withColumn("blockbits", expr(
        s"""zip_with(diffs, cats, (d, c) -> concat(
              element_at(array($dcCodes), c + 1),
              if(c = 0, '', lpad(bin(cast(if(d > 0, d, d + shiftleft(1, c) - 1) as bigint)), c, '0')),
              '1010'))"""))
    for ((name, bitsExpr) <- segs) {
      df = df.withColumn(name, expr(bitsExpr))
        .withColumn(s"p$name", expr(
          s"rpad($name, cast(ceil(length($name) / 8.0) * 8 as int), '1')"))
        .withColumn(s"seg$name", expr(pack(s"p$name")))
    }
    val scan = segs.zipWithIndex.map { case ((name, _), i) =>
      val m = if (i < segs.length - 1) s", 'FFD${i % 8}'" else ""
      s"seg$name$m"
    }.mkString(", ")
    df.select(col("doc_id"), expr(s"concat($scan)").as("scan"))
  }

  /** The retired progressive two-scan chain (`realJpegProg` pre-r18):
    * returns (doc_id, scan1, scan2).
    */
  private def oldProgScans(docs: org.apache.spark.sql.DataFrame,
      nBlocks: Int, rst: Int): org.apache.spark.sql.DataFrame = {
    def b(k: String) = s"cast(conv(substring(h, ($k) * 2 + 1, 2), 16, 10) as int)"
    def pack(p: String) =
      s"""array_join(transform(sequence(0, cast(length($p) / 8 as int) - 1),
            i -> if(conv(substring($p, i * 8 + 1, 8), 2, 10) = '255', 'FF00',
                    lpad(hex(cast(conv(substring($p, i * 8 + 1, 8), 2, 10) as bigint)), 2, '0'))),
          '')"""
    val segs = (0 until nBlocks / rst).map { s =>
      (s, s"array_join(slice(blockbits, ${s * rst + 1}, $rst), '')",
        s"array_join(slice(refbits, ${s * rst + 1}, $rst), '')")
    }
    var df = docs
      .withColumn("tvals", expr(
        s"transform(sequence(0, ${nBlocks - 1}), k -> shiftright(${b("k")} - 128, 1))"))
      .withColumn("diffs", expr(
        s"transform(sequence(0, ${nBlocks - 1}), k -> element_at(tvals, k + 1) - if(k % $rst = 0, 0, element_at(tvals, k)))"))
      .withColumn("cats", expr(
        "transform(diffs, d -> if(d = 0, 0, length(bin(cast(abs(d) as bigint)))))"))
      .withColumn("blockbits", expr(
        s"""zip_with(diffs, cats, (d, c) -> concat(
              element_at(array($dcCodes), c + 1),
              if(c = 0, '', lpad(bin(cast(if(d > 0, d, d + shiftleft(1, c) - 1) as bigint)), c, '0'))))"""))
      .withColumn("refbits", expr(
        s"transform(sequence(0, ${nBlocks - 1}), k -> cast((${b("k")} - 128) % 2 != 0 as string))"))
      .withColumn("refbits", expr("transform(refbits, v -> if(v = 'true', '1', '0'))"))
    for ((i, bits1, bits2) <- segs) {
      df = df
        .withColumn(s"p1s$i", expr(
          s"rpad($bits1, cast(ceil(length($bits1) / 8.0) * 8 as int), '1')"))
        .withColumn(s"seg1s$i", expr(pack(s"p1s$i")))
        .withColumn(s"p2s$i", expr(
          s"rpad($bits2, cast(ceil(length($bits2) / 8.0) * 8 as int), '1')"))
        .withColumn(s"seg2s$i", expr(pack(s"p2s$i")))
    }
    def scanOf(prefix: String) = segs.map { case (i, _, _) =>
      val m = if (i < segs.length - 1) s", 'FFD${i % 8}'" else ""
      s"$prefix$i$m"
    }.mkString(", ")
    df.select(col("doc_id"),
      expr(s"concat(${scanOf("seg1s")})").as("scan1"),
      expr(s"concat(${scanOf("seg2s")})").as("scan2"))
  }

  private def sampleDocs(minBytes: Int) =
    graft.Tables.documents(spark, Sf0001)
      .filter(expr(s"octet_length(text) >= $minBytes"))
      .limit(40)
      .withColumn("h", expr("hex(cast(text as binary))"))

  test("jpeg_dc_scan_hex mode 0 == retired baseline SQL chain (all orientations)") {
    val idxOf: Map[Int, String => String] = Map(
      1 -> (k => k),
      3 -> ((k: String) => s"63 - ($k)"),
      6 -> ((k: String) => s"(($k) % 8) * 8 + 7 - ($k) div 8"),
      8 -> ((k: String) => s"(7 - ($k) % 8) * 8 + ($k) div 8"))
    for (o <- Seq(1, 3, 6, 8)) {
      val docs = sampleDocs(64)
      val old = oldBaselineScan(docs, 64, 16, idxOf(o))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val neu = docs.select(col("doc_id"),
          expr(s"jpeg_dc_scan_hex(substring(cast(text as binary), 1, 64), 16, 0, $o)").as("scan"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(old.nonEmpty && neu == old, s"orientation $o")
    }
    // and the 48-block identity geometry mm_real_jpeg uses
    val docs48 = sampleDocs(48)
    val old48 = oldBaselineScan(docs48, 48, 16, k => k)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val neu48 = docs48.select(col("doc_id"),
        expr("jpeg_dc_scan_hex(substring(cast(text as binary), 1, 48), 16, 0, 1)").as("scan"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(old48.nonEmpty && neu48 == old48)
  }

  test("jpeg_dc_scan_hex modes 1/2 == retired progressive SQL chains") {
    val docs = sampleDocs(48)
    val old = oldProgScans(docs, 48, 16)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val neu = docs.select(col("doc_id"),
        expr("jpeg_dc_scan_hex(substring(cast(text as binary), 1, 48), 16, 1, 1)").as("s1"),
        expr("jpeg_dc_scan_hex(substring(cast(text as binary), 1, 48), 16, 2, 1)").as("s2"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(old.nonEmpty && neu == old)
  }

  test("gif_pixel_blocks_hex == retired per-block SQL concat") {
    val gifPixels = 192
    val pix = "lpad(hex(cast(conv(substring(h, i * 2 + 1, 2), 16, 10) as bigint) % 128), 2, '0')"
    def block(start: Int, count: Int, last: Boolean) = {
      val body = s"array_join(transform(sequence($start, ${start + count - 1}), i -> $pix), '')"
      if (!last) s"concat('7F80', $body)"
      else s"concat('${"%02X".format(count + 2)}80', $body, '81')"
    }
    val blocks = (0 until gifPixels / 126).map(b => block(b * 126, 126, last = false)) :+
      block((gifPixels / 126) * 126, gifPixels % 126, last = true)
    val docs = sampleDocs(gifPixels)
    val old = docs.select(col("doc_id"), expr(s"concat(${blocks.mkString(", ")})").as("g"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val neu = docs.select(col("doc_id"),
        expr(s"gif_pixel_blocks_hex(substring(cast(text as binary), 1, $gifPixels))").as("g"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(old.nonEmpty && neu == old)
  }

  test("ahash64_sampled == retired conv/mean/bit-pack SQL folds") {
    val docs = sampleDocs(64)
      .select(col("doc_id"), expr("cast(text as binary)").as("payload"))
      .withColumn("h", expr("hex(payload)"))
      .withColumn("stride", expr("length(payload) div 64"))
    val old = docs
      .withColumn("bytes", expr(
        """transform(sequence(0, 63), j ->
              CAST(conv(substring(h, j * stride * 2 + 1, 2), 16, 10) AS DOUBLE))"""))
      .withColumn("mean", expr(
        "aggregate(bytes, CAST(0.0 AS DOUBLE), (a, x) -> a + x) / 64.0D"))
      .withColumn("ah", expr(
        """aggregate(sequence(0, 63), CAST(0 AS BIGINT),
              (acc, j) -> acc + CASE WHEN element_at(bytes, j + 1) > mean
                THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)"""))
      .select("doc_id", "ah").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val neu = docs.select(col("doc_id"), expr("ahash64_sampled(payload)").as("ah"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(old.nonEmpty && neu == old)
  }
}
