package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The batched decode contract (the mapInPandas-analogue surface): results
  * must be deterministic and INDEPENDENT of batch size and partitioning —
  * the batching is an execution detail, not a semantic one.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDs =
    Multimodal.media(spark, Sf0001)
      .select("doc_id", "media_type", "payload").as[MediaRow]

  test("batched decode is batch-size and partitioning invariant") {
    def run(batch: Int, parts: Int): Seq[(Long, Seq[Float])] =
      BatchedDecode.decodeFeatures(mediaDs.repartition(parts), batch)
        .collect().map(f => (f.doc_id, f.feature.toSeq)).toSeq.sortBy(_._1)
    val base = run(64, 4)
    assert(base.nonEmpty)
    assert(base === run(1, 4))
    assert(base === run(7, 1))
  }

  test("stub decoder features are non-trivial and fixed-dimension") {
    val feats = BatchedDecode.decodeFeatures(mediaDs).collect()
    assert(feats.forall(_.feature.length == Multimodal.FeatureDim))
    assert(feats.exists(_.feature.exists(_ > 0f)))
  }

  test("declarative feature norms agree between media() rows and raw documents") {
    val n = Multimodal.featureExtract(spark, Sf0001)
    // every document appears exactly once with a finite norm
    assert(n.count() === graft.Tables.documents(spark, Sf0001).count())
    assert(n.filter(col("feature_norm").isNull || col("feature_norm") < 0).count() === 0)
  }

  test("ahash dedup: identical payloads pair at hamming 0; independent aHash recompute") {
    import java.nio.file.Files
    val d = Files.createTempDirectory("graft_ahash_fixture").toString
    val longA = (0 until 40).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val longB = (0 until 40).map(i => s"zulu$i xray$i quux$i").mkString(" ")
    Seq((1L, longA, "en", "s0"), (2L, longA, "en", "s0"), (3L, longB, "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    // independent aHash: stride-sample 64 bytes of the UTF-8 payload,
    // threshold against their mean, pack bits
    def ahash(text: String): Long = {
      val bytes = text.getBytes("UTF-8")
      val stride = bytes.length / 64
      val sampled = (0 until 64).map(j => (bytes(j * stride) & 0xff).toDouble)
      val mean = sampled.sum / 64.0
      (0 until 64).foldLeft(0L)((acc, j) =>
        if (sampled(j) > mean) acc + (1L << j) else acc)
    }
    val got = Multimodal.ahashDedup(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got.get((1L, 2L)).contains(0), s"identical payloads must pair at 0: $got")
    val crossHam = java.lang.Long.bitCount(ahash(longA) ^ ahash(longB))
    assert(got.contains((1L, 3L)) == (crossHam <= 3),
      s"cross pair presence must follow the independent hamming $crossHam")
    got.foreach { case ((ia, ib), h) => assert(ia < ib && h <= 3) }
  }

  test("ahash dedup: chunk blocking survives aHashes straddling the sign bit") {
    import java.nio.file.Files
    val d = Files.createTempDirectory("graft_ahash_signbit").toString
    // 64-byte texts → stride 1, so byte j IS sample j. 'z'(122) > mean >
    // '0'(48) always (mean stays in [85, 86.2]), so the bit pattern is the
    // high/low pattern directly. A and B differ ONLY at position 63:
    // A sets bit 63 (negative aHash), B leaves it clear (positive aHash),
    // hamming(A, B) = 1 — chunks 0-2 are bitwise identical, so the 16-bit
    // chunk pigeonhole MUST pair them. Before the &65535 fix, the signed
    // `% 65536` remainder made every chunk of the negative hash differ.
    val base = (0 until 64).map(j => if (j % 2 == 0) 'z' else '0')
    val textA = (base.init :+ 'z').mkString // position 63 high → bit 63 set
    val textB = base.mkString               // position 63 low  → bit 63 clear
    Seq((10L, textA, "en", "s0"), (11L, textB, "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    def ahash(text: String): Long = {
      val bytes = text.getBytes("UTF-8")
      val sampled = (0 until 64).map(j => (bytes(j) & 0xff).toDouble)
      val mean = sampled.sum / 64.0
      (0 until 64).foldLeft(0L)((acc, j) =>
        if (sampled(j) > mean) acc + (1L << j) else acc)
    }
    // the fixture really does straddle the sign bit at hamming 1
    assert(ahash(textA) < 0 && ahash(textB) >= 0)
    assert(java.lang.Long.bitCount(ahash(textA) ^ ahash(textB)) === 1)

    val got = Multimodal.ahashDedup(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got.get((10L, 11L)).contains(1),
      s"sign-straddling hamming-1 pair must be found by chunk blocking: $got")
  }

  test("real-pixel ahash dedup: decoded near-dups pair; independent integer-hash recompute") {
    import java.nio.file.Files
    val d = Files.createTempDirectory("graft_real_ahash_fixture").toString
    // 192-char texts = the full 8x8 RGB pixel block. A and B share the
    // first 189 bytes; B's last pixel (bytes 189-191) flips from low to
    // high — at most that ONE grid cell's vote changes (plus any mean-shift
    // flips, none here: bytes are 'z'/'0', mean stays far from both).
    val half = (0 until 96).map(j => if (j % 2 == 0) 'z' else '0')
    val textA = (half ++ half).mkString
    val textB = ((half ++ half).take(189) ++ Seq('z', 'z', 'z')).mkString
    val textC = (0 until 192).map(j => "qrstuvw".charAt(j % 7)).mkString
    Seq((1L, textA, "en", "s0"), (2L, textB, "en", "s0"), (3L, textC, "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    // independent recompute: integer cross-multiplication threshold over
    // the 64 per-pixel RGB sums of the raw text bytes
    def ahash(text: String): Long = {
      val b = text.getBytes("UTF-8").take(192).map(_ & 0xff)
      val sums = (0 until 64).map(c => b(3 * c) + b(3 * c + 1) + b(3 * c + 2))
      val total = sums.sum // counts are all 1 on the 8x8 grid
      (0 until 64).foldLeft(0L)((acc, c) =>
        if (64L * sums(c) > total.toLong) acc | (1L << c) else acc)
    }
    val hamAB = java.lang.Long.bitCount(ahash(textA) ^ ahash(textB))
    assert(hamAB >= 1 && hamAB <= 3, s"fixture must be a true near-dup: $hamAB")
    val got = Multimodal.realAhashDedup(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got.get((1L, 2L)).contains(hamAB),
      s"decoded near-dup pair must match the independent hamming $hamAB: $got")
    val hamAC = java.lang.Long.bitCount(ahash(textA) ^ ahash(textC))
    assert(got.contains((1L, 3L)) == (hamAC <= 3),
      s"far pair presence must follow independent hamming $hamAC")
  }
}
