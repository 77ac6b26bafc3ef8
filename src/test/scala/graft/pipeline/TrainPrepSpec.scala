package graft.pipeline

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic tests for the training-prep operators: the split aggregate is
  * checked against an independent Java md5 implementation (not Spark's),
  * and packing against hand-computed bins on a fixture with known token
  * counts — including the exact-boundary case.
  */
class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int, lang: String) =
    (id, Seq.fill(nTokens)("w").mkString(" "), lang, "src0")

  /** 1000 docs, alternating en/de, 7 tokens each. */
  private lazy val splitDir: String = {
    val d = Files.createTempDirectory("graft_split_fixture").toString
    (0L until 1000L).map(i => doc(i, 7, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** The same hash60(doc_id) % 100 assignment, via java.security directly. */
  private def splitOf(id: Long): String = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16) % 100
    if (h < TrainPrep.TrainPct) "train" else if (h < TrainPrep.ValPct) "val" else "test"
  }

  test("stable split matches an independent md5 implementation exactly") {
    val expected = (0L until 1000L)
      .map(i => (splitOf(i), if (i % 2 == 0) "en" else "de"))
      .groupBy(identity).view.mapValues(_.size).toMap
    val got = TrainPrep.stableSplit(spark, splitDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (nDocs, nTokens)) =>
      assert(nDocs == expected(k).toLong, s"docs for $k")
      assert(nTokens == 7L * expected(k), s"tokens for $k")
    }
    // the 90/5/5 boundaries actually hold in aggregate
    val bySplit = got.groupBy(_._1._1).view.mapValues(_.values.map(_._1).sum)
    assert(bySplit("train") > 850 && bySplit("train") < 950)
    assert(bySplit("val") > 0 && bySplit("test") > 0)
  }

  /** Shard 0 (ids 0,8,16,24): tokens 300,300,300,100 → bins 0,0,1,1.
    * Shard 1 (ids 1,9): tokens 512,10 — the second doc STARTS exactly at
    * the 512 budget, so it opens bin 1. Shard 2 (ids 2,10): 200,200 both
    * fit bin 0.
    */
  private lazy val packDir: String = {
    val d = Files.createTempDirectory("graft_pack_fixture").toString
    Seq(doc(0L, 300, "en"), doc(8L, 300, "en"), doc(16L, 300, "en"),
      doc(24L, 100, "en"), doc(1L, 512, "en"), doc(9L, 10, "en"),
      doc(2L, 200, "en"), doc(10L, 200, "en"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("packing fills bins greedily per shard, boundary doc opens a new bin") {
    val rows = TrainPrep.packSequences(spark, packDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(rows == Map(
      (0L, 0L) -> ((2L, 600L)), // 300+300 overflows the 512 budget: contiguity packing
      (0L, 1L) -> ((2L, 400L)), // 300+100
      (1L, 0L) -> ((1L, 512L)), // exactly full
      (1L, 1L) -> ((1L, 10L)),  // starts at 512 → next bin
      (2L, 0L) -> ((2L, 400L)),
    ))
    val fill = TrainPrep.packSequences(spark, packDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    assert(fill((1L, 0L)) == 1.0)
    assert(fill((0L, 0L)) == 600.0 / 512)
  }

  test("split and pack are deterministic across runs") {
    def run() = (TrainPrep.stableSplit(spark, splitDir).collect().toSeq,
      TrainPrep.packSequences(spark, packDir).collect().toSeq)
    assert(run() == run())
  }

  test("negative sampling: full fan-out, never self, single-doc corpus draws nothing") {
    val rows = TrainPrep.negativePairs(spark, splitDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 1000 * TrainPrep.NegativesPerAnchor)
    assert(rows.forall { case (a, _, n) => a != n }, "anchor drew itself")
    // reproducible by construction: same corpus, same pairs
    assert(rows.toSeq === TrainPrep.negativePairs(spark, splitDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)

    val d = Files.createTempDirectory("graft_neg_single").toString
    Seq(doc(7L, 3, "en")).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    assert(TrainPrep.negativePairs(spark, d).count() === 0L,
      "N-1 = 0 must guard, not divide by zero")
  }

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Texts sized around the 200/150 window/stride: empty, sub-window,
    * exactly one window, and a 380-char doc that needs three chunks.
    */
  private lazy val chunkDir: String = {
    val d = Files.createTempDirectory("graft_chunk_fixture").toString
    Seq((0L, ""), (1L, "a" * 100), (2L, (('a' to 'z').mkString * 10).take(200)),
      (3L, Seq.tabulate(380)(i => ('a' + i % 26).toChar).mkString))
      .map { case (id, t) => (id, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("chunking: offsets, short tails, empty docs, md5 vs java digest") {
    val texts = Map(
      0L -> "", 1L -> "a" * 100,
      2L -> (('a' to 'z').mkString * 10).take(200),
      3L -> Seq.tabulate(380)(i => ('a' + i % 26).toChar).mkString)
    val got = TrainPrep.chunkDocs(spark, chunkDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byDoc = got.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // chunk counts: max(1, number of strides indexing into the text)
    assert(byDoc(0L).length == 1 && byDoc(1L).length == 1)
    assert(byDoc(2L).length == 2, "len 200 > stride 150 → second (tail) chunk")
    assert(byDoc(3L).length == 3)
    got.foreach { case (id, cid, start, len, digest) =>
      val t = texts(id)
      assert(start == cid * TrainPrep.ChunkStride)
      val expected = t.slice(start.toInt, start.toInt + TrainPrep.ChunkWidth)
      assert(len == expected.length, s"doc $id chunk $cid length")
      assert(digest == md5Hex(expected), s"doc $id chunk $cid md5")
    }
    // coverage: consecutive chunks tile the text with stride-sized advances
    // and the last chunk reaches the end of the document
    byDoc.foreach { case (id, chunks) =>
      assert(chunks.map(_._2).toSeq == (0L until chunks.length))
      val last = chunks.last
      assert(last._3 + last._4 == texts(id).length, s"doc $id tail reaches end")
    }
  }

  test("chunking: NULL text behaves like '' — the doc still appears in the manifest") {
    val docs = Seq((10L, Some("hello")), (11L, None), (12L, Some("")))
      .toDF("doc_id", "text")
    val got = TrainPrep.chunkDocsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getString(4)))
    assert(got.map(_._1).toSet == Set(10L, 11L, 12L), "no doc_id may vanish")
    val nullRow = got.find(_._1 == 11L).get
    val emptyRow = got.find(_._1 == 12L).get
    assert(nullRow._3 == 0L && nullRow._4 == emptyRow._4,
      "null text chunks identically to the empty string")
  }

  test("priority sample: matches an independent Duffield-Lund-Thorup selection") {
    // independent re-derivation: u from java md5, priority = quality/u,
    // top-m with doc_id tiebreak, tau = (m+1)-th priority
    val quality = TextAnalysis.qualityScoreOf(
        graft.Tables.documents(spark, splitDir))
      .select("doc_id", "quality_score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    def uOf(id: Long): Double = {
      val hex = md5Hex(s"prio:$id").substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      val draw = ((h % TrainPrep.PriorityDrawSpace) + TrainPrep.PriorityDrawSpace) %
        TrainPrep.PriorityDrawSpace
      (draw + 1L).toDouble / TrainPrep.PriorityDrawSpace.toDouble
    }
    val ranked = quality.toSeq
      .map { case (id, q) => (id, q, q / uOf(id)) }
      .sortBy { case (id, _, p) => (-p, id) }
    val m = TrainPrep.PrioritySampleSize
    val tau = if (ranked.length > m) ranked(m)._3 else 0.0
    val expected = ranked.take(m)
      .map { case (id, q, p) => (id, q, p, math.max(q, tau)) }
    val got = TrainPrep.prioritySample(spark, splitDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // the HT property that makes the sample usable downstream:
    // every est_weight is >= its own quality and >= tau
    got.foreach { case (_, q, _, w) => assert(w >= q && w >= tau) }
  }

  test("stratified sample: exact quota per stratum, members are the md5-smallest") {
    val got = TrainPrep.stratifiedSample(spark, splitDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val byLang = got.groupBy(_._1)
    assert(byLang.keySet == Set("en", "de"))
    byLang.values.foreach { rows =>
      assert(rows.length == TrainPrep.StratumQuota)
      assert(rows.map(_._3).sorted == (1L to TrainPrep.StratumQuota))
    }
    // independent md5: the sample is exactly the draw-smallest ids per stratum
    def expect(parity: Long) = (0L until 1000L).filter(_ % 2 == parity)
      .sortBy(i => (md5Hex(s"strat:$i"), i)).take(TrainPrep.StratumQuota).toSet
    assert(byLang("en").map(_._2).toSet == expect(0))
    assert(byLang("de").map(_._2).toSet == expect(1))
  }

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  test("rendezvous shards: independent HRW recompute; resize moves ~1/(n+1), mod moves ~n/(n+1)") {
    val n = 1000L
    def hrwShard(id: Long, shards: Int): Int =
      (0 until shards).maxBy(s => hash60(s"rv:$id:$s"))
    val expect = (0L until n).map(id => (hrwShard(id, TrainPrep.RvShards),
      hrwShard(id, TrainPrep.RvShardsNext)))
      .groupBy(_._1).map { case (s, rows) =>
        (s, rows.size.toLong, rows.count(r => r._1 != r._2).toLong)
      }.toSet
    val got = TrainPrep.rendezvousShards(spark, splitDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    // the minimal-disruption property, quantified: HRW moves ~1/9 of docs
    // where mod-resharding moves ~8/9
    val moved = got.toSeq.map(_._3).sum
    assert(moved > 0 && moved < 2 * n / (TrainPrep.RvShardsNext), s"HRW moved $moved")
    val modMoved = (0L until n).count(id => id % TrainPrep.RvShards != id % TrainPrep.RvShardsNext)
    assert(modMoved > n / 2, s"fixture drift: mod moved only $modMoved")
  }

  test("allocated sample: largest-remainder allocation is exact and the budget is hit exactly") {
    // splitDir: 500 en / 500 de -> exact 50/50, no leftovers; build a
    // skewed fixture where remainders decide
    val d = Files.createTempDirectory("graft_alloc_fixture").toString
    val sizes = Seq("en" -> 333, "de" -> 211, "fr" -> 89, "zh" -> 17)
    sizes.flatMap { case (lang, k) =>
      (0 until k).map(i => doc((lang.hashCode.toLong.abs % 97) * 10000 + i, 3, lang))
    }.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val total = sizes.map(_._2).sum.toLong
    val b = TrainPrep.AllocBudget.toLong
    val base = sizes.map { case (l, k) => l -> (b * k) / total }.toMap
    val rem = sizes.map { case (l, k) => l -> (b * k) % total }.toMap
    val leftover = (b - base.values.sum).toInt
    val winners = sizes.map(_._1).sortBy(l => (-rem(l), l)).take(leftover).toSet
    val expectAlloc = sizes.map { case (l, _) =>
      l -> (base(l) + (if (winners(l)) 1L else 0L)) }.toMap

    val got = TrainPrep.allocatedSample(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.size.toLong == b, s"budget must be hit exactly, got ${got.size}")
    val byLang = got.groupBy(_._1).map { case (l, rows) => l -> rows.size.toLong }
    assert(byLang == expectAlloc, s"allocation drifted: $byLang vs $expectAlloc")
    // every stratum within 1 doc of its exact proportional share
    sizes.foreach { case (l, k) =>
      val share = b.toDouble * k / total
      assert(math.abs(byLang(l) - share) < 1.0, s"$l: ${byLang(l)} vs $share")
    }
    // ranks are dense 1..alloc per stratum
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).sorted == (1L to rows.size.toLong))
    }
  }
}
