package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE trainer semantics against an independent plain-Scala implementation
  * (mutable maps + explicit greedy rewrite loop — shares no code with the
  * relational formulation), on a planted corpus AND on the real sf0.001
  * documents table. The DuckDB oracle proves Spark↔oracle parity; this
  * proves both compute actual byte-pair encoding.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private type Vocab = Map[Vector[String], Long]

  private def toVocab(wordCounts: Map[String, Long]): Vocab =
    wordCounts.groupMapReduce(
      { case (w, _) => w.map(_.toString).toVector :+ BpeTokenizer.Eow })(
      { case (_, c) => c })(_ + _)

  /** Textbook BPE: per-round weighted pair argmax (count desc, pair
    * lexicographic) + leftmost-nonoverlapping greedy rewrite. Returns the
    * merge list and the vocab chain (round 0 .. N).
    */
  private def independentBpe(wordCounts: Map[String, Long], rounds: Int)
      : (Seq[(Int, String, String, String, Long)], Seq[Vocab]) = {
    var words = toVocab(wordCounts)
    val chain = Seq.newBuilder[Vocab]
    chain += words
    val merges = (1 to rounds).map { r =>
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairs((syms(i), syms(i + 1))) =
          pairs.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val ((l, rr), cnt) = pairs.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      val m = l + rr
      words = words.groupMapReduce({ case (syms, _) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        for (s <- syms) {
          if (out.nonEmpty && out.last == l && s == rr) {
            out.remove(out.length - 1); out += m
          } else out += s
        }
        out.toVector
      })({ case (_, c) => c })(_ + _)
      chain += words
      (r, l, rr, m, cnt)
    }
    (merges, chain.result())
  }

  private def trained(dir: String): Seq[(Int, String, String, String, Long)] =
    BpeTokenizer.bpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq

  /** 'aaaa' forces the overlap question (3 (a,a) positions, 2 mergeable);
    * the the/theme family forces a contested second round.
    */
  private lazy val fixture: (String, Map[String, Long]) = {
    val d = Files.createTempDirectory("graft_bpe_fixture").toString
    val docs = Seq(
      (1L, "the theme thesis then aaaa", "en", "s0"),
      (2L, "the other anthem the aaaa aab", "en", "s0"),
      (3L, "banana bandana the aaaa", "en", "s1"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val wc = docs.flatMap(_._2.toLowerCase.split("[^a-z]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    (d, wc)
  }

  test("bpe merges match the independent implementation on a planted corpus") {
    val (d, wc) = fixture
    assert(trained(d) == independentBpe(wc, BpeTokenizer.BpeRounds)._1)
  }

  test("bpe apply compression curve matches the independent vocab chain") {
    val (d, wc) = fixture
    val chain = independentBpe(wc, BpeTokenizer.BpeRounds)._2
    val s0 = chain.head.map { case (syms, c) => c * syms.length }.sum
    val expect = chain.zipWithIndex.map { case (v, r) =>
      val nSym = v.map { case (syms, c) => c * syms.length }.sum
      (r, v.size.toLong, nSym, v.keys.flatten.toSet.size.toLong,
        s0.toDouble / nSym)
    }
    val got = BpeTokenizer.bpeApply(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expect, s"curve drifted:\n got $got\n exp $expect")
    // each merge strictly shrinks the stream; the type count grows by AT
    // MOST one (the new merged symbol) — it can grow by less when a merge
    // consumes a constituent's last free occurrence
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 < a._3 && b._4 <= a._4 + 1)
    }
  }

  test("bpe merges match the independent implementation on the real corpus") {
    val wc = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(explode(expr(Dedup.rawTokens)).as("w")).groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(trained(Sf0001) == independentBpe(wc, BpeTokenizer.BpeRounds)._1)
  }
}
