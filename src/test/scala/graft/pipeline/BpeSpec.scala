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

  /** Textbook BPE on a word-count map: symbols = chars + EOW, per-round
    * weighted pair argmax (count desc, pair lexicographic), leftmost-
    * nonoverlapping greedy rewrite.
    */
  private def independentBpe(wordCounts: Map[String, Long],
                             rounds: Int): Seq[(Int, String, String, String, Long)] = {
    var words: Map[Vector[String], Long] = wordCounts.groupMapReduce(
      { case (w, _) => w.map(_.toString).toVector :+ BpeTokenizer.Eow })(
      { case (_, c) => c })(_ + _)
    (1 to rounds).map { r =>
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
      (r, l, rr, m, cnt)
    }
  }

  private def trained(dir: String): Seq[(Int, String, String, String, Long)] =
    BpeTokenizer.bpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq

  test("bpe merges match the independent implementation on a planted corpus") {
    val d = Files.createTempDirectory("graft_bpe_fixture").toString
    // 'aaaa' forces the overlap question (3 (a,a) positions, 2 mergeable);
    // the the/theme family forces a contested second round
    val docs = Seq(
      (1L, "the theme thesis then aaaa", "en", "s0"),
      (2L, "the other anthem the aaaa aab", "en", "s0"),
      (3L, "banana bandana the aaaa", "en", "s1"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val wc = docs.flatMap(_._2.toLowerCase.split("[^a-z]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    assert(trained(d) == independentBpe(wc, BpeTokenizer.BpeRounds))
  }

  test("bpe merges match the independent implementation on the real corpus") {
    val wc = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(explode(expr(Dedup.rawTokens)).as("w")).groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(trained(Sf0001) == independentBpe(wc, BpeTokenizer.BpeRounds))
  }
}
