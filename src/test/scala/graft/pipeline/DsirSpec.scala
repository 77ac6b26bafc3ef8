package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance-weight semantics against an independent plain-Scala
  * recomputation (own md5/bucket/log math, shares no code with the
  * relational formulation): exact rank order, the selection cut, and the
  * defining property — selection is CONTENT-based, not label-based (a
  * non-target-language doc written in target-like vocabulary outranks a
  * non-target-language doc with alien vocabulary).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  /** Independent hash60: first 15 hex chars of md5, base 16. */
  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.substring(0, 15), 16)
  }

  test("dsir ranks match an independent recomputation; selection is content-based") {
    val d = Files.createTempDirectory("graft_dsir_fixture").toString
    // target (en) vocabulary: alpha/beta/gamma family; alien: zulu/xray
    val docs = Seq(
      (1L, "alpha beta gamma alpha delta", "en", "s0"),
      (2L, "beta gamma delta epsilon beta", "en", "s0"),
      (3L, "alpha gamma epsilon delta", "en", "s1"),
      (4L, "alpha beta gamma delta epsilon", "fr", "s1"), // target-like content
      (5L, "zulu xray yankee whiskey zulu", "fr", "s1"),  // alien content
      (6L, "zulu beta xray alpha yankee", "de", "s2"))    // mixed
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    // independent weights: hashed-unigram add-1 model, target = en
    val nb = TrainPrep.DsirBuckets
    def buckets(text: String): Seq[Long] =
      "[a-z]+".r.findAllIn(text.toLowerCase).map(w => hash60(w) % nb).toSeq
    val byDoc = docs.map { case (id, text, lang, _) => (id, buckets(text), lang) }
    val tcnt = byDoc.filter(_._3 == TrainPrep.DsirTargetLang)
      .flatMap(_._2).groupBy(identity).map { case (b, bs) => b -> bs.size.toLong }
    val rcnt = byDoc.flatMap(_._2).groupBy(identity)
      .map { case (b, bs) => b -> bs.size.toLong }
    val tt = tcnt.values.sum
    val rt = rcnt.values.sum
    val lw = byDoc.map { case (id, bs, _) =>
      id -> bs.map { b =>
        math.log((tcnt.getOrElse(b, 0L) + 1.0) / (tt + nb.toDouble)) -
          math.log((rcnt(b) + 1.0) / (rt + nb.toDouble))
      }.sum
    }.toMap
    val expectOrder = docs.map(_._1).sortBy(id => (-lw(id), id))
    val nSel = (docs.size + TrainPrep.DsirSelDenom - 1) / TrainPrep.DsirSelDenom

    val got = TrainPrep.dsirWeights(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(got.map(_._2) == expectOrder, s"rank order drifted: $got vs $expectOrder")
    assert(got.map(_._1) == (1L to docs.size.toLong), "ranks must be dense 1..N")
    got.foreach { case (rank, _, _, _, sel) => assert(sel == (rank <= nSel)) }
    // the content property: target-vocab fr doc beats alien-vocab fr doc
    assert(lw(4L) > lw(5L), "fixture drift: doc 4 should be target-like")
    assert(got.indexWhere(_._2 == 4L) < got.indexWhere(_._2 == 5L))
    // exact token counts carried through
    val toks = got.map(t => t._2 -> t._3).toMap
    assert(toks(1L) == 5L && toks(3L) == 4L)
  }
}
