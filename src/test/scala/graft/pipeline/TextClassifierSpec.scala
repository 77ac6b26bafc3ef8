package graft.pipeline

import graft.SparkSpec

/** Nearest-centroid training and the division-free verdict traced BY HAND
  * on a two-document corpus — the independent check next to the
  * mirrored-formula oracle rows (`text_classifier_train` / `_score`).
  *
  * Fixture: doc 2 (even → y=+1, gains 3 planted markers) = "aa bb",
  * doc 3 (y=−1) = "aa". Buckets (md5 & 63): aa→39, bb→16, marker→6.
  *
  * Model: S⁺ = {6:3, 16:1, 39:1}, S⁻ = {39:1}; ‖S⁺‖²=11, ‖S⁻‖²=1,
  * n⁺=n⁻=1. Dots: doc2 (11, 1), doc3 (1, 1). Verdicts:
  * doc2: 11−2·11 = −11 < 1−2·1 = −1 → positive; doc3: 11−2·1 = 9 ≮ −1
  * → negative. Both correct.
  */
class TextClassifierSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val docs = Seq((2L, "aa bb"), (3L, "aa")).toDF("doc_id", "text")

  test("hand-traced centroid sums: planted markers and both class sides exact") {
    val m = TextClassifier.trainOf(spark, TextClassifier.featuresOf(docs))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(6L) == ((3L, 0L)) && m(16L) == ((1L, 0L)) && m(39L) == ((1L, 1L)), s"got $m")
    assert(m.size == TextClassifier.Buckets)
    assert(m.values.map(v => v._1 + v._2).sum == 6L, s"5 positive + 1 negative counts: $m")
  }

  test("hand-traced verdicts: exact dots, cross-multiplied decision, both correct") {
    val feats = TextClassifier.featuresOf(docs)
    val m = TextClassifier.trainOf(spark, feats)
    val s = TextClassifier.scoreOf(feats, m, TextClassifier.countsOf(feats))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(s(2L) == ((1L, 11L, 1L, true, true)), s"got $s")
    assert(s(3L) == ((-1L, 1L, 1L, false, true)), s"got $s")
  }

  test("a tie in squared distance predicts negative (strict <)") {
    // symmetric corpus: doc 2 (+) = "aa", doc 3 (−) = "aa", markers
    // disabled by using an odd/even pair with identical natural text.
    // S⁺ = {6:3, 39:1}, S⁻ = {39:1}. doc3: lhs = 10−2·1 = 8, rhs = −1 →
    // negative; doc2 carries the markers so no tie arises there — build
    // an exact tie instead from two empty-ish docs is impossible with
    // planted markers, so assert the strict-< rule on the formula level:
    val feats = TextClassifier.featuresOf(Seq((2L, "aa"), (3L, "aa")).toDF("doc_id", "text"))
    val s = TextClassifier.scoreOf(feats, TextClassifier.trainOf(spark, feats), TextClassifier.countsOf(feats))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(4), r.getBoolean(5))).toMap
    assert(s(2L) == ((true, true)) && s(3L) == ((false, true)), s"got $s")
  }

  // ---- multi-class (learned lang-id) ----

  test("multi-class: identical text, marker-separated — each doc predicted its own class") {
    val docs = Seq(
      (10L, "shared body words", "en"),
      (11L, "shared body words", "fr"),
      (12L, "shared body words", "zh")).toDF("doc_id", "text", "lang")
    val feats = TextClassifier.ngramFeaturesOf(docs)
    val m = TextClassifier.multiTrainOf(spark, feats)
    // model shape: |Langs| x NgramBuckets densified, class sizes exact
    assert(m.count() == TextClassifier.Langs.size.toLong * TextClassifier.NgramBuckets)
    val n = m.select("lang", "n").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n == Map("en" -> 1L, "fr" -> 1L, "zh" -> 1L, "de" -> 0L, "es" -> 0L), s"got $n")
    val s = TextClassifier.multiScoreOf(feats, m)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getBoolean(3))).toSet
    assert(s == Set((10L, "en", true), (11L, "fr", true), (12L, "zh", true)), s"got $s")
  }

  test("multi-class: an EMPTY class never wins (n=0 eligibility guard)") {
    // only 'fr' is populated; without the n_c > 0 guard the first class
    // in order ('de', empty) would win every comparison 0 <= 0
    val docs = Seq((20L, "lone document", "fr")).toDF("doc_id", "text", "lang")
    val feats = TextClassifier.ngramFeaturesOf(docs)
    val s = TextClassifier.multiScoreOf(feats, TextClassifier.multiTrainOf(spark, feats))
      .collect().map(r => (r.getString(2), r.getBoolean(3))).toSeq
    assert(s == Seq(("fr", true)), s"got $s")
  }

  test("multi-class: sub-3-char text grams to marker-only features, still classified") {
    val docs = Seq((30L, "ab", "es")).toDF("doc_id", "text", "lang")
    val s = TextClassifier.multiScoreOf(
      TextClassifier.ngramFeaturesOf(docs),
      TextClassifier.multiTrainOf(spark, TextClassifier.ngramFeaturesOf(docs)))
      .collect().map(r => r.getString(2)).toSeq
    assert(s == Seq("es"))
  }
}
