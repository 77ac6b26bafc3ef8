package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic tests: the QC operators must actually CATCH planted spam /
  * contamination and compute the mixture math on knowable inputs.
  */
class CorpusQcSpec extends SparkSpec {
  import spark.implicits._

  private def write(d: String, rows: Seq[(Long, String, String, String)]): String = {
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def words(prefix: String, n: Int) = (0 until n)
    .map(i => s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}")

  private lazy val repDir: String = write(
    Files.createTempDirectory("graft_rep_fixture").toString,
    Seq(
      (1L, Seq.fill(50)("spam").mkString(" "), "en", "s"), // pure repetition
      (2L, words("w", 50).mkString(" "), "en", "s"),       // 50 distinct words
      (3L, "aa bb cc", "en", "s"),                         // under MinTokens
    ))

  test("repetition flags the spam doc, passes the diverse doc, skips short docs") {
    val rows = CorpusQc.repetition(spark, repDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(rows.keySet == Set(1L, 2L))
    val (top1, dup1, flag1) = rows(1L)
    assert(top1 == 1.0)               // all 49 bigrams are "spam spam"
    assert(dup1 == 1.0 - 1.0 / 46)    // 46 5-gram slots, 1 distinct
    assert(flag1)
    val (top2, dup2, flag2) = rows(2L)
    assert(top2 == 1.0 / 49 && dup2 == 0.0 && !flag2)
  }

  private lazy val contamDir: String = {
    val bench = words("b", 60).mkString(" ")
    val half = (words("b", 30) ++ words("z", 30)).mkString(" ")
    write(Files.createTempDirectory("graft_contam_fixture").toString,
      Seq(
        (0L, bench, "en", "s"),                     // 0 % 97 == 0 → benchmark
        (98L, bench, "en", "s"),                    // verbatim copy of it
        (99L, words("q", 60).mkString(" "), "en", "s"), // unrelated
        (100L, half, "en", "s"),                    // front half shared
      ))
  }

  test("contamination flags the verbatim copy, scores the partial, skips clean docs") {
    val rows = CorpusQc.contamination(spark, contamDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(!rows.contains(0L), "benchmark docs must not report against themselves")
    assert(!rows.contains(99L), "clean doc must not appear")
    val (copyRatio, copyFlag) = rows(98L)
    assert(copyRatio == 1.0 && copyFlag)
    val (halfRatio, halfFlag) = rows(100L)
    // 58 shingles, 28 fully inside the shared 30-word prefix
    assert(halfRatio == 28.0 / 58 && !halfFlag)
  }

  private lazy val mixDir: String = write(
    Files.createTempDirectory("graft_mix_fixture").toString,
    Seq(
      (1L, Seq.fill(200)("w").mkString(" "), "en", "s"),
      (2L, Seq.fill(200)("w").mkString(" "), "en", "s"),
      (3L, Seq.fill(100)("w").mkString(" "), "de", "s"),
    ))

  test("mixture weights follow sqrt scaling and oversample the small lang") {
    val rows = CorpusQc.mixWeights(spark, mixDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val denom = 10.0 + 20.0 // sorted ascending fold: sqrt(100) then sqrt(400)
    assert(rows("en") == ((2L, 400L, 20.0 / denom, 20.0 / denom * 500.0 / 400.0)))
    assert(rows("de") == ((1L, 100L, 10.0 / denom, 10.0 / denom * 500.0 / 100.0)))
    // sqrt mixing up-weights the low-resource lang above parity
    assert(rows("de")._4 > 1.0 && rows("en")._4 < 1.0)
  }

  test("mixture materialization draws deterministic per-doc copies at the computed rates") {
    def h(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mix:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 1000000
    }
    def copies(id: Long, f: Double): Long =
      math.floor(f).toLong +
        (if (h(id) < math.floor((f - math.floor(f)) * 1000000)) 1L else 0L)
    val fEn = 20.0 / 30.0 * 500.0 / 400.0 // < 1: downsampled
    val fDe = 10.0 / 30.0 * 500.0 / 100.0 // > 1: every doc once, ~2/3 twice
    val rows = CorpusQc.mixMaterialize(spark, mixDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows == Map(
      1L -> copies(1L, fEn), 2L -> copies(2L, fEn), 3L -> copies(3L, fDe)))
    assert(rows.values.forall(c => c >= 0 && c <= 2))
  }

  test("snapshot diff classifies add/remove/change/unchanged on planted edits") {
    import spark.implicits._
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val neu = Seq((1L, "alpha"), (2L, "beta EDITED"), (4L, "delta")).toDF("doc_id", "text")
    val got = CorpusQc.snapshotDiffOf(old, neu).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("source report: counts, language spread, low-quality share, bucketed mean") {
    // src_good: two clean all-alpha docs (no stopwords), langs en+de.
    // src_bad: one doc that is mostly digits → alpha_ratio ≈ 0 → q < 0.5.
    // src_empty: a zero-token doc, excluded entirely (no report row).
    val docs = Seq(
      (1L, words("x", 40).mkString(" "), "en", "src_good"),
      (2L, words("y", 40).mkString(" "), "de", "src_good"),
      (3L, ("1234567890 " * 30).trim, "en", "src_bad"),
      (4L, "   ", "en", "src_empty"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusQc.sourceReportOf(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set("src_good", "src_bad"), got.toString)
    val (nG, tokG, langG, lowG, mqG) = got("src_good")
    assert(nG == 2L && tokG == 80L && langG == 2L && lowG == 0L)
    // good docs: alpha_ratio = 120/159, no stopwords, length term 0.08
    // → q ≈ 0.757; the bucketed mean must land in the same region
    assert(mqG > 0.5 && mqG <= 1.0, s"good mean $mqG")
    val (nB, _, _, lowB, mqB) = got("src_bad")
    assert(nB == 1L && lowB == 1L, "digit doc must fall below the quality bar")
    assert(mqB < 0.5, s"bad mean $mqB")
  }

  test("snapshot drift: chi-square matches an independent recompute; drifted lang stands out") {
    import java.nio.file.Files
    val d = Files.createTempDirectory("graft_drift_fixture").toString
    // 'st': old and new share the length profile (no drift);
    // 'dr': old docs short, new docs long (hard drift)
    def mk(id: Long, lang: String, n: Int) = (id, "w " * (n / 2), lang, "s0", n.toLong)
    val rows =
      (0L until 40L).map(i => mk(i * 10 + 1, "st", 60 + (i % 4).toInt * 64)) ++   // old st
      (0L until 40L).map(i => mk(i * 10, "st", 60 + (i % 4).toInt * 64)) ++       // new st, same mix
      (0L until 40L).map(i => mk(1000 + i * 10 + 1, "dr", 40)) ++                 // old dr: bucket 0
      (0L until 40L).map(i => mk(1000 + i * 10, "dr", 500))                       // new dr: bucket 7
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    // independent recompute
    def chisqOf(lang: String): (Long, Long, Double) = {
      val docs = rows.filter(_._3 == lang).map { case (id, _, _, _, n) =>
        (if (id % 10 == 0) "new" else "old",
         math.min(n / CorpusQc.DriftBucketWidth, CorpusQc.DriftBuckets - 1L))
      }
      val buckets = docs.map(_._2).distinct.sorted
      val cells = for (sn <- Seq("old", "new"); b <- buckets) yield
        (sn, b, docs.count(x => x._1 == sn && x._2 == b).toLong)
      val tot = docs.size.toDouble
      val terms = cells.map { case (sn, b, n) =>
        val rt = docs.count(_._1 == sn).toDouble
        val ct = docs.count(_._2 == b).toDouble
        val e = rt * ct / tot
        if (e > 0) (n - e) * (n - e) / e else 0.0
      }
      (cells.size.toLong, buckets.size.toLong - 1, terms.sorted.sum)
    }

    val got = CorpusQc.snapshotDrift(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    Seq("st", "dr").foreach { lang =>
      val (nc, dof, chi) = chisqOf(lang)
      val (gnc, gdof, gold, gnew, gchi) = got(lang)
      assert((gnc, gdof) == ((nc, dof)), s"$lang cells/dof")
      assert(gold == 40L && gnew == 40L)
      assert(math.abs(gchi - chi) < 1e-9, s"$lang chi $gchi vs $chi")
    }
    // identical profiles -> 0; total separation -> the maximal N statistic
    assert(got("st")._5 == 0.0)
    assert(math.abs(got("dr")._5 - 80.0) < 1e-9)
  }

  test("entropyQuality: planted low/normal/high-entropy docs land on the right side of the band") {
    val d = Files.createTempDirectory("graft_entropy_fixture").toString
    // 94 distinct printable ASCII chars, repeated: H = log2(94) ~ 6.55 b/B
    val wide = (0 until 4).flatMap(_ => (33 to 126).map(_.toChar)).mkString
    write(d, Seq(
      (1L, "a" * 300, "en", "s"),                       // H = 0: flood
      (2L, ("ab" * 150), "en", "s"),                    // H = 1 bit/byte
      (3L, "The quick brown fox jumps over the lazy dog. " * 8, "en", "s"),
      (4L, wide, "en", "s")))                           // H ~ 6.55: binary-ish
    val got = CorpusQc.entropyQuality(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(got(1L) == ((300L, 1L, 0L, false)))          // flood: entropy 0, dropped
    val (n2, d2, e2, k2) = got(2L)
    assert(n2 == 300L && d2 == 2L && (e2 == 999L || e2 == 1000L) && !k2)
    val (_, _, e3, k3) = got(3L)                        // prose: inside the band
    assert(e3 > 3500L && e3 < 5000L && k3, s"prose entropy $e3")
    val (_, d4, e4, k4) = got(4L)                       // uniform wide alphabet
    assert(d4 == 94L && e4 > 6500L && e4 < 6560L && !k4, s"wide entropy $e4")
  }

  test("compressRatio: repetition compresses away, hash-noise does not") {
    val d = Files.createTempDirectory("graft_zratio_fixture").toString
    // 512 hex chars of md5 output: ~4 bits/char, structureless at zstd's
    // match lengths -> stays near ceil; repeated sentence -> tiny
    val noise = (0 until 16).map(i => s"nz$i".hashCode.toHexString).mkString.take(512)
    write(d, Seq(
      (1L, "All work and no play makes Jack a dull boy. " * 40, "en", "s"),
      (2L, noise + noise.reverse, "en", "s")))
    val got = CorpusQc.compressRatio(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
    val (r1, k1) = got(1L)
    assert(r1 < CorpusQc.CompressRatioMin && !k1, s"repetition ratio $r1")
    val (r2, k2) = got(2L)
    assert(r2 > CorpusQc.CompressRatioMin && k2, s"noise ratio $r2")
    assert(r1 < r2)
  }
}
