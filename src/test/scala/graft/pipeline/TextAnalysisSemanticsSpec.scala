package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic tests on crafted documents — the oracle proves Spark↔DuckDB
  * parity but is structurally blind to "both engines compute the wrong
  * thing" (that is how the unreachable-'und' bug survived one round of
  * parity checks).
  */
class TextAnalysisSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_text_fixture").toString
    Seq(
      (1L, "der hund und die katze ist das haus der garten", "de", "src0"),
      (2L, "the cat and the dog is a friend of the house", "en", "src0"),
      (3L, "xyzzy plugh quux corge grault waldo fred thud", "zz", "src0"), // zero marker hits
      (4L, "le chat et la maison les arbres des fleurs", "fr", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("language ID picks the marker-dominant language; zero hits → 'und'") {
    val pred = TextAnalysis.langId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(pred === Map(1L -> "de", 2L -> "en", 3L -> "und", 4L -> "fr"))
  }

  test("token counts are exact on a known string") {
    val r = TextAnalysis.tokenCounts(spark, dir)
      .filter(col("doc_id") === 2).collect().head
    // "the cat and the dog is a friend of the house": 11 ws tokens, all alpha
    assert(r.getLong(2) === 11L) // ws_tokens
    assert(r.getLong(3) === 11L) // bpe_tokens (no digits/punct)
  }

  test("quality score rewards alpha-heavy low-stopword text and stays in [0,1]") {
    val rows = TextAnalysis.qualityScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(rows.values.forall(s => s >= 0.0 && s <= 1.0))
    // doc 3 has zero stopwords; doc 2 is stopword-heavy ("the" x3, "a", "is", "of")
    assert(rows(3L) > rows(2L))
  }

  test("fingerprint is identical for identical text and differs under edits") {
    val fps = TextAnalysis.fingerprint(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fps.size === 4)
    assert(fps.values.toSet.size === 4) // all distinct texts → distinct fingerprints
  }

  test("tf-idf ranks a rare term above a corpus-wide term despite lower tf") {
    val d = Files.createTempDirectory("graft_tfidf_fixture").toString
    // "common" dominates every doc (tf=3) but df=N ⇒ idf=ln(1)=0; each doc's
    // singleton word (df=1, tf=1) must out-rank it
    Seq(
      (1L, "common common common alpha"),
      (2L, "common common common beta"),
      (3L, "common common common gamma"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextAnalysis.tfidfKeywords(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(4))) // (doc, term, rank)
    val rank1 = rows.filter(_._3 == 1).map(t => t._1 -> t._2).toMap
    assert(rank1 === Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
    assert(rows.filter(_._2 == "common").forall(_._3 == 2),
      "zero-idf term must sit below every positive-score term")
  }

  test("count-min never undercounts, and a planted heavy hitter surfaces exactly") {
    val d = Files.createTempDirectory("graft_cms_fixture").toString
    // all-alpha filler: the tokenizer is [a-z]+, so digit-suffixed words
    // would collapse into one token and out-count the planted hitter
    val filler = (0 until 40)
      .map(i => s"f${('a' + i / 26).toChar}${('a' + i % 26).toChar}").mkString(" ")
    Seq(
      (1L, ("spam " * 50) + filler),
      (2L, filler),
      (3L, filler))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextAnalysis.cmsHeavyHitters(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (word, trueCount, est) = rows.head // ordered by true count desc
    assert(word === "spam" && trueCount === 50L)
    assert(rows.forall { case (_, t, e) => e >= t },
      "CMS collisions only ever ADD counts")
  }

  test("inverted index: df counts docs once each, postings are sorted doc ids") {
    val d = Files.createTempDirectory("graft_invidx_fixture").toString
    Seq(
      (1L, "alpha beta alpha"), // repeated term must count once for df
      (2L, "beta gamma"),
      (3L, "alpha beta"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextAnalysis.invertedIndex(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows == Seq(
      ("beta", 3L, "1,2,3"),
      ("alpha", 2L, "1,3"),
      ("gamma", 1L, "2")))
  }

  test("bigram LM: counts, prefix totals, and conditional probabilities are exact") {
    val d = Files.createTempDirectory("graft_bigram_fixture").toString
    // doc 1 bigrams: (a,b), (b,a), (a,b); doc 2: (b,c); doc 3 has none
    Seq((1L, "a b a b"), (2L, "b c"), (3L, "solo"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextAnalysis.bigramLm(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(rows == Seq(
      ("a", "b", 2L, 2L, 1.0),
      ("b", "a", 1L, 2L, 0.5),
      ("b", "c", 1L, 2L, 0.5)))
  }

  test("BM25: scores match an independent scalar recomputation, rare term outranks") {
    val d = Files.createTempDirectory("graft_bm25_fixture").toString
    // query terms: dup, vector, scan, key. doc 1: rare 'dup' once; doc 2:
    // common 'key' three times; doc 3: two distinct common terms; doc 4: no
    // hits (must not appear); docs 5-8 pad df for 'key'/'scan'.
    val texts = Map(
      1L -> "dup alpha beta gamma", 2L -> "key key key alpha",
      3L -> "scan key beta", 4L -> "alpha beta gamma delta",
      5L -> "key scan alpha", 6L -> "key scan beta",
      7L -> "key scan gamma", 8L -> "key scan delta")
    texts.toSeq.map { case (id, t) => (id, t) }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    // independent recomputation: plain Scala over the raw map
    val q = TextAnalysis.Bm25QueryTerms.toSet
    val toks = texts.view.mapValues(_.split(" ").toSeq).toMap
    val n = texts.size.toLong
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val tfm = toks.view.mapValues(_.filter(q).groupBy(identity).view.mapValues(_.size.toLong).toMap).toMap
    val dfm = q.map(t => t -> tfm.values.count(_.contains(t)).toLong).toMap
    def contrib(tf: Long, dl: Long, df: Long): Double =
      math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
        ((tf.toDouble * 2.2) / (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))))
    val expected = tfm.collect { case (id, tfs) if tfs.nonEmpty =>
      id -> tfs.map { case (t, tf) => contrib(tf, toks(id).size.toLong, dfm(t)) }
        .toSeq.sorted.foldLeft(0.0)(_ + _)
    }

    val (tf, dfreq, stats) = TextAnalysis.bm25Inputs(
      TextAnalysis.bm25Projection(spark.read.parquet(s"$d/documents.parquet")))
    val got = TextAnalysis.bm25ScoredOf(tf, dfreq, stats).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got.keySet == expected.keySet, "exactly the query-hit docs score")
    expected.foreach { case (id, s) =>
      assert(got(id) == s, s"doc $id: got ${got(id)}, independent $s")
    }
    // retrieval semantics: the rare high-idf term beats tf-spam on a common one
    assert(got(1L) > got(2L), "one rare-term hit must outrank three common-term hits")
  }

  test("perplexity filter: ranks match an independent plain-Scala recomputation") {
    val docs = Seq(
      (1L, "a b a b", "en", "s", 7L),
      (2L, "a b c", "en", "s", 5L),
      (3L, "z z z z z", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // independent model: V=4; corpus bigrams (a,b):3 (b,a):1 (b,c):1 (z,z):4;
    // prefixes a:3 b:2 z:4; p = (c+.5)/(pref+.5*4)
    def p(c: Long, pref: Long) = (c + 0.5) / (pref + 0.5 * 4)
    val ce = Map(
      1L -> -(2 * math.log(p(3, 3)) + 1 * math.log(p(1, 2))) / 3,
      2L -> -(1 * math.log(p(3, 3)) + 1 * math.log(p(1, 2))) / 2,
      3L -> -(4 * math.log(p(4, 4))) / 4)
    val wantRank = ce.toSeq.sortBy { case (id, c) => (-c, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val got = TextAnalysis.perplexityFilterOf(docs).collect()
      .map(r => r.getLong(1) -> ((r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((wantRank(1L), 3L, 2L, wantRank(1L) == 1L)))
    assert(got(2L) == ((wantRank(2L), 2L, 2L, wantRank(2L) == 1L)))
    assert(got(3L) == ((wantRank(3L), 4L, 1L, wantRank(3L) == 1L)))
    // semantics: the self-repetitive doc is the most predictable (last rank),
    // the doc with two rare bigrams the least
    assert(wantRank(3L) == 3L && wantRank(2L) == 1L)
  }

  test("vocab coverage matches an independent plain-Scala recomputation") {
    val texts = Seq(
      "der hund und die katze ist das haus der garten",
      "the cat and the dog is a friend of the house",
      "xyzzy plugh quux corge grault waldo fred thud",
      "le chat et la maison les arbres des fleurs")
    val counts = texts.flatMap(_.toLowerCase.split("[^a-z]+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val ranked = counts.sortBy { case (t, c) => (-c, t) }
    val total = counts.map(_._2).sum
    val cum = ranked.scanLeft(0L)(_ + _._2).tail
    val want = TextAnalysis.VocabCheckpoints.filter(_ <= ranked.size).map { k =>
      val i = k.toInt - 1
      (k, ranked(i)._1, cum(i), total, cum(i).toDouble / total)
    }
    val got = TextAnalysis.vocabCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got === want)
    // the curve is monotone and ends short of 1.0 while types remain uncovered
    assert(got.map(_._5) === got.map(_._5).sorted)
    assert(got.last._5 < 1.0 || got.last._1 >= ranked.size)
  }

  test("hybrid rrf equals an independent fusion of its two arms") {
    import org.apache.spark.sql.functions._
    val lex = TextAnalysis.bm25TopK(spark, Sf0001).collect()
      .map(r => r.getLong(1) -> r.getInt(0)).toMap
    // independent vector arm: strict left-fold cosine in plain Scala
    val vecs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val q = vecs(TextAnalysis.HybridQueryVec)
    val qn = math.sqrt(dot(q, q))
    val vr = vecs.toSeq.filter(_._1 != TextAnalysis.HybridQueryVec)
      .map { case (id, v) => (id, dot(q, v) / (qn * math.sqrt(dot(v, v)))) }
      .sortBy { case (id, c) => (-c, id) }.take(25)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val expect = (lex.keySet ++ vr.keySet).toSeq.map { id =>
      val r = lex.get(id).map(r => 1.0 / (TextAnalysis.RrfK + r)).getOrElse(0.0) +
        vr.get(id).map(r => 1.0 / (TextAnalysis.RrfK + r)).getOrElse(0.0)
      (id, r)
    }.sortBy { case (id, r) => (-r, id) }.take(TextAnalysis.RrfTopK)

    val got = TextAnalysis.hybridRrf(spark, Sf0001).collect()
      .map(r => (r.getLong(1), r.getDouble(4))).toSeq
    assert(got == expect, s"fusion drifted:\n got $got\n exp $expect")
    // the fusion premium: any doc present in BOTH arms outranks the tail of
    // single-arm docs with comparable per-arm ranks
    val both = got.map(_._1).filter(id => lex.contains(id) && vr.contains(id))
    if (both.nonEmpty) assert(got.head._1 == both.head)
  }
}
