package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic tests: the dedup operators must actually FIND planted
  * duplicates. (The DuckDB oracle proves Spark↔oracle parity; these prove
  * the operators detect what they claim to detect.)
  */
class DedupSemanticsSpec extends SparkSpec {
  import spark.implicits._

  /** Fixture corpus written as documents.parquet in a temp sfDir:
    * 1,2 = exact duplicates; 3 = near-dup of 1 (one word changed);
    * 4 = unrelated; 10,11,12 = a planted CHAIN (10≈11 and 11≈12 at
    * Jaccard 48/52 ≈ 0.923 ≥ 0.9, but 10 vs 12 differ in 4 words →
    * 46/54 ≈ 0.852 < 0.9, so no direct pair survives verification).
    */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_dedup_fixture").toString
    // 50 DISTINCT alphabetic words (the tokenizer is [a-z]+ — digits would
    // collapse wordN to one token)
    def words(prefix: String) = (0 until 50)
      .map(i => s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    val base = words("w").mkString(" ")
    val near = base.replace("waz", "changed")
    val other = words("q").mkString(" ")
    val chainA = words("c").mkString(" ")
    val chainB = chainA.replace("caa", "alpha").replace("cab", "beta")
    val chainC = chainB.replace("cac", "gamma").replace("cad", "delta")
    Seq(
      (1L, base, "en", "src0"),
      (2L, base, "en", "src0"),
      (3L, near, "en", "src1"),
      (4L, other, "en", "src1"),
      (10L, chainA, "en", "src2"),
      (11L, chainB, "en", "src2"),
      (12L, chainC, "en", "src2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("exact dedup groups the identical pair and keeps min doc_id canonical") {
    val rows = Dedup.exactDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSeq
    // (doc_id, canonical_id, group_size, is_duplicate)
    assert(rows.contains((1L, 1L, 2L, false)))
    assert(rows.contains((2L, 1L, 2L, true)))
    assert(rows.contains((3L, 3L, 1L, false))) // near-dup is NOT exact-dup
  }

  test("MinHash-LSH finds the exact pair at jaccard 1.0 and the near-dup above 0.9") {
    val pairs = Dedup.minhashLsh(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.get((1L, 2L)).contains(1.0))
    // one word of 50 changed → |∩|=49, |∪|=51 → 49/51 ≈ 0.9608
    assert(pairs.get((1L, 3L)).exists(j => j > 0.9 && j < 1.0))
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("prefix-filtered exact pairs: FULL recall by theorem on the planted fixture") {
    val exact = Dedup.prefixJaccardDedup(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // every J >= 0.9 pair present with the exact value...
    assert(exact.get((1L, 2L)).contains(1.0))
    assert(exact.get((1L, 3L)).exists(j => math.abs(j - 49.0 / 51.0) < 1e-12))
    assert(exact.get((10L, 11L)).exists(j => math.abs(j - 48.0 / 52.0) < 1e-12))
    assert(exact.get((11L, 12L)).exists(j => math.abs(j - 48.0 / 52.0) < 1e-12))
    // ...and the below-threshold chain ends and unrelated doc are OUT
    assert(!exact.contains((10L, 12L)), "J = 46/54 < 0.9 must not pair")
    assert(!exact.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("prefix df-cap: over-cap postings route to the LSH candidate path, generous cap stays exact") {
    val uncapped = Dedup.prefixJaccardDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      // cap 1 kills every pairwise posting (a shared token has pdf >= 2),
      // so ALL surviving candidates came through the LSH union
      spark.conf.set("graft.dedup.prefix.maxDf", "1")
      val capped = Dedup.prefixJaccardDedup(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = Dedup.minhashLsh(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(capped == lsh, "cap-1 candidates must be exactly the LSH pair set")
      // a cap above every posting leaves the theorem-exact set untouched
      spark.conf.set("graft.dedup.prefix.maxDf", "1000000")
      val generous = Dedup.prefixJaccardDedup(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(generous == uncapped, "a generous cap must not change the exact answer")
    } finally spark.conf.unset("graft.dedup.prefix.maxDf")
  }

  test("LSH recall audit: LSH pairs are a subset of exact, recall in (0, 1]") {
    val r = Dedup.lshRecallDedup(spark, dir).collect().head
    val (nExact, nLsh, nCommon, nExtra, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(nExtra == 0L, "LSH verifies with exact Jaccard: it can never emit a non-pair")
    assert(nCommon == nLsh)
    assert(nExact >= nLsh && nExact > 0)
    assert(recall == nCommon.toDouble / nExact && recall > 0 && recall <= 1.0)
  }

  test("shingle-Jaccard and SimHash agree on the exact pair; unrelated doc stays out") {
    val shingle = Dedup.jaccardDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shingle.contains((1L, 2L)))
    assert(!shingle.exists { case (a, b) => a == 4L || b == 4L })
    val simhash = Dedup.simhashDedup(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(simhash.get((1L, 2L)).contains(0)) // identical → hamming 0
    assert(!simhash.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("components resolves a transitive chain to one canonical id (pure pair input)") {
    // (1,2),(2,3) chain + isolated pair (10,11): labels must propagate
    // transitively even though (1,3) is not an edge
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("ia", "ib")
    val got = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("components agrees with union-find on random graphs (incl. a long path)") {
    val rnd = new scala.util.Random(20260812L)
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // min-label canonicalization: root then min over each root's members
      val byRoot = nodes.groupBy(find)
      byRoot.flatMap { case (_, members) =>
        val m = members.min; members.map(_ -> m)
      }
    }
    // a long path (worst diameter for label propagation) + random graphs
    val cases = Seq(
      (0 until 40).map(i => (i.toLong, (i + 1).toLong)), // path of 41 nodes
      Seq.empty[(Long, Long)],
      Seq((7L, 7L))) ++ // self-loop only
      (1 to 3).map { _ =>
        val n = 60
        Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      }
    cases.foreach { edges =>
      val expected = unionFind(0, edges.filter(e => e._1 != e._2))
      val got =
        if (edges.isEmpty) Map.empty[Long, Long]
        else Dedup.components(edges.toDF("ia", "ib")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expectedWithSelfLoops = expected ++
        edges.filter(e => e._1 == e._2).map(e => e._1 -> e._1).toMap
          .filterNot { case (k, _) => expected.contains(k) }
      assert(got === expectedWithSelfLoops, s"edges=$edges")
    }
  }

  test("dedup_components folds the planted chain A≈B≈C into one canonical group") {
    // the chain links exist, but no direct 10–12 pair does (0.852 < 0.9)
    val minhash = Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(minhash.contains((10L, 11L)) && minhash.contains((11L, 12L)))
    assert(!minhash.contains((10L, 12L)))
    val rows = Dedup.componentsDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    // transitive closure: 12 resolves to 10 despite no direct pair
    assert(rows.contains((10L, 10L, 3L, false)))
    assert(rows.contains((11L, 10L, 3L, true)))
    assert(rows.contains((12L, 10L, 3L, true)))
    // the exact-dup pair resolves too; near-dup 3 joins via minhash (1≈3)
    assert(rows.contains((2L, 1L, 3L, true)))
    // untouched docs are their own singleton groups
    assert(rows.contains((4L, 4L, 1L, false)))
  }

  test("canonical selection keeps exactly the best-quality doc per cluster") {
    val rows = Dedup.canonicalDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    // (doc_id, cluster_id, quality_score, group_size, keep)
    val byCluster = rows.groupBy(_._2)
    // exactly one survivor per cluster, and it is the (quality DESC, doc_id)
    // argmax of the cluster's own rows
    byCluster.foreach { case (c, members) =>
      val keeps = members.filter(_._5)
      assert(keeps.length === 1, s"cluster $c keeps: $keeps")
      val expected = members.minBy(m => (-m._3, m._1))
      assert(keeps.head._1 === expected._1,
        s"cluster $c kept ${keeps.head._1}, argmax is ${expected._1}")
    }
    // clustering agrees with dedup_components (same labels, same sizes)
    val comp = Dedup.componentsDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (id, cluster, _, size, _) =>
      assert(comp(id) === ((cluster, size)), s"doc $id cluster/size drifted")
    }
    // the chain cluster {10,11,12} picks by quality, not by min id: its
    // members' scores differ (distinct texts), so the survivor is whichever
    // doc scored highest — assert the selection is genuinely quality-driven
    val chain = byCluster(10L)
    assert(chain.map(_._1).toSet === Set(10L, 11L, 12L))
    assert(chain.map(_._3).distinct.length === 3, "fixture texts should score distinctly")
    assert(chain.filter(_._5).head._3 === chain.map(_._3).max)
  }

  test("planted identical embeddings are each other's top brute-force neighbor") {
    val d = Files.createTempDirectory("graft_sim_fixture").toString
    val v0 = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val v1 = v0.clone() // exact clone of v0
    val others = (2 to 30).map(k => Array.tabulate(64)(i => math.cos(i * k + 7).toFloat))
    (Seq((0L, v0, 0), (1L, v1, 0)) ++ others.zipWithIndex.map { case (v, i) => (i + 2L, v, 1) })
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val top = SimilaritySearch.bruteTopK(spark, d)
      .filter(col("rnk") === 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(top(0L)._1 === 1L && top(0L)._2 > 0.999999)
    assert(top(1L)._1 === 0L && top(1L)._2 > 0.999999)
  }

  test("cluster histogram: planted clusters and the singleton row") {
    // fixture components: {1,2,3} (exact pair + near-dup) and {10,11,12}
    // (the chain); doc 4 pairs with nothing
    val got = Dedup.clusterHistogram(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 1L), (3L, 2L, 6L)), s"histogram drifted: $got")
  }

  test("ngram novelty matches an independent recomputation on the planted corpus") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Set[Seq[String]] = {
      val ws = "[a-z]+".r.findAllIn(t.toLowerCase).toVector
      (0 to ws.length - 8).map(i => ws.slice(i, i + 8)).toSet
    }
    val g = texts.map { case (id, t) => id -> grams(t) }
    val dfm = g.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val expect = g.collect { case (id, gs) if gs.nonEmpty =>
      val novel = gs.count(x => dfm(x) == 1).toLong
      (id, gs.size.toLong, novel, novel.toDouble / gs.size)
    }.toSet
    val got = Dedup.ngramNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expect)
    // planted structure: the identical pair has nothing novel; the
    // unrelated doc is fully novel
    val byId = got.map(t => t._1 -> t._4).toMap
    assert(byId(1L) == 0.0 && byId(2L) == 0.0 && byId(4L) == 1.0)
  }

  test("semantic dedup drops cell-mates above tau with keep-first keepers, no chaining") {
    val d = Files.createTempDirectory("graft_semdedup_fixture").toString
    val e0 = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val near = e0.clone(); near(0) = (near(0) * 1.1).toFloat // tiny angular nudge
    val far = Array.tabulate(64)(i => math.cos(3 * i + 2).toFloat)
    Seq((1L, e0, 0), (2L, e0.clone(), 0), (3L, near, 0), (4L, far, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // fixture precondition: the "far" vector really is below tau vs e0
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    val cosFar = dot(e0, far) / math.sqrt(dot(e0, e0) * dot(far, far))
    assert(math.abs(cosFar) < Dedup.SemTau, s"fixture drift: cos(e0, far) = $cosFar")

    val rows = Dedup.semanticDedup(spark, d).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // 2 and 3 are dropped; BOTH keep 1 as keeper (upper-triangular rule:
    // 2 being itself dropped does not hand 3 off to keeper 2 — no chaining,
    // and a keeper is never dropped)
    assert(rows.keySet === Set(2L, 3L))
    assert(rows(2L)._1 === 1L && rows(2L)._2 > 0.999999) // identical pair
    assert(rows(3L)._1 === 1L && rows(3L)._2 >= Dedup.SemTau)
  }

  /** 50-token docs have 43 token-8-grams; an edit at 0-indexed position p
    * kills the grams starting in [p-7, p] ∩ [0, 42]. So: identical pair
    * shares 43; one interior edit (waz, p=25) kills 8 → 35; the chain's
    * leading-edge edits (p ∈ {0,1} / {2,3}) kill only 2 or 4 — and unlike
    * Jaccard-τ, the span detector rightly REPORTS (10,12): they still share
    * long exact spans even though their set Jaccard fell to 0.852.
    */
  test("LSH planner picks s-curve midpoints near the target threshold") {
    def midpoint(br: (Int, Int)) = math.pow(1.0 / br._1, 1.0 / br._2)
    // the planner's midpoint lands within 0.06 of any reasonable target
    Seq(0.7, 0.8, 0.85, 0.9, 0.95).foreach { tau =>
      assert(math.abs(midpoint(Dedup.lshPlan(tau)) - tau) < 0.06, s"tau=$tau")
    }
    // higher thresholds need fewer bands (more selective OR-construction)
    assert(Dedup.lshPlan(0.95)._1 < Dedup.lshPlan(0.7)._1)
    // the shipped 8x12 is the planner's own answer for the fixture profile
    assert(Dedup.lshPlan(0.84) == ((Dedup.Bands, Dedup.RowsPerBand)))
  }

  test("span overlap finds exact shared spans with exact window counts") {
    val rows = Dedup.spanOverlap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows == Map(
      (1L, 2L) -> 43L, (1L, 3L) -> 35L, (2L, 3L) -> 35L,
      (10L, 11L) -> 41L, (10L, 12L) -> 39L, (11L, 12L) -> 39L))
  }

  test("cosine LSH scale path recovers the exact postings-join pair list") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val exact = rows(Dedup.sparseCosineDedup(spark, Sf0001))
    assert(exact.nonEmpty, "fixture should contain cosine near-dups")
    // same pairs, same bit-exact cosines: band candidates lost nothing here
    assert(rows(Dedup.sparseCosineLsh(spark, Sf0001)) === exact)
  }

  test("sparse-cosine df cap is an absolute ~sqrt(N) bound, engaged on real data") {
    // unit shape: floor below floor², ceil(sqrt) above, monotone
    assert(Dedup.cosDfCap(0) == Dedup.CosDfCapFloor)
    assert(Dedup.cosDfCap(Dedup.CosDfCapFloor * Dedup.CosDfCapFloor) == Dedup.CosDfCapFloor)
    assert(Dedup.cosDfCap(1_000_000L) == 1000L)
    assert(Dedup.cosDfCap(1_000_001L) == 1001L) // ceil, not round
    assert(Dedup.cosDfCap(10_000_000_000L) == 100_000L)
    // integration: on the real corpus the cap is strictly tighter than the
    // old near-stopword N/2 rule AND actually drops something — i.e. the
    // sum_df^2 <= N*sqrt(N) bound is enforced by design, not fixture luck
    import org.apache.spark.sql.functions._
    val p0 = Dedup.shinglePostings(spark, Sf0001)
    val nDocs = p0.select("doc_id").distinct().count()
    val cap = Dedup.cosDfCap(nDocs)
    assert(cap < nDocs / 2, s"cap $cap should be tighter than N/2 of $nDocs")
    val maxDf = p0.groupBy("h").agg(count(lit(1)).as("df"))
      .agg(max("df")).head().getLong(0)
    assert(maxDf > cap, s"fixture should contain terms above the cap (max df $maxDf, cap $cap)")
  }
}
