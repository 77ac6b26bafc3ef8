package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletion neighborhood finds substitution, insertion, and exact-dup pairs — and only those") {
    val d = Files.createTempDirectory("graft_fuzzy_fixture").toString
    Seq(
      (1L, "martha"),
      (2L, "marhta"), // transposition = 2 substitutions → NOT a d=1 neighbor
      (3L, "marta"),  // deletion of 'h' from martha (d=1 to 1; also d=1 to marhta)
      (4L, "martha"), // exact duplicate of 1
      (5L, "mortha"), // substitution at position 2 (d=1 to martha/4)
      (6L, "zzzzzz")  // far from everything
    ).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val got = FuzzyJoin.neighborCounts(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // neighbors: 1↔{3,4,5}, 2↔{3}, 3↔{1,2,4}, 4↔{1,3,5}, 5↔{1,4}, 6↔∅
    assert(got === Map(
      1L -> ((3L, 3L)), 2L -> ((1L, 3L)), 3L -> ((3L, 1L)),
      4L -> ((3L, 1L)), 5L -> ((2L, 1L))))

    // graph: edges {13,14,15,23,34,45}; wedges (1,3,4),(1,4,5),(2,3,4),
    // (3,4,5); only the first two close ((1,4),(1,5) exist; (2,4),(3,5) don't)
    val census = FuzzyJoin.triangleCensus(spark, d).collect().head
    assert((census.getLong(0), census.getLong(1), census.getLong(2)) === ((6L, 4L, 2L)))
  }

  test("entity clusters: planted households resolve transitively; singleton stays out") {
    val d = Files.createTempDirectory("graft_entity_fixture").toString
    Seq(
      (1L, "alpha smith"), (2L, "alpha smyth"), (3L, "alpha smythe"), // chain 1-2-3
      (10L, "beta jones"), (11L, "beta jonez"),                       // pair
      (20L, "gamma solo"))                                            // clean entity
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val got = FuzzyJoin.entityClusters(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    // 1-2 (smith~smyth sub), 2-3 (smyth~smythe insert) chain though 1-3 is
    // distance 2 — transitive resolution is the point
    assert(got == Seq(
      (1L, "alpha smith", 3L, "1,2,3"),
      (10L, "beta jones", 2L, "10,11")))
  }

  test("d=2 neighborhood finds transpositions and double edits the d=1 matcher cannot") {
    val d = Files.createTempDirectory("graft_fuzzy_d2_fixture").toString
    Seq(
      (1L, "martha"),
      (2L, "marhta"), // transposition = 2 substitutions: d=2 only
      (3L, "marta"),
      (4L, "martha"),
      (5L, "mortha"),
      (6L, "zzzzzz")
    ).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val got = FuzzyJoin.neighborCountsD2(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // pairs at lev<=2: {12,13,14,15,23,24,34,35,45} (2-5 is distance 3)
    assert(got === Map(
      1L -> ((4L, 2L)), 2L -> ((3L, 1L)), 3L -> ((4L, 1L)),
      4L -> ((4L, 1L)), 5L -> ((3L, 1L))))
  }

  test("d=2 blocking has FULL recall vs brute-force levenshtein on random strings") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
        j => if (i == 0) j else if (j == 0) i else 0
      })
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val rnd = new scala.util.Random(41)
    // tiny alphabet + short strings → dense near-pair structure, including
    // length-changing double edits and repeated-run collisions
    val names = (1L to 60L).map(id =>
      (id, (0 until 3 + rnd.nextInt(5)).map(_ => "abc".charAt(rnd.nextInt(3))).mkString))
    val d = Files.createTempDirectory("graft_fuzzy_d2_prop").toString
    names.toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val expect = (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && lev(na, nb) <= FuzzyJoin.MaxDist2
    } yield (ia, ib)).toSet
    val got = FuzzyJoin.fuzzyPairsD2(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("q-gram blocking has FULL recall vs brute-force levenshtein on long strings") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
        j => if (i == 0) j else if (j == 0) i else 0
      })
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val rnd = new scala.util.Random(43)
    val alpha = "abcd "
    def randStr(n: Int) = (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (0 until edits).foreach { _ =>
        val i = rnd.nextInt(cur.length)
        rnd.nextInt(3) match {
          case 0 => cur = cur.updated(i, alpha(rnd.nextInt(alpha.length)))
          case 1 => cur = cur.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + cur.substring(i)
          case _ => cur = cur.substring(0, i) + cur.substring(i + 1)
        }
      }
      cur
    }
    // long strings (the regime FastSS's L² keys cannot serve): each base
    // plants a 1-edit, a 2-edit, and a 3-edit copy — substitutions,
    // inserts, AND deletes, so every |Δpos| / |Δlen| / verify bound is hit;
    // the tiny alphabet also makes hot q-grams (the prefix-filter stress)
    val texts = Seq.fill(12)(randStr(50 + rnd.nextInt(40)))
      .flatMap(b => Seq(b, mutate(b, 1), mutate(b, 2), mutate(b, 3)))
    val docs = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong + 1, t, "en", "synthetic", t.length.toLong)
    }
    val d = Files.createTempDirectory("graft_qgram_prop").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // mirror the query's fixture string exactly
    val strings = docs.map { case (id, t, lang, _, _) => id -> s"$lang:${t.toLowerCase.take(77)}" }
    val expect = (for {
      (ia, sa) <- strings; (ib, sb) <- strings
      if ia < ib && math.abs(sa.length - sb.length) <= 2 && lev(sa, sb) <= 2
    } yield (ia, ib) -> lev(sa, sb)).toMap
    val got = FuzzyJoin.qgramDocPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == expect,
      s"missing=${expect.keySet -- got.keySet} extra=${got.keySet -- expect.keySet}")
  }

  test("radius profile's d=1 bucket equals the positioned d=1 matcher's edge count") {
    val profile = FuzzyJoin.radiusProfile(spark, Sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val d1Edges = FuzzyJoin.fuzzyPairs(spark, Sf0001).count()
    assert(profile.getOrElse(1, 0L) + profile.getOrElse(0, 0L) == d1Edges,
      s"cross-implementation drift: profile=$profile d1=$d1Edges")
  }

  test("entity clusters equal an independent union-find over the real pair set") {
    val pairs = FuzzyJoin.fuzzyPairs(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expect = members.groupBy(find).map { case (_, ms) =>
      val sorted = ms.sorted
      (sorted.head, ms.size.toLong, sorted.mkString(","))
    }.toSet
    val got = FuzzyJoin.entityClusters(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(got == expect)
  }
}
