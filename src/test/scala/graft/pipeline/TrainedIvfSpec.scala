package graft.pipeline

import graft.{SparkEntry, SparkSpec}

/** The Lloyd-trained IVF quantizer must demonstrably beat the seeded one
  * where training has something to fix: on the 500-vector fixture the
  * deterministic seed centroids partition the corpus badly (recall 0.80)
  * and two Lloyd rounds repair it (0.915). Guards the training pipeline
  * end-to-end — assignment, sorted-fold means, empty-cell fallback,
  * probes — via the same query the oracle checks.
  */
class TrainedIvfSpec extends SparkSpec {
  import spark.implicits._

  test("trained centroids beat the seeded quantizer on the small fixture") {
    val r = SparkEntry.queries("similarity_ivf_recall")(spark, Sf0001)
      .head()
    val seeded = r.getAs[Double]("recall_at_k")
    val trained = r.getAs[Double]("recall_at_k_trained")
    assert(trained >= 0.9, s"trained recall regressed: $trained")
    assert(trained > seeded,
      s"training no longer helps where seeds are bad: trained=$trained seeded=$seeded")
  }

  test("ivf sweep: recall and candidate volume are monotone in nprobe; full probe is exact") {
    val rows = SimilaritySearch.ivfSweep(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(rows.map(_._1) == SimilaritySearch.SweepProbes)
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 >= a._2, s"candidates must not shrink: $a -> $b")
      assert(b._4 >= a._4, s"hits must not shrink: $a -> $b")
    }
    // probing every cell IS brute force: recall exactly 1. The exactness
    // claim only holds for a sweep point that covers ALL cells, so derive
    // that row from NumCentroids instead of assuming it is the last one.
    assert(SimilaritySearch.SweepProbes.last == graft.pipeline.Similarity.NumCentroids,
      s"sweep must end at a full probe (SweepProbes.last=${SimilaritySearch.SweepProbes.last}" +
        s" vs NumCentroids=${graft.pipeline.Similarity.NumCentroids}) or the" +
        " exactness assertion below is wrong-by-construction")
    val fullProbe = rows.find(_._1 >= graft.pipeline.Similarity.NumCentroids).get
    assert(fullProbe._5 == 1.0, s"full probe must be exact: $fullProbe")
    rows.foreach { case (_, _, nTrue, nHit, rec) =>
      assert(rec == nHit.toDouble / nTrue)
    }
  }

  test("knn label agreement: coherent labels score high, a planted impostor drags its label") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    val d = Files.createTempDirectory("graft_knnlabel_fixture").toString
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Float]): Array[Float] =
      base.zipWithIndex.map { case (x, _) => x + (rnd.nextFloat() - 0.5f) * 0.05f }
    val baseA = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val baseB = Array.tabulate(64)(i => math.cos(2 * i + 5).toFloat)
    val rows =
      (0 until 12).map(i => (i.toLong, jitter(baseA), 0)) ++          // coherent label 0
      (0 until 12).map(i => (100L + i, jitter(baseB), 1)) ++          // coherent label 1
      Seq((999L, jitter(baseA), 1))                                   // impostor: A-shaped, labeled 1
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = SimilaritySearch.knnLabelAgreement(spark, d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(got.keySet == Set(0, 1))
    val (n0, _, a0) = got(0)
    val (n1, p1, a1) = got(1)
    assert(n0 == 12L && n1 == 13L)
    // the impostor hurts BOTH labels: its own 10 neighbors are all label 0
    // (zero agreement — exactly K disagreeing pairs on label 1, while the
    // 12 true B-members see only B-mates), and it pollutes some label-0
    // members' top-10 lists
    assert(p1 == 130L)
    assert(a1 == 120.0 / 130.0, s"label 1 must lose exactly the impostor's K pairs: $a1")
    assert(a0 > 0.8 && a0 < 1.0,
      s"label 0 must stay high but lose pairs to the impostor: $a0")
  }
}
