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
    // probing every cell IS brute force: recall exactly 1
    assert(rows.last._1 == graft.pipeline.Similarity.NumCentroids)
    assert(rows.last._5 == 1.0, s"full probe must be exact: ${rows.last}")
    rows.foreach { case (_, _, nTrue, nHit, rec) =>
      assert(rec == nHit.toDouble / nTrue)
    }
  }
}
