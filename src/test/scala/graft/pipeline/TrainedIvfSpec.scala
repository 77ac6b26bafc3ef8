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
}
