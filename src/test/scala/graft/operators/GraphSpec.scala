package graft.operators

import graft.SparkSpec

/** PageRank semantics on planted graphs, checked against an independent
  * in-memory implementation that mirrors the engine's deterministic
  * sorted-fold addition order — so the comparison is EXACT double equality,
  * not a tolerance (the same independent-twin discipline as TrainPrepSpec's
  * md5 checks).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Undirected edge list → the `(u, v, deg)` frame [[Graph.pagerankOf]]
    * consumes.
    */
  private def edgeFrame(und: Seq[(Long, Long)]) = {
    val dir = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val deg = dir.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    dir.map { case (u, v) => (u, v, deg(u)) }.toDF("u", "v", "deg")
  }

  private def referenceRanks(und: Seq[(Long, Long)]): Map[Long, Double] = {
    val dir = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val nodes = dir.map(_._1).distinct.sorted
    val deg = dir.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size
    var r: Map[Long, Double] = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to Graph.Iterations) {
      val contribs = dir.groupBy(_._2).view.mapValues { es =>
        es.map { case (u, _) => r(u) / deg(u) }.sorted.foldLeft(0.0)(_ + _)
      }.toMap
      r = nodes.map(id =>
        id -> (Graph.Teleport / n + Graph.Damping * contribs.getOrElse(id, 0.0))).toMap
    }
    r
  }

  private val starPlusPair =
    Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L), (6L, 7L))

  test("pagerank matches the independent implementation exactly (star + pair)") {
    val got = Graph.pagerankOf(edgeFrame(starPlusPair)).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val want = referenceRanks(starPlusPair)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, v) => assert(v == want(id), s"node $id") }
  }

  test("ranks sum to 1 (no dangling mass in an undirected graph) and the hub dominates") {
    val got = Graph.pagerankOf(edgeFrame(starPlusPair)).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    assert(got(0L) == got.values.max)
    // the disconnected pair's nodes are symmetric: identical ranks
    assert(got(6L) == got(7L))
  }
}
