package graft.operators

import graft.SparkSpec

/** χ² semantics against an independent Scala computation mirroring the
  * engine's sorted-fold addition order — exact double equality, zero cell
  * included.
  */
class ChisqSpec extends SparkSpec {
  import spark.implicits._

  test("chi-square matches an independent computation; zero cells contribute") {
    // contingency: (A,x)=2, (B,x)=1, (B,y)=3, (A,y)=0 ← the zero cell
    val df = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "y"), ("B", "y"), ("B", "y"))
      .toDF("s0", "p0")
    val r = Profiling.chisqOf(df, "s0", "p0").collect().head

    val obs = Map(("A", "x") -> 2L, ("B", "x") -> 1L, ("B", "y") -> 3L)
    val ss = Seq("A", "B")
    val ps = Seq("x", "y")
    val cells = for (s <- ss; p <- ps) yield (s, p, obs.getOrElse((s, p), 0L))
    val rt = ss.map(s => s -> cells.collect { case (`s`, _, n) => n }.sum).toMap
    val ct = ps.map(p => p -> cells.collect { case (_, `p`, n) => n }.sum).toMap
    val tot = cells.map(_._3).sum
    val terms = cells.map { case (s, p, n) =>
      val e = rt(s).toDouble * ct(p) / tot
      (n.toDouble - e) * (n.toDouble - e) / e
    }
    val want = terms.sorted.foldLeft(0.0)(_ + _)

    assert(r.getLong(0) == 4L, "n_cells")
    assert(r.getLong(1) == 1L, "dof")
    assert(r.getDouble(2) == want, "statistic must match the sorted fold exactly")
  }
}
