package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Similarity

/** vec_dot (native codegen'd expression) must agree BIT-IDENTICALLY with the
  * interpreted higher-order-function fold it replaces — that equivalence is
  * what lets the DuckDB oracle (Similarity.dotDuck, same fold order) check
  * every query built on it.
  */
class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.5f, -2.25f, 0.125f), Array(0.5f, 4.0f, -8.0f)),
    (2L, Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f)),
    (3L, Array(1e-7f, 3e7f, -1e-7f), Array(1e7f, 1e-7f, 42.0f)),
  ).toDF("id", "a", "b")

  test("vec_dot equals the interpreted HOF fold bit-for-bit") {
    val rows = vecs
      .select(expr("vec_dot(a, b)").as("native"), expr(Similarity.dot("a", "b")).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot also matches with expression codegen disabled (interpreted eval path)") {
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.get(key, "FALLBACK")
    try {
      spark.conf.set(key, "NO_CODEGEN")
      val rows = vecs
        .select(expr("vec_dot(a, b)").as("native"), expr(Similarity.dot("a", "b")).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    } finally spark.conf.set(key, old)
  }

  test("vec_dot is NULL on length mismatch and null elements, like the HOF/oracle fold") {
    // zip_with pads the short side with NULL and the fold propagates it; a
    // malformed embedding must surface as NULL, not a partial dot product
    val cases = Seq(
      ("vec_dot(array(1.0D, 2.0D), array(1.0D, 2.0D, 3.0D))",
        Similarity.dot("array(1.0D, 2.0D)", "array(1.0D, 2.0D, 3.0D)")),
      ("vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D))",
        Similarity.dot("array(1.0D, CAST(NULL AS DOUBLE))", "array(1.0D, 2.0D)")))
    cases.foreach { case (native, hof) =>
      val r = spark.range(1).select(expr(native).as("n"), expr(hof).as("h")).head()
      assert(r.isNullAt(0), s"native should be null: $native")
      assert(r.isNullAt(1), s"HOF twin should be null: $hof")
    }
    // and the interpreted eval path agrees with codegen
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.get(key, "FALLBACK")
    try {
      spark.conf.set(key, "NO_CODEGEN")
      cases.foreach { case (native, _) =>
        assert(spark.range(1).select(expr(native)).head().isNullAt(0))
      }
    } finally spark.conf.set(key, old)
  }

  test("vec_dot handles double-array literals (hyperplanes) and nulls") {
    val r = vecs.select(
      expr("vec_dot(a, array(1.0D, 2.0D, 3.0D))").as("mixed"),
      expr("vec_dot(CAST(NULL AS ARRAY<FLOAT>), b)").as("n")).collect()
    assert(r.forall(!_.isNullAt(0)))
    assert(r.forall(_.isNullAt(1)))
  }

  test("ivfAssign produces the same buckets as its DuckDB-dialect twin's math") {
    // spot-check the Scala-side plane generator against the rendered literal:
    // component (0,0) is ((0*2654435761) % 2001 - 1000)/1000 = -1.0
    assert(Similarity.planeComponent(0, 0) === -1.0)
    // buckets must be stable and in range
    val buckets = graft.Tables.embeddings(spark, Sf0001)
      .select(expr(Similarity.ivfAssign("embedding")).as("bucket"))
      .distinct().collect().map(_.getInt(0))
    assert(buckets.forall(b => b >= 0 && b < (1 << Similarity.NumPlanes)))
  }
}
