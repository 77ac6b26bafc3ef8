package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Pivot ⇄ unpivot is lossless: melting the wide frame and re-pivoting the
  * long form rebuilds it exactly (zero-filled cells survive as explicit
  * zero rows).
  */
class UnpivotSpec extends SparkSpec {

  test("unpivot inverts the pivot on the sf0.001 corpus") {
    val wide = Nested.customerPriorityPivot(spark, Sf0001).drop("total_orders")
    val long = Nested.customerPivotUnpivot(spark, Sf0001)
    assert(long.count() == wide.count() * 5, "five long rows per wide row")
    val rebuilt = long.groupBy("o_custkey").pivot("priority").sum("n_orders")
      .select(wide.columns.map(col): _*)
    assert(rebuilt.exceptAll(wide).count() == 0 && wide.exceptAll(rebuilt).count() == 0)
  }
}
