package graft

import org.apache.spark.sql.functions._

/** Dev probe: where profile_orders spends its time (not registered). */
object ProfProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val df = Tables.orders(spark, sfDir)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $tag sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("warmup")(df.count())
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    // the full 6-distinct single agg, as the query runs it
    time("full_profile")(operators.Profiling.profileOf(df.select(cols.map(col): _*)).collect())
    time("full_profile_warm")(operators.Profiling.profileOf(df.select(cols.map(col): _*)).collect())
    // distinct counts only, one agg
    time("distincts_only")(df.agg(countDistinct(col(cols.head)),
      cols.tail.map(c => countDistinct(col(c))): _*).collect())
    // null/min/max only, one agg
    time("minmax_only")(df.agg(
      cols.flatMap(c => Seq(min(col(c).cast("string")), max(col(c).cast("string")),
        sum(when(col(c).isNull, 1L).otherwise(0L)))).head,
      cols.flatMap(c => Seq(min(col(c).cast("string")), max(col(c).cast("string")),
        sum(when(col(c).isNull, 1L).otherwise(0L)))).tail: _*).collect())
    // per-column distinct, separate jobs
    cols.foreach(c => time(s"distinct_$c")(df.agg(countDistinct(col(c))).collect()))
    operators.Profiling.profileOf(df.select(cols.map(col): _*)).explain("formatted")
    spark.stop()
  }
}
