package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit runner: `runMain graft.Plans <query names...>` prints
  * `explain("formatted")` for each registered query at sf0.01. Findings are
  * kept in PLANS.md — re-run after any plan-affecting change and check:
  * PushedFilters on every scan, pruned ReadSchema, no forced broadcast of
  * data-dependent frames, WindowGroupLimit on top-k windows, cached frames
  * reused (InMemoryTableScan) where a self-join would recompute.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      SparkEntry.queries.get(name) match {
        case Some(q) =>
          println(s"###PLAN $name")
          q(spark, sf).explain("formatted")
          spark.catalog.clearCache()
        case None =>
          println(s"###UNKNOWN $name — known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      }
    }
    spark.stop()
  }
}
