package graft

/** Dev utility (r18): time registered queries in Bench's PASS-2 shape —
  * JIT-warm JVM, memo/bucketed-table state reset before each listed
  * query — so a build-owning query's steady-state build cost is
  * measurable without a full Bench run. Usage:
  * `SPARK_GRAFT_CPUS=32 runMain graft.ProbeColdBuild <sfDir> <query>...`
  * Each query runs twice: once cold (after a reset — the pass-2 number)
  * and once warm (memos in place — the steady probe number).
  */
object ProbeColdBuild {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sfDir = args(0)
    val names = args.drop(1)
    // JIT warmup: run everything once, untimed
    names.foreach { q =>
      try SparkEntry.queries(q)(spark, sfDir).count()
      catch { case e: Throwable => println(s"WARMUP $q FAILED: ${e.getMessage}") }
      spark.catalog.clearCache(); Scratch.sweepEphemeral()
    }
    names.foreach { q =>
      Scratch.clearMemo()
      Scratch.dropBucketedTables(spark)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); Scratch.sweepEphemeral()
      val t1 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"PROBE $q rows=$n cold=$cold%.2f warm=$warm%.2f")
      spark.catalog.clearCache(); Scratch.sweepEphemeral()
    }
    spark.stop()
  }
}
