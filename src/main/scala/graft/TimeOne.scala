package graft

/** Dev utility: time individual registered queries at a given SF dir —
  * `runMain graft.TimeOne <sfDir> <query>...`. Each query is counted once
  * in a shared session; the FIRST query listed pays JVM/codegen warmup.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_CPUS (the Bench convention) sizes local threads AND the
    // shuffle fan-out — the sf10 probe needs partitions ∝ data where the
    // default 32 holds whole-partition agg state an sf10 shard outgrows
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sfDir = args(0)
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      println(f"TIMED $q rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
