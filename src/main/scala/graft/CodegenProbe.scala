package graft

import org.apache.spark.metrics.source.CodegenMetrics

/** Dev probe for the cross-JVM slow-first-pass mode (BENCH_r12: d2 pass1 at
  * 15x CPU with a near-zero jit delta, then a 140 s jit delta landing on the
  * NEXT query's window): per timed query, dump the whole-stage-codegen
  * bytecode-size histograms so the two candidate mechanisms become
  * distinguishable facts —
  *   - a generated method > 8000 bytecodes is NEVER JIT-compiled under
  *     HotSpot's default `-XX:+DontCompileHugeMethods` (interpreted forever,
  *     while Spark's own `spark.sql.codegen.hugeMethodLimit` default of
  *     65535 never triggers its fallback first);
  *   - a fleet of 2-8 KB methods that each cost C2 minutes to compile shows
  *     up as a giant METRIC_COMPILATION_TIME tail instead.
  *
  * `runMain graft.CodegenProbe <sfDir> <query>...` — each query runs twice
  * (cold + steady) and prints wall, process-CPU delta, jit delta, generated
  * method count/max/p99, and the count of methods past the 8000-bytecode
  * HotSpot refusal threshold.
  */
object CodegenProbe {
  private def jitSeconds(): Double = {
    val c = java.lang.management.ManagementFactory.getCompilationMXBean
    if (c != null && c.isCompilationTimeMonitoringSupported)
      c.getTotalCompilationTime / 1e3
    else 0.0
  }
  private def cpuSeconds(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime.max(0L) / 1e9
      case _ => 0.0
    }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sfDir = args(0)
    val hist = CodegenMetrics.METRIC_GENERATED_METHOD_BYTECODE_SIZE
    val comp = CodegenMetrics.METRIC_COMPILATION_TIME
    println(s"jvm DontCompileHugeMethods-relevant flags: " +
      java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments
        .toArray.mkString(" "))
    args.drop(1).foreach { q =>
      (1 to 2).foreach { pass =>
        val c0 = hist.getCount; val t0 = System.nanoTime()
        val j0 = jitSeconds(); val p0 = cpuSeconds(); val k0 = comp.getCount
        val n = SparkEntry.queries(q)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val snap = hist.getSnapshot
        val over8k = snap.getValues.count(_ > 8000)
        val csnap = comp.getSnapshot
        println(f"PROBE $q pass=$pass rows=$n wall=$wall%.2f " +
          f"cpu=${cpuSeconds() - p0}%.1f jit=${jitSeconds() - j0}%.1f " +
          f"genMethods+=${hist.getCount - c0} maxBytecode=${snap.getMax} " +
          f"p99=${snap.get99thPercentile()}%.0f over8k(reservoir)=$over8k " +
          f"janinoCompiles+=${comp.getCount - k0} janinoMaxMs=${csnap.getMax}")
        spark.catalog.clearCache()
        Scratch.sweepEphemeral()
      }
    }
    spark.stop()
  }
}
