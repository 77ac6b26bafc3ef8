ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadooppysparkstreaminganalyticsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Forked-JVM heap: SPARK_DRIVER_MEM, CLAMPED at 30g. Measured r14 (CodegenProbe,
// sf0.1 steady-state, same commit — the four-config table is in COVERAGE.md):
// at -Xmx90g the largest string/hash-CPU plans run 2-13x slower STEADY
// (graph_pagerank 21-81 s / 170-630 CPU-s vs 2.8 s at 30g; fuzzy_qgram_docs
// 27 s vs 3.5 s) — real CPU inflation, not GC/JIT/commit (all measured flat).
// Compressed oops are RULED OUT: -Xmx33g (oops off, young ~20 GiB) matches the
// 8g builder exactly. The mode needs the genuinely huge heap — at 90g G1's
// ergonomic young gen reaches 54 GiB and regions grow to 32 MiB, and even
// -XX:MaxNewSize=2g there only makes it chaotic (8-81 s swings). Every probe
// at <= 33g lands at builder numbers; the suite's high-water committed heap is
// ~21 GB, so 30g keeps full headroom. Production guidance agrees: Spark
// driver/executor heaps are sized 8-32 GB for exactly these reasons. Override
// knowingly via GRAFT_JVM_OPTS (last -Xmx wins).
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${
    val raw = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
    scala.util.Try(raw.toLowerCase.stripSuffix("g").toInt).toOption match {
      case Some(n) if n > 30 => "30g"
      case _ => raw
    }
  }",
  // A 200+-query whole-stage-codegen run compiles thousands of generated
  // classes; at the JVM-default 240m the code cache runs hot and under
  // flushing pressure the most string-CPU-bound stages can end up
  // interpreted — the leading suspect for the r11 cross-JVM 3-4.5x
  // bimodality on fuzzy_name_neighbors_d2/fuzzy_qgram_docs (bench env
  // block measured 166m used at run end WITH flushing available).
  "-XX:ReservedCodeCacheSize=512m",
  // Keep G1 from UNCOMMITTING heap it has expanded into: the r13 bench
  // pre-touch (Bench.preTouchHeap) commits the heap during warmup, but at
  // the default MaxHeapFreeRatio=70 G1 hands the pages back to the kernel
  // as soon as the warmup ballast dies, and the first allocation-heavy
  // query re-pays lazy page commit/zero (measured: graph_pagerank pass1
  // 17 s with heap_grow_mb=3523 — down from 44.7 s unpre-touched, but not
  // gone until the commit sticks). Harmless at small -Xmx: the committed
  // heap simply stays at its high-water mark.
  "-XX:MaxHeapFreeRatio=100",
) ++
  // ad-hoc JVM A/B switch for forked runs (e.g. the r13 slow-mode probes:
  // GRAFT_JVM_OPTS="-XX:-DontCompileHugeMethods" sbt "runMain graft.CodegenProbe ...")
  sys.env.get("GRAFT_JVM_OPTS").toSeq.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
