package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Cluster-safe scratch space for intermediate materializations and the
  * source round-trip queries.
  *
  * Root resolution: `SPARK_GRAFT_SCRATCH` env var if set, else the JVM temp
  * dir. In local mode the default is fine; on a real cluster the env var MUST
  * point at a filesystem shared by driver and executors (NFS mount, or a
  * `file:`-visible DFS fuse path) — a driver-local `/tmp` is invisible to
  * executors, which is exactly the round-2 portability bug this replaces.
  */
object Scratch {

  def root: String =
    sys.env.getOrElse("SPARK_GRAFT_SCRATCH", System.getProperty("java.io.tmpdir"))

  // scratch dirs created by this JVM, removed on exit so repeated Verify /
  // Bench / test runs don't accumulate under the shared root
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  sys.addShutdownHook {
    created.forEach { p =>
      try {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.deleteIfExists(f))
      } catch { case _: Throwable => () } // best-effort; scratch is disposable
    }
  }

  /** Fresh unique directory under the scratch root. */
  def dir(prefix: String): String = {
    val r = Paths.get(root)
    Files.createDirectories(r)
    val d = Files.createTempDirectory(r, prefix)
    created.add(d)
    d.toString
  }

  /** Materialize a DataFrame to scratch parquet once and hand back a plain
    * parquet scan of it.
    *
    * This is the self-join materialization primitive for the LSH family: a
    * signature table that is joined against itself must be computed exactly
    * once. `cache()` alone does not guarantee that (both join sides race to
    * fill the cache and each computes every partition), and cache+count pins
    * executor memory and adds a hidden eager action that leaks persisted
    * partitions to later queries. A scratch-parquet write is deterministic,
    * spill-free (it lives on disk, not in the block manager), costs one
    * deliberate pass, and both self-join sides read the same immutable files.
    */
  def materialize(df: DataFrame, prefix: String): DataFrame = {
    val d = dir(prefix)
    df.write.mode("overwrite").parquet(d)
    df.sparkSession.read.parquet(d)
  }
}
