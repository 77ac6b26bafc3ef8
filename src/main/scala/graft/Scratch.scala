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
    created.forEach(deleteRecursively)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    } catch { case _: Throwable => () } // best-effort; scratch is disposable

  /** Eagerly delete a scratch path created by [[dir]] (best-effort) —
    * for owners that bound peak scratch disk themselves instead of waiting
    * for the JVM-exit hook.
    */
  def delete(path: String): Unit = deleteRecursively(Paths.get(path))

  /** Default bucket count for persisted bucketed tables: the
    * `SPARK_GRAFT_BUCKETS` env var when set, else the session's shuffle
    * parallelism (`spark.sql.shuffle.partitions`) with 16 as the floor
    * (the band-index convention) — bucketed layouts track the cluster's
    * configured parallelism instead of a compile-time constant, with the
    * env as the explicit operator override.
    */
  def defaultBuckets(spark: org.apache.spark.sql.SparkSession): Int =
    sys.env.get("SPARK_GRAFT_BUCKETS").map(_.trim.toInt).getOrElse(
      math.max(16, scala.util.Try(
        spark.conf.get("spark.sql.shuffle.partitions").toInt).getOrElse(16)))

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
    *
    * Dirs written here are PER-INVOCATION (unlike [[memoize]]'s per-run
    * stages) and are registered for [[sweepEphemeral]]: a harness that runs
    * many queries back to back (Bench, Verify) sweeps them as soon as the
    * owning query's action completes, so one query's token-scale scratch
    * write can never sit on the page cache while its neighbors are being
    * timed — the r7 text-family regression was exactly that bleed.
    */
  def materialize(df: DataFrame, prefix: String): DataFrame = {
    val d = dir(prefix)
    ephemeral.add(Paths.get(d))
    df.write.mode("overwrite").parquet(d)
    df.sparkSession.read.parquet(d)
  }

  // per-invocation materialize dirs, swept between queries by the harnesses
  private val ephemeral = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  /** Delete every per-invocation [[materialize]] dir created since the last
    * sweep. Callers (Bench, Verify) invoke this AFTER the query's action has
    * completed — the returned DataFrame is a lazy scan of the swept files, so
    * sweeping mid-query would break the read. Memoized stages and bucketed
    * tables are NOT swept: their cross-query reuse is the production DAG
    * shape ([[memoize]]); they fall to [[clearMemo]]/[[dropBucketedTables]].
    */
  def sweepEphemeral(): Unit = {
    var p = ephemeral.poll()
    while (p != null) { deleteRecursively(p); p = ephemeral.poll() }
  }

  // content key → future scratch parquet path, one entry per logical
  // pipeline stage per JVM (see memoize); a per-key future rather than a
  // global lock so concurrent callers computing DIFFERENT stages never
  // serialize behind each other's Spark jobs
  // monotone count of one-time builds (memoized stages + bucketed index
  // tables) actually COMPUTED by this JVM — memo hits don't advance it.
  // Bench samples the delta around each query to tell "paid an index/memo
  // build" invocations from steady-state ones.
  private val builds = new java.util.concurrent.atomic.AtomicLong()

  /** Number of one-time builds (memo stages + bucketed tables) computed so
    * far in this JVM. Deltas around a query identify build-paying runs.
    */
  def buildsCount: Long = builds.get()

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.CompletableFuture[String]]()

  /** [[materialize]], memoized on a logical-stage key: the first call per JVM
    * computes `df` and writes it to scratch parquet; every later call with
    * the same key — from ANY query in the same Verify/Bench/test run — gets a
    * scan of the already-written files without recomputing the stage.
    *
    * This is the production-DAG shape (materialize once, consume everywhere):
    * `dedup_components` consumes the very pair tables `dedup_minhash_lsh` /
    * `dedup_simhash` produce, and `dedup_incremental` reuses the tokenized
    * corpus, instead of each query re-running the shared upstream stages.
    *
    * The key MUST identify the stage's full input and logic — convention:
    * `s"$sfDir#<stage>#<params>"`. Callers whose output must be fresh per
    * invocation (e.g. the per-round connected-components label tables) use
    * [[materialize]] directly.
    *
    * Exactly-once compute per key via a per-key future: the first caller
    * installs and completes it, racers (and nested stages on other keys)
    * proceed independently; a failed compute removes its entry so a retry
    * is possible.
    */
  def memoize(spark: org.apache.spark.sql.SparkSession, key: String)
             (df: => DataFrame): DataFrame =
    memoizeWith(spark, key)(df.write.mode("overwrite").parquet(_))

  /** [[memoize]] with a Hive-style `partitionBy` layout: the scratch table
    * is written under `col=value/` directories, so a later scan with a
    * filter (static or a runtime `DynamicPruningExpression`) on the
    * partition columns reads ONLY the matching directories. This is the
    * date-partitioned fact-table layout every 100 TB warehouse uses; at
    * test scale it exists so the pruning plans can be pinned for real.
    */
  def memoizePartitioned(spark: org.apache.spark.sql.SparkSession, key: String,
                         partitionCols: Seq[String])
                        (df: => DataFrame): DataFrame =
    memoizeWith(spark, key)(
      df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(_))

  private def memoizeWith(spark: org.apache.spark.sql.SparkSession, key: String)
                         (write: String => Unit): DataFrame = {
    val fresh = new java.util.concurrent.CompletableFuture[String]()
    val prior = memo.putIfAbsent(key, fresh)
    val fut =
      if (prior != null) prior
      else {
        try {
          val d = dir("graft_memo")
          write(d)
          builds.incrementAndGet()
          fresh.complete(d)
        } catch {
          case e: Throwable =>
            memo.remove(key, fresh)
            fresh.completeExceptionally(e)
            throw e
        }
        fresh
      }
    spark.read.parquet(fut.join())
  }

  /** Fan a narrow frame out to the session's parallelism BEFORE expensive
    * per-row map work — ONLY when its current plan would run on fewer
    * partitions (the fixture reality: single-file single-row-group parquet
    * scans are one task, so an un-fanned map phase runs serial on a
    * 32-core session). On a production multi-split table the condition is
    * false and NO repartition is inserted — the scale-adaptive version of
    * the pre-explode fan-outs the d2/qgram builders already use.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Force several INDEPENDENT one-time builds concurrently (guide §2.6:
    * overlap independent jobs — Spark happily runs several jobs at once;
    * they are only sequential when the driver calls their actions
    * sequentially). Each thunk typically forces a [[memoize]] stage; the
    * per-key futures make concurrent forcing race-free, and a later
    * sequential consumer finds every memo in place. Thread count is the
    * thunk count — callers pass a handful of component builds, not a task
    * fan-out. The first failure rethrows after all threads settle (so no
    * build is left mid-flight when the caller unwinds).
    */
  def buildConcurrently(thunks: Seq[() => Any]): Unit =
    if (thunks.sizeIs <= 1) thunks.foreach(_.apply())
    else {
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = thunks.map { t =>
        val th = new Thread(() => try { t(); () } catch { case e: Throwable => errs.add(e) })
        th.start(); th
      }
      ts.foreach(_.join())
      if (!errs.isEmpty) throw errs.peek()
    }

  private final case class BucketTable(name: String, path: String)

  // logical-stage key → future (catalog name, scratch path) of a persisted
  // bucketed table — same per-key-future discipline as [[memoize]] so a
  // multi-job index build for one corpus never serializes a concurrent
  // build for another
  private val bucketMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.CompletableFuture[BucketTable]]()

  /** Persist `df` once per (JVM, key) as a catalog table BUCKETED AND
    * SORTED by `bucketCols` (files under scratch), and hand back a scan of
    * it. This is the offline index-build lifecycle shared by the dedup
    * band index, the PageRank edge table, and the CDC state table: build
    * once, then every iterated/nightly join against the table reads
    * co-located buckets with ZERO exchange on the persisted side.
    *
    * The pre-write `repartition(buckets, bucketCols)` matters: Spark's
    * native bucket id is `pmod(murmur3(cols), buckets)` — identical to the
    * repartition hash — so each write task holds exactly one bucket's rows
    * and the table lands as one file per bucket (not tasks × buckets),
    * which is also what lets sorted-bucket scans feed sort-merge joins
    * without re-sorting.
    */
  def memoizeBucketed(spark: org.apache.spark.sql.SparkSession, key: String,
                      prefix: String, bucketCols: Seq[String])
                     (df: => DataFrame): DataFrame = {
    val fresh = new java.util.concurrent.CompletableFuture[BucketTable]()
    val prior = bucketMemo.putIfAbsent(key, fresh)
    val fut =
      if (prior != null) prior
      else {
        try {
          val t = s"${prefix}_${java.lang.Long.toHexString(System.nanoTime())}"
          val path = dir(prefix)
          val buckets = defaultBuckets(spark)
          df.repartition(buckets,
              bucketCols.map(org.apache.spark.sql.functions.col): _*)
            .write.mode("overwrite")
            .option("path", path)
            .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
            .sortBy(bucketCols.head, bucketCols.tail: _*)
            .saveAsTable(t)
          builds.incrementAndGet()
          fresh.complete(BucketTable(t, path))
        } catch {
          case e: Throwable =>
            bucketMemo.remove(key, fresh)
            fresh.completeExceptionally(e)
            throw e
        }
        fresh
      }
    spark.table(fut.join().name)
  }

  /** Drop every bucketed table this JVM registered AND delete its files
    * eagerly (the catalog drop alone leaves the external `path` files until
    * JVM exit, which would accumulate a copy per Bench pass). Bench pairs
    * this with [[clearMemo]] between passes so pass 2 re-measures the full
    * index-build + probe cost.
    */
  def dropBucketedTables(spark: org.apache.spark.sql.SparkSession): Unit = {
    bucketMemo.values.forEach { f =>
      if (f.isDone && !f.isCompletedExceptionally) {
        val bt = f.join()
        spark.sql(s"DROP TABLE IF EXISTS ${bt.name}")
        deleteRecursively(Paths.get(bt.path))
      }
    }
    bucketMemo.clear()
  }

  /** Forget every memoized stage and delete its files eagerly (bounding peak
    * scratch disk instead of waiting for JVM exit). Bench calls this between
    * suite passes so the second pass re-measures the real pipelines cold
    * rather than timing warm memo scans.
    */
  def clearMemo(): Unit = {
    memo.values.forEach { f =>
      if (f.isDone && !f.isCompletedExceptionally) deleteRecursively(Paths.get(f.join()))
    }
    memo.clear()
  }
}
