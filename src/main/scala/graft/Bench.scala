package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** A run pair whose slower pass exceeds the faster by this factor (and by
    * [[DivergeFloorSec]] absolutely) is reported as DIVERGENT: the committed
    * best-of-2 number is then a lower bound, not a stable measurement, and
    * the per-query GC deltas in the JSON say whether the stall was collector
    * time or something external (page cache, scratch I/O). The r7 board hid
    * a roaming ~180 s stall behind best-of-2; this makes it mechanical to
    * tell noise from regression.
    */
  val DivergeRatio = 3.0
  val DivergeFloorSec = 1.0

  private def gcSeconds(): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime.max(0L)).sum / 1e3
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    // untimed warmup: JVM/codegen/scheduler startup otherwise lands on
    // whichever query happens to run first
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1000).groupBy("l_returnflag").count().collect()
    // DAG order, not alphabetical: consumers of memoized upstream stages run
    // AFTER their producers (exactly how a production pipeline schedules —
    // pair tables are built by the pair queries, then resolution/recall
    // consume them), so each query's time reflects the work it owns. Ties
    // and everything else stay sorted.
    val producerRank = Map(
      "dedup_minhash_lsh" -> 0, "dedup_simhash" -> 0, "similarity_topk_lsh" -> 0,
      "similarity_topk_ivf" -> 0,
      "dedup_components" -> 1, "dedup_incremental" -> 1, "similarity_lsh_recall" -> 1,
      "similarity_ivf_recall" -> 1,
      // consumes the minhash pair memo the LSH query builds
      "corpus_curated_manifest" -> 1,
      // consumes the shingle-postings memo the exact cosine query builds
      "dedup_cosine_lsh" -> 1,
      // consumes the IVF cell-assignment memo similarity_topk_ivf builds
      "dedup_semantic" -> 1,
      // consumes the component-label memo dedup_components builds (which
      // itself consumes the rank-0 pair memos) — rank 2 so each stage's
      // cost lands on the query that owns it, not on whichever name sorts
      // first
      "dedup_canonical" -> 2,
      // consumes the same component-label memo
      "dedup_cluster_histogram" -> 2,
    ).withDefaultValue(0)
    val names = SparkEntry.queries.keys.toSeq.sortBy(n => (producerRank(n), n))
    // (wall sec, gc-delta sec, error) per query
    def runPass(): Map[String, (Double, Double, Option[String])] = names.map { name =>
      val g0 = gcSeconds()
      val t0 = System.nanoTime()
      // a failed query must surface as an error in the JSON, never as a
      // fast-looking time
      val err = try { SparkEntry.queries(name)(spark, sfDir).count(); None }
                catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      val gc = gcSeconds() - g0
      // queries may cache intermediates or write per-invocation scratch;
      // drop both so later timings are independent of earlier queries
      // (lingering scratch parquet competes for the page cache — the r7
      // text-family 7-12x regression)
      spark.catalog.clearCache()
      Scratch.sweepEphemeral()
      name -> (dt, gc, err)
    }.toMap
    // this box swings ±40% run-to-run at sf0.1: report per-query BEST of two
    // full suite passes (raw pairs + GC deltas kept in the JSON; pairs past
    // DivergeRatio flagged loudly). Memoized scratch stages and the persisted
    // band index are reset between passes so pass 2 times the real pipelines
    // cold, not warm memo scans — WITHIN a pass the memo sharing stays on,
    // because that cross-query reuse is the production DAG shape being
    // measured.
    def resetShared(): Unit = {
      Scratch.clearMemo()
      Scratch.dropBucketedTables(spark) // band index, PageRank edges, CDC state
      spark.catalog.clearCache()
    }
    val pass1 = runPass()
    resetShared()
    val pass2 = runPass()
    val results = names.map { name =>
      val (t1, g1, e1) = pass1(name)
      val (t2, g2, e2) = pass2(name)
      // best of the SUCCESSFUL passes only: a fast abort must never report
      // as a fast time; error only when both passes failed
      val ok = Seq((t1, e1), (t2, e2)).collect { case (t, None) => t }
      val best = if (ok.nonEmpty) ok.min else math.min(t1, t2)
      val err = if (ok.nonEmpty) None else e1.orElse(e2)
      val divergent = err.isEmpty && ok.size == 2 &&
        ok.max - ok.min > DivergeFloorSec && ok.max > DivergeRatio * ok.min
      (name, best, Seq(t1, t2), Seq(g1, g2), err, divergent)
    }
    val diverged = results.collect { case (n, _, ts, gs, _, true) => (n, ts, gs) }
    diverged.foreach { case (n, ts, gs) =>
      System.err.println(
        f"[bench] DIVERGENT $n: passes ${ts.map(t => f"$t%.2f").mkString("/")}s " +
          f"(>${DivergeRatio}x), gc ${gs.map(g => f"$g%.2f").mkString("/")}s — " +
          "best-of-2 is a lower bound, not a stable measurement")
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v, _, _, _, _) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val runs = results.map { case (k, _, rs, _, _, _) => jstr(k) + ":" + rs.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val gcs = results.map { case (k, _, _, gs, _, _) => jstr(k) + ":" + gs.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, _, Some(e), _) => jstr(k) + ":" + jstr(e.take(300)) }
      .mkString("{", ",", "}")
    val divJson = diverged.map { case (n, _, _) => jstr(n) }.mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"gc":$gcs,"divergent":$divJson,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // the harness captures only a bounded stdout tail, which has truncated
    // the (large) JSON line before; the file copy keeps the full official
    // number self-contained under the repo
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_result.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
