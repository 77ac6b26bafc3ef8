package graft

import org.apache.spark.sql.functions._

/** Dev utility: STAGE-SPLIT the sparse-cosine dedup at a given SF dir —
  * `runMain graft.CosProbe <sfDir>` — so scale exponents can be attributed
  * to a stage instead of argued (VERDICT r10 #5: the 0.73/decade wall
  * exponent needed a split between candidate volume and verify). Prints
  * one line per stage: postings build (the memoized corpus scan +
  * shingle/tf aggregation), candidate fan-out (the df-capped postings
  * self-join, counted BEFORE the pair aggregation), pair aggregation
  * (dots), and the steady full query, plus the volumes each stage moves.
  */
object CosProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sfDir = args(0)
    spark.range(1000).selectExpr("sum(id)").collect() // scheduler warmup

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"COSPROBE $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }

    val p0 = timed("postings_build") {
      val p = graft.pipeline.Dedup.shinglePostings(spark, sfDir)
      p.count()
      p
    }
    println(s"COSPROBE postings_rows n=${p0.count()}")
    val nDocs = p0.select("doc_id").distinct().count()
    val cap = graft.pipeline.Dedup.cosDfCap(nDocs)
    println(s"COSPROBE n_docs n=$nDocs df_cap=$cap")
    val keep = p0.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap).select("h")
    val p = timed("df_filter") {
      val f = p0.join(keep, "h")
      println(s"COSPROBE surviving_postings n=${f.count()}")
      f
    }
    // candidate fan-out: the h-keyed self-join volume (sum of df^2 over
    // surviving terms, upper-bounded by cap * surviving_postings)
    timed("candidate_join") {
      val cand = p.select(col("doc_id").as("ia"), col("h"))
        .join(p.select(col("doc_id").as("ib"), col("h")), "h")
        .filter(col("ia") < col("ib"))
      println(s"COSPROBE candidate_rows n=${cand.count()}")
    }
    timed("pair_agg_dots") {
      val dots = p.select(col("doc_id").as("ia"), col("h"), col("tf").as("tfa"))
        .join(p.select(col("doc_id").as("ib"), col("h"), col("tf").as("tfb")), "h")
        .filter(col("ia") < col("ib"))
        .groupBy("ia", "ib").agg(sum(col("tfa") * col("tfb")).as("d"))
      println(s"COSPROBE distinct_pairs n=${dots.count()}")
    }
    timed("full_query_steady") {
      val n = graft.pipeline.Dedup.sparseCosineDedup(spark, sfDir).count()
      println(s"COSPROBE result_pairs n=$n")
    }
    spark.stop()
  }
}
