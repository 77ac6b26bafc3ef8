package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Training-data preparation operators: deterministic dataset splitting and
  * sequence packing — the two steps between "deduped corpus" and "batches a
  * trainer can read".
  *
  * Both are oracle-checked (hash-stable math shared with DuckDB) because
  * determinism is the POINT of these operators in production: a re-run of
  * the pipeline must put every document in the same split and the same bin,
  * or training becomes irreproducible and val/test leak across runs.
  *
  * Scale (100 TB): the split is a map-only hash projection + one bounded
  * aggregate (splits × langs rows). Packing windows are partitioned by
  * shard — parallelism = number of shards (set it to a multiple of executor
  * count at scale); within a shard the greedy fill is the sequential
  * contiguity packing pipelines actually use, and no shard ever needs more
  * than its own running sum in memory.
  */
object TrainPrep extends QueryModule {

  /** Split fractions in percent: [0,90) train, [90,95) val, [95,100) test. */
  val TrainPct = 90
  val ValPct = 95

  /** `text_stable_split`: content-independent hash-stable split assignment
    * (hash60(doc_id) mod 100 against the fraction boundaries — adding
    * documents never reassigns existing ones, unlike any sample()/random
    * split), summarized as docs + tokens per (split, lang).
    */
  def stableSplit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        expr(s"size(${Dedup.rawTokens})").as("n_tokens"),
        expr(s"${Dedup.hash60("CAST(doc_id AS STRING)")} % 100").as("h"))
      .withColumn("split",
        when(col("h") < TrainPct, "train")
          .when(col("h") < ValPct, "val")
          .otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("split", "lang")

  private val stableSplitSql =
    s"""WITH d AS (
          SELECT doc_id, lang,
                 len(${Dedup.rawTokensDuck}) AS n_tokens,
                 ${Dedup.hash60Duck("CAST(doc_id AS VARCHAR)")} % 100 AS h
          FROM documents)
        SELECT CASE WHEN h < $TrainPct THEN 'train'
                    WHEN h < $ValPct THEN 'val'
                    ELSE 'test' END AS split,
               lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM d GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Token budget per packed bin and shard count for [[packSequences]]. */
  val PackBudget = 512
  val PackShards = 8

  /** `pack_sequences`: greedy contiguous packing of documents into
    * fixed-token-budget bins, shard-local: within each shard (doc_id mod
    * [[PackShards]]), docs fill bins in doc_id order and a doc belongs to
    * the bin its running total STARTS in (bins may overflow at the
    * boundary — the standard contiguity packing; the trainer truncates or
    * spans). One row per bin: docs packed, tokens, fill ratio.
    */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (col("doc_id") % PackShards).as("shard"),
        expr(s"size(${Dedup.rawTokens})").as("n_tokens"))
      .withColumn("bin",
        floor((sum("n_tokens").over(w) - col("n_tokens")) / lit(PackBudget.toDouble)))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .withColumn("fill_ratio", col("bin_tokens").cast("double") / PackBudget)
      .orderBy("shard", "bin")
  }

  private val packSequencesSql =
    s"""WITH d AS (
          SELECT doc_id, doc_id % $PackShards AS shard,
                 len(${Dedup.rawTokensDuck}) AS n_tokens
          FROM documents
        ), b AS (
          SELECT shard, n_tokens,
                 CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_tokens)
                            / ${PackBudget.toDouble}) AS BIGINT) AS bin
          FROM d)
        SELECT shard, bin, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
               CAST(SUM(n_tokens) AS DOUBLE) / $PackBudget AS fill_ratio
        FROM b GROUP BY 1, 2 ORDER BY 1, 2"""

  /** `pack_manifest`: the trainer-facing manifest — each bin's member docs
    * as an ordered CSV string (same bin assignment as [[packSequences]];
    * doc list sorted numerically before joining so both engines emit the
    * identical string). Bins hold a handful of docs, so the per-group array
    * work is bounded.
    */
  def packManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (col("doc_id") % PackShards).as("shard"),
        expr(s"size(${Dedup.rawTokens})").as("n_tokens"))
      .withColumn("bin",
        floor((sum("n_tokens").over(w) - col("n_tokens")) / lit(PackBudget.toDouble)))
      .groupBy("shard", "bin")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(doc_id)), x -> CAST(x AS STRING)), ',')")
        .as("docs"))
      .orderBy("shard", "bin")
  }

  private val packManifestSql =
    s"""WITH d AS (
          SELECT doc_id, doc_id % $PackShards AS shard,
                 len(${Dedup.rawTokensDuck}) AS n_tokens
          FROM documents
        ), b AS (
          SELECT doc_id, shard,
                 CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_tokens)
                            / ${PackBudget.toDouble}) AS BIGINT) AS bin
          FROM d)
        SELECT shard, bin,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS docs
        FROM b GROUP BY 1, 2 ORDER BY 1, 2"""

  /** `doc_global_index`: dense contiguous sample indices 0..N-1 in doc_id
    * order — the address space a trainer's sampler draws from. A global
    * ORDER BY + row_number window would collapse the numbering onto ONE
    * task at scale; this is the scale-correct form: range-partitioned sort,
    * then `zipWithIndex` (one lightweight per-partition count job + a
    * map-side offset add — the textbook distributed prefix sum, and one of
    * the two deliberate RDD uses in the repo). The oracle's row_number
    * twin proves the two formulations agree.
    */
  def globalIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id")).orderBy("doc_id")
      .as[Long].rdd.zipWithIndex()
      .toDF("doc_id", "idx")
      .orderBy("doc_id")
  }

  private val globalIndexSql =
    """SELECT doc_id,
              CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
       FROM documents ORDER BY doc_id"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stable_split" -> (stableSplit _),
    "pack_sequences" -> (packSequences _),
    "pack_manifest" -> (packManifest _),
    "doc_global_index" -> (globalIndex _),
  )

  override def oracle: Map[String, String] = Map(
    "text_stable_split" -> stableSplitSql,
    "pack_sequences" -> packSequencesSql,
    "pack_manifest" -> packManifestSql,
    "doc_global_index" -> globalIndexSql,
  )
}
