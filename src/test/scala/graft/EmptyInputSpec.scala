package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.BpeTokenizer

/** Empty-corpus robustness: a fresh ingest partition IS an empty table, so
  * every documents/embeddings-family query must plan and return empty —
  * never throw on size(t)-style guards, empty folds, empty pivots, or
  * empty index builds.
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_empty_fixture").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private val docQueries = Seq(
    "text_lang_id", "text_langid_confusion", "text_quality_score", "text_quality_percentile", "text_token_counts", "text_fingerprint",
    "text_repetition", "text_contamination", "text_stable_split",
    "mix_weights", "mix_materialize", "corpus_token_budget",
    "pack_sequences", "pack_manifest", "pack_compare", "doc_global_index",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_span_overlap", "dedup_components", "dedup_cluster_histogram", "text_ngram_novelty",
    "similarity_topk_brute", "similarity_topk_lsh", "similarity_topk_ivf",
    "similarity_probe_incremental",
    "similarity_topk_ivf_trained", "dedup_embedding", "dedup_semantic",
    "q1_wordcount_top20", "q1_length_histogram", "q1_corpus_stats",
    "text_tfidf_keywords", "text_heavy_hitters_cms", "text_vocab_coverage",
    "text_bpe_pairs", "text_bpe_train", "text_bpe_apply",
    "train_negative_pairs",
    "docs_chunked", "docs_stratified_sample", "corpus_source_report",
    "docs_rendezvous_shards", "docs_allocated_sample",
    "text_inverted_index", "text_bigram_lm",
    "dedup_cosine_sparse", "dedup_cosine_lsh", "corpus_curated_manifest",
    "corpus_source_overlap", "corpus_source_overlap_kmv", "corpus_dataset_card",
    "corpus_dataset_card_kmv",
    "text_perplexity_filter", "train_decontaminated_split", "train_dsir_weights",
    "corpus_snapshot_drift",
    "emb_covariance_q", "emb_quantization_clipped", "emb_label_centroids",
    "emb_topk_quantized", "emb_whitened_check", "emb_knn_label_agreement",
    "emb_snapshot_drift",
    // r14 family
    "text_gopher_filter", "text_gopher_repetition", "code_quality_filter",
    "text_pii_luhn", "lz4_ingest", "docs_lz4_roundtrip",
    "train_bloom_decontaminate", "text_classifier_train", "text_classifier_score",
    "emb_pq_codes", "similarity_topk_pq", "similarity_pq_recall",
    "emb_cluster_sample",
    // r15 family (jsonl_* build their fixture FROM documents, so an empty
    // corpus means zero files land and the walks must return empty)
    "jsonl_ingest", "jsonl_files_ingest", "sitemap_coverage",
    "robots_sitemap_locs", "text_compress_ratio",
    "text_classifier_multi", "text_langid_learned", "mm_real_exif",
    // r16/r17 family (the pdf fixtures build FROM documents, so an empty
    // corpus lands zero files and the walks must return empty)
    "pdf_text_extract", "pdf_xref_stream_extract", "pdf_info_extract",
    "pdf_files_ingest", "mm_ahash_oriented")

  /** Ungrouped global aggregates correctly emit ONE summary row on empty
    * input (SQL semantics, same as the DuckDB oracle) — everything else
    * must be empty.
    */
  private val globalAggRows = Map("q1_corpus_stats" -> 1L,
    // the compression curve is one GLOBAL-aggregate row per merge round
    "text_bpe_apply" -> (BpeTokenizer.BpeRounds + 1).toLong,
    // one global-aggregate row per packing strategy
    "pack_compare" -> 2L,
    // the model relation is densified to all buckets even with no corpus
    "text_classifier_train" -> graft.pipeline.TextClassifier.Buckets.toLong,
    // recall row: one global-aggregate row (all-NULL metrics on empty)
    "similarity_pq_recall" -> 1L,
    // the multi-class model is densified to the full langs x buckets grid
    "text_classifier_multi" -> (graft.pipeline.TextClassifier.Langs.size.toLong *
      graft.pipeline.TextClassifier.NgramBuckets))

  test("documents-family queries return empty on an empty corpus, never throw") {
    docQueries.foreach { name =>
      val n =
        try SparkEntry.queries(name)(spark, dir).count()
        catch { case e: Throwable => fail(s"$name threw on empty input: $e") }
      assert(n == globalAggRows.getOrElse(name, 0L),
        s"$name returned $n rows on empty input")
      spark.catalog.clearCache()
    }
  }
}
