package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: PLANS.md's audit claims, executable. If a
  * refactor drops a pushed filter, un-prunes a scan, or loses the top-k
  * window pushdown, these fail — not just the bench.
  */
class PlanAssertionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("prefix-exact candidate join rides the token equi-key with PPJoin residuals, never a cartesian") {
    val plan = graft.pipeline.Dedup.prefixJaccardPairsBuild(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "the prefix self-join must stay keyed on the shared prefix token")
    // the length and positional filters must survive as join residuals —
    // dropping them silently would re-inflate the candidate set 3.3x
    assert(plan.contains("least") && plan.contains("greatest"),
      "PPJoin length filter missing from the candidate join condition")
    assert(plan.contains("div 19") || plan.contains("div (19)") || plan.contains(" 19)"),
      "PPJoin positional filter (overlap-threshold div 19) missing")
  }

  test("q-gram doc matcher: equi-keyed on the gram with residual verify — no cartesian, no per-side re-explode") {
    val plan = graft.operators.FuzzyJoin.qgramDocPairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "the probe-index join must stay keyed on the q-gram")
    assert(plan.contains("lev_within"),
      "the bounded verify must ride the candidate join as a residual")
    // the gram derivation is ONE materialized linear pass; a Generate in
    // the candidate plan would mean a side re-exploded its grams — the
    // door through which a length-quadratic enumeration (the FastSS d=2
    // shape this operator exists to replace) would sneak back in
    assert(!plan.contains("Generate"),
      "candidate stage must read the materialized gram pass, not re-explode")
  }

  test("flagship: cleaning filters reach the parquet scan (pushdown)") {
    val p = planOf("q2_customer_summary")
    assert(p.contains("PushedFilters"))
    assert(p.contains("StringStartsWith(l_returnflag,R)"))
  }

  test("flagship: lineitem scan is column-pruned") {
    val p = planOf("q2_customer_summary")
    // no lineitem scan should read more than the 6 needed columns of 16
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(reads.nonEmpty)
    assert(reads.forall(_.split(",").length <= 6), reads.mkString("\n"))
  }

  test("similarity brute top-k uses two-phase WindowGroupLimit, broadcast query side") {
    // the registered query scans the memoized result; audit the computation
    val p = pipeline.SimilaritySearch.bruteCompute(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"))
  }

  test("incremental dedup probes the bucketed band index without shuffling it") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: at fixture scale the probe side would
      // auto-broadcast, which proves nothing about the index bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = SparkEntry.queries("dedup_incremental")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
      // the (band, band_key) join may shuffle the probe side into the bucket
      // layout, but never the corpus index side: exactly one such exchange
      val exchanges = "Exchange hashpartitioning\\(band".r.findAllIn(plan).size
      assert(exchanges <= 1, s"corpus index side re-shuffled:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }

  test("redundant left join to the unique-keyed dim is eliminated whole") {
    // the semantic-layer view query must not contain ANY join after
    // EliminateRedundantLeftJoin — the dim aggregate is never even built
    val plan = SparkEntry.queries("q2_join_eliminated")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"dead dim join survived:\n$plan")
  }

  test("incremental ANN probe reads the bucketed cell index without shuffling it") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = SparkEntry.queries("similarity_probe_incremental")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"cell index scan not bucketed:\n$plan")
      // the probe side may shuffle into the bucket layout; the index never
      val exchanges = "Exchange hashpartitioning\\(bucket".r.findAllIn(plan).size
      assert(exchanges <= 1, s"cell index side re-shuffled:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }

  test("attribution interval join rides the user_id equi-key, never a cartesian") {
    val p = planOf("events_attribution")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval join lost its equi-key:\n$p")
  }

  test("enrichment join prunes the dim scan to its two columns") {
    val p = planOf("events_enriched")
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq
    // the customer scan must read only (c_custkey, c_mktsegment)
    assert(reads.exists(r => r.contains("c_custkey") && r.split(",").length == 2),
      reads.mkString("\n"))
  }

  test("IVF top-k keeps the two-phase WindowGroupLimit and broadcast query side") {
    val p = planOf("similarity_topk_ivf")
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("BroadcastExchange"))
  }

  private def executed(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("perplexity flag cut is distributed: every window is partitioned") {
    // the rank decomposition (bucket histogram + per-bucket row_number)
    // must never fall back to a global single-partition window — the
    // operator's 100 TB story (TextAnalysis.perplexityFilterOf scaladoc)
    val plan = SparkEntry.queries("text_perplexity_filter")(spark, sf)
      .queryExecution.executedPlan
    val unpartitioned = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      s"single-partition window in the perplexity plan:\n$plan")
  }

  test("dsir selection cut is distributed: every window is partitioned") {
    // same histRankDesc decomposition as the perplexity pin — the DSIR
    // rank/selection must also never fall back to a global window
    val plan = SparkEntry.queries("train_dsir_weights")(spark, sf)
      .queryExecution.executedPlan
    val unpartitioned = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      s"single-partition window in the dsir plan:\n$plan")
  }

  test("decontaminated split consumes gate tables as scans, not recomputed explodes") {
    // contamination + exact-dup gates arrive from the memoized scratch
    // parquet their standalone queries own — a Generate (shingle explode)
    // in THIS plan means the repeated-subtree disease is back
    val plan = SparkEntry.queries("train_decontaminated_split")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"gate subtree recomputed inline:\n$plan")
  }

  test("repetition grams stay codegen'd: no interpreted lambda anywhere") {
    val p = executed("text_repetition")
    assert(!p.contains("lambdafunction"), s"HOF crept back in:\n$p")
    // the scan reads only (doc_id, text)
    assert("ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p)
      .forall(_.group(1).split(",").length <= 2), p)
  }

  test("contamination broadcasts the benchmark set; corpus text never hash-shuffles") {
    // the registered query scans the memoized gate table; audit the
    // computation the memo pays (the bruteCompute precedent)
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val p = pipeline.CorpusQc.contaminationOf(
        docs.filter(col("doc_id") % pipeline.CorpusQc.BenchMod =!= 0),
        pipeline.CorpusQc.benchShingles(spark, sf))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the only hash exchange is the post-join per-doc count — the corpus
    // side reaches the join map-side
    val hashEx = "Exchange hashpartitioning\\(doc_id".r.findAllIn(p).size
    assert(hashEx == 1, s"corpus side shuffled before the broadcast join:\n$p")
  }

  test("packing's bin aggregate reuses the shard window exchange") {
    val p = executed("pack_sequences")
    // one exchange to shard-partition the window; the (shard, bin) aggregate
    // is satisfied by it (shard ⊆ keys) — no second hash exchange
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"bin aggregate re-shuffled:\n$p")
  }

  test("stable split is map-only up to its bounded aggregate") {
    val p = executed("text_stable_split")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("tf-idf and count-min tokenize the corpus once: no Generate in the final plan") {
    // both consume a scratch-materialized count table; a Generate (explode)
    // reappearing means a consumer re-derived the token stream from text
    for (name <- Seq("text_tfidf_keywords", "text_heavy_hitters_cms")) {
      val p = planOf(name)
      assert(!p.contains("Generate"), s"$name re-tokenizes the corpus:\n$p")
    }
  }

  test("trailing range-frame window shuffles once and evaluates as ONE Window") {
    val p = executed("q2_trailing_revenue")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    // count and sum share the frame; a second Window node means the ordering
    // expression diverged into distinct attributes and re-sorts the partition
    assert("Window ".r.findAllIn(p).size == 1, p)
  }

  test("q5 star join: date filter pushed to the orders scan, dims broadcast, one agg shuffle") {
    val p = executed("q5_region_revenue")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), s"date filter not pushed:\n$p")
    assert(p.contains("EqualTo(r_name,ASIA)"), s"region filter not pushed:\n$p")
    // every dim side must come in as a broadcast hash join at this scale
    assert("BroadcastHashJoin".r.findAllIn(p).size == 5, s"expected 5 broadcast joins:\n$p")
    // the only hash exchange is the final n_name aggregate (fact⋈orders is
    // broadcast at fixture scale; at 100 TB AQE flips it to sort-merge)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"extra shuffle:\n$p")
  }

  test("corr matrix is ONE partial+final aggregation pass over a pruned scan") {
    val p = executed("lineitem_corr_matrix")
    // a single 1-row reduce: exactly one SinglePartition exchange, no Expand
    // (nothing here count-distincts), scan pruned to the four measures
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1, s"moment pass not single:\n$p")
    assert(!p.contains("Expand"), s"unexpected Expand:\n$p")
    val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(reads.nonEmpty && reads.forall(_.split(",").length <= 4), reads.mkString("\n"))
  }

  test("top-k unshipped revenue runs as TakeOrderedAndProject, never a global sort") {
    val p = executed("topk_unshipped_revenue")
    assert(p.contains("TakeOrderedAndProject"), s"top-k lost its heap operator:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"global sort crept in:\n$p")
  }

  test("rolling actives never sort the event stream with a window function") {
    val p = executed("events_rolling_active_users")
    assert(!p.contains("Window"), s"window-function formulation crept in:\n$p")
    assert(p.contains("Generate explode"), s"cover fan-out missing:\n$p")
  }

  test("source report: map-only features, one source shuffle (plus bounded lang Expand)") {
    val p = executed("corpus_source_report")
    // exchanges: the (source[, lang]) aggregate pair from count-distinct and
    // the presentation sort — but never TWO independent scans of documents
    assert("FileScan parquet".r.findAllIn(p).size == 1, s"documents scanned twice:\n$p")
  }

  test("abc classification: every window is partition-local, no global-order window") {
    val p = executed("parts_abc_classification")
    val specs = "windowspecdefinition\\(([^)]*)\\)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"expected the per-partition running sum window:\n$p")
    // a spec NOT led by the pid partition key is the single-task global
    // cumulative creeping back
    assert(specs.forall(_.contains("pid")), s"global window crept back:\n$specs")
  }

  test("vocab coverage: windows are partition-local, one corpus-scale aggregate") {
    val p = executed("text_vocab_coverage")
    val specs = "windowspecdefinition\\(([^)]*)\\)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"expected the per-partition prefix-sum windows:\n$p")
    assert(specs.forall(_.contains("pid")), s"global window crept back:\n$specs")
    // the type-grain offsets/grand-total joins must broadcast, never shuffle
    // the ranked vocab table again
    assert(!p.contains("SortMergeJoin"), s"type-grain join fell to SMJ:\n$p")
  }

  test("pagerank: bucketed edge table, zero exchanges on the edge side") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force sort-merge joins: at fixture scale the rank table would
      // broadcast, which also avoids edge exchanges but proves nothing
      // about the bucket layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = SparkEntry.queries("graph_pagerank")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"edge scan not bucketed:\n$plan")
      // every contribution join and the node distinct must be satisfied by
      // the bucket partitioning: no u-exchange anywhere in the plan
      assert("Exchange hashpartitioning\\(u#".r.findAllIn(plan).isEmpty,
        s"edge side re-shuffled:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }

  test("cdc upsert: bucketed state table, zero exchanges on the state side") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: at fixture scale the batch side would
      // auto-broadcast, which proves nothing about the state-table layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = SparkEntry.queries("orders_cdc_upsert")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"state scan not bucketed:\n$plan")
      // the merge join may shuffle the batch side into the bucket layout,
      // but never the persisted state side: at most one key exchange
      val exchanges = "Exchange hashpartitioning\\(o_orderkey".r.findAllIn(plan).size
      assert(exchanges <= 1, s"state side re-shuffled:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }

  test("kmv profile: one aggregation pass, no Expand") {
    val p = executed("profile_orders_kmv")
    assert(!p.contains("Expand"), s"exact-distinct Expand crept back:\n$p")
    // single global reduce: exactly one SinglePartition exchange
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1, s"extra shuffle:\n$p")
  }

  test("dpp: month-partitioned fact scan is pruned by a DynamicPruningExpression") {
    val df = SparkEntry.queries("dpp_monthly_revenue")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the dim's year filter must reach the fact as a runtime partition filter
    assert(p.contains("dynamicpruningexpression"),
      s"fact scan not dynamically pruned:\n$p")
    // and it must land in PartitionFilters (directory pruning), not a row filter
    assert("PartitionFilters: \\[[^\\]]*dynamicpruning".r.findFirstIn(p).isDefined,
      s"dynamic filter did not land on the partition columns:\n$p")
    // pruning is real: the executed fact scan reads 12 of ~80 month partitions
    df.collect()
    def scansOf(n: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = n match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansOf(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.partitionSchema.fieldNames.contains("o_month") => Seq(s)
      case other => other.children.flatMap(scansOf)
    }
    val scans = scansOf(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, s"no partitioned fact scan found:\n$p")
    val partsRead = scans.head.metrics("numPartitions").value
    // expected partitions = the dim months the year filter selects — derived,
    // not hardcoded, so a regenerated fixture with a missing month still pins
    // that pruning happened (partsRead well below the full month domain)
    val dim = graft.operators.Layout.monthDim(spark, sf)
    val expected = dim.filter(
      org.apache.spark.sql.functions.col("m_year") === graft.operators.Layout.DppYear).count()
    val total = dim.count()
    assert(partsRead == expected,
      s"expected $expected surviving o_month partitions, got $partsRead")
    assert(partsRead < total / 2,
      s"pruning too weak to prove anything: $partsRead of $total partitions read")
  }

  test("two-level dpp: BOTH month-partitioned facts pruned by dynamic partition filters") {
    val df = SparkEntry.queries("dpp_lineitem_revenue")(spark, sf)
    df.collect()
    def scansOf(n: org.apache.spark.sql.execution.SparkPlan, partCol: String)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = n match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.executedPlan, partCol)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansOf(q.plan, partCol)
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.partitionSchema.fieldNames.contains(partCol) => Seq(s)
      case other => other.children.flatMap(n => scansOf(n, partCol))
    }
    val dim = graft.operators.Layout.monthDim(spark, sf)
    val expected = dim.filter(
      org.apache.spark.sql.functions.col("m_year") === graft.operators.Layout.DppYear).count()
    for (partCol <- Seq("l_month", "o_month")) {
      val scans = scansOf(df.queryExecution.executedPlan, partCol)
      assert(scans.nonEmpty, s"no $partCol-partitioned fact scan found")
      val p = scans.head.toString
      assert(p.contains("dynamicpruningexpression") &&
        "PartitionFilters: \\[[^\\]]*dynamicpruning".r.findFirstIn(p).isDefined,
        s"$partCol fact scan not dynamically pruned:\n$p")
      val partsRead = scans.head.metrics("numPartitions").value
      assert(partsRead == expected,
        s"expected $expected surviving $partCol partitions, got $partsRead")
    }
  }

  test("curated manifest composes from memoized stages: zero raw-text scans in its plan") {
    // the registered pipeline query must consume only memoized scratch
    // tables and broadcasts — never re-scan the corpus text itself
    val p = planOf("corpus_curated_manifest")
    assert(!p.contains("documents.parquet"),
      s"composed pipeline re-scans the raw corpus:\n$p")
    // and the feature stage that feeds it is ONE map-only corpus scan
    val compute = pipeline.CurationPipeline.featuresCompute(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(compute).size == 1,
      s"feature stage scans more than once:\n$compute")
    assert(!compute.contains("Exchange"), s"feature stage shuffles:\n$compute")
  }

  test("real decode (image, audio, video) is map-only: one range Exchange for the sort, no joins") {
    for (q <- Seq("mm_real_decode", "mm_real_audio", "mm_real_frames",
      "mm_real_decode16", "mm_real_gray", "mm_real_audio16", "mm_real_audio_deep",
      "mm_real_chroma", "mm_real_chroma422", "mm_real_bmp", "mm_real_png",
      "mm_real_jpeg", "mm_real_thumbnail")) {
      val p = planOf(q)
      assert(p.contains("MapPartitions"), s"$q: typed decode batcher missing from plan")
      val exchanges = "Exchange (\\w+)".r.findAllMatchIn(p).map(_.group(1)).toSeq
      assert(exchanges.forall(_.startsWith("rangepartitioning")),
        s"$q: decode path shuffles beyond the final sort: $exchanges\n$p")
      assert(!p.contains("Join"), s"$q: decode path joins:\n$p")
    }
  }

  test("real-pixel ahash dedup consumes the signature memo, never raw text") {
    val p = planOf("mm_real_ahash_dedup")
    assert(!p.contains("documents.parquet"),
      s"blocking stage re-scans the corpus text:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"chunk blocking lost its equi-join:\n$p")
  }

  test("d=2 radius profile reads the memoized pair set, not the key explosion") {
    val p = planOf("fuzzy_radius_profile")
    assert(!p.contains("Generate"),
      s"profile re-explodes the deletion neighborhood instead of reading the memo:\n$p")
    assert(!p.contains("customer.parquet"),
      s"profile re-scans the base table:\n$p")
  }

  test("html/cleaning/tar/gif fixture rows are map-only: no hash shuffle, scan to sort") {
    // each builds per-row fixtures and extracts/decodes in the same
    // projection — the only Exchange allowed is the final sort's range
    // partitioning; a hashpartitioning would mean an accidental shuffle
    for (name <- Seq("html_text_extract", "text_c4_filter", "text_pii_redact",
        "tar_ingest", "mm_real_gif", "mm_real_jpeg", "zip_ingest", "zip64_ingest",
        "zstd_ingest", "mm_real_exif",
        "mm_real_jpeg_prog", "mm_real_png_adam7", "mm_real_pbm", "mm_real_adpcm",
        "mm_real_g711", "docs_zstd_roundtrip")) {
      val p = planOf(name)
      assert(!p.contains("Exchange hashpartitioning"), s"$name hash-shuffles:\n$p")
    }
  }

  test("html extraction chain stays codegen'd: no interpreted lambda, pruned scan") {
    val p = executed("html_text_extract")
    assert(!p.contains("Generate"), "extraction must not explode")
    // the regexp_replace/replace chain is plain expressions — a
    // lambdafunction here would mean an interpreted HOF crept in
    assert(!p.contains("lambdafunction"), s"HOF in the extraction chain:\n$p")
    assert("ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p)
      .forall(_.group(1).split(",").length <= 2), p)
  }

  test("zstd ingest has no typed boundary: build, inflate, and summarize in one projection") {
    // the whole point of zstd_inflate as an Expression (vs a mapPartitions
    // decode) is that the frame build and the native inflate live in the
    // SAME projection over the scan — a Deserialize/Serialize pair here
    // would mean the decompress fell off the codegen path
    val p = planOf("zstd_ingest")
    assert(!p.contains("DeserializeToObject") && !p.contains("SerializeFromObject"),
      s"zstd_ingest crossed a typed boundary:\n$p")
    assert(p.contains("zstd_inflate"), s"native expression missing from the plan:\n$p")
  }

  test("jsonl ingest: build, inflate, line-split, and from_json in one declarative plan") {
    // the whole batch front door is plan-resident: codec dispatch + line
    // posexplode + JSON parse with no typed boundary, and the only
    // Exchange is the output sort's range partitioning — at 100 TB the
    // landing path is file-parallel map work, never a shuffle
    val p = planOf("jsonl_ingest")
    assert(!p.contains("DeserializeToObject") && !p.contains("SerializeFromObject"),
      s"jsonl_ingest crossed a typed boundary:\n$p")
    assert(!p.contains("Exchange hashpartitioning"), s"jsonl_ingest hash-shuffles:\n$p")
    assert(p.contains("from_json"), s"declared-schema JSON parse missing:\n$p")
    assert(p.contains("lz4_inflate") && p.contains("zstd_inflate") && p.contains("gunzip"),
      s"codec dispatch legs missing from the plan:\n$p")
  }

  test("pdf text extract: map-only until the output sort, both codec legs in one scan pass") {
    // the fixture build + the task-side page walk are per-document map
    // work; the only Exchange is the output sort's range partitioning —
    // at 100 TB the PDF landing path is file-parallel, never a shuffle
    val p = planOf("pdf_text_extract")
    assert(!p.contains("Exchange hashpartitioning"), s"pdf_text_extract hash-shuffles:\n$p")
    assert(p.contains("Union"), s"raw + flate legs must union, not re-scan twice joined:\n$p")
  }

  test("pdf xref-stream extract: map-only until the output sort, both layout legs union") {
    // same contract as pdf_text_extract — the compressed-layout walk
    // (xref stream + ObjStm) is still per-document map work
    val p = planOf("pdf_xref_stream_extract")
    assert(!p.contains("Exchange hashpartitioning"), s"pdf_xref_stream_extract hash-shuffles:\n$p")
    assert(p.contains("Union"), s"xrefstm + objstm legs must union, not re-scan twice joined:\n$p")
  }

  test("pdf info extract: one map-only leg, no hash exchange before the output sort") {
    val p = planOf("pdf_info_extract")
    assert(!p.contains("Exchange hashpartitioning"), s"pdf_info_extract hash-shuffles:\n$p")
  }

  test("pdf links extract: one map-only leg, no hash exchange before the output sort") {
    val p = planOf("pdf_links_extract")
    assert(!p.contains("Exchange hashpartitioning"), s"pdf_links_extract hash-shuffles:\n$p")
  }

  test("pdf filter-chain extract: map-only until the output sort, ahx + a85 legs union") {
    // the SQL base-85/hex armoring and the task-side chain fold are
    // per-document map work — same contract as pdf_text_extract
    val p = planOf("pdf_filter_chain_extract")
    assert(!p.contains("Exchange hashpartitioning"), s"pdf_filter_chain_extract hash-shuffles:\n$p")
    assert(p.contains("Union"), s"ahx + a85flate legs must union, not re-scan twice joined:\n$p")
  }

  test("oriented ahash: four fixture legs union map-only, no hash exchange") {
    val p = planOf("mm_ahash_oriented")
    assert(!p.contains("Exchange hashpartitioning"), s"mm_ahash_oriented hash-shuffles:\n$p")
    assert(p.contains("Union"), s"the four orientation legs must union:\n$p")
  }

  test("sitemap coverage: declared-schema XML parse, equi-joins only (no cartesian)") {
    val p = planOf("sitemap_coverage")
    assert(p.contains("from_xml"), s"native XML parse missing from the plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"sitemap joins must stay keyed (url / (regdom, loc)):\n$p")
  }

  test("hll registers combine map-side: partial_max under the bucket exchange") {
    val p = planOf("sketch_hll_distinct")
    assert(p.contains("partial_max") || p.contains("partial max"),
      s"register max must map-side combine (256-value state per partition):\n$p")
  }

  test("host caps: two-phase WindowGroupLimit and broadcast anti-join for the blocklist") {
    val p = planOf("html_host_caps")
    assert(p.contains("WindowGroupLimit"),
      s"per-domain cap must be the partial/final group-limit shape, not a full window sort:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the fixed blocklist must broadcast, never shuffle the crawl side:\n$p")
    assert(p.contains("LeftAnti"), s"blocklist exclusion must be an anti-join:\n$p")
  }

  test("entropy/compress quality signals are map-only projections over one scan") {
    Seq("text_entropy_quality", "text_compress_ratio").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("HashAggregate"), s"$q must not aggregate per byte:\n$p")
      assert(!p.contains("Generate"), s"$q must not explode per byte:\n$p")
      // exactly one exchange: the final orderBy's range partitioning
      // (formatted explain names each node once in the detail section)
      assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 1,
        s"$q has extra shuffles:\n$p")
      spark.catalog.clearCache()
    }
  }

  test("line dedup: first-occurrence reduction combines map-side, one line-grain exchange") {
    val p = planOf("text_line_dedup")
    // partial_min under the line exchange = the survivors ARE the group
    // aggregates; without it every line row crosses the wire
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"line dedup must map-side combine the min(k) reduction:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"line dedup must not join the full line set back:\n$p")
  }

  test("robots filter and mojibake repair stay map-only on the corpus side") {
    val robots = planOf("html_robots_filter")
    assert(robots.contains("LeftAnti") && robots.contains("BroadcastExchange"),
      s"robots rules must broadcast-anti, never shuffle the crawl:\n$robots")
    assert(!robots.contains("SortMergeJoin"), s"robots rules shuffled the crawl:\n$robots")
    val moji = planOf("text_mojibake_repair")
    assert(!moji.contains("Join") && !moji.contains("HashAggregate") &&
      "\\(\\d+\\) Exchange".r.findAllIn(moji).size == 1,
      s"mojibake repair must be a map-only projection + one sort exchange:\n$moji")
    spark.catalog.clearCache()
  }

  test("domain scorecard: ONE corpus scan, zero doc-grain joins, one domain-grain exchange") {
    val p = planOf("html_domain_scorecard")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
      s"every per-doc signal must ride one scan:\n$p")
    assert(p.contains("LeftAnti"), s"blocklist must be an anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"scorecard must not join per-doc frames (columns, not joins):\n$p")
  }

  test("robots PARSER output broadcasts into the page decision; main content stays map-only") {
    // the parsed rule table is domain-grain: it may shuffle internally
    // (windows over dimension-sized robots payloads), but its join INTO the
    // page corpus must broadcast — the crawl side never exchanges for it
    val robots = planOf("html_robots_parsed")
    assert(robots.contains("BroadcastExchange"),
      s"parsed rules must broadcast into the page side:\n$robots")
    assert(!robots.contains("SortMergeJoin"),
      s"the page corpus shuffled for the rules join:\n$robots")
    Seq("html_main_content", "text_gopher_filter", "text_pii_luhn").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("Join") && !p.contains("HashAggregate") &&
        "\\(\\d+\\) Exchange".r.findAllIn(p).size == 1,
        s"$q must be a map-only projection + one sort exchange:\n$p")
    }
    spark.catalog.clearCache()
  }

  test("repetition and code-quality screens are map-only projections over one scan") {
    // every metric is a per-document array computation (let-bound lambda
    // intermediates, no helper columns to re-derive): no join, no explode,
    // no per-gram aggregate — one exchange for the output orderBy
    Seq("text_gopher_repetition", "code_quality_filter").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("Join") && !p.contains("HashAggregate") &&
        !p.contains("Generate") &&
        "\\(\\d+\\) Exchange".r.findAllIn(p).size == 1,
        s"$q must be a map-only projection + one sort exchange:\n$p")
      spark.catalog.clearCache()
    }
  }

  test("PQ search: ADC scans codes with broadcast query tables, two-phase shortlist, no corpus SMJ") {
    // the registered queries scan the memo; audit the computation
    val p = pipeline.PqSearch.pqRankedCompute(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastExchange"),
      s"query tables and the re-rank query side must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"the ADC shortlist must run as partial/final group-limit, not a full sort:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the ADC fan-out must be the broadcast nested-loop of 20 query rows:\n$p")
    spark.catalog.clearCache()
  }

  test("classifier: training is one bucket-grain aggregate, scoring broadcasts the model") {
    val train = pipeline.TextClassifier.weightsCompute(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!train.contains("SortMergeJoin"),
      s"the 64-row densify join must broadcast, never shuffle the sums:\n$train")
    val score = planOf("text_classifier_score")
    assert(score.contains("BroadcastExchange"),
      s"the model and its scalar stats must broadcast into the feature scan:\n$score")
    assert(!score.contains("SortMergeJoin"),
      s"scoring must not shuffle the corpus for the model join:\n$score")
    spark.catalog.clearCache()
  }

  test("multi-class classifier: model and stats broadcast, corpus never shuffles for the join") {
    val score = planOf("text_langid_learned")
    assert(score.contains("BroadcastExchange"),
      s"the 5x256 model and its 1-row stats must broadcast:\n$score")
    assert(!score.contains("SortMergeJoin"),
      s"scoring must not shuffle the corpus for the model join:\n$score")
    spark.catalog.clearCache()
  }

  test("bloom decontamination prescreens map-side and verifies on a merge join") {
    val p = planOf("train_bloom_decontaminate")
    assert(p.contains("might_contain"),
      s"the corpus shingle stream must be bloom-prescreened before any shuffle:\n$p")
    assert(p.contains("SortMergeJoin"),
      s"the exact verify must stay the too-big-to-broadcast merge join:\n$p")
    spark.catalog.clearCache()
  }

  test("cluster sample runs as two-phase WindowGroupLimit over the trained-cell memo") {
    val p = planOf("emb_cluster_sample")
    assert(p.contains("WindowGroupLimit"),
      s"the per-cell quota must be partial/final group-limit, not a full sort:\n$p")
    spark.catalog.clearCache()
  }

  test("no registered query collects to the driver in its plan") {
    // CollectLimit appears only for show()-style paths; registered queries
    // must sort/aggregate distributively
    SparkEntry.queries.keys.foreach { name =>
      val p = planOf(name)
      assert(!p.contains("CollectLimit"), s"$name collects to driver")
      spark.catalog.clearCache()
    }
  }
}
