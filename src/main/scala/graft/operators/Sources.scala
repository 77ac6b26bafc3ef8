package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Scratch, Tables}

/** Source/sink + set-op surface (SURVEY §2.1, §2.7).
  *
  * The reference's batch inputs are CSV-with-inferSchema (S1, q2:38-43),
  * JSON-lines-with-inferSchema (S2, q3:25-29) and raw text (S4,
  * q1_mapper.py:43-46); its sink is a coalesce(1) header CSV (K1, q2:271-275).
  * Each round-trip query below writes the driver parquet through that format
  * and reads it back, so the oracle (plain SQL over the original table)
  * checks format fidelity end-to-end: header handling, type inference, null
  * encoding, line framing.
  *
  * Scale note: the fact-scale round-trips (customer CSV, documents text)
  * write PARTITIONED; coalesce(1) is a presentation-layer choice reserved
  * for the fixed-25-row nation table (K1's single-report-file semantics).
  */
object Sources extends QueryModule {

  // Scratch-rooted (SPARK_GRAFT_SCRATCH): on a cluster the round-trip files
  // must live on a filesystem executors can see, not the driver's /tmp.
  private def tmpDir(prefix: String): String = Scratch.dir(prefix)

  /** S1 + K1: customer → header CSV (overwrite) → read back with inferSchema.
    * Written PARTITIONED (customer is fact-scale at 100×; a coalesce(1) here
    * would funnel the table through one task — the single-file presentation
    * sink is exercised on the fixed-size nation table instead). Doubles
    * survive CSV via Spark's round-trippable default formatting; c_acctbal
    * has ≤2 decimals anyway.
    */
  def csvRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmpDir("graft_csv")
    Tables.customer(spark, sfDir)
      .write.mode("overwrite").option("header", true).csv(dir)
    spark.read.option("header", true).option("inferSchema", true).csv(dir)
      .select(col("c_custkey").cast("long"), col("c_name"),
        col("c_nationkey").cast("int"), col("c_acctbal").cast("double"),
        col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** S2: nation → JSON-lines (multiLine=false) → read back with inference. */
  def jsonRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmpDir("graft_json")
    Tables.nation(spark, sfDir)
      .coalesce(1).write.mode("overwrite").json(dir)
    spark.read.option("multiLine", false).json(dir)
      .select(col("n_nationkey").cast("int"), col("n_name"),
        col("n_regionkey").cast("int"))
      .orderBy("n_nationkey")
  }

  /** S4: documents.text → raw text files → Dataset[String] → tokenize-count.
    * Proves the text-line source feeding the Q1 pipeline. Documents contain no
    * newlines, so one line per doc and the oracle is the direct equivalent.
    */
  def textSourceWordCount(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmpDir("graft_text")
    Tables.documents(spark, sfDir).select("text")
      .write.mode("overwrite").text(dir) // partitioned: documents is fact-scale
    import spark.implicits._
    val lines = spark.read.textFile(dir)
    lines
      .select(explode(expr("regexp_extract_all(lower(value), '[a-z]+', 0)")).as("word"))
      .filter(!col("word").isin(TextStats.stopWords: _*))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(50)
  }

  private val textSourceWordCountSql =
    """WITH tok AS (
         SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
         FROM documents)
       SELECT word, COUNT(*) AS n FROM tok
       WHERE word NOT IN ('the', 'is', 'an', 'a', 'are')
       GROUP BY word ORDER BY n DESC, word LIMIT 50"""

  /** S5-adjacent: supplier → ORC (snappy, partitioned) → read back. ORC is
    * the other columnar format a Hadoop-lineage pipeline inherits (the
    * reference's course stack is Hadoop-first); schema and values must
    * survive the trip bit-for-bit. Statistics-bearing like parquet, so
    * filter pushdown and column pruning work the same way at scale.
    */
  def orcRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmpDir("graft_orc")
    Tables.supplier(spark, sfDir).write.mode("overwrite").orc(dir)
    spark.read.orc(dir)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey")
  }

  /** S7: schema evolution across parquet generations. A long-lived corpus is
    * written by many pipeline versions; later generations grow columns. Two
    * generations land in one directory — even suppkeys without `s_acctbal`
    * (the old writer), odd ones with it — and a `mergeSchema` read unifies
    * them, nulling the missing column. At 100 TB mergeSchema's footer-merge
    * pass is the cost knob (it reads every file's footer up front), which is
    * why it is opt-in here and not a session default.
    */
  def schemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmpDir("graft_evolve")
    val s = Tables.supplier(spark, sfDir)
    s.filter(pmod(col("s_suppkey"), lit(2)) === 0)
      .select("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/gen=1")
    s.filter(pmod(col("s_suppkey"), lit(2)) === 1)
      .select("s_suppkey", "s_name", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/gen=2")
    spark.read.option("mergeSchema", "true").parquet(s"$dir/gen=1", s"$dir/gen=2")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_suppkey")
  }

  /** S8: small-file compaction — the table-maintenance pass every streaming
    * or fine-partitioned 100 TB corpus needs: micro-batches and
    * per-executor writers leave thousands of KB-sized files whose per-file
    * open/footer cost dominates scans. Sizes the output by the directory's
    * ACTUAL bytes (Hadoop FS metadata listing, a driver-side catalog op —
    * not a data collect) over a target file size, then rewrites with that
    * partition count. Content must survive byte-for-byte; CompactionSpec
    * additionally pins the file-count collapse.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    // a lazy scan of inDir while overwriting the same path would destroy the
    // data mid-read; compact-in-place needs a staging dir + swap, not this
    require(new java.io.File(inDir).getCanonicalPath !=
        new java.io.File(outDir).getCanonicalPath,
      s"compact cannot write into its input directory ($inDir)")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).repartition(parts)
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }

  def compactionRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val frag = tmpDir("graft_frag")
    val out = tmpDir("graft_compacted")
    // simulate a micro-batch-fragmented landing zone: 64 tiny files
    Tables.supplier(spark, sfDir).repartition(64)
      .write.mode("overwrite").parquet(frag)
    compact(spark, frag, out)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey")
  }

  /** S9: nation → XML (one `<nation>` element per row; Spark 4's NATIVE
    * XML datasource, no external package) → read back with schema
    * inference. Proves the remaining built-in file format end to end —
    * element-name round-trip, type inference from element text, and the
    * same select-cast-sort normalization discipline as the CSV/JSON/ORC
    * rows (XML infers longs where parquet had ints, and orders columns
    * alphabetically; the projection pins both).
    */
  def xmlRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmpDir("graft_xml")
    Tables.nation(spark, sfDir)
      .coalesce(1).write.mode("overwrite")
      .format("xml").option("rowTag", "nation").save(dir)
    spark.read.format("xml").option("rowTag", "nation").load(dir)
      .select(col("n_nationkey").cast("int"), col("n_name"),
        col("n_regionkey").cast("int"))
      .orderBy("n_nationkey")
  }

  /** S10: SPLITTABLE-compression text ingestion. A gzip text file is one
    * task no matter its size (the stream has no entry points), which is
    * the classic 100 TB ingestion trap; bzip2 is the Hadoop-lineage
    * splittable codec — its 4-byte-block magic gives the reader sync
    * points, so ONE multi-TB `.bz2` file still parallelizes at block
    * grain (why Wikipedia dumps ship .bz2). Documents round-trip as
    * `doc_id<TAB>hex(text)` lines through a REAL pure-Java `BZip2Codec`
    * write (bundled with Hadoop, picked by the `compression` option) and
    * a plain `spark.read.text` back (codec re-picked by extension); the
    * hex framing makes any text line-safe, and the oracle md5s each
    * document straight from the parquet source, so a codec, framing, or
    * split-boundary bug lands as a digest mismatch or a lost row.
    */
  def bz2RoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = tmpDir("graft_bz2")
    Tables.documents(spark, sfDir)
      .select(concat_ws("\t", col("doc_id"),
        hex(col("text").cast("binary"))).as("value"))
      .write.mode("overwrite").option("compression", "bzip2").text(dir)
    // split with an explicit limit: Spark's 2-arg split drops TRAILING empty
    // fields, so an empty document's 'id<TAB>' line would lose its hex field
    // entirely and md5(NULL)/octet_length(NULL) would diverge from the
    // oracle's md5('')/0
    spark.read.text(dir)
      .select(
        expr("cast(split(value, '\t', 2)[0] as bigint)").as("doc_id"),
        expr("md5(unhex(split(value, '\t', 2)[1]))").as("text_md5"),
        expr("octet_length(unhex(split(value, '\t', 2)[1]))").as("n_bytes"))
      .orderBy("doc_id")
  }

  /** §2.7 set operators over compatible projections. */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val fulfilled = o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
    val open = o.filter(col("o_orderstatus") === "O").select("o_custkey").distinct()
    val union = fulfilled.union(open).distinct()
      .withColumn("set_op", lit("union"))
    val intersect = fulfilled.intersect(open)
      .withColumn("set_op", lit("intersect"))
    val except = fulfilled.except(open)
      .withColumn("set_op", lit("except"))
    union.union(intersect).union(except)
      .orderBy("set_op", "o_custkey")
  }

  private val setOpsSql =
    """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
            o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
       SELECT o_custkey, 'union' AS set_op FROM (SELECT * FROM f UNION SELECT * FROM o)
       UNION ALL
       SELECT o_custkey, 'intersect' AS set_op FROM (SELECT * FROM f INTERSECT SELECT * FROM o)
       UNION ALL
       SELECT o_custkey, 'except' AS set_op FROM (SELECT * FROM f EXCEPT SELECT * FROM o)
       ORDER BY set_op, o_custkey"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_csv_roundtrip" -> (csvRoundTrip _),
    "s2_json_roundtrip" -> (jsonRoundTrip _),
    "s4_text_wordcount" -> (textSourceWordCount _),
    "s6_orc_roundtrip" -> (orcRoundTrip _),
    "s7_schema_evolution" -> (schemaEvolution _),
    "s8_compaction_roundtrip" -> (compactionRoundTrip _),
    "s9_xml_roundtrip" -> (xmlRoundTrip _),
    "s10_bz2_roundtrip" -> (bz2RoundTrip _),
    "setops_union_intersect_except" -> (setOps _),
  )

  override def oracle: Map[String, String] = Map(
    "s1_csv_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
         FROM customer ORDER BY c_custkey""",
    "s2_json_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""",
    "s4_text_wordcount" -> textSourceWordCountSql,
    "s6_orc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
         FROM supplier ORDER BY s_suppkey""",
    "s7_schema_evolution" ->
      """SELECT s_suppkey, s_name,
              CASE WHEN s_suppkey % 2 = 1 THEN s_acctbal END AS s_acctbal
         FROM supplier ORDER BY s_suppkey""",
    "s8_compaction_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
         FROM supplier ORDER BY s_suppkey""",
    "s9_xml_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""",
    "s10_bz2_roundtrip" ->
      """SELECT doc_id, md5(text) AS text_md5,
              CAST(octet_length(encode(text)) AS INT) AS n_bytes
         FROM documents ORDER BY doc_id""",
    "setops_union_intersect_except" -> setOpsSql,
  )
}
