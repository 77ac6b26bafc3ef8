package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Schema-driven data profiling: per-column null counts, exact distinct
  * counts, and lexicographic min/max (values rendered as strings so one
  * result schema fits every column type) — the first query a pipeline runs
  * against an unfamiliar table, generated from `df.schema` so it works on
  * ANY table without per-table code.
  *
  * Reference scope: the reference eyeballs `printSchema`/`show` per script
  * (q3_json_processing.py:30-40); a reusable profiling operator is the
  * production replacement.
  *
  * Shape: ONE aggregation pass emits all 4·n_cols metrics; the `stack`
  * generator unpivots the single wide row into one row per column. The
  * exact per-column COUNT(DISTINCT) forces Catalyst's Expand (input rows ×
  * n_cols before the shuffle) — the deliberate exact/oracle-checkable
  * form. At 100 TB swap `count_distinct` for `approx_count_distinct`
  * (HLL): same single pass, NO Expand, ~2% error — the documented
  * production knob, same operator otherwise.
  *
  * Min/max compare AFTER the string cast (lexicographic), so the metric is
  * type-agnostic and engine-identical; numeric extremes belong to a
  * numeric query, not a profile.
  */
object Profiling extends QueryModule {

  /** Profile any DataFrame: one row per column. Unordered. */
  def profileOf(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    // TWO single-row aggregates, not one: mixing DISTINCT and plain
    // aggregates in one agg makes Catalyst's distinct rewrite drag every
    // plain aggregate's input (here: 2 string casts + a null flag per
    // column) through EVERY Expand replica — n_cols+1 copies of each row
    // with the wide string columns attached (measured 3.6 s warm on the
    // 150k-row orders table where the two split aggregates take
    // 1.2 + 0.7 s). Split, the Expand carries only the narrow distinct
    // keys and the plain pass stays a plain single scan; the cross join
    // below is 1 row x 1 row (the documented broadcast-stats-side shape).
    val distincts = df.agg(
      countDistinct(col(cols.head)).as(s"${cols.head}__distinct"),
      cols.tail.map(c => countDistinct(col(c)).as(s"${c}__distinct")): _*)
    val plainAggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max"))
    }
    val plain = df.agg(plainAggs.head, plainAggs.tail: _*)
    val wide = plain.crossJoin(distincts)
    val stacked = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stacked) AS (column_name, n_nulls, n_distinct, min_value, max_value)")
  }

  def profileOrders(spark: SparkSession, sfDir: String): DataFrame =
    profileOf(Tables.orders(spark, sfDir)).orderBy("column_name")

  /** The synthetic orders schema spelled out (the oracle cannot reflect). */
  private val OrdersCols = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  private def profileSqlFor(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS column_name,
                 CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                 COUNT(DISTINCT $c) AS n_distinct,
                 MIN(CAST($c AS VARCHAR)) AS min_value,
                 MAX(CAST($c AS VARCHAR)) AS max_value
          FROM $table"""
    }.mkString("", " UNION ALL ", " ORDER BY column_name")

  private val profileOrdersSql = profileSqlFor("orders", OrdersCols)

  /** `profile_documents`: the same one-pass profile over the corpus table —
    * the first look a curator takes at a new documents drop (null text?
    * lang/source cardinalities? id range?). Same plan shape as
    * `profile_orders`; the string min/max on `text` is byte-wise in both
    * engines over the ASCII corpus.
    */
  def profileDocuments(spark: SparkSession, sfDir: String): DataFrame =
    profileOf(Tables.documents(spark, sfDir)).orderBy("column_name")

  private val DocumentsCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private val profileDocumentsSql = profileSqlFor("documents", DocumentsCols)

  /** `profile_embeddings`: the third table-agnostic instantiation of the
    * one-pass profile — the scalar columns of the vector drop (the opaque
    * embedding payload is profiled by the quantization/covariance family,
    * not by min/max strings).
    */
  def profileEmbeddings(spark: SparkSession, sfDir: String): DataFrame =
    profileOf(Tables.embeddings(spark, sfDir).select("vec_id", "label"))
      .orderBy("column_name")

  private val profileEmbeddingsSql =
    profileSqlFor("embeddings", Seq("vec_id", "label"))

  /** [[profileOf]] with BOUNDED-state distinct counts — the 100 TB form.
    * The exact profile's per-column COUNT(DISTINCT) forces Catalyst's
    * Expand (input rows × n_cols before the shuffle); this variant
    * estimates each column's cardinality with the deterministic KMV
    * sketch ([[graft.functions.KmvSketchAgg]]) over the same md5-derived
    * 60-bit hashes the dedup family uses: ONE aggregation pass, NO
    * Expand, ≤K longs of state per column regardless of input size.
    * KMV is a pure set function (the K smallest distinct hashes), so the
    * estimate is bit-reproducible in the DuckDB oracle — unlike HLL,
    * whose register layout is engine-private. Exact when a column has
    * fewer than K distinct hashes; ~1/√(K−2) relative error above.
    */
  def profileKmvOf(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        expr(s"kmv_distinct(${graft.pipeline.Dedup.hash60(s"CAST($c AS STRING)")})")
          .as(s"${c}__kmv"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__kmv, ${c}__min, ${c}__max").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stacked) AS (column_name, n_nulls, n_distinct_kmv, min_value, max_value)")
  }

  def profileOrdersKmv(spark: SparkSession, sfDir: String): DataFrame =
    // fanOut: the partial-aggregate phase md5-hashes every column of every
    // row (9 × kmv hash60) and a single-row-group scan runs it on ONE
    // task — fan the narrow input out first (conditional: a multi-split
    // production scan inserts nothing). r18: 1.8 s → see OPTIMIZATION_r18.md.
    profileKmvOf(graft.Scratch.fanOut(Tables.orders(spark, sfDir)))
      .orderBy("column_name")

  private val profileOrdersKmvSql = {
    val k = graft.functions.KmvSketch.K
    OrdersCols.map { c =>
      val h = graft.pipeline.Dedup.hash60Duck(s"CAST($c AS VARCHAR)")
      s"""SELECT '$c' AS column_name, b.n_nulls, ks.n_distinct_kmv, b.min_value, b.max_value
          FROM (SELECT CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                       MIN(CAST($c AS VARCHAR)) AS min_value,
                       MAX(CAST($c AS VARCHAR)) AS max_value
                FROM orders) b
          CROSS JOIN (
            SELECT CASE WHEN COUNT(*) < $k THEN CAST(COUNT(*) AS DOUBLE)
                        ELSE ${k - 1}.0 * 1152921504606846976.0
                             / MAX(CASE WHEN rn = $k THEN h END) END AS n_distinct_kmv
            FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
                  FROM (SELECT DISTINCT $h AS h FROM orders WHERE $c IS NOT NULL) hh) r
          ) ks"""
    }.mkString("", " UNION ALL ", " ORDER BY column_name")
  }

  /** `orders_chisq_independence`: the χ² independence statistic of a
    * contingency table (o_orderstatus × o_orderpriority) — the standard
    * drift / association check a data-quality pipeline runs between two
    * categorical columns.
    *
    * All inputs are exact longs: observed cell counts (zero cells included
    * via the distinct×distinct spine — they legitimately contribute to the
    * statistic), row/column/grand totals via windows over the cells-sized
    * table. `expected = row·col/N` and each `(o−e)²/e` term are
    * fixed-shape double expressions; the final sum is the sorted left-fold
    * (the mix_weights pattern) so the statistic is bit-identical to the
    * oracle. The corpus pays one counting shuffle; everything after runs
    * on `|statuses|·|priorities|` rows.
    */
  def chisqIndependence(spark: SparkSession, sfDir: String): DataFrame =
    chisqOf(Tables.orders(spark, sfDir), "o_orderstatus", "o_orderpriority")

  /** χ² core over any frame and categorical column pair. */
  def chisqOf(o: DataFrame, cs: String, cp: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = o.groupBy(col(cs).as("s"), col(cp).as("p"))
      .agg(count(lit(1)).as("n"))
    val cells = o.select(col(cs).as("s")).distinct()
      .crossJoin(o.select(col(cp).as("p")).distinct())
      .join(counts, Seq("s", "p"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val terms = cells
      .withColumn("rt", sum("n").over(Window.partitionBy("s")))
      .withColumn("ct", sum("n").over(Window.partitionBy("p")))
      .withColumn("tot", sum("n").over(Window.partitionBy()))
      .withColumn("e", col("rt").cast("double") * col("ct") / col("tot"))
      .withColumn("term",
        (col("n").cast("double") - col("e")) * (col("n").cast("double") - col("e")) / col("e"))
    terms.agg(
      count(lit(1)).as("n_cells"),
      ((countDistinct("s") - 1) * (countDistinct("p") - 1)).as("dof"),
      expr("sorted_sum(term)").as("chisq")) // deterministic fold, production agg form (functions.SortedSumAgg)
  }

  private val chisqIndependenceSql =
    """WITH c AS (
         SELECT o_orderstatus AS s, o_orderpriority AS p, COUNT(*) AS n
         FROM orders GROUP BY 1, 2
       ), cells AS (
         SELECT ds.s, dp.p, COALESCE(c.n, 0) AS n
         FROM (SELECT DISTINCT o_orderstatus AS s FROM orders) ds
         CROSS JOIN (SELECT DISTINCT o_orderpriority AS p FROM orders) dp
         LEFT JOIN c ON c.s = ds.s AND c.p = dp.p
       ), t AS (
         SELECT s, p, n,
                CAST(SUM(n) OVER (PARTITION BY s) AS BIGINT) AS rt,
                CAST(SUM(n) OVER (PARTITION BY p) AS BIGINT) AS ct,
                CAST(SUM(n) OVER () AS BIGINT) AS tot
         FROM cells
       ), terms AS (
         SELECT s, p,
                (CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * ct / tot)
                  * (CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * ct / tot)
                  / (CAST(rt AS DOUBLE) * ct / tot) AS term
         FROM t
       )
       SELECT (SELECT COUNT(*) FROM terms) AS n_cells,
              (SELECT (COUNT(DISTINCT s) - 1) * (COUNT(DISTINCT p) - 1) FROM cells) AS dof,
              list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(term))),
                          (a, x) -> a + x) AS chisq
       FROM terms"""

  /** Numeric lineitem columns profiled by [[corrMatrix]], with their exact
    * integer encodings (×100 kills the two-decimal float representation, so
    * every moment below is an EXACT integer sum — the whole reason the
    * statistic can be oracle-hash-checked across engines).
    */
  private val CorrVars: Seq[(String, String)] = Seq(
    "l_quantity" -> "q", "l_extendedprice" -> "e",
    "l_discount" -> "d", "l_tax" -> "t")

  private val CorrPairs: Seq[((String, String), (String, String))] =
    for { i <- 0 until CorrVars.length; j <- i + 1 until CorrVars.length }
      yield (CorrVars(i), CorrVars(j))

  /** Exact-integer → double, LIMB-EXACT: once a moment sum exceeds 2⁵³ the
    * engines' native conversions stop agreeing (Spark's DECIMAL→DOUBLE and
    * DuckDB's HUGEINT→DOUBLE round the same integer to DIFFERENT nearest
    * doubles in the last ulp — observed at sf0.1, where Sxx ≈ 3·10¹⁹).
    * Splitting into three 42-bit limbs makes every CAST exact (each limb
    * < 2⁴², and the 2⁴²/2⁸⁴ scalings are powers of two, so the products
    * are exact too); the only rounding left is the final two IEEE
    * additions, identical in both engines. Valid for any x < 2¹²⁶ — i.e.
    * every value a DECIMAL(38) moment can hold. Requires x ≥ 0 (the
    * caller factors the sign out first).
    */
  private val LimbB = "4398046511104"               // 2^42
  private val LimbB2 = "19342813113834066795298816" // 2^84

  private def hlSpark(x: String): String =
    s"""(CAST((($x) - (($x) % $LimbB2)) / $LimbB2 AS DOUBLE) * CAST($LimbB2 AS DOUBLE)
        + CAST(((($x) % $LimbB2) - (($x) % $LimbB)) / $LimbB AS DOUBLE) * CAST($LimbB AS DOUBLE)
        + CAST(($x) % $LimbB AS DOUBLE))"""

  private def hlDuck(x: String): String =
    s"""(CAST(($x) // $LimbB2 AS DOUBLE) * CAST($LimbB2 AS DOUBLE)
        + CAST((($x) % $LimbB2) // $LimbB AS DOUBLE) * CAST($LimbB AS DOUBLE)
        + CAST(($x) % $LimbB AS DOUBLE))"""

  /** The Pearson formula on the exact moment sums: numerator and both
    * radicands stay EXACT integers (DECIMAL / HUGEINT) through the
    * arithmetic, the sign is factored out exactly, and only the three
    * final non-negative integers cross into double — limb-exact, so both
    * engines round the same reals through the same IEEE operation tree.
    */
  private def corrExpr(x: String, y: String, hl: String => String): String = {
    val num = s"(n * s_${x}_$y - s_$x * s_$y)"
    val dx = s"(n * s_${x}_$x - s_$x * s_$x)"
    val dy = s"(n * s_${y}_$y - s_$y * s_$y)"
    s"""(CASE WHEN $num < 0 THEN -1.0 ELSE 1.0 END)
        * ${hl(s"abs($num)")}
        / (sqrt(${hl(dx)}) * sqrt(${hl(dy)}))"""
  }

  /** `lineitem_corr_matrix`: the pairwise Pearson correlation matrix of the
    * numeric lineitem measures — the numeric companion of [[chisqOf]] in a
    * profiling pass (which measures move together?).
    *
    * Unlike `corr()` (whose double accumulation is partition-order
    * dependent and can never hash-match another engine), the moments here
    * are EXACT: each measure becomes an integer (×100), and all sums /
    * cross-product sums accumulate as DECIMAL (HUGEINT in the oracle) —
    * associative exact arithmetic, any partitioning, any cluster. The
    * double math happens once, on the 14 exact aggregates, in a fixed
    * expression shape.
    *
    * Shape: ONE partial+final aggregation pass over a 4-column pruned scan
    * computes all 14 moments (map-side combine does almost all the work);
    * the matrix assembly is a `stack` over a single row. At 100 TB this is
    * a single scan + a 14-value reduce — there is no cheaper shape.
    *
    * r18 optimization (guide §2.3 "narrower types"): the per-row arithmetic
    * and the aggregation buffers are plain BIGINT, not DECIMAL. A
    * DECIMAL(18,0)×DECIMAL(18,0) product is precision-37 — past Spark's
    * compact-long Decimal representation — so every row paid BigDecimal
    * allocation in the hash-aggregate update (measured: ~2.4 s/pass at
    * sf0.1; ~0.4 s as longs). Each cross-product (≤ 1.2·10¹⁴) is split
    * into three 20-bit-grain limbs (lo = p mod 2²⁰, mid, hi = p div 2⁴⁰ ≤
    * 1.2·10¹⁴/2⁴⁰ ≈ 110) whose LONG sums cannot overflow below ~9·10¹²
    * rows (≫ 100 TB of lineitem); the exact DECIMAL(38,0) moments are
    * reassembled from the three limb sums on the single post-aggregation
    * row, so every value downstream of the agg — and therefore every
    * emitted double — is bit-identical to the direct DECIMAL formulation
    * the oracle still runs.
    */
  def corrMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(CorrVars.map { case (c, _) => col(c).isNotNull }.reduce(_ && _))
      .select(CorrVars.map { case (c, a) =>
        expr(s"CAST(ROUND($c * 100) AS BIGINT)").as(a)
      }: _*)
    val L1 = 1L << 20
    val L2 = 1L << 40
    val crossLimbs = CorrVars.zipWithIndex.flatMap { case ((_, a), i) =>
      CorrVars.drop(i).flatMap { case (_, b) => Seq(
        sum(expr(s"($a * $b) % $L1")).as(s"lo_${a}_$b"),
        sum(expr(s"(($a * $b) div $L1) % $L1")).as(s"mid_${a}_$b"),
        sum(expr(s"($a * $b) div $L2")).as(s"hi_${a}_$b"))
      }
    }
    val moments: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("n") +:
      CorrVars.map { case (_, a) => sum(col(a)).as(s"s_$a") } ++: crossLimbs
    val wideL = li.agg(moments.head, moments.tail: _*)
    // exact DECIMAL(38,0) moments reassembled from the limb sums (one row)
    val wide = wideL.select(
      col("n") +:
      CorrVars.map { case (_, a) =>
        expr(s"CAST(s_$a AS DECIMAL(38,0))").as(s"s_$a") } ++:
      CorrVars.zipWithIndex.flatMap { case ((_, a), i) =>
        CorrVars.drop(i).map { case (_, b) =>
          expr(s"CAST(hi_${a}_$b AS DECIMAL(38,0)) * $L2 " +
            s"+ CAST(mid_${a}_$b AS DECIMAL(38,0)) * $L1 + lo_${a}_$b")
            .as(s"s_${a}_$b") }
      }: _*)
    val withCorrs = CorrPairs.foldLeft(wide) { case (df, ((_, a), (_, b))) =>
      df.withColumn(s"corr_${a}_$b", expr(corrExpr(a, b, hlSpark)))
    }
    val stacked = CorrPairs.map { case ((cx, a), (cy, b)) =>
      s"'$cx', '$cy', corr_${a}_$b" }.mkString(", ")
    withCorrs.selectExpr("n AS n_rows",
      s"stack(${CorrPairs.length}, $stacked) AS (col_x, col_y, corr)")
      .select("col_x", "col_y", "n_rows", "corr")
      .orderBy("col_x", "col_y")
  }

  def corrMatrixQ(spark: SparkSession, sfDir: String): DataFrame =
    corrMatrix(spark, sfDir)

  private val corrMatrixSql = {
    val notNull = CorrVars.map { case (c, _) => s"$c IS NOT NULL" }.mkString(" AND ")
    val enc = CorrVars.map { case (c, a) => s"CAST(ROUND($c * 100) AS HUGEINT) AS $a" }
      .mkString(", ")
    val sums = (CorrVars.map { case (_, a) => s"SUM($a) AS s_$a" } ++
      CorrVars.zipWithIndex.flatMap { case ((_, a), i) =>
        CorrVars.drop(i).map { case (_, b) => s"SUM($a * $b) AS s_${a}_$b" }
      }).mkString(", ")
    val rows = CorrPairs.map { case ((cx, a), (cy, b)) =>
      s"""SELECT '$cx' AS col_x, '$cy' AS col_y, CAST(n AS BIGINT) AS n_rows,
                 ${corrExpr(a, b, hlDuck)} AS corr
          FROM a"""
    }.mkString(" UNION ALL ")
    s"""WITH v AS (SELECT $enc FROM lineitem WHERE $notNull),
        a AS (SELECT COUNT(*) AS n, $sums FROM v)
        $rows ORDER BY col_x, col_y"""
  }

  /** Signed limb-exact integer→double: the sign factored exactly, the
    * magnitude through [[hlSpark]]/[[hlDuck]].
    */
  private def signedHl(x: String, hl: String => String): String =
    s"(CASE WHEN $x < 0 THEN -1.0 ELSE 1.0 END) * ${hl(s"abs($x)")}"

  /** The OLS slope/intercept expressions on the exact per-group moments
    * `(n, sx, sy, sxy, sxx)`: numerator and denominator stay exact
    * integers through the arithmetic (the corr-matrix discipline), the
    * denominator `n·Σx² − (Σx)²` is ≥ 0 by Cauchy–Schwarz (zero only when
    * every x in the group is equal — reported as NULL, not ±Inf), and the
    * remaining double math is one fixed IEEE expression tree per output.
    */
  private def slopeExpr(hl: String => String): String = {
    val num = "(n * sxy - sx * sy)"
    val den = "(n * sxx - sx * sx)"
    s"""CASE WHEN $den = 0 THEN NULL
             ELSE ${signedHl(num, hl)} / ${hl(den)} END"""
  }

  private def interceptExpr(hl: String => String): String =
    s"""CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
             ELSE (${signedHl("sy", hl)} - (${slopeExpr(hl)}) * ${signedHl("sx", hl)})
                  / CAST(n AS DOUBLE) END"""

  /** `brand_price_trend`: per-brand ordinary-least-squares trend of line
    * price over ship time — GROUPED regression as a single aggregation
    * pass, the per-segment drift statistic a pricing or data-quality
    * monitor tracks. x = ship day (days since epoch), y = extended price
    * in cents; slope is cents/day, intercept the day-0 baseline.
    *
    * Same determinism discipline as [[corrMatrix]]: both variables are
    * exact integers, the five per-brand moments accumulate as
    * DECIMAL/HUGEINT (associative under any partitioning), the slope's
    * numerator/denominator stay exact through the arithmetic, and the
    * limb-exact conversion crosses into double once per output.
    *
    * Shape: ONE map-side-combined aggregation over a 3-column pruned scan
    * joined to the broadcast part dim — brands-sized state (25 × 5
    * moments), no windows, no second pass. At 100 TB, AQE flips the
    * fixture broadcast to shuffle if part outgrows the threshold; the
    * moment math is unchanged.
    */
  def brandPriceTrend(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate").isNotNull && col("l_extendedprice").isNotNull)
      .select(col("l_partkey"),
        datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
          .cast("decimal(18,0)").as("x"),
        expr("CAST(ROUND(l_extendedprice * 100) AS DECIMAL(18,0))").as("y"))
    val brands = Tables.part(spark, sfDir)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    li.join(broadcast(brands), "l_partkey")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("p_brand"), col("n").as("n_items"),
        expr(slopeExpr(hlSpark)).as("slope_cents_per_day"),
        expr(interceptExpr(hlSpark)).as("intercept_cents"))
      .orderBy("p_brand")
  }

  private val brandPriceTrendSql =
    s"""WITH v AS (
          SELECT p.p_brand,
                 CAST(date_diff('day', DATE '1970-01-01', l_shipdate) AS HUGEINT) AS x,
                 CAST(ROUND(l_extendedprice * 100) AS HUGEINT) AS y
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL
        ), m AS (
          SELECT p_brand, COUNT(*) AS n,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM v GROUP BY 1
        )
        SELECT p_brand, CAST(n AS BIGINT) AS n_items,
               ${slopeExpr(hlDuck)} AS slope_cents_per_day,
               ${interceptExpr(hlDuck)} AS intercept_cents
        FROM m ORDER BY p_brand"""

  /** NULL sentinel for [[ordersChecksum]]'s row serialization — must be a
    * string no data column can produce; '<NULL>' is documented convention,
    * and a collision would need the literal text in a key/date column.
    */
  private val NullMark = "<NULL>"

  /** `orders_table_checksum`: ORDER-INDEPENDENT content fingerprint of the
    * orders table — the audit both sides of a migration / replication /
    * CDC-merge run to prove "same rows" without sorting or moving data.
    * Each row serializes to a canonical string (fixed column order, typed
    * formats — DECIMAL strings for money, yyyy-MM-dd for dates, NULLs as
    * a sentinel), hashes to 60 bits, and the table's checksum is the SUM
    * of row hashes: commutative and associative, so ANY partitioning, row
    * order, cluster size — or engine — produces the identical value
    * (DECIMAL(38) accumulator: no overflow until ~10²⁶ rows). One map-side
    * combined pass, 2-value state; the weakness of sum-vs-multiset
    * (a forged collision needs hash control) is acceptable for drift
    * detection, which is this operator's job.
    */
  def ordersChecksum(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq(
      "CAST(o_orderkey AS STRING)",
      "CAST(o_custkey AS STRING)",
      "o_orderstatus",
      "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS STRING)",
      "date_format(o_orderdate, 'yyyy-MM-dd')",
      "o_orderpriority")
    val rowStr = cols.map(c => s"coalesce($c, '$NullMark')").mkString("concat_ws('|', ", ", ", ")")
    Tables.orders(spark, sfDir)
      .select(expr(graft.pipeline.Dedup.hash60(rowStr)).cast("decimal(38,0)").as("fp"))
      .agg(count(lit(1)).as("n_rows"), sum("fp").as("cs"))
      .select(col("n_rows"), col("cs").cast("string").as("checksum"))
  }

  private val ordersChecksumSql = {
    val cols = Seq(
      "CAST(o_orderkey AS VARCHAR)",
      "CAST(o_custkey AS VARCHAR)",
      "o_orderstatus",
      "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)",
      "strftime(o_orderdate, '%Y-%m-%d')",
      "o_orderpriority")
    val rowStr = cols.map(c => s"coalesce($c, '$NullMark')").mkString(" || '|' || ")
    s"""SELECT COUNT(*) AS n_rows,
               CAST(SUM(CAST(${graft.pipeline.Dedup.hash60Duck(rowStr)} AS HUGEINT)) AS VARCHAR)
                 AS checksum
        FROM orders"""
  }

  /** The orders data contract: named row-level expectations as SQL
    * predicate strings (violation when TRUE) — ONE text parsed by both
    * engines, the bm25TermScore discipline. The date window deliberately
    * ends before the fixture's max orderdate, so the report demonstrably
    * CATCHES violations rather than vacuously passing.
    */
  val OrdersRowRules: Seq[(String, String)] = Seq(
    "orderkey_not_null" -> "o_orderkey IS NULL",
    "status_in_domain" ->
      "o_orderstatus IS NULL OR o_orderstatus NOT IN ('O', 'F', 'P')",
    "price_positive" -> "o_totalprice IS NULL OR o_totalprice <= 0.0e0",
    "orderdate_in_window" ->
      """o_orderdate IS NULL OR o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
         OR o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'""")

  /** `orders_contract_report`: the data-contract validation every ingest
    * gate runs before promoting a batch — one row per named rule with
    * (rows checked, violations, pass/fail). Three rule shapes, each in its
    * cheapest plan:
    *
    *   - ROW rules ([[OrdersRowRules]]) and the KEY-UNIQUENESS rule share
    *     ONE aggregation pass (`sum(CASE WHEN violation)` per rule next to
    *     `count` + `count(DISTINCT key)`; map-side partials, a 1-row
    *     result, `stack` fans it out to rule rows);
    *   - the REFERENTIAL rule is one LEFT ANTI join against the dim's key
    *     projection (the join prunes to the key column; at 100 TB this is
    *     the one key-grain shuffle a FK check fundamentally costs, and AQE
    *     broadcasts the dim side when it fits).
    *
    * Uniqueness violations are counted as EXTRA rows (`n − n_distinct
    * keys`): 0 exactly when the key is unique, and the count never needs
    * per-key state beyond the distinct aggregate. All counts are exact
    * longs; `passed` is `violations = 0` — deterministic in both engines.
    *
    * Scale: total cost = one map-combined pass over orders + one FK join;
    * nothing driver-side, no per-rule rescans — adding a row rule is one
    * more CASE column in the same pass.
    */
  def ordersContractReport(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val rowAggs = OrdersRowRules.map { case (name, pred) =>
      sum(when(expr(pred), 1L).otherwise(0L)).as(s"v_$name")
    }
    val wide = orders.agg(
      count(lit(1)).as("n_rows"),
      (countDistinct(col("o_orderkey")) +: rowAggs): _*)
    val stacked = (OrdersRowRules.map { case (name, _) =>
      s"'$name', n_rows, v_$name"
    } :+ s"'orderkey_unique', n_rows, n_rows - `count(DISTINCT o_orderkey)`")
      .mkString(", ")
    val rowReport = wide.selectExpr(
      s"stack(${OrdersRowRules.length + 1}, $stacked) AS (rule, n_checked, n_violations)")
    val withCust = orders.filter(col("o_custkey").isNotNull)
    val fkChecked = withCust.agg(count(lit(1)).as("n_checked"))
    val fkViolations = withCust
      .join(Tables.customer(spark, sfDir).select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val fkReport = fkChecked.crossJoin(fkViolations) // two 1-row frames
      .select(lit("custkey_references_customer").as("rule"),
        col("n_checked"), col("n_violations"))
    rowReport.unionByName(fkReport)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy("rule")
  }

  private val ordersContractReportSql = {
    val rowBranches = OrdersRowRules.map { case (name, pred) =>
      s"""SELECT '$name' AS rule, COUNT(*) AS n_checked,
                 CAST(SUM(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
          FROM orders"""
    }
    val unique =
      s"""SELECT 'orderkey_unique' AS rule, COUNT(*) AS n_checked,
                 COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations
          FROM orders"""
    val fk =
      s"""SELECT 'custkey_references_customer' AS rule,
                 (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL) AS n_checked,
                 (SELECT COUNT(*) FROM orders o
                  WHERE o.o_custkey IS NOT NULL
                    AND NOT EXISTS (SELECT 1 FROM customer c
                                    WHERE c.c_custkey = o.o_custkey)) AS n_violations"""
    (rowBranches :+ unique :+ fk)
      .mkString("SELECT rule, n_checked, n_violations, n_violations = 0 AS passed FROM (",
        " UNION ALL ", ") ORDER BY rule")
  }

  /** `gdpr_deletion_impact`: the right-to-be-forgotten IMPACT report — the
    * first artifact a deletion request produces: for a batch of entities to
    * forget (fixture stand-in: custkey/user % 100 == 7; in production an
    * explicit request table), how many rows each table loses and how many
    * entities each touches, INCLUDING the indirect blast radius (lineitem
    * has no customer key — its rows die through their orders). The report
    * is what the deletion job is reconciled against after it runs.
    *
    * Shape: the forget set is broadcast and every table pays one semi-join
    * (lineitem through the order keys — two-hop lineage); per-table 1-row
    * aggregates union into the tables-sized report. Exact counts only.
    */
  def gdprImpact(spark: SparkSession, sfDir: String): DataFrame = {
    val forget = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 100 === 7).select("c_custkey")
    val fo = Tables.orders(spark, sfDir)
      .join(broadcast(forget), col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey")
    val fl = Tables.lineitem(spark, sfDir).select("l_orderkey")
      .join(broadcast(fo), col("l_orderkey") === col("o_orderkey"))
    val fe = Tables.events(spark, sfDir)
      .filter(col("user_id") % 100 === 7).select("user_id")
    def row(tbl: String, df: DataFrame, entity: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(col(entity)).as("n_entities"))
        .select(lit(tbl).as("tbl"), col("n_rows"), col("n_entities"))
    row("customer", forget, "c_custkey")
      .unionByName(row("events", fe, "user_id"))
      .unionByName(row("lineitem", fl, "o_custkey"))
      .unionByName(row("orders", fo, "o_custkey"))
      .orderBy("tbl")
  }

  private val gdprImpactSql =
    """WITH forget AS (
         SELECT c_custkey FROM customer WHERE c_custkey % 100 = 7
       ), fo AS (
         SELECT o_orderkey, o_custkey FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM forget)
       ), fl AS (
         SELECT fo.o_custkey FROM lineitem l JOIN fo ON l.l_orderkey = fo.o_orderkey
       ), fe AS (
         SELECT user_id FROM events WHERE user_id % 100 = 7
       )
       SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_entities FROM forget
       UNION ALL
       SELECT 'events', CAST(COUNT(*) AS BIGINT),
              CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM fe
       UNION ALL
       SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
              CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM fl
       UNION ALL
       SELECT 'orders', CAST(COUNT(*) AS BIGINT),
              CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM fo
       ORDER BY tbl"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_orders" -> (profileOrders _),
    "gdpr_deletion_impact" -> (gdprImpact _),
    "profile_documents" -> (profileDocuments _),
    "profile_embeddings" -> (profileEmbeddings _),
    "profile_orders_kmv" -> (profileOrdersKmv _),
    "orders_chisq_independence" -> (chisqIndependence _),
    "lineitem_corr_matrix" -> (corrMatrixQ _),
    "brand_price_trend" -> (brandPriceTrend _),
    "orders_table_checksum" -> (ordersChecksum _),
    "orders_contract_report" -> (ordersContractReport _),
  )

  override def oracle: Map[String, String] = Map(
    "profile_orders" -> profileOrdersSql,
    "gdpr_deletion_impact" -> gdprImpactSql,
    "profile_documents" -> profileDocumentsSql,
    "profile_embeddings" -> profileEmbeddingsSql,
    "profile_orders_kmv" -> profileOrdersKmvSql,
    "orders_chisq_independence" -> chisqIndependenceSql,
    "lineitem_corr_matrix" -> corrMatrixSql,
    "brand_price_trend" -> brandPriceTrendSql,
    "orders_table_checksum" -> ordersChecksumSql,
    "orders_contract_report" -> ordersContractReportSql,
  )
}
