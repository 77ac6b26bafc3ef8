package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Scratch}

/** PageRank over the co-purchase graph: parts are nodes, an edge connects
  * two parts that ever share an order basket — the same graph the
  * market-basket queries (`basket_pair_counts`, q2_ecommerce_analysis.py's
  * co-occurrence motivation) mine pairwise, here analyzed globally with the
  * canonical iterative-join algorithm every production-scale engine needs.
  *
  * Per round the plan is: contributions = edges ⋈ ranks on the source id
  * (ONE equi-join — the scratch-materialized edge table already carries the
  * source degree), one shuffle on the target id for the re-aggregation,
  * then the node-sized rank table rebuilds. [[Iterations]] is fixed, so
  * lineage depth is bounded without per-round re-materialization (contrast
  * `dedup_components`, whose data-dependent fixpoint loop re-roots each
  * round).
  *
  * At 100 TB: the edge table is the big immutable input — it is persisted
  * BUCKETED BY `u` ([[Graph.edgeBuckets]] buckets, one offline build per
  * corpus), so every round's contribution join reads co-located buckets
  * straight from the files and only the node-sized rank table moves
  * (asserted in PlanAssertionsSpec: zero `u`-exchanges in the executed
  * plan). The contribution aggregate would be a plain `sum`; the sorted
  * left-fold used here pins IEEE addition order so the DuckDB oracle
  * matches bit-for-bit (the mix_weights determinism pattern) at the cost
  * of an in-degree-bounded per-group list. Dangling nodes cannot arise in
  * an undirected graph (every node with an edge has out-degree ≥ 1), so no
  * teleport-mass redistribution term is needed.
  */
object Graph extends QueryModule {

  /** Damping factor and its teleport complement. Kept as separate literals
    * (never derived as `1 - Damping` at runtime): both engines parse the
    * decimal strings "0.85"/"0.15" to the same nearest doubles, whereas
    * computed `1.0 - 0.85` is 0.15000000000000002.
    */
  val Damping = 0.85
  val Teleport = 0.15

  val Iterations = 3
  val TopK = 20

  /** Directed edge list of the undirected co-purchase graph (both
    * directions present) with the source's out-degree attached — the one
    * join input every PageRank round consumes. Persisted via
    * [[Scratch.memoizeBucketed]] as a catalog table BUCKETED AND SORTED BY
    * `u` ([[Scratch.defaultBuckets]] buckets, so the layout tracks the
    * session's configured parallelism), so each round's contribution join
    * (and the node extraction, whose `u`-clustering the bucket layout
    * already satisfies) runs with ZERO exchange on the edge side — the
    * offline one-time index build that makes iterated joins cheap, exactly
    * like the incremental-dedup band index. The basket-item distinct is
    * shared with the market-basket queries.
    */
  private def edges(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.memoizeBucketed(spark, s"$sfDir#graph#edges", "graft_edges", Seq("u")) {
      edgesBuild(spark, sfDir)
    }

  /** The unmemoized edge-build frame — package-visible so the plan audit
    * can explain the BUILD (the registered query's own plan scans the
    * bucketed memo). The build is the one-time offline index job; its
    * plan shape is what matters at 100 TB.
    */
  private[graft] def edgesBuild(spark: SparkSession, sfDir: String): DataFrame = {
    val items = Retail.distinctItems(spark, sfDir)
    val a = items.select(col("l_orderkey"), col("l_partkey").as("u"))
    val b = items.select(col("l_orderkey"), col("l_partkey").as("v"))
    // the u-only repartition makes the distinct's exchange land on
    // hashpartitioning(u) (a u-partitioning trivially clusters (u, v)), so
    // the deg window below reuses it instead of adding a second shuffle
    val e = a.join(b, "l_orderkey")
      .filter(col("u") =!= col("v"))
      .select("u", "v").repartition(col("u")).distinct()
    // deg = COUNT(*) OVER (PARTITION BY u), not `e JOIN e.groupBy(u).count`:
    // the join form planned the whole self-join + distinct subtree TWICE
    // (no exchange reuse across the aggregate) and merged the two copies
    // with a sort-merge join — r18 plan audit measured 12 Exchanges and two
    // full edge derivations (plans/r18/graph_pagerank_edges_before.txt).
    // The window computes the same per-u row count in the single pass the
    // bucketed write needs anyway (guide §2.4: two operations keyed the
    // same way share one exchange).
    e.withColumn("deg", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("u")))
  }

  /** [[Iterations]] rounds of PageRank over a directed `(u, v, deg)` edge
    * list (deg = out-degree of u). Returns `(id, deg, pagerank)` for every
    * node with at least one out-edge.
    */
  def pagerankOf(edgeList: DataFrame): DataFrame =
    pagerankOfWithAgg(edgeList, "sorted_sum(c)")

  /** [[pagerankOf]] with the contribution aggregate pluggable — bench/A-B
    * surface for comparing deterministic-sum implementations (the HOF fold
    * and `sorted_sum` are bit-identical; see SortedSumSpec).
    */
  private[graft] def pagerankOfWithAgg(edgeList: DataFrame, aggExpr: String): DataFrame = {
    val nodes = edgeList.select(col("u").as("id"), col("deg")).distinct()
    val n = nodes.agg(count(lit(1)).as("n")).scalar()
    var ranks = nodes.select(col("id"), (lit(1.0) / n).as("r"))
    for (_ <- 1 to Iterations) {
      val contribs = edgeList
        .join(ranks, edgeList("u") === ranks("id"))
        .select(col("v").as("id"), (col("r") / col("deg")).as("c"))
        .groupBy("id")
        .agg(expr(aggExpr).as("s"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(Teleport) / n +
            lit(Damping) * coalesce(col("s"), lit(0.0))).as("r"))
    }
    nodes.join(ranks, "id").select(col("id"), col("deg"), col("r").as("pagerank"))
  }

  /** `graph_pagerank`: top-[[TopK]] parts of the co-purchase graph by
    * PageRank, ties broken by part id.
    */
  def pagerankQ(spark: SparkSession, sfDir: String): DataFrame =
    pagerankQWithAgg(spark, sfDir, "sorted_sum(c)")

  private[graft] def pagerankQWithAgg(spark: SparkSession, sfDir: String,
      aggExpr: String): DataFrame =
    pagerankOfWithAgg(edges(spark, sfDir), aggExpr)
      .select(col("id").as("part_id"), col("deg").as("n_neighbors"), col("pagerank"))
      .orderBy(col("pagerank").desc, col("part_id"))
      .limit(TopK)

  private val pagerankSql = {
    val iters = (1 to Iterations).map { i =>
      val prev = s"r${i - 1}"
      s"""c$i AS (
            SELECT e.v AS id,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_sort(list(r.r / e.deg))), (a, x) -> a + x) AS s
            FROM edges e JOIN $prev r ON r.id = e.u
            GROUP BY 1
          ), r$i AS (
            SELECT nodes.id,
                   CAST($Teleport AS DOUBLE) / n
                     + CAST($Damping AS DOUBLE) * COALESCE(c.s, CAST(0.0 AS DOUBLE)) AS r
            FROM nodes CROSS JOIN n LEFT JOIN c$i c ON c.id = nodes.id
          )"""
    }.mkString(", ")
    s"""WITH items AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), edge0 AS (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM items a JOIN items b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        ), deg AS (
          SELECT u, COUNT(*) AS deg FROM edge0 GROUP BY 1
        ), edges AS (
          SELECT e.u, e.v, d.deg FROM edge0 e JOIN deg d USING (u)
        ), nodes AS (
          SELECT u AS id, deg FROM deg
        ), n AS (
          SELECT COUNT(*) AS n FROM nodes
        ), r0 AS (
          SELECT id, CAST(1.0 AS DOUBLE) / n AS r FROM nodes CROSS JOIN n
        ), $iters
        SELECT r.id AS part_id, nd.deg AS n_neighbors, r.r AS pagerank
        FROM r$Iterations r JOIN nodes nd ON nd.id = r.id
        ORDER BY pagerank DESC, part_id LIMIT $TopK"""
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (pagerankQ _),
  )

  override def oracle: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql,
  )
}
