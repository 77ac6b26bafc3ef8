package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def orders = Tables.orders(spark, Sf0001).select("o_custkey", "o_totalprice")
  private def dim = Tables.customer(spark, Sf0001)
    .filter($"c_mktsegment" === "BUILDING" && $"c_nationkey" < 5)
    .select("c_custkey", "c_nationkey")

  test("bloom-pruned join equals the plain join exactly") {
    val plain = orders.join(dim, $"o_custkey" === $"c_custkey")
      .select("o_custkey", "c_nationkey", "o_totalprice")
      .as[(Long, Int, Double)].collect().sorted.toSeq
    val bloomed = BloomJoin
      .bloomJoin(orders, dim, "o_custkey", "c_custkey", 1000L, 1L << 14)
      .select("o_custkey", "c_nationkey", "o_totalprice")
      .as[(Long, Int, Double)].collect().sorted.toSeq
    assert(bloomed === plain)
    assert(plain.nonEmpty) // fixture sanity: an empty join would prove nothing
  }

  test("the sketch prunes: a superset of true matches, far below the full fact") {
    val total = orders.count()
    val trueMatches = orders.join(dim, $"o_custkey" === $"c_custkey", "left_semi").count()
    val kept = BloomJoin
      .semiFilter(orders, $"o_custkey", BloomJoin.keyBloom(dim, $"c_custkey", 1000L, 1L << 14))
      .count()
    assert(kept >= trueMatches, "bloom filters have no false negatives")
    // ~1000 keys in 16k bits ⇒ fp well under 50%; anything near `total`
    // would mean the filter is a no-op
    assert(kept < total / 2, s"bloom kept $kept of $total — not pruning")
  }

  test("the might_contain filter sits below the join, on the scan side of the shuffle") {
    // force the shuffle path (broadcast would also skip the fact shuffle and
    // prove nothing about map-side pruning) and plan without AQE — query-stage
    // nodes hide their subtrees from `collect`, and the stage boundaries are
    // the same either way
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = BloomJoin
        .bloomJoin(orders, dim, "o_custkey", "c_custkey", 1000L, 1L << 14)
        .queryExecution.executedPlan
      // the subtree UNDER a shuffle exchange must already contain the bloom
      // probe — i.e. fact rows are pruned before they are shuffled
      val exchanges: Seq[SparkPlan] = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(exchanges.nonEmpty, plan.toString)
      assert(exchanges.exists(_.toString.contains("might_contain")), plan.toString)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }
}
