package graft

import org.apache.spark.sql.functions._

/** Dev probe: stage timings for the d=2 FastSS chain (not registered). */
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import org.apache.spark.sql.DataFrame
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $tag rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val cust = Tables.customer(spark, sfDir)
    time("warmup")(cust.count())
    val keyed = cust
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("c_custkey"), col("c_name"),
        explode(expr("sequence(0, length(c_name))")).as("j"))
      .select(col("c_custkey"), col("c_name"), col("j"),
        explode(expr("sequence(0, CASE WHEN j = 0 THEN 0 ELSE j - 1 END)")).as("i"))
      .select(col("c_custkey"), col("c_name"), expr(
        """CASE WHEN j = 0 THEN c_name
                WHEN i = 0 THEN concat(substring(c_name, 1, j - 1),
                                       substring(c_name, j + 1, length(c_name)))
                ELSE concat(substring(c_name, 1, i - 1),
                            substring(c_name, i + 1, j - i - 1),
                            substring(c_name, j + 1, length(c_name))) END""").as("k"))
      .select(col("c_custkey"), col("c_name"), xxhash64(col("k")).as("kh"))
      .distinct()
    time("keyed_build_count")(keyed.count())
    val mat = graft.Scratch.materialize(keyed, "graft_fuzz_probe_keys")
    time("materialize")(mat.count())
    val joined = mat
      .select(col("c_custkey").as("a_id"), col("c_name").as("a_name"), col("kh"))
      .join(mat.select(col("c_custkey").as("b_id"), col("c_name").as("b_name"), col("kh")), "kh")
      .filter(col("a_id") < col("b_id"))
    time("join_only")(joined.count())
    val verified = joined.filter(expr("lev_within(a_name, b_name, 2)"))
    time("join_verify")(verified.count())
    time("distinct")(verified.select("a_id", "b_id").distinct().count())
    spark.stop()
  }
}
