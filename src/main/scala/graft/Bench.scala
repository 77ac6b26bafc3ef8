package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    // untimed warmup: JVM/codegen/scheduler startup otherwise lands on
    // whichever query happens to run first
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1000).groupBy("l_returnflag").count().collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must surface as an error in the JSON, never as a
      // fast-looking time
      val err = try { fn(spark, sfDir).count(); None }
                catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries may cache intermediates; drop them so later timings are
      // independent of earlier queries
      spark.catalog.clearCache()
      (name, dt, err)
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v, _) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e.take(300)) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
