package graft

/** Throwaway smoke driver for the verify skill: flagship entry on sf0.001. */
object SmokeMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    println(s"SMOKE entry rows=${SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
