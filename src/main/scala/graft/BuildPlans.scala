package graft

/** Dev plan-audit runner for BUILD frames (the one-time memoized/bucketed
  * index builds whose cost a registered query owns but whose plan the
  * registered query hides behind a memo scan — see OPTIMIZATION_r18.md's
  * Method note). `runMain graft.BuildPlans <name...>` prints
  * `explain("formatted")` for each known build at sf0.01.
  */
object BuildPlans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val builds: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "graph_pagerank_edges" -> (() => operators.Graph.edgesBuild(spark, sf)),
    )
    val names = if (args.nonEmpty) args.toSeq else builds.keys.toSeq.sorted
    for (name <- names) {
      builds.get(name) match {
        case Some(b) =>
          println(s"###PLAN $name")
          b().explain("formatted")
        case None => println(s"###UNKNOWN $name — known: ${builds.keys.toSeq.sorted.mkString(", ")}")
      }
    }
    spark.stop()
  }
}
