package graft.streaming

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.pipeline.TextAnalysis

/** The count-min grid is a commutative groupBy-count, so the STREAMING form
  * (complete mode over an unbounded word stream) must converge to the batch
  * grid on the same words — bounded depth×width state where an exact
  * word-count map would grow with the vocabulary.
  */
class CmsStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit private def sqlCtx: SQLContext = spark.sqlContext

  test("streaming grid converges to the batch grid across micro-batches") {
    val words = Seq.fill(25)("spam") ++ (1 to 60).map(i => s"w${('a' + i % 26).toChar}")
    val (first, second) = words.splitAt(words.size / 2)

    val src = MemoryStream[String]
    val q = TextAnalysis.cmsGrid(src.toDF.toDF("word"))
      .writeStream.format("memory").queryName("cms_grid").outputMode("complete")
      .start()
    try {
      src.addData(first: _*); q.processAllAvailable()
      src.addData(second: _*); q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1)) -> r.getLong(2)
    val streamed = spark.table("cms_grid").collect().map(key).toMap
    val batch = TextAnalysis.cmsGrid(words.toDF("word")).collect().map(key).toMap
    assert(streamed === batch)
    assert(batch.nonEmpty && batch.values.sum === words.size.toLong * TextAnalysis.CmsDepth)
  }
}
