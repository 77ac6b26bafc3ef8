package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.History

case class OrderRow(o_orderkey: Long, o_status: String, o_price: Double)
case class Change(o_orderkey: Long, o_status: String, o_price: Double, op: String)

/** The streaming CDC apply must converge to the batch merge core applied
  * sequentially, exercise all three MERGE cases across micro-batches
  * (update, insert, tombstone — including deleting a key a PRIOR batch
  * inserted), and replay idempotently.
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit private def sqlCtx: SQLContext = spark.sqlContext

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet

  test("streamed merges equal the sequential batch merges and replay idempotently") {
    val stateDir = Files.createTempDirectory("graft_cdc_state").toString
    val ckpt = Files.createTempDirectory("graft_cdc_ckpt").toString
    val initial = (1L to 10L).map(k => OrderRow(k, "O", k * 10.0)).toDF()
    CdcStream.init(initial, stateDir)

    val b1 = Seq( // update 2, insert 11, delete 3
      Change(2L, "F", 999.0, "U"), Change(11L, "O", 110.0, "U"), Change(3L, "", 0.0, "D"))
    val b2 = Seq( // update the batch-1 insert, delete 2, insert 12
      Change(11L, "F", 111.0, "U"), Change(2L, "", 0.0, "D"), Change(12L, "O", 120.0, "U"))

    val src = MemoryStream[Change]
    val q = CdcStream.start(src.toDF, stateDir, ckpt, "o_orderkey")
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    assert(CdcStream.latestVersion(spark, stateDir) === 2L)
    val streamed = CdcStream.latestState(spark, stateDir)

    // batch twin: the same merge core applied sequentially
    val expected = History.mergeCdc(
      History.mergeCdc(initial, b1.toDF(), "o_orderkey"), b2.toDF(), "o_orderkey")
    assert(rows(streamed) === rows(expected))

    // the three cases really happened: 2 deleted, 11 inserted-then-updated,
    // 12 inserted, 3 deleted, untouched keys intact
    val byKey = streamed.as[OrderRow].collect().map(r => r.o_orderkey -> r).toMap
    assert(!byKey.contains(2L) && !byKey.contains(3L))
    assert(byKey(11L).o_status === "F" && byKey(11L).o_price === 111.0)
    assert(byKey(12L).o_price === 120.0)
    assert(byKey(1L).o_status === "O" && byKey.size === 10)

    // crash replay of a committed batch: v=2 is recomputed from v=1, no change
    val before = rows(streamed)
    CdcStream.batchMerger(spark, stateDir, "o_orderkey")(b2.toDF(), 1L)
    assert(rows(CdcStream.latestState(spark, stateDir)) === before)
  }
}
