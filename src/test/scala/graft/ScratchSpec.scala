package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

/** Contract tests for the scratch memo layer: exactly-once compute per key
  * under concurrency, independence across keys, retry after failure, and
  * eager cleanup.
  */
class ScratchSpec extends SparkSpec {

  test("memoize computes a key exactly once under concurrent callers") {
    val computes = new AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val df = Scratch.memoize(spark, "spec#concurrent-once") {
          computes.incrementAndGet()
          spark.range(100).select(col("id"))
        }
        assert(df.count() === 100L)
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(computes.get() === 1)
  }

  test("a failed compute is retryable (entry removed, later caller succeeds)") {
    val attempts = new AtomicInteger(0)
    intercept[RuntimeException] {
      Scratch.memoize(spark, "spec#retry") {
        attempts.incrementAndGet()
        throw new RuntimeException("boom")
      }
    }
    val df = Scratch.memoize(spark, "spec#retry") {
      attempts.incrementAndGet()
      spark.range(5).select(col("id"))
    }
    assert(df.count() === 5L && attempts.get() === 2)
  }

  test("different keys never share results; clearMemo forces recompute") {
    val computes = new AtomicInteger(0)
    def stage(k: String) = Scratch.memoize(spark, s"spec#$k") {
      computes.incrementAndGet()
      spark.range(10).select(col("id"))
    }
    stage("a").count(); stage("b").count(); stage("a").count()
    assert(computes.get() === 2)
    Scratch.clearMemo()
    stage("a").count()
    assert(computes.get() === 3)
  }
}
