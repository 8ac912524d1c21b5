package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark
import graft.model.Metric

/** B4 ingest counters through the listener bus. */
class IngestMetricsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("observe + listener count written rows per micro-batch") {
    implicit val sc = spark.sqlContext
    val listener = new IngestMetrics.Listener
    spark.streams.addListener(listener)
    val mem = MemoryStream[Metric]
    val q = IngestMetrics.observed(mem.toDF)
      .writeStream.format("noop").queryName("ingest_count_test").start()
    try {
      def m(n: Int) = Metric(new java.sql.Timestamp(1704067200000L + n), "gauge",
        "h", "x", n.toDouble, Map())
      mem.addData(m(1), m(2), m(3))
      q.processAllAvailable()
      mem.addData(m(4))
      q.processAllAvailable()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis + 30000
      while (listener.written("ingest_count_test") < 4 &&
        System.currentTimeMillis < deadline) Thread.sleep(100)
      assert(listener.written("ingest_count_test") == 4)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
