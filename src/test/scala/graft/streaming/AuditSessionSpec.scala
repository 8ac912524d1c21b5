package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark
import AuditSession.AuditLine

/** T8 audit reassembly (ref: tail.go:62-87) — batch flush, size overflow,
  * streaming emission.
  */
class AuditSessionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def line(id: String, typ: String, n: Int) =
    AuditLine(new Timestamp(1704067200000L + n * 100), "h1", id, typ, s"k$n=v$n")

  test("parseLines: libaudit format, non-matching lines dropped") {
    val raw = Seq(
      "type=SYSCALL msg=audit(1700000000.123:456): arch=c000003e syscall=59",
      "garbage line").toDS
    val parsed = AuditSession.parseLines(spark, raw, "h1").collect()
    assert(parsed.length == 1)
    assert(parsed.head.auditId == "456" && parsed.head.auditType == "SYSCALL")
    assert(parsed.head.ts.getTime == 1700000000123L)
  }

  test("parseLines: sub-3-digit fraction scales as a decimal, not literal ms") {
    val raw = Seq(
      "type=SYSCALL msg=audit(1700000000.5:1): a=b",     // .5 s = +500 ms
      "type=SYSCALL msg=audit(1700000000.1234:2): a=b"). // truncates to ms
      toDS
    val ts = AuditSession.parseLines(spark, raw, "h1").collect()
      .sortBy(_.auditId).map(_.ts.getTime)
    assert(ts.toSeq == Seq(1700000000500L, 1700000000123L))
  }

  test("batch: one coalesced event per audit id, payloads merged in order") {
    val lines = Seq(line("1", "SYSCALL", 0), line("1", "PATH", 1), line("2", "LOGIN", 2))
    val events = AuditSession.sessionizeBatch(lines.toDS).collect().sortBy(_.eventType)
    assert(events.length == 2)
    val sys = events.find(_.eventType == "audit.SYSCALL").get
    assert(sys.tags("n_msgs") == "2" && sys.tags("audit_id") == "1")
    assert(sys.data.contains("\"type\":\"SYSCALL\"") && sys.data.contains("\"type\":\"PATH\""))
    assert(events.find(_.eventType == "audit.LOGIN").get.tags("n_msgs") == "1")
  }

  test("size overflow splits a group at maxMsgs (100-msg window analog)") {
    val lines = (0 until 7).map(line("9", "SYSCALL", _))
    val events = AuditSession.sessionizeBatch(lines.toDS, maxMsgs = 3).collect()
    assert(events.map(_.tags("n_msgs")).sorted.toSeq == Seq("1", "3", "3"))
  }

  test("streaming: size-overflow groups emit within the micro-batch") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[AuditLine]
    val q = AuditSession.sessionize(mem.toDS, maxMsgs = 2, timeoutMs = 60000)
      .writeStream.format("memory").queryName("audit_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .outputMode("append").start()
    try {
      mem.addData((0 until 4).map(line("7", "SYSCALL", _)): _*)
      // NOTE: processAllAvailable never returns here — ProcessingTimeTimeout
      // forces continuous timeout-check batches, so the stream never
      // quiesces. Poll the sink with a deadline instead.
      val deadline = System.currentTimeMillis + 120000
      while (spark.table("audit_test").count() < 2 &&
        System.currentTimeMillis < deadline) Thread.sleep(250)
      val events = spark.table("audit_test").as[graft.model.Event].collect()
      // 4 lines, maxMsgs=2 → two flushed events; nothing left buffered
      assert(events.length == 2 && events.forall(_.tags("n_msgs") == "2"))
    } finally q.stop()
  }
}
