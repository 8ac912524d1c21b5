package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** B3 journald projection (FIXTURES.md §B3; ref: journal/client.go:30-82). */
class JournaldSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val line =
    """{"SYSLOG_IDENTIFIER":"sshd","MESSAGE":"Accepted publickey for root",
      | "PRIORITY":"6","__REALTIME_TIMESTAMP":"1704067200123456",
      | "__CURSOR":"s=abc;i=1","_HOSTNAME":"other","_SYSTEMD_INVOCATION_ID":"x",
      | "_STREAM_ID":"y","__MONOTONIC_TIMESTAMP":"999","_PID":"4242"}"""
      .stripMargin.replace("\n", "")

  test("field projection: service/data/time/level/host") {
    val r = Journald.logs(Seq(line).toDF("value"), hostname = "web-1").collect().head
    assert(r.getAs[String]("service") == "sshd")
    assert(r.getAs[String]("data") == "Accepted publickey for root")
    assert(r.getAs[String]("level") == "info") // PRIORITY 6
    assert(r.getAs[String]("host") == "web-1") // configured, not _HOSTNAME
    assert(r.getAs[java.sql.Timestamp]("time").toInstant.toString
      == "2024-01-01T00:00:00.123456Z")
  }

  test("consumed fields dropped; residual fields become tags (ref client.go:48-66)") {
    val tags = Journald.logs(Seq(line).toDF("value"), "web-1")
      .collect().head.getAs[Map[String, String]]("tags")
    assert(tags == Map("_PID" -> "4242"))
  }

  test("priority mapping incl. unknown → \"\" (ref client.go:84-99)") {
    def lv(p: String): String = {
      val j = s"""{"SYSLOG_IDENTIFIER":"s","MESSAGE":"m","PRIORITY":"$p","__REALTIME_TIMESTAMP":"1704067200000000"}"""
      Journald.logs(Seq(j).toDF("value"), "h").collect().head.getAs[String]("level")
    }
    assert(lv("0") == "critical" && lv("2") == "critical")
    assert(lv("3") == "error" && lv("4") == "warning")
    assert(lv("5") == "info" && lv("7") == "debug")
    assert(lv("9") == "" && lv("junk") == "")
  }

  test("ignored services filtered (ref client.go:17-27)") {
    assert(Journald.logs(Seq(line).toDF("value"), "h",
      ignoredServices = Seq("sshd")).count() == 0)
  }
}
