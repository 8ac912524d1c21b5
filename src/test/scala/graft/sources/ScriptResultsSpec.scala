package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** B2 ScriptResult parsing (FIXTURES.md §B2; ref: script.go:19-118). */
class ScriptResultsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val collectedAt = lit("2024-02-01 00:00:00").cast("timestamp")

  private val doc =
    """{"metrics":[{"type":"counter","name":"dl.total","value":123456}],
      | "metric":{"type":"gauge","name":"x.y","value":1.5,"time":1704067200,"tags":{"a":"b"}},
      | "logs":[{"service":"myapp","level":"info","data":"hello"}],
      | "event":{"type":"deploy","data":"{\"sha\":\"abc\"}"}}"""
      .stripMargin.replace("\n", "")

  test("singular and plural metric forms both parse") {
    val m = ScriptResults.metrics(Seq(doc).toDF("value"), collectedAt, host = "h1")
      .orderBy("name").collect()
    assert(m.map(_.getAs[String]("name")).toSeq == Seq("dl.total", "x.y"))
    assert(m.forall(_.getAs[String]("host") == "h1"))
  }

  test("unix-seconds time override vs collection-time default (ref script.go:35-37)") {
    val m = ScriptResults.metrics(Seq(doc).toDF("value"), collectedAt)
      .orderBy("name").collect()
    // dl.total has no time → collectedAt; x.y has 1704067200 = 2024-01-01T00:00:00Z
    assert(m(0).getAs[java.sql.Timestamp]("time").toInstant.toString
      == "2024-02-01T00:00:00Z")
    assert(m(1).getAs[java.sql.Timestamp]("time").toInstant.toString
      == "2024-01-01T00:00:00Z")
    assert(m(1).getAs[Map[String, String]]("tags") == Map("a" -> "b"))
  }

  test("logs and events parse with defaults") {
    val l = ScriptResults.logs(Seq(doc).toDF("value"), collectedAt).collect()
    assert(l.length == 1 && l.head.getAs[String]("service") == "myapp")
    val e = ScriptResults.events(Seq(doc).toDF("value"), collectedAt).collect()
    assert(e.length == 1 && e.head.getAs[String]("type") == "deploy")
    assert(e.head.getAs[Map[String, String]]("tags").isEmpty)
  }

  test("unknown metric type dropped; empty doc yields nothing") {
    val bad = """{"metric":{"type":"histogram","name":"n","value":1}}"""
    assert(ScriptResults.metrics(Seq(bad, "{}").toDF("value"), collectedAt).count() == 0)
  }
}
