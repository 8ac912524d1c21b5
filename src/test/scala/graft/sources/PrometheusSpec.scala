package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** B4 exposition-format parsing (FIXTURES.md §B4; ref: prom/scrape.go:52-101). */
class PrometheusSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val at = lit("2024-01-01 00:00:00").cast("timestamp")

  private val exposition = Seq(
    "# TYPE process_cpu_seconds_total counter",
    """process_cpu_seconds_total{instance="a",env="prod"} 42.5""",
    "# TYPE go_goroutines gauge",
    "go_goroutines 12",
    "# TYPE http_req_duration histogram",
    """http_req_duration_bucket{le="1"} 3""",
    "# TYPE some_gauge gauge",
    "some_gauge NaN",
    "")

  test("gauge/counter parsed; histogram family and NaN dropped") {
    val m = Prometheus.metrics(exposition.toDF("value"), at).orderBy("name").collect()
    assert(m.map(_.getAs[String]("name")).toSeq == Seq("go_goroutines", "process_cpu_seconds_total"))
    assert(m(0).getAs[String]("type") == "gauge")
    assert(m(1).getAs[String]("type") == "counter")
    assert(m(1).getAs[Double]("value") == 42.5)
  }

  test("labels merge OVER config tags; prefix applied (ref scrape.go:69-82)") {
    val m = Prometheus.metrics(exposition.toDF("value"), at,
        configTags = Map("env" -> "config", "dc" -> "eu"), prefix = "svc.")
      .filter(col("name") === "svc.process_cpu_seconds_total").collect().head
    assert(m.getAs[Map[String, String]]("tags")
      == Map("instance" -> "a", "env" -> "prod", "dc" -> "eu"))
  }

  test("unlabeled samples get config tags only") {
    val m = Prometheus.metrics(exposition.toDF("value"), at,
        configTags = Map("dc" -> "eu"))
      .filter(col("name") === "go_goroutines").collect().head
    assert(m.getAs[Map[String, String]]("tags") == Map("dc" -> "eu"))
  }

  test("repeated TYPE lines across payloads do not duplicate samples") {
    val twoPayloads = exposition ++ exposition.filterNot(_.contains("42.5"))
    val m = Prometheus.metrics(twoPayloads.toDF("value"), at)
    // one TYPE comment per family per payload; the 42.5 sample appears once
    // in the input and must appear exactly once in the output
    assert(m.filter(col("value") === 42.5).count() == 1)
    assert(m.filter(col("name") === "go_goroutines").count() == 2) // 2 samples in
  }

  test("duplicate label names keep the last value instead of failing the batch") {
    val lines = Seq(
      "# TYPE q gauge",
      """q{env="a",env="b",other="x"} 1""")
    val m = Prometheus.metrics(lines.toDF("value"), at).collect().head
    assert(m.getAs[Map[String, String]]("tags") == Map("env" -> "b", "other" -> "x"))
  }

  test("label values with commas, '=', and escaped quotes survive (expfmt)") {
    val lines = Seq(
      "# TYPE q gauge",
      """q{path="/a,b",expr="x=y",msg="say \"hi\"",win="c:\\tmp"} 1""")
    val m = Prometheus.metrics(lines.toDF("value"), at).collect().head
    assert(m.getAs[Map[String, String]]("tags") == Map(
      "path" -> "/a,b", "expr" -> "x=y", "msg" -> "say \"hi\"", "win" -> "c:\\tmp"))
  }
}
