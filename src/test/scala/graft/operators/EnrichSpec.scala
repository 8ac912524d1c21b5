package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.TestSpark

/** T1/T5/T6/T9 transforms + D3 tag canonicalization (SURVEY.md §2.2). */
class EnrichSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("withMetadata: host overwritten, static tags win on collision (ref writer.go:27-35)") {
    val df = Seq(("old-host", Map("env" -> "record", "keep" -> "me")))
      .toDF("host", "tags")
    val out = Enrich.withMetadata(df, "web-1", Map("env" -> "static", "dc" -> "eu"))
      .collect().head
    assert(out.getAs[String]("host") == "web-1")
    assert(out.getAs[Map[String, String]]("tags")
      == Map("env" -> "static", "dc" -> "eu", "keep" -> "me"))
  }

  test("withMetadata: null tags normalize to static map (ref common/metric.go:34-36)") {
    val df = Seq(("h", Option.empty[Map[String, String]])).toDF("host", "tags")
    assert(Enrich.withMetadata(df, "w", Map("a" -> "b")).collect().head
      .getAs[Map[String, String]]("tags") == Map("a" -> "b"))
  }

  test("parseNumber/parseFloat: 0 on failure (ref util/strings.go:18-32)") {
    val df = Seq("42", "3.9", "junk", "").toDF("s")
      .select(Enrich.parseNumber(col("s")).as("n"), Enrich.parseFloat(col("s")).as("f"))
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(42L, 0L, 0L, 0L)) // "3.9" not an int
    assert(rows.map(_.getDouble(1)).toSeq == Seq(42.0, 3.9, 0.0, 0.0))
  }

  test("splitFields drops repeated-space empties (ref util/strings.go:7-16)") {
    val out = Seq("a  b   c ").toDF("s")
      .select(Enrich.splitFields(col("s"))).as[Seq[String]].collect().head
    assert(out == Seq("a", "b", "c"))
  }

  test("sensor name normalization (ref collector/sensors.go:18-20)") {
    val out = Seq("Core 0: Temp").toDF("s")
      .select(Enrich.normalizeSensorName(col("s"))).as[String].collect().head
    assert(out == "core_0__temp")
  }

  test("tagsKey: canonical under key order (D3) — sampled property") {
    val gen = Gen.mapOf(Gen.zip(Gen.alphaStr.suchThat(_.nonEmpty), Gen.alphaStr))
    // one Spark job over 20 generated maps, each paired with a re-ordered copy
    val samples = Iterator.continually(gen.sample).flatten.take(20).toSeq
    val df = samples.map(m => (m, m.toSeq.reverse.toMap)).toDF("a", "b")
      .select(Enrich.tagsKey(col("a")).as("ka"), Enrich.tagsKey(col("b")).as("kb"))
    df.collect().foreach(r => assert(r.getString(0) == r.getString(1)))
  }
}
