package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs end-to-end on sf0.001 and yields rows; full
  * value-level checking is the driver's DuckDB oracle (SURVEY.md §5.1) —
  * this spec guards against plan-breaking regressions in `sbt test`.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // pair-finding queries can legitimately be empty at this tiny SF
  private val mayBeEmpty = Set("q_token_jaccard", "q_minhash_lsh",
    "q_minhash_shingle", "q_simhash", "q_embed_near_dup")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, dir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry smoke (driver contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx percentiles track the exact definition (value-level)") {
    import graft.operators.EventOps
    def byType(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    val exact = byType(EventOps.valuePercentiles(spark, "/root/testdata/sf0.01"))
    val approx = byType(EventOps.valuePercentilesApprox(spark, "/root/testdata/sf0.01"))
    exact.foreach { case (t, (p50, p95)) =>
      val (a50, a95) = approx(t)
      assert(math.abs(a50 - p50) <= math.max(2.0, p50 * 0.05), s"$t p50 $a50 vs $p50")
      assert(math.abs(a95 - p95) <= math.max(2.0, p95 * 0.05), s"$t p95 $a95 vs $p95")
    }
  }

  test("approx distinct (HLL++, rsd 0.01) tracks the exact count within 5 sigma") {
    import graft.operators.EventOps
    def byDay(df: org.apache.spark.sql.DataFrame, cnt: String) = df.collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long](cnt)).toMap
    val exact = byDay(EventOps.distinctDaily(spark, "/root/testdata/sf0.01"), "n_users")
    val approx = byDay(EventOps.distinctApprox(spark, "/root/testdata/sf0.01"), "approx_users")
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (day, ex) =>
      // HLL++ error is ~gaussian with the configured rsd: 5 sigma = 5% here
      // (plus a small absolute floor for tiny daily cardinalities)
      val tol = math.max(3.0, ex * 0.01 * 5)
      assert(math.abs(approx(day) - ex) <= tol,
        s"$day: approx ${approx(day)} vs exact $ex (tol $tol)")
    }
  }

  test("every oracleSql key has a matching query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql without queries: $unknown")
  }
}
