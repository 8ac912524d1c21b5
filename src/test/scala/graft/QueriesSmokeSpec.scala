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

  test("approx distinct (KMV k=64 md5 tier) tracks the exact count within sketch error") {
    import graft.operators.EventOps
    def byDay(df: org.apache.spark.sql.DataFrame, cnt: String) = df.collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long](cnt)).toMap
    val exact = byDay(EventOps.distinctDaily(spark, "/root/testdata/sf0.01"), "n_users")
    val approx = byDay(EventOps.distinctApprox(spark, "/root/testdata/sf0.01"), "approx_users")
    assert(exact.keySet == approx.keySet)
    // KMV at k=64 concentrates with relative std ~1/sqrt(k-2) ≈ 12.7%
    // (KmvAggSpec pins both regimes; the driver hash-checks exactness of
    // the estimator itself). Per-day: ~4.5 sigma so 30 independent days
    // don't flake; corpus-level: the mean |relative error| expectation
    // is sigma*sqrt(2/pi) ≈ 10% — bound it at 20% (+4 sigma of the mean)
    val rels = exact.toSeq.map { case (day, ex) =>
      val rel = math.abs(approx(day) - ex).toDouble / math.max(ex, 1L)
      assert(math.abs(approx(day) - ex) <= math.max(3.0, ex * 0.6),
        s"$day: approx ${approx(day)} vs exact $ex")
      rel
    }
    val meanRel = rels.sum / rels.size
    assert(meanRel <= 0.2, s"mean |relative error| $meanRel > 0.2")
  }

  test("every oracleSql key has a matching query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql without queries: $unknown")
  }
}
