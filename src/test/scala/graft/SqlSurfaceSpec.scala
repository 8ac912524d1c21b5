package graft

import org.scalatest.funsuite.AnyFunSuite

/** The plain-SQL surface: registered views + native functions make the
  * whole engine reachable from `spark.sql` (the reference's users query
  * ClickHouse with raw SQL — parity includes this entry point).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  Tables.registerViews(spark, "/root/testdata/sf0.001")

  test("bucketed aggregation over events via spark.sql") {
    val n = spark.sql(
      """SELECT date_trunc('minute', ts) AS bucket, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin).count()
    assert(n > 0)
  }

  test("joins across registered views") {
    val top = spark.sql(
      """SELECT c_mktsegment, count(*) AS n FROM events
        |JOIN customer ON user_id = c_custkey GROUP BY 1 ORDER BY n DESC""".stripMargin)
      .collect()
    assert(top.nonEmpty && top.head.getLong(1) > 0)
  }

  test("native functions available in SQL alongside the views") {
    val d = spark.sql(
      "SELECT max(vec_dot(embedding, embedding)) FROM embeddings")
      .collect().head.getDouble(0)
    assert(d > 0.0)
  }

  test("the r12 SQL-authored twins return the DSL faces' exact rows " +
      "(window, session, top-k classes)") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().toSeq.map(_.toString)
    assert(rows(SqlFrontDoor.sqlTopK(spark, dir))
      === rows(operators.EventOps.topK(spark, dir)))
    assert(rows(SqlFrontDoor.sqlRate(spark, dir))
      === rows(operators.EventOps.rate(spark, dir)))
    assert(rows(SqlFrontDoor.sqlSession(spark, dir))
      === rows(operators.EventOps.session(spark, dir)))
    assert(SqlFrontDoor.sqlSession(spark, dir).count() > 0)
    assert(rows(SqlFrontDoor.sqlTagFilter(spark, dir))
      === rows(operators.EventOps.tagFilter(spark, dir)))
    assert(rows(SqlFrontDoor.sqlDistinctApprox(spark, dir))
      === rows(operators.EventOps.distinctApprox(spark, dir)))
    // the r14 quantile-summary twin: SQL-parsed inner aggregate routed
    // onto the same maintained histogram rollup, same rows
    assert(rows(SqlFrontDoor.sqlPercentilesApprox(spark, dir))
      === rows(operators.EventOps.valuePercentilesApprox(spark, dir)))
    // the r14 corpus-stats twin: the SQL-parsed count/sum/token-total
    // aggregate routed onto the same per-(lang, source) rollup
    // (engagement required inside the face), same rows as the DSL face
    assert(rows(SqlFrontDoor.sqlRouteStats(spark, dir))
      === rows(graft.plans.CorpusRoute.routedStats(spark, dir)))
    assert(SqlFrontDoor.sqlRouteStats(spark, dir).count() > 0)
  }

  test("the SQL-authored BM25 face returns the index-served DSL face's " +
      "exact rows (r13 — the retrieval class through the front door)") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().toSeq.map(_.toString)
    val got = rows(SqlFrontDoor.sqlBm25Indexed(spark, dir))
    assert(got.nonEmpty, "SQL BM25 face returned no rows; pin vacuous")
    assert(got === rows(operators.TextIndex.bm25TopKIndexed(spark, dir)))
    // and the raw-scan face — all three serving paths, one answer
    assert(got === rows(operators.TextOps.bm25TopK(spark, dir)))
    // the positional class too: SQL-authored phrase counts equal the
    // DSL index serving exactly
    val phrase = rows(SqlFrontDoor.sqlPhraseSearch(spark, dir))
    assert(phrase.nonEmpty, "SQL phrase face returned no rows; pin vacuous")
    assert(phrase === rows(operators.TextIndex.phraseSearch(spark, dir)))
    // and the fused stack: SQL-authored RRF equals the DSL hybrid
    val hybrid = rows(SqlFrontDoor.sqlHybridSearch(spark, dir))
    assert(hybrid.nonEmpty, "SQL hybrid face returned no rows; pin vacuous")
    assert(hybrid === rows(operators.VectorOps.hybridSearch(spark, dir)))
  }

  test("the SQL-authored winnow-match face returns the index-served DSL " +
      "face's exact rows (r15 — the plagiarism/attribution class " +
      "through the front door)") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().toSeq.map(_.toString)
    val got = rows(SqlFrontDoor.sqlWinnowMatch(spark, dir))
    assert(got.nonEmpty, "SQL winnow face returned no rows; pin vacuous")
    // serves the SAME maintained fingerprint set as the DSL face — the
    // SQL-authored probe winnowing must reproduce winnowOver exactly
    assert(got === rows(operators.TextOps.winnowMatchIndexed(spark, dir)))
    // ...and the per-query recompute face — three paths, one answer
    assert(got === rows(operators.TextOps.winnowMatch(spark, dir)))
    // matched documents exist in the fixture (the triage signal is live)
    assert(SqlFrontDoor.sqlWinnowMatch(spark, dir)
      .filter(org.apache.spark.sql.functions.col("n_matched") > 0)
      .count() > 0)
  }

  test("minhash_agg sketch aggregate usable from SQL") {
    val rows = spark.sql(
      """SELECT lang, minhash_agg(xxhash64(tok)) AS sig FROM (
        |  SELECT lang, explode(split(text, ' ')) AS tok FROM documents)
        |GROUP BY lang""".stripMargin).collect()
    assert(rows.nonEmpty &&
      rows.forall(_.getSeq[Long](1).size == 16))
  }
}
