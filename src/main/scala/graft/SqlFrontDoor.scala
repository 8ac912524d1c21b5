package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-SQL entry-point parity (SURVEY.md §3.3, r11): the
  * reference's real query surface is SQL text over its tables
  * (ClickHouse SQL over `yamon.lts_*` — ref: res/schema.sql, the
  * dashboards' own queries), so the engine's capability must be
  * reachable through the SQL front door, not only the Scala DSL. The
  * datasets register as temp views (through [[Tables]]' normalizing
  * readers, so SQL sees the same surface types the DSL does — the
  * events `ts` generation differences never leak into view consumers),
  * and the declared q_sql_* twins are authored as `spark.sql` TEXT
  * against those views, hash-checked by the same DuckDB oracles as
  * their DSL twins. PlanSpec pins plan IDENTITY (sameResult on the
  * optimized plans): the SQL face is the same declarative plan, so
  * every pushdown/partial-agg property the DSL twins carry holds
  * verbatim — Catalyst does not care which front door the plan came
  * through.
  */
object SqlFrontDoor {

  // last (session, dir) registered — registration itself is scan-free
  // but not footer-free (Tables.events inspects the ts encoding, and
  // ten createOrReplaceTempView calls re-read ten parquet footers), so
  // repeated same-dir invocations (bench iterations, a dashboard
  // refresh) skip it. A dir change re-registers: views capture the
  // plan at registration time.
  @volatile private var registeredFor: (SparkSession, String) = null

  /** Register every dataset table as a temp view bound to `dir`.
    * Called by each SQL-authored query; idempotent and cached per
    * (session, dir).
    */
  def registerViews(spark: SparkSession, dir: String): Unit = synchronized {
    if (registeredFor == ((spark, dir))) return
    registerViewsAlways(spark, dir)
    registeredFor = (spark, dir)
  }

  private def registerViewsAlways(spark: SparkSession, dir: String): Unit = {
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    Tables.region(spark, dir).createOrReplaceTempView("region")
    Tables.part(spark, dir).createOrReplaceTempView("part")
  }

  /** SQL face of [[graft.operators.EventOps.bucketAvg]] (D1 — the gauge
    * materialized view): identical expression tree (exact decimal sum,
    * one double division), so the optimized plan is the DSL twin's.
    */
  def sqlBucketAvg(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT date_trunc('minute', ts) AS bucket, event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(1) AS avg_value,
        |  COUNT(1) AS n
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin)
  }

  /** SQL face of [[graft.operators.EventOps.bucketSum]] (D2 — the
    * counter materialized view).
    */
  def sqlBucketSum(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT date_trunc('minute', ts) AS bucket, event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  COUNT(1) AS n
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin)
  }

  /** SQL face of [[graft.operators.EventOps.downsampleLts]] (D1+D2
    * unioned — the flagship MV semantics).
    */
  def sqlDownsampleLts(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    // bucket materializes in an inner projection BEFORE grouping (the
    // DSL twin's withColumn shape) so both front doors optimize to the
    // identical plan — grouping directly on the date_trunc expression
    // would leave an extra grouping-expression alias in the aggregate
    // and fail the PlanSpec sameResult pin
    spark.sql(
      """WITH b AS (SELECT event_type, value, date_trunc('minute', ts) AS bucket
        |           FROM events)
        |SELECT * FROM (
        |  SELECT bucket, event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(1) AS value,
        |    'gauge' AS kind
        |  FROM b WHERE event_type IN ('view', 'click') GROUP BY bucket, event_type
        |  UNION ALL
        |  SELECT bucket, event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value,
        |    'counter' AS kind
        |  FROM b WHERE event_type NOT IN ('view', 'click') GROUP BY bucket, event_type
        |) ORDER BY bucket, event_type""".stripMargin)
  }
}
