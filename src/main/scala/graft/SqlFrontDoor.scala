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

  /** Register every dataset table as a temp view bound to `dir` — the
    * existing [[Tables.registerViews]] (events ts-normalized, native
    * functions included), called UNCONDITIONALLY by each SQL-authored
    * query. Deliberately not memoized: temp-view names are session
    * catalog state this object does not own (specs and user code call
    * Tables.registerViews for other dirs, or drop views), so a cached
    * "already registered" answer can silently serve another dataset's
    * plan — wrong results with no error. Re-registration costs a few
    * parquet footer reads, the price of a front door that is always
    * pointed at the dataset it claims. Concurrent registration for
    * DIFFERENT dirs in one session races on the shared names by
    * construction of temp views — one session, one dataset at a time
    * is the contract, same as any shared catalog.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.registerViews(spark, dir)

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

  /** SQL face of [[graft.operators.EventOps.topK]] — the top-k class a
    * dashboard's "heaviest series" panel is written in: hash-aggregate
    * with map-side partial combine, then a sort over only
    * #distinct-types rows, LIMIT-pruned.
    */
  def sqlTopK(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT event_type, COUNT(1) AS cnt FROM events
        |GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 3""".stripMargin)
  }

  /** SQL face of [[graft.operators.EventOps.rate]] — the lag-window
    * counter-rate class (the canonical monitoring query): the window
    * computes in a subquery so the NOT-NULL filter and the final
    * projection sit above it exactly like the DSL's
    * withColumn→filter→select chain.
    */
  def sqlRate(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    // the subquery is `SELECT *, … AS delta` — the DSL twin's withColumn
    // shape — so column PRUNING generates the inner projection in
    // relation order on both front doors; an explicit column list here
    // would pin a different projection order and fail the sameResult pin
    // on a cosmetic difference
    spark.sql(
      """SELECT user_id, event_id, delta FROM (
        |  SELECT *,
        |    value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
        |  FROM events)
        |WHERE delta IS NOT NULL
        |ORDER BY user_id, event_id""".stripMargin)
  }

  /** SQL face of [[graft.operators.EventOps.session]] — gap-based
    * sessionization through SQL's `session_window` table function
    * (30-minute inactivity gap), the T8 audit-reassembly class.
    */
  def sqlSession(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT user_id, session_window.start AS session_start, n_events FROM (
        |  SELECT session_window(ts, '30 minutes') AS session_window, user_id,
        |    COUNT(1) AS n_events
        |  FROM events
        |  GROUP BY session_window(ts, '30 minutes'), user_id)
        |ORDER BY user_id, session_start""".stripMargin)
  }

  /** SQL face of [[graft.operators.EventOps.tagFilter]] (D6 — and the
    * first INDEX-SERVED class through the front door): the maintained
    * tag-indexed table registers as its own view, so external SQL
    * reaches the ingest-amortized serving path — typed `k` predicate
    * pushed into the parquet scan (row-group stats + bloom), never a
    * per-row JSON parse — with the identical plan the DSL face gets
    * (sameResult-pinned). Registered unconditionally per call, the
    * [[registerViews]] rationale: view names are session state this
    * object does not own.
    */
  def sqlTagFilter(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    graft.operators.TagIndex.events(spark, dir)
      .createOrReplaceTempView("events_tagged")
    spark.sql(
      """SELECT event_id, user_id, k FROM events_tagged
        |WHERE k > 50 ORDER BY event_id""".stripMargin)
  }

  /** SQL face of [[graft.operators.EventOps.distinctApprox]] — and the
    * first CUSTOM-AGGREGATE class through the front door: the KMV
    * sketch ([[graft.functions.KmvAgg]], a TypedImperativeAggregate) is
    * called by NAME from SQL text ([[Tables.registerViews]] registers
    * the native functions alongside the views), with the md5-60-bit
    * hash spelled as the same expression chain the DSL's h60 builds —
    * proving the engine's sketch surface, not just its built-ins, is
    * reachable from plain SQL with the identical plan.
    */
  def sqlDistinctApprox(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT to_date(ts) AS day,
        |  kmv_count_distinct_exact(
        |    CAST(conv(substring(md5(CAST(CAST(user_id AS STRING) AS BINARY)), 1, 15), 16, 10) AS BIGINT),
        |    64) AS approx_users
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin)
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
