package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Schemas
import graft.operators.Enrich

/** Parsers for the agent→server wire protocol: a column of JSON `Batch`
  * envelopes (`{"m":[...],"l":[...],"e":[...]}` with short struct-tag keys,
  * ref: common/batch.go:3-7, FIXTURES.md §B1) → the three canonical record
  * streams. Works identically on batch and streaming DataFrames — this is
  * the S23 ingestion boundary (`POST /v1/submit-batch`,
  * ref: forward_server.go:58-79).
  *
  * Malformed JSON yields a null struct from `from_json` and the record is
  * dropped, mirroring the reference's decode-and-reject behavior
  * (ref: forward_server.go:58-63) without failing the stream.
  */
object Wire {

  /** RFC3339Nano strings (ref: Go time.Time JSON encoding); nanosecond
    * digits beyond Spark's µs are truncated (SURVEY.md §1.4).
    */
  private[sources] def parseTime(c: Column): Column = c.try_cast("timestamp")

  /** S23 auth gate (ref: forward_server.go:38-56): each envelope row
    * carries its transport `Authorization` value in `authColumn` as
    * `name:key`; rows survive only when the name is a known sender and the
    * key matches. An empty `keys` map accepts everything (the reference's
    * nil-keys server). Malformed values (no / multiple colons, unknown
    * name, wrong key) are dropped, and drops are counted on the riding
    * [[graft.streaming.IngestMetrics.authObservationName]] observation —
    * the 401 counter without a second pass over the stream.
    */
  def authorized(df: DataFrame, keys: Map[String, String],
      authColumn: String = "auth"): DataFrame = {
    if (keys.isEmpty) return df
    val parts = split(col(authColumn), ":", -1)
    val ok = size(parts) === 2 &&
      element_at(typedlit(keys), parts.getItem(0)) === parts.getItem(1)
    df.observe(graft.streaming.IngestMetrics.authObservationName,
        count(lit(1)).as("received"),
        coalesce(sum(when(ok, 0L).otherwise(1L)), lit(0L)).as("dropped"))
      .filter(ok)
  }

  private def envelope(jsonLines: DataFrame, column: String): DataFrame =
    jsonLines.select(from_json(col(column), Schemas.wireBatch).as("b"))
      .filter(col("b").isNotNull)

  // short (server submit-batch) and long (agent /v1/data) key spellings
  // are both valid envelopes; records under either key parse identically.
  // TRUE UNION of both keys per envelope — explode of an absent (null)
  // array emits nothing, so neither spelling can shadow the other when a
  // producer ever sends both
  private def records(env: DataFrame, short: String, long: String): DataFrame =
    env.select(explode(col(s"b.$short")).as("r"))
      .unionByName(env.select(explode(col(s"b.$long")).as("r")))

  /** Metric stream: only `gauge`/`counter` survive — any other type is
    * dropped, the *intended* semantics of the reference's script decode
    * (ref: script.go:29-38 leaves other types nil; we do not replicate the
    * nil-deref, SURVEY.md §7.4).
    */
  def metrics(jsonLines: DataFrame, column: String = "value"): DataFrame =
    records(envelope(jsonLines, column), "m", "metrics")
      .select(
        parseTime(col("r.t")).as("time"),
        col("r.m").as("type"),
        coalesce(col("r.h"), lit("")).as("host"),
        col("r.n").as("name"),
        col("r.v").as("value"),
        Enrich.normTags(col("r.g")).as("tags"))
      .filter(col("time").isNotNull && col("name").isNotNull &&
        col("type").isin("gauge", "counter"))

  /** Log stream; absent level defaults to "" (ref: common/log.go:21). */
  def logs(jsonLines: DataFrame, column: String = "value"): DataFrame =
    records(envelope(jsonLines, column), "l", "logs")
      .select(
        parseTime(col("r.t")).as("time"),
        coalesce(col("r.h"), lit("")).as("host"),
        col("r.s").as("service"),
        coalesce(col("r.l"), lit("")).as("level"),
        coalesce(col("r.d"), lit("")).as("data"),
        Enrich.normTags(col("r.g")).as("tags"))
      .filter(col("time").isNotNull && col("service").isNotNull)

  /** Event stream (ref: common/event.go:8-14). */
  def events(jsonLines: DataFrame, column: String = "value"): DataFrame =
    records(envelope(jsonLines, column), "e", "events")
      .select(
        parseTime(col("r.t")).as("time"),
        coalesce(col("r.h"), lit("")).as("host"),
        col("r.e").as("type"),
        coalesce(col("r.d"), lit("")).as("data"),
        Enrich.normTags(col("r.g")).as("tags"))
      .filter(col("time").isNotNull && col("type").isNotNull)
}

/** Parser for script stdout documents (`ScriptResult`, ref: script.go:77-86,
  * FIXTURES.md §B2): singular and plural forms both valid, optional
  * unix-seconds `time` override; records without a time use the supplied
  * collection time (the reference stamps time.Now at parse,
  * ref: script.go:35-37).
  *
  * NOTE divergence from the reference, by design (SURVEY.md §7.4): the
  * streaming-script path actually *emits* parsed records (the reference
  * drops them, script.go:184-189), and unknown metric types are dropped
  * instead of panicking (script.go:29-38).
  */
object ScriptResults {

  private def ts(unixSecs: Column, collectedAt: Column): Column =
    coalesce(timestamp_seconds(unixSecs), collectedAt)

  private def docs(jsonLines: DataFrame, column: String): DataFrame =
    jsonLines.select(from_json(col(column), Schemas.scriptResult).as("r"))
      .filter(col("r").isNotNull)

  /** Singular field ∪ plural array, as one exploded record column. */
  private def forms(doc: DataFrame, singular: String, plural: String): DataFrame =
    doc.filter(col(s"r.$singular").isNotNull).select(col(s"r.$singular").as("x"))
      .unionByName(
        doc.filter(col(s"r.$plural").isNotNull)
          .select(explode(col(s"r.$plural")).as("x")))

  /** Metrics from one-or-many documents: `metric` ∪ `metrics[]`. */
  def metrics(jsonLines: DataFrame, collectedAt: Column, host: String = "",
      column: String = "value"): DataFrame =
    forms(docs(jsonLines, column), "metric", "metrics")
      .select(
        ts(col("x.time"), collectedAt).as("time"),
        col("x.type").as("type"),
        lit(host).as("host"),
        col("x.name").as("name"),
        col("x.value").as("value"),
        Enrich.normTags(col("x.tags")).as("tags"))
      .filter(col("name").isNotNull && col("type").isin("gauge", "counter"))

  /** Logs: `log` ∪ `logs[]`; absent level → "" (ref: script.go:49-52). */
  def logs(jsonLines: DataFrame, collectedAt: Column, host: String = "",
      column: String = "value"): DataFrame =
    forms(docs(jsonLines, column), "log", "logs")
      .select(
        ts(col("x.time"), collectedAt).as("time"),
        lit(host).as("host"),
        col("x.service").as("service"),
        coalesce(col("x.level"), lit("")).as("level"),
        coalesce(col("x.data"), lit("")).as("data"),
        Enrich.normTags(col("x.tags")).as("tags"))
      .filter(col("service").isNotNull)

  /** Events: `event` ∪ `events[]` (ref: script.go:66-75). */
  def events(jsonLines: DataFrame, collectedAt: Column, host: String = "",
      column: String = "value"): DataFrame =
    forms(docs(jsonLines, column), "event", "events")
      .select(
        ts(col("x.time"), collectedAt).as("time"),
        lit(host).as("host"),
        col("x.type").as("type"),
        coalesce(col("x.data"), lit("")).as("data"),
        Enrich.normTags(col("x.tags")).as("tags"))
      .filter(col("type").isNotNull)
}
