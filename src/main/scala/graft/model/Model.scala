package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Core record types of the engine — the three append-only streams the
  * reference ingests (ref: common/metric.go:16-23, common/log.go:5-12,
  * common/event.go:8-14). Tags are never null: absent tags normalize to an
  * empty map (ref: common/metric.go:34-36).
  *
  * Times are Spark `TimestampType` (microsecond precision). The reference
  * stores nanoseconds (res/schema.sql:3); its own downsampled long-term
  * tables are already millisecond, so µs loses nothing that the query
  * surface observes (SURVEY.md §1.4).
  */
final case class Metric(
    time: Timestamp,
    metricType: String, // "gauge" | "counter" (ref: common/metric.go:11-13)
    host: String,
    name: String,
    value: Double,
    tags: Map[String, String])

final case class LogEntry(
    time: Timestamp,
    host: String,
    service: String,
    level: String, // free-form; journald maps syslog priorities (ref: journal/client.go:84-99)
    data: String,
    tags: Map[String, String])

final case class Event(
    time: Timestamp,
    host: String,
    eventType: String,
    data: String, // free-form, often JSON (ref: common/event.go:28-43)
    tags: Map[String, String])

object Schemas {
  val tagsType: MapType =
    MapType(StringType, StringType, valueContainsNull = false)

  val metric: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("metricType", StringType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("tags", tagsType, nullable = false)))

  val logEntry: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("service", StringType, nullable = false),
    StructField("level", StringType, nullable = false),
    StructField("data", StringType, nullable = false),
    StructField("tags", tagsType, nullable = false)))

  val event: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("eventType", StringType, nullable = false),
    StructField("data", StringType, nullable = false),
    StructField("tags", tagsType, nullable = false)))

  /** Wire `Batch` envelope: agent→server JSON with short struct-tag keys
    * (ref: common/batch.go:3-7; FIXTURES.md §B1). Timestamps arrive as
    * RFC3339Nano strings and are parsed to µs.
    */
  val wireMetric: StructType = StructType(Seq(
    StructField("t", StringType), StructField("m", StringType),
    StructField("h", StringType), StructField("n", StringType),
    StructField("v", DoubleType),
    StructField("g", MapType(StringType, StringType))))

  val wireLog: StructType = StructType(Seq(
    StructField("t", StringType), StructField("h", StringType),
    StructField("s", StringType), StructField("l", StringType),
    StructField("d", StringType),
    StructField("g", MapType(StringType, StringType))))

  val wireEvent: StructType = StructType(Seq(
    StructField("t", StringType), StructField("h", StringType),
    StructField("e", StringType), StructField("d", StringType),
    StructField("g", MapType(StringType, StringType))))

  /** Both envelope spellings share the record shapes: the server's
    * submit-batch uses short keys m/l/e (ref: common/batch.go:3-7), the
    * agent's /v1/data uses long keys metrics/logs/events
    * (ref: agent/http.go:36-40). One schema reads either.
    */
  val wireBatch: StructType = StructType(Seq(
    StructField("m", ArrayType(wireMetric)),
    StructField("l", ArrayType(wireLog)),
    StructField("e", ArrayType(wireEvent)),
    StructField("metrics", ArrayType(wireMetric)),
    StructField("logs", ArrayType(wireLog)),
    StructField("events", ArrayType(wireEvent))))

  /** Script stdout document (ref: script.go:19-118; FIXTURES.md §B2):
    * singular and plural forms both valid, optional unix-seconds `time`.
    */
  val scriptMetric: StructType = StructType(Seq(
    StructField("type", StringType), StructField("name", StringType),
    StructField("value", DoubleType), StructField("time", LongType),
    StructField("tags", MapType(StringType, StringType))))

  val scriptLog: StructType = StructType(Seq(
    StructField("service", StringType), StructField("level", StringType),
    StructField("data", StringType), StructField("time", LongType),
    StructField("tags", MapType(StringType, StringType))))

  val scriptEvent: StructType = StructType(Seq(
    StructField("type", StringType), StructField("data", StringType),
    StructField("time", LongType),
    StructField("tags", MapType(StringType, StringType))))

  val scriptResult: StructType = StructType(Seq(
    StructField("metric", scriptMetric),
    StructField("metrics", ArrayType(scriptMetric)),
    StructField("log", scriptLog),
    StructField("logs", ArrayType(scriptLog)),
    StructField("event", scriptEvent),
    StructField("events", ArrayType(scriptEvent))))
}
