package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}
import graft.operators.Enrich

/** Projection of `journalctl --output json` lines into the canonical log
  * stream (S16/T2/T3/T9; ref: journal/client.go:30-82,
  * journal/journalctl/journalctl.go:12-17, FIXTURES.md §B3):
  *
  *  - service = SYSLOG_IDENTIFIER, data = MESSAGE
  *  - time = __REALTIME_TIMESTAMP (µs since epoch, as string)
  *  - level = PRIORITY via the 8-way syslog mapping, unknown → ""
  *  - dropped fields: _HOSTNAME, _SYSTEMD_INVOCATION_ID, _STREAM_ID,
  *    __MONOTONIC_TIMESTAMP, __CURSOR (the cursor's at-least-once resume
  *    role is played by Structured Streaming checkpoints, SURVEY.md §2.5)
  *  - every residual field becomes a tag
  *
  * The whole projection is map functions over one `from_json` — codegen'd,
  * no UDFs.
  */
object Journald {

  private val consumed = Seq(
    "SYSLOG_IDENTIFIER", "MESSAGE", "PRIORITY", "__REALTIME_TIMESTAMP",
    "_HOSTNAME", "_SYSTEMD_INVOCATION_ID", "_STREAM_ID",
    "__MONOTONIC_TIMESTAMP", "__CURSOR")

  /** @param ignoredServices drop entries from these services entirely
    *        (ref: journal/client.go:17-27,50-52)
    */
  def logs(jsonLines: DataFrame, hostname: String,
      ignoredServices: Seq[String] = Nil, column: String = "value"): DataFrame = {
    val fields = from_json(col(column), MapType(StringType, StringType))
    jsonLines
      .select(fields.as("j"))
      .filter(col("j").isNotNull)
      .select(
        timestamp_micros(element_at(col("j"), "__REALTIME_TIMESTAMP")
          .try_cast("long")).as("time"),
        lit(hostname).as("host"),
        coalesce(element_at(col("j"), "SYSLOG_IDENTIFIER"), lit("")).as("service"),
        Enrich.levelFromPriority(element_at(col("j"), "PRIORITY")).as("level"),
        coalesce(element_at(col("j"), "MESSAGE"), lit("")).as("data"),
        map_filter(col("j"), (k, _) => !k.isin(consumed: _*)).as("tags"))
      .filter(col("time").isNotNull &&
        (if (ignoredServices.isEmpty) lit(true)
         else !col("service").isin(ignoredServices: _*)))
  }
}
