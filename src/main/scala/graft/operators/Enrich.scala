package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-level transforms of the ingestion pipeline (SURVEY.md §2.2).
  *
  * All pure Column/DataFrame functions — no UDFs, so every transform stays
  * inside whole-stage codegen and is safe at any scale.
  */
object Enrich {

  /** T1 — metadata enrichment applied to every record before forwarding
    * (ref: writer.go:27-55): host is overwritten with the agent hostname
    * and static config tags are merged into the record tags, with the
    * static tags winning on key collision (ref loop assigns them last).
    */
  def withMetadata(df: DataFrame, hostname: String, staticTags: Map[String, String]): DataFrame = {
    val static: Column =
      if (staticTags.isEmpty) map().cast("map<string,string>")
      else map(staticTags.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    df.withColumn("host", lit(hostname))
      .withColumn("tags",
        map_concat(
          map_filter(normTags(col("tags")), (k, _) => !map_contains_key(static, k)),
          static))
  }

  /** Tags are never null: absent maps normalize to {} (ref: common/metric.go:34-36). */
  def normTags(tags: Column): Column =
    coalesce(tags, map().cast("map<string,string>"))

  /** T5 — `ParseNumber`: integer parse with 0 on failure (ref: util/strings.go:18-24). */
  def parseNumber(c: Column): Column =
    coalesce(c.try_cast("long"), lit(0L))

  /** T5 — `ParseFloat`: float parse with 0.0 on failure (ref: util/strings.go:26-32). */
  def parseFloat(c: Column): Column =
    coalesce(c.try_cast("double"), lit(0.0))

  /** T5 — `FilterRepeatingSpaces`: whitespace tokenizer dropping empties
    * (ref: util/strings.go:7-16).
    */
  def splitFields(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  /** T6 — sensor name normalization: lowercase, spaces and colons → `_`
    * (ref: collector/sensors.go:18-20).
    */
  def normalizeSensorName(c: Column): Column =
    translate(lower(c), " :", "__")

  /** T9 — syslog priority → level name; unknown priorities map to ""
    * (ref: journal/client.go:84-99).
    */
  def levelFromPriority(priority: Column): Column = {
    val p = priority.try_cast("int")
    when(p.isin(0, 1, 2), "critical")
      .when(p === 3, "error")
      .when(p === 4, "warning")
      .when(p.isin(5, 6), "info")
      .when(p === 7, "debug")
      .otherwise("")
  }

  /** D3 — canonical grouping key for a map column: Spark cannot hash
    * MapType, so series grouping uses the sorted-entries JSON rendering.
    * Deterministic across batch and streaming (SURVEY.md §7.4).
    */
  def tagsKey(tags: Column): Column =
    to_json(map_from_entries(array_sort(map_entries(normTags(tags)))))
}
