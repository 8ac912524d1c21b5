package graft.operators

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.Ingest

/** D6 query path — the reference serves tag predicates from bloom skip
  * indexes built at insert time (ref: res/schema.sql:9-10); parquet has no
  * post-hoc index, so the Spark-native equivalent is a one-time re-ingest of
  * the foreign events parquet through [[Ingest.writeTable]] with the hot tag
  * materialized as a typed, bloom-filtered, sort-clustered column. Queries
  * then read the indexed table and their tag predicates push down into the
  * scan (PushedFilters + row-group stats/bloom skipping) instead of
  * JSON-parsing every row — the shape that survives 100 TB, where the
  * unindexed path is a full-corpus `get_json_object` scan.
  *
  * The build cost is ingest-time, not query-time (exactly where ClickHouse
  * pays for its indexes): `ensure` runs once per dataset fingerprint and is
  * a no-op afterwards.
  */
object TagIndex {

  /** Deterministic per-dataset location, fingerprinted by the source
    * parquet's (length, mtime) so a regenerated dataset rebuilds the index
    * instead of serving stale rows.
    */
  private[graft] def indexPath(dir: String): String =
    Artifacts.datasetRoot(dir, "events", "events_tagged")

  /** Build-if-missing; returns the indexed table path. One pass over
    * events: props JSON → `tags` map (wire-model shape, so writeTable also
    * derives `tag_keys`/`tag_values`), plus the hot tag `k` extracted as a
    * typed column and used as the sort key — range predicates prune row
    * groups via min/max, equality via bloom + dictionary.
    *
    * Cross-process safety (two JVMs, e.g. Bench and Verify concurrently,
    * could both pass the `_SUCCESS` check and double-append) is the
    * shared [[Artifacts.ensureRoot]] tmp-build + atomic-rename publish.
    */
  def ensure(spark: SparkSession, dir: String): String =
    Artifacts.ensureRoot(indexPath(dir))(_ => true) { tmp =>
      val ev = Tables.events(spark, dir)
        .withColumn("time", col("ts"))
        .withColumn("tags", from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")))
        .select("time", "event_id", "user_id", "event_type", "value", "tags")
      Ingest.writeTable(ev, tmp, sortKeys = Seq("k"),
        derived = Seq("k" -> col("tags").getItem("k").cast("bigint")))
    }

  /** The indexed events table. */
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(ensure(spark, dir))
}
