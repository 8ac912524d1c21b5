package graft.operators

import java.io.File
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * pays for its indexes); since r13 the artifact is MAINTAINED like the
  * other index families rather than one-shot: [[ensure]] builds through
  * the real prefix+[[appendTo]]+[[compactDates]] chain (in-builder segment
  * requires make the exercise structural), a continuous maintainer folds
  * new event slices in at date-partition grain, compaction is
  * date-dir-local through the shared [[Artifacts.swapStagedDirs]] crash
  * chain, and serving refuses crashed-swap residue loudly.
  *
  * Replay semantics differ from the value-idempotent families on purpose:
  * events are BAG rows (a duplicated event row changes query answers,
  * where a duplicated fingerprint/hash row never does), so appends under
  * at-least-once delivery must carry an `appendTag` — the TextIndex
  * postings protocol: tagged segment files, a replay first DELETES files
  * carrying its own tag, so every crash point converges to exactly-once.
  * Untagged appends are for exactly-once callers (the ensure chain).
  */
object TagIndex {

  /** Deterministic per-dataset location, fingerprinted by the source
    * parquet's (length, mtime) so a regenerated dataset rebuilds the index
    * instead of serving stale rows.
    */
  private[graft] def indexPath(dir: String): String =
    Artifacts.datasetRoot(dir, "events", "events_tagged")

  /** The ONE wire-model shaping every write path runs (build, append) —
    * props JSON → `tags` map (so writeTable also derives
    * `tag_keys`/`tag_values`), shared so the maintained slices can never
    * drift from the build's schema.
    */
  private def shaped(ev: DataFrame): DataFrame =
    ev.withColumn("time", col("ts"))
      .withColumn("tags", from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")))
      .select("time", "event_id", "user_id", "event_type", "value", "tags")

  /** The hot tag `k` extracted as a typed sort/bloom column — range
    * predicates prune row groups via min/max, equality via
    * bloom + dictionary.
    */
  private def hotTag: Seq[(String, Column)] =
    Seq("k" -> col("tags").getItem("k").cast("bigint"))

  /** The bloom columns [[Ingest.writeTable]] enables for this table —
    * [[compactDates]]' rewrite must re-enable exactly these, or a
    * compaction would silently strip the index the table exists for.
    */
  private val bloomCols = Seq(
    "tag_keys.list.element", "tag_values.list.element", "k")

  /** Build-if-missing; returns the indexed table path. Built the way
    * production MAINTAINS the table (the WinnowIndex/VectorIndex/
    * MediaHashIndex ensure pattern): a deterministic prefix of the
    * events (event_id % 5 ≠ 1) through the one-shot [[Ingest.writeTable]]
    * ingest, the remainder folded in with [[appendTo]], then
    * [[compactDates]] — so the hash-green q_tag_filter /
    * q_sql_tag_filter driver rows stand behind the append+compact
    * maintenance chain, not just the build path. Cross-process safety
    * (two JVMs could both pass the `_SUCCESS` check) is the shared
    * [[Artifacts.ensureRoot]] tmp-build + atomic-rename publish.
    */
  def ensure(spark: SparkSession, dir: String): String =
    Artifacts.ensureRoot(indexPath(dir))(_ => true) { tmp =>
      val ev = Tables.events(spark, dir)
      val prefix = ev.filter(col("event_id") % 5 =!= 1)
      val rest = ev.filter(col("event_id") % 5 === 1)
      Ingest.writeTable(shaped(prefix), tmp, sortKeys = Seq("k"),
        derived = hotTag)
      // structural requires guarded by the degenerate-slice escape (the
      // family-wide pattern): an empty dataset still builds a servable
      // empty table, never strands prepare behind a vacuous proof
      val segsAfterBuild = segments(tmp)
      appendTo(tmp, rest)
      require(segments(tmp) == segsAfterBuild + 1 || rest.isEmpty,
        "tag index append did not add a segment — the maintenance path " +
          "this artifact exists to prove was not exercised")
      compactDates(tmp, spark)
      require(segments(tmp) == 1 || ev.isEmpty,
        s"tag index compact left ${segments(tmp)} segments, expected 1")
    }

  /** Fold a NEW event slice in (wire-model shaping applied here — the
    * caller hands raw events): lands as ONE tagged segment file per
    * touched date dir by staged write + per-file rename, date-slice-sized
    * work. With `appendTag` = (streamId, batchId) the append is
    * REPLAY-IDEMPOTENT — a replay first deletes files carrying its own
    * tag, so a half-published crashed attempt is overwritten, never
    * double-counted (events are bag rows; the value-idempotence the
    * fingerprint families rely on does not apply). Untagged appends get
    * a unique adhoc tag and require an exactly-once caller.
    */
  def appendTo(root: String, newEvents: DataFrame,
      appendTag: Option[(String, String)] = None): Unit = {
    require(new File(root).isDirectory,
      s"appendTo on $root with no table — build or recover first")
    val (owner, sticky) = Artifacts.leaseIdentity(appendTag)
    Artifacts.withLease(root, owner, sticky) {
      val prefix = Artifacts.segPrefix(appendTag)
      if (appendTag.isDefined)
        Artifacts.deleteTaggedFiles(root, "date=", prefix)
      // dot-prefixed stage: invisible to parquet readers while staging;
      // recover sweeps a crashed attempt's leftovers
      val stage = s"$root/.tmp-append-${java.util.UUID.randomUUID()}"
      // one pre-write partition bounds the append's file count to one
      // per touched date (the family-wide appendTo rationale)
      Ingest.writeTable(shaped(newEvents).repartition(1), stage,
        sortKeys = Seq("k"), derived = hotTag)
      Artifacts.publishStagedFiles(stage, root, "date=", prefix)
      Artifacts.rmTree(new File(stage))
    }
  }

  /** DATE-LOCAL compaction — the family's shard-local entry at date
    * grain: every `date=` dir whose segment-file count exceeds
    * `maxSegments` is rewritten alone (k-sort restored, the SAME bloom
    * columns re-enabled, one file), in ONE job over exactly the
    * overweight dirs, each swapped in atomically through the shared
    * [[Artifacts.swapStagedDirs]] crash chain. Date partitions are
    * disjoint by construction, so a per-date rewrite preserves the row
    * bag exactly (spec-pinned). Rewritten files lose their `seg-` tags —
    * safe under the single-maintainer contract (compaction runs after
    * appends committed; a replayer of a committed tag deletes nothing
    * it still needs because its rows are already in the rewritten file
    * and re-appending the same tag first deletes only files CARRYING
    * the tag prefix — which the rewrite's files no longer do, so a
    * replay after compaction would double-append; maintainers must not
    * replay batches older than their last compaction, the TextIndex
    * postings contract).
    */
  def compactDates(root: String, spark: SparkSession,
      maxSegments: Int = 1,
      owner: Option[String] = None): Unit = {
    val (id, sticky) = Artifacts.leaseFor(owner)
    Artifacts.withLease(root, id, sticky) {
      compactDatesLeased(root, spark, maxSegments)
    }
  }

  private def compactDatesLeased(root: String, spark: SparkSession,
      maxSegments: Int): Unit = {
    recover(root)
    val dirs = Artifacts.overweightDirs(root, "date=", maxSegments)
    if (dirs.isEmpty) return
    val stage = s"$root/.tmp-compact-${java.util.UUID.randomUUID()}"
    val writer = spark.read.option("basePath", root)
      .parquet(dirs.map(_.getPath).toSeq: _*)
      .repartition(col("date"))
      .sortWithinPartitions("date", "k", "time")
      .write.partitionBy("date")
      .option("compression", "zstd")
    bloomCols.foldLeft(writer) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }.parquet(stage)
    Artifacts.swapStagedDirs(spark, stage, dirs.toSeq)
  }

  /** Heal crashed date-dir swaps and sweep stale staging dirs — call at
    * maintenance entry; single-maintainer-per-root is the concurrency
    * contract.
    */
  def recover(root: String): Unit = {
    Artifacts.recoverDirSwaps(root, "date=")
    Option(new File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(".tmp-"))
      .foreach(Artifacts.rmTree)
  }

  /** MAX parquet file count across date dirs — the shared segment
    * proxy a maintainer bounds (each append adds one file per touched
    * date).
    */
  private[graft] def segments(root: String): Int =
    Artifacts.maxSegmentsIn(root, "date=")

  /** The indexed events table — the serving gate refuses crashed-swap
    * residue (the family-wide r12 rule): a crashed [[compactDates]] swap
    * leaves `date=D` missing with `date=D.old-<uuid>` present, and
    * partition discovery would parse the aside as a STRING date value —
    * a date-pruned read would silently drop that partition's events.
    */
  private[graft] def requireNoDateResidue(root: String): Unit = {
    val residue = Artifacts.settledDirResidue(root, "date=")
    require(residue.isEmpty,
      s"tag index at $root holds crashed date-compaction residue " +
        s"(${residue.sorted.mkString(", ")}) — a date-pruned read would " +
        "silently drop those partitions' events; run a maintenance entry " +
        "(recover/compact) to heal before serving")
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    val root = ensure(spark, dir)
    requireNoDateResidue(root)
    spark.read.parquet(root)
  }
}
