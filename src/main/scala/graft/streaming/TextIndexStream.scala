package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.TextIndex

/** Continuous inverted-index maintenance — the ingest-time face of
  * lexical retrieval: each arriving micro-batch of documents folds into
  * the index via [[TextIndex.appendTo]] at foreachBatch altitude, so the
  * BM25 / phrase serving path stays fresh as the corpus grows without
  * ever re-reading it. Per-batch work is batch-sized (new postings
  * append under their term shards; the vocabulary-bounded term table and
  * one-row stats re-aggregate old + delta) — the same per-batch-not-
  * per-corpus contract as the dedup streaming twins.
  *
  * Consistency model: queries issued WHILE a batch is appending may see
  * the old index (the postings append publishes per-file); after the
  * batch commits, the index serves exactly what a full rebuild over all
  * delivered documents would — TextIndexStreamSpec pins that
  * equivalence across micro-batch boundaries.
  */
object TextIndexStream {

  /** The streaming writer: docs stream in as (doc_id, text, ...); each
    * micro-batch appends into the index at `root` (which must already
    * hold a built index — build the base with [[TextIndex.buildInto]] or
    * [[TextIndex.ensure]]).
    *
    * REPLAY-SAFE: foreachBatch is at-least-once — after a restart Spark
    * re-delivers the last uncommitted batch, and a bare append would
    * double-count its postings and stats. Two gates:
    *  - a per-batch marker under `_appended/` (the common fast path);
    *  - the per-stream append TAG ([[TextIndex.lastAppendTags]]) the
    *    append itself commits inside the stats swap — its LAST mutation
    *    — so a crash AFTER a fully committed append but BEFORE the
    *    marker landed is still detected on replay (the marker is then
    *    backfilled), including when ANOTHER stream appended into the
    *    same root in between (the tags are a map keyed by streamId).
    *    Artifact swaps themselves publish by the crash-recoverable
    *    rename chain ([[TextIndex.recoverArtifacts]] runs at batch
    *    entry), so a crash mid-swap heals instead of losing postings.
    *    A crash INSIDE the append is covered too: postings publish
    *    under (streamId, batchId)-tagged file names a replay overwrites
    *    rather than re-appends, and the terms swap carries its own tag
    *    so a crash between the terms and stats swaps cannot re-merge
    *    df — see [[TextIndex.appendTo]]'s replay-idempotence contract.
    *
    * SEGMENT-BOUNDED: each append adds one parquet file per touched term
    * shard, and long-running ingest would otherwise degrade scan setup
    * with file count. After a committed append, if any shard holds more
    * than `maxSegments` files, [[TextIndex.compactShards]] (r12 —
    * SHARD-LOCAL, the WinnowIndex pattern) rewrites exactly the
    * overweight term-shard dirs in one job — so segment count stays
    * bounded by the compaction threshold regardless of stream lifetime,
    * and the per-compaction cost tracks the shards the stream's appends
    * actually loaded, not the corpus (TextIndexStreamSpec pins
    * serving ≡ rebuild across the compaction and the bound after N
    * micro-batches; [[TextIndex.compact]] remains the whole-index
    * rewrite entry).
    */
  /** `streamId` must be 1:1 with the query's CHECKPOINT: batch ids are
    * only meaningful within one checkpoint lineage, so a reset/relocated
    * checkpoint (which renumbers batches from 0) or a second stream
    * against the same root needs its own id — otherwise a stale marker
    * silently swallows a renumbered batch's documents.
    */
  def appendStream(docs: DataFrame, root: String,
      streamId: String = "default",
      maxSegments: Int = 8): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      appendBatch(root, batch, id, streamId, maxSegments)
    }

  /** One idempotent micro-batch append (the foreachBatch body, separated
    * so the replay gate is directly testable).
    */
  private[streaming] def appendBatch(root: String, batch: DataFrame,
      id: Long, streamId: String = "default", maxSegments: Int = 8): Unit = {
    val marker = new java.io.File(s"$root/_appended/$streamId/batch-$id")
    if (!batch.isEmpty && !marker.exists()) {
      // heal any crashed artifact swap BEFORE reading or appending —
      // otherwise an append into a mid-swap root would silently
      // recreate a missing postings dir with only this batch's rows
      TextIndex.recoverArtifacts(root)
      // the tag check reads the ONE-ROW stats artifact (metadata-scale,
      // paid per batch on the no-marker path): a committed tag FOR THIS
      // STREAM means the append finished and only the marker was lost —
      // backfill and move on (tags are a per-stream map, so another
      // stream's later append cannot mask this stream's commit)
      val alreadyCommitted = TextIndex
        .lastAppendTags(batch.sparkSession, root)
        .get(streamId).contains(id.toString)
      if (!alreadyCommitted)
        TextIndex.appendTo(root, batch.select("doc_id", "text"),
          s"tidxstream:$root:$streamId:$id",
          appendTag = Some(streamId -> id.toString))
      marker.getParentFile.mkdirs()
      marker.createNewFile(): Unit
      if (TextIndex.postingsSegments(root) > maxSegments)
        // shard-local: only dirs past the bound rewrite (to one file);
        // dirs the stream's appends never overloaded keep their files.
        // Compaction runs AS this stream (lease owner = streamId), so
        // the stream's standing maintenance lease stays held
        TextIndex.compactShards(root, batch.sparkSession, maxSegments,
          owner = Some(streamId))
    }
  }
}
