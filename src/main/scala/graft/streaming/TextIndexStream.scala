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
    * double-count its postings and stats. A per-batch marker under
    * `_appended/` gates replays (the common failure mode); the marker
    * commits AFTER the append, so the remaining window is a crash
    * mid-append — the same documented non-atomic gap as
    * [[TextIndex.appendTo]]'s small-table swap, closed in production by
    * a segment manifest.
    */
  /** `streamId` must be 1:1 with the query's CHECKPOINT: batch ids are
    * only meaningful within one checkpoint lineage, so a reset/relocated
    * checkpoint (which renumbers batches from 0) or a second stream
    * against the same root needs its own id — otherwise a stale marker
    * silently swallows a renumbered batch's documents.
    */
  def appendStream(docs: DataFrame, root: String,
      streamId: String = "default"): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      appendBatch(root, batch, id, streamId)
    }

  /** One idempotent micro-batch append (the foreachBatch body, separated
    * so the replay gate is directly testable).
    */
  private[streaming] def appendBatch(root: String, batch: DataFrame,
      id: Long, streamId: String = "default"): Unit = {
    val marker = new java.io.File(s"$root/_appended/$streamId/batch-$id")
    if (!batch.isEmpty && !marker.exists()) {
      TextIndex.appendTo(root, batch.select("doc_id", "text"),
        s"tidxstream:$root:$streamId:$id")
      marker.getParentFile.mkdirs()
      marker.createNewFile(): Unit
    }
  }
}
