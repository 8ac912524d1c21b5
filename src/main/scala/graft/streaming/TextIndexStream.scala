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
    */
  def appendStream(docs: DataFrame, root: String): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty)
        TextIndex.appendTo(root, batch.select("doc_id", "text"),
          s"tidxstream:$root:$id")
    }
}
