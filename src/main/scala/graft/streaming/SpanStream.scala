package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import graft.operators.TextOps

/** Streaming exact-SUBSTRING dedup against corpus history — the span
  * layer of the ingest pipeline whose exact layer is
  * `Ingest.dedupStream` and whose near layer is
  * [[StreamDedup.candidatesVsCorpus]]: each arriving document reports
  * the maximal token spans whose every `w`-token window already occurs
  * in the existing corpus (the batch [[TextOps.incrSpans]] semantics,
  * per micro-batch). A crawler re-serving a boilerplate header, or a
  * document quoting a long block of an already-ingested page, is
  * flagged WITH the span manifest at ingest time instead of waiting for
  * the next full-corpus span sweep.
  *
  * Spark-first shape: the corpus side is its distinct 16-byte
  * window-key set ([[TextOps.spanKeysOf]] — an ingest artifact, written
  * bucketed by key at production scale), and each micro-batch runs the
  * SAME batch kernel ([[TextOps.incrSpansVsKeys]]) stream-static
  * against it at `foreachBatch` altitude. Stateless — a document's
  * manifest depends only on (document, key set), so nothing
  * accumulates, no watermark is needed, and a drained stream equals
  * the batch run over the same documents by construction
  * (StreamSpanSpec pins it anyway, across micro-batch boundaries).
  *
  * 100 TB posture: the key set is the only corpus-scale artifact and
  * it moves ONCE per refresh, not per batch; the per-batch exchange is
  * the batch's own window occurrences semi-joined against it. History
  * is never re-scanned, exactly like the batch incremental family.
  */
object SpanStream {

  /** Span manifests of `stream` documents against a static corpus
    * key-set frame. Plain transformation — works identically on a
    * batch frame, which is how the spec pins stream ≡ batch.
    */
  def spansVsCorpus(stream: DataFrame, corpusKeys: DataFrame,
      windowTokens: Int = 8): DataFrame =
    TextOps.incrSpansVsKeys(stream, corpusKeys, windowTokens)

  /** [[spansVsCorpus]] with a PERIODICALLY REFRESHED corpus key set —
    * the same production posture (and consistency model) as
    * [[StreamDedup.candidatesVsCorpusRefreshing]]: the key set is an
    * ingest artifact that grows with the corpus; every `refreshEvery`
    * micro-batches it is re-read from `keysPath` (after
    * `refreshByPath`, so the re-read cannot ride a stale shared
    * file-listing cache), the previous snapshot unpersists and the
    * fresh one persists. Corpus additions become visible at the next
    * refresh boundary, never mid-batch.
    *
    * Returns an unstarted writer (`.start()` it); `sink` receives each
    * micro-batch's manifests with the [[spansVsCorpus]] schema plus
    * the batch id.
    */
  def spansVsCorpusRefreshing(stream: DataFrame, keysPath: String,
      refreshEvery: Int, windowTokens: Int = 8)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    require(refreshEvery >= 1, s"refreshEvery must be >= 1, got $refreshEvery")
    val snap = new RefreshingSnapshot(stream.sparkSession, sp => {
      sp.catalog.refreshByPath(keysPath)
      sp.read.parquet(keysPath)
    })
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], batchId: Long) =>
        val keys = snap.forBatch(batch.sparkSession, batchId, refreshEvery)
        sink(spansVsCorpus(batch.toDF(), keys, windowTokens), batchId)
    }
  }
}
