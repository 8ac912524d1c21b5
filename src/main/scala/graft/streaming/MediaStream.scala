package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import graft.operators.{MediaHashIndex, MultimodalOps}

/** Streaming perceptual near-dup vs corpus history — the MEDIA face of
  * the ingest-time dedup stack (r13), completing its symmetry across
  * every modality the engine hashes: exact substrings ([[SpanStream]]),
  * lexical LSH ([[StreamDedup]]), embeddings ([[VectorStream]]), winnow
  * fingerprints ([[WinnowStream]]), and now image/audio perceptual
  * hashes: each arriving media document hashes row-wise through the ONE
  * shared pipeline ([[MediaHashIndex.Modality.hashesOf]] — the same
  * chain the maintained artifact was built by, so the code space cannot
  * drift between the two sides) and band-joins against the corpus's
  * stored hashes, with the exact Hamming confirm gating emission.
  *
  * Spark-first shape: hashing is row-wise (container build + native
  * decode + codegen'd hash — no shuffle); the only exchange is the
  * stream-static (band, bv) equi-join, which moves the (small)
  * micro-batch side. Completely STATELESS — history lives in the static
  * artifact, refreshed at foreachBatch altitude like every sibling — so
  * the same code runs identically on a batch frame, which is exactly
  * how MediaStreamSpec pins drained-stream ≡ batch.
  *
  * 100 TB posture: the corpus side is 16-byte (media_id, h) rows — the
  * media BYTES are decoded exactly once, at ingest, by the maintainer
  * ([[appendStream]]) — and each arriving document's candidate work is
  * its band-bucket collisions (~2⁻¹⁶ per band for non-dup content),
  * independent of corpus size.
  */
object MediaStream {

  /** Per-batch near-dup hits of a (doc_id, text) micro-batch against a
    * static corpus hash set: the batch hashes through the modality's
    * shared pipeline, candidates propose by banded equi-join, exact
    * Hamming confirms. Plain transformations — identical on a batch
    * frame (the stream ≡ batch pin). Output: (media_id, corpus_id,
    * hamming).
    */
  def matchesVsCorpus(docs: DataFrame, corpusHashes: DataFrame,
      modality: MediaHashIndex.Modality, bands: Int = 4,
      maxHamming: Int = 3): DataFrame =
    MultimodalOps.dhashBandJoin(modality.hashesOf(docs), corpusHashes,
      bands, maxHamming)

  /** [[matchesVsCorpus]] against a MAINTAINED [[MediaHashIndex]] root —
    * the VectorStream.candidatesVsIndexRefreshing shape for media: the
    * artifact's hashes serve through the shared refresh-snapshot
    * lifecycle (appends/compactions by the maintainer become visible at
    * refresh boundaries, never mid-batch), with the pipeline-FAMILY
    * gate inside the refresh loader so a root rebuilt under a different
    * packing/hash version mid-stream fails the next refresh loudly
    * instead of silently pairing garbage. The loader's dedup absorbs
    * the benign duplicate rows a replayed append leaves.
    */
  def matchesVsIndexRefreshing(stream: DataFrame, root: String,
      modality: MediaHashIndex.Modality, refreshEvery: Int,
      bands: Int = 4, maxHamming: Int = 3)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    require(refreshEvery >= 1, s"refreshEvery must be >= 1, got $refreshEvery")
    val snap = new RefreshingSnapshot(stream.sparkSession, sp => {
      sp.catalog.refreshByPath(MediaHashIndex.hashesDir(root))
      // load runs the family gate + residue refusal + value dedup
      MediaHashIndex.load(sp, root, modality.family)
    })
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], batchId: Long) =>
        val corpus = snap.forBatch(batch.sparkSession, batchId, refreshEvery)
        sink(matchesVsCorpus(batch.toDF(), corpus, modality,
          bands, maxHamming), batchId)
    }
  }

  /** Continuous artifact maintenance — the ingest face (the
    * WinnowStream/VectorStream.appendStream lifecycle for media): each
    * micro-batch of (doc_id, text) documents hashes ONCE (this is where
    * the 100 TB decode cost is paid, exactly once per document) and
    * folds into the maintained artifact via [[MediaHashIndex.appendTo]]
    * (slice-sized — only touched shard dirs gain a file), with
    * crash-swap recovery at batch entry and SHARD-LOCAL auto-compaction
    * past `maxSegments` files. Replay-safe by VALUE: a re-delivered
    * batch appends duplicate (media_id, h) rows, which serving dedupes
    * and compaction collapses.
    */
  def appendStream(docs: DataFrame, root: String,
      modality: MediaHashIndex.Modality, maxSegments: Int = 8)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          MediaHashIndex.recover(root)
          MediaHashIndex.appendTo(root, modality.hashesOf(batch.toDF()),
            modality.family)
          if (MediaHashIndex.segments(root) > maxSegments)
            MediaHashIndex.compactShards(root, batch.sparkSession,
              modality.family, maxSegments)
        }
    }
}
