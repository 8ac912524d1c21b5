package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.TextOps

/** Streaming NEAR-dup dedup — the streaming half of the minhash-LSH family
  * (the exact half is `Ingest.dedupStream`'s
  * dropDuplicatesWithinWatermark): every arriving document is checked
  * against the documents already seen in any of its LSH band buckets, and
  * near-duplicate hits (minhash signature agreement >= threshold) are
  * emitted as they happen. This is the shape a continuously ingested
  * training corpus needs — flag near-copies of already-accepted documents
  * at ingest time, instead of re-running batch dedup over the full corpus.
  *
  * Spark-first shape: the signature + band projection is pure row-wise
  * column work (no shuffle before the stateful stage); the only state is
  * `flatMapGroupsWithState` keyed by (band, bucket) holding the bucket's
  * seen (doc_id, signature) list. Emitted pairs for a fully-drained stream
  * equal the batch candidate set AT THE SAME HASH TIER — this stream
  * lives in the [[TextOps.MinHashXx]] production signature space, so the
  * batch face of the equivalence is
  * `TextOps.minhashLshWith(…, MinHashXx)` (the DECLARED q_minhash_lsh
  * runs the md5 ORACLE tier since r10; tiers differ by construction) —
  * a pair collides in >= 1 band and passes the same signature-agreement
  * cut in both, and StreamDedupSpec asserts that equivalence, including
  * across micro-batch boundaries.
  *
  * 100 TB posture: state is per-bucket and bounded two ways — by
  * `maxPerBucket` (4096-bucket band space × bounded lists — hot buckets
  * degrade recall, never memory) and, on the [[candidatesWithTtl]] path,
  * by an event-time TTL: entries older than the dedup window evict as
  * the watermark passes them and whole buckets expire via
  * `EventTimeTimeout`, so state size tracks the WINDOW's document count,
  * not the stream's lifetime.
  */
object StreamDedup {

  final case class BandedDoc(docId: Long, band: Int, bucket: Int, sig: Seq[Long])
  final case class BandedTsDoc(docId: Long, ts: java.sql.Timestamp,
      sig: Seq[Long], band: Int, bucket: Int)
  final case class DupHit(doc_a: Long, doc_b: Long, est_jaccard: Double)
  final case class BucketState(docs: List[(Long, Seq[Long])])
  final case class BucketTsState(docs: List[(Long, Seq[Long], Long)])

  /** Row-wise projection of a streaming (doc_id, text) frame to one row
    * per (document, band): signature + band bucket, no shuffle.
    */
  def banded(docs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(docs.sparkSession)
    val ths = transform(split(col("text"), " "), t => xxhash64(t))
    docs
      .select(col("doc_id").as("docId"), ths.as("ths"))
      .filter(size(col("ths")) > 0) // null-text docs have no signature
      .select(col("docId"), TextOps.minhashSig(col("ths")).as("sig"))
      .select(col("docId"), col("sig"),
        posexplode(TextOps.minhashBandHashes(col("sig"))).as(Seq("band", "bucket")))
  }

  /** Near-dup hits against everything previously seen in the stream.
    * A pair colliding in several bands emits once per band — downstream
    * consumers `dropDuplicates(doc_a, doc_b)` exactly like the batch path
    * does after its band join.
    */
  def candidates(docs: DataFrame, threshold: Double = 0.9,
      maxPerBucket: Int = 256): Dataset[DupHit] = {
    // unbounded keyspace (buckets accumulate with the corpus) — default
    // the session onto the RocksDB provider; see StateBackend
    StateBackend.defaultToRocksDB(docs.sparkSession)
    implicit val hitEnc = Encoders.product[DupHit]
    implicit val keyEnc = Encoders.product[(Int, Int)]
    implicit val rowEnc = Encoders.product[BandedDoc]
    implicit val stateEnc = Encoders.product[BucketState]
    banded(docs)
      .select(col("docId"), col("band"), col("bucket"), col("sig"))
      .as[BandedDoc]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[BucketState, DupHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[BucketState]) =>
          var seen = state.getOption.map(_.docs).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[DupHit]
          // doc-id order within the micro-batch, so results don't depend
          // on task-internal row order
          it.toSeq.sortBy(_.docId).foreach { r =>
            seen.foreach { case (id, sig) =>
              if (id != r.docId) {
                val agree = sig.iterator.zip(r.sig.iterator)
                  .count { case (x, y) => x == y }
                val est = agree.toDouble / sig.size
                if (est >= threshold)
                  out += DupHit(math.min(id, r.docId), math.max(id, r.docId), est)
              }
            }
            if (seen.size < maxPerBucket && !seen.exists(_._1 == r.docId))
              seen = (r.docId, r.sig) :: seen
          }
          state.update(BucketState(seen))
          out.iterator
      }
  }

  /** Near-dup hits of the STREAM against CORPUS HISTORY — the streaming
    * face of [[graft.operators.TextOps.incrementalDedup]]: a batch-built
    * LSH index of the existing corpus (same [[banded]] projection, so the
    * band space can never drift) joins each micro-batch stream-static on
    * (band, bucket), and collisions verify row-wise by minhash signature
    * agreement. Completely STATELESS — no flatMapGroupsWithState, no
    * watermark, nothing accumulates: history lives in the static side
    * (refreshed batch-side like the mix gates' thresholds), and the same
    * code runs identically on a batch frame, which is exactly how
    * StreamDedupSpec pins drained-stream ≡ batch.
    *
    * A pair colliding in several bands emits once per band, like
    * [[candidates]] — consumers dropDuplicates(doc_id, corpus_doc).
    *
    * 100 TB posture: the static index is (band, bucket)-keyed and
    * parquet/bucketed at corpus scale; each micro-batch touches only the
    * buckets its documents hash into. The join is the only exchange and
    * it moves the (small) batch side.
    */
  def candidatesVsCorpus(stream: DataFrame, corpusIndex: DataFrame,
      threshold: Double = TextOps.minhashEstThreshold): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(stream.sparkSession)
    banded(stream)
      .join(corpusIndex, Seq("band", "bucket"))
      .filter(col("docId") =!= col("corpus_doc"))
      // the SAME agreement estimator + cut as the batch LSH family —
      // their equivalence only holds while both sides share the constant
      .withColumn("est_jaccard",
        TextOps.minhashAgreement(col("sig"), col("corpus_sig")))
      .filter(col("est_jaccard") >= threshold)
      .select(col("docId").as("doc_id"), col("corpus_doc"), col("est_jaccard"))
  }

  /** The batch-built static side of [[candidatesVsCorpus]]: the existing
    * corpus through the SAME banded projection, renamed for the join.
    * At production scale this is an ingest artifact written bucketed by
    * (band, bucket); callers persist or reload it between refreshes.
    */
  def corpusIndexOf(corpus: DataFrame): DataFrame =
    banded(corpus).select(col("docId").as("corpus_doc"),
      col("band"), col("bucket"), col("sig").as("corpus_sig"))

  /** [[candidatesVsCorpus]] with a PERIODICALLY REFRESHED corpus index —
    * the production posture: the corpus-side index is an ingest artifact
    * that grows as the corpus does, and a long-running dedup stream must
    * pick up additions without a restart. A stream-static join pins the
    * static side's file listing at plan time, so the refresh runs at
    * `foreachBatch` altitude: every `refreshEvery` micro-batches the
    * index at `indexPath` is re-read (after `refreshByPath`, which drops
    * Spark's shared file-listing cache for the path — a plain re-read
    * can otherwise ride the stale listing), the previous snapshot
    * unpersists, and the fresh one persists for the batches that ride
    * it. Consistency model: corpus additions become visible at the NEXT
    * refresh boundary, never mid-batch — a document that streams past
    * between an addition and the boundary is not re-checked (the same
    * trade every snapshot-refreshed serving index makes). Snapshot
    * lifecycle (final-snapshot release on query termination,
    * double-start fail-fast) is [[RefreshingSnapshot]]'s.
    *
    * Returns an unstarted writer (`.start()` it); `sink` receives each
    * micro-batch's hits with the [[candidatesVsCorpus]] schema plus the
    * batch id.
    */
  def candidatesVsCorpusRefreshing(stream: DataFrame, indexPath: String,
      refreshEvery: Int, threshold: Double = TextOps.minhashEstThreshold)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(refreshEvery >= 1, s"refreshEvery must be >= 1, got $refreshEvery")
    val snap = new RefreshingSnapshot(stream.sparkSession, sp => {
      sp.catalog.refreshByPath(indexPath)
      sp.read.parquet(indexPath)
    })
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val idx = snap.forBatch(batch.sparkSession, batchId, refreshEvery)
        sink(candidatesVsCorpus(batch.toDF(), idx, threshold), batchId)
    }
  }

  /** [[candidates]] with an event-time TTL: documents carry a `ts`
    * timestamp, a document only matches prior documents within
    * `windowMs` of event time (symmetric, so out-of-order arrivals
    * behave), and bucket entries age out once the watermark passes
    * `entry ts + windowMs` — the same watermark discipline
    * `CorpusStream` gets from dropDuplicatesWithinWatermark, applied to
    * custom `flatMapGroupsWithState` state. Expired entries free their
    * `maxPerBucket` slots, and a bucket with nothing left in-window is
    * removed entirely via its `EventTimeTimeout`.
    */
  def candidatesWithTtl(docs: DataFrame, windowMs: Long,
      watermarkDelay: String = "0 seconds", threshold: Double = 0.9,
      maxPerBucket: Int = 256): Dataset[DupHit] = {
    graft.functions.VectorFunctions.ensureRegistered(docs.sparkSession)
    // TTL bounds state to the window's documents, but the bucket keyspace
    // still tracks corpus-rate ingest — same off-heap default
    StateBackend.defaultToRocksDB(docs.sparkSession)
    implicit val hitEnc = Encoders.product[DupHit]
    implicit val keyEnc = Encoders.product[(Int, Int)]
    implicit val rowEnc = Encoders.product[BandedTsDoc]
    implicit val stateEnc = Encoders.product[BucketTsState]
    val ths = transform(split(col("text"), " "), t => xxhash64(t))
    docs.withWatermark("ts", watermarkDelay)
      .select(col("doc_id").as("docId"), col("ts"), ths.as("ths"))
      .filter(size(col("ths")) > 0) // null-text docs have no signature
      .select(col("docId"), col("ts"), TextOps.minhashSig(col("ths")).as("sig"))
      .select(col("docId"), col("ts"), col("sig"),
        posexplode(TextOps.minhashBandHashes(col("sig"))).as(Seq("band", "bucket")))
      .as[BandedTsDoc]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[BucketTsState, DupHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, it, state: GroupState[BucketTsState]) =>
          val wm = state.getCurrentWatermarkMs()
          // watermark-driven eviction: an entry whose window the watermark
          // has fully passed can never match an in-order arrival again
          var seen = state.getOption.map(_.docs).getOrElse(Nil)
            .filter { case (_, _, ets) => ets >= wm - windowMs }
          val out = scala.collection.mutable.ArrayBuffer.empty[DupHit]
          it.toSeq.sortBy(_.docId).foreach { r =>
            val ts = r.ts.getTime
            seen.foreach { case (id, sig, ets) =>
              if (id != r.docId && math.abs(ts - ets) <= windowMs) {
                val agree = sig.iterator.zip(r.sig.iterator)
                  .count { case (x, y) => x == y }
                val est = agree.toDouble / sig.size
                if (est >= threshold)
                  out += DupHit(math.min(id, r.docId), math.max(id, r.docId), est)
              }
            }
            if (seen.size < maxPerBucket && !seen.exists(_._1 == r.docId))
              seen = (r.docId, r.sig, ts) :: seen
          }
          if (seen.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(BucketTsState(seen))
            // the bucket dies when the watermark passes its youngest
            // entry's window (timeout must sit strictly past the watermark)
            state.setTimeoutTimestamp(
              math.max(seen.map(_._3).max + windowMs + 1, wm + 1))
          }
          out.iterator
      }
  }
}
