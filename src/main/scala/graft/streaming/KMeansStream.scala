package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.VectorOps

/** Streaming mini-batch k-means — the clustering face of the ingest
  * stack, completing the batch↔stream symmetry the dedup families
  * already have (batch [[VectorOps.kmeansAssign]] ↔ this). Centroids
  * update per arriving micro-batch by count-weighted means (the
  * classic streaming k-means update): assignment of the batch against
  * the current centroids is a map-only literal-centroid pass, the
  * per-cluster (dim-keyed) sums partial-aggregate map-side, and the
  * driver folds exactly k·dim aggregated rows into the model — the
  * same bounded-collect contract as the batch trainer's iteration.
  * Per-batch cost tracks the batch, never the corpus.
  *
  * Initialization is deterministic from the FIRST batch (the k vectors
  * with smallest (md5-60-bit(vec_id), vec_id) — the batch trainer's
  * seed-free init ordering, shared since the r9 exact fit so the two
  * trainers cannot drift on which vectors seed the model), so a
  * drained stream is reproducible for a fixed batch sequence.
  * Mini-batch k-means is order-dependent by nature (state, like every
  * streaming aggregate here), so the spec pins QUALITY — planted
  * well-separated clusters are recovered with purity 1 — rather than
  * bit-equality with the batch trainer; centroids stay double-valued
  * (count-weighted running means do not quantize cleanly, and no
  * oracle replays a stream).
  */
object KMeansStream {

  /** Mutable model folded across micro-batches. */
  final class Model(val k: Int) {
    @volatile private[streaming] var cents: IndexedSeq[Seq[Double]] = IndexedSeq.empty
    private[streaming] val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
    def centroids: IndexedSeq[Seq[Double]] = cents
  }

  /** The streaming writer plus its live model: embeddings stream in as
    * (vec_id, embedding); each micro-batch updates `model.centroids`.
    */
  def fitStream(emb: DataFrame, k: Int): (DataStreamWriter[Row], Model) = {
    val model = new Model(k)
    val writer = emb.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      graft.functions.VectorFunctions.ensureRegistered(batch.sparkSession)
      if (!batch.isEmpty) {
        val rows = batch.filter(col("embedding").isNotNull)
          .select(col("vec_id"), col("embedding"))
        // initialize — and KEEP topping up while under k: a stream whose
        // first trigger fires on a trickle (fewer than k rows) must not
        // stay permanently capped at that many clusters
        if (model.cents.size < k) {
          // .distinct dedups identical embeddings WITHIN the candidate
          // batch (duplicate docs are the norm in crawl data); the
          // filterNot only helps before the first update pass — once
          // centroids have moved to rounded means, a top-up near an
          // existing centroid is possible and tolerated (Lloyd updates
          // separate or starve it; empty clusters keep their centroid)
          val extra = rows
            .orderBy(VectorOps.seedOrderKey(col("vec_id")), col("vec_id"))
            .limit(k)
            .select(col("embedding").cast("array<double>"))
            .collect().map(_.getSeq[Double](0)).toIndexedSeq
            .distinct
            .filterNot(model.cents.contains)
            .take(k - model.cents.size)
          model.cents = model.cents ++ extra
          model.counts ++= Seq.fill(extra.size)(0L)
        }
        val sums = VectorOps.assignForTest(rows, model.cents)
          .select(col("cluster"), posexplode(col("embedding")))
          .groupBy("cluster", "pos")
          .agg(sum(col("col").cast("double")).as("s"), count(lit(1)).as("c"))
          .collect() // ≤ k·dim rows — model-sized, not batch-sized
        val byCluster = sums.groupBy(_.getInt(0))
        model.cents = model.cents.zipWithIndex.map { case (prev, cid) =>
          byCluster.get(cid) match {
            case Some(rs) =>
              val dim = prev.length
              val bc = rs.head.getLong(3)
              val oc = model.counts(cid)
              val next = new Array[Double](dim)
              var i = 0
              while (i < dim) { next(i) = prev(i) * oc; i += 1 }
              rs.foreach(r => next(r.getInt(1)) += r.getDouble(2))
              model.counts(cid) = oc + bc
              next.map(x =>
                BigDecimal(x / (oc + bc))
                  .setScale(9, BigDecimal.RoundingMode.HALF_EVEN).toDouble).toSeq
            case None => prev // cluster saw nothing this batch
          }
        }
      }
    }
    (writer, model)
  }
}
