package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.TestSpark
import graft.operators.VectorOps

/** Streaming mini-batch k-means recovers planted well-separated clusters
  * with purity 1 after draining, and the model's centroid count stays k.
  */
class KMeansStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8
  private val perBlob = 60

  /** Blob membership follows the init rule's hash order (rank % 3), so
    * the deterministic first-batch init (3 smallest hashes) seeds one
    * centroid in each blob — the spec tests convergence, not
    * init-luckiness. The ranking key is [[VectorOps.seedOrderKey]]
    * ITSELF (not a re-derivation), so a change to the init family
    * cannot silently break the one-seed-per-blob construction.
    */
  private def corpus(): Seq[(Long, Array[Float], Int)] = {
    val ids = (0L until (3L * perBlob)).toSeq
    val ranked = ids.toDF("vec_id")
      .select(col("vec_id"), VectorOps.seedOrderKey(col("vec_id")).as("h"))
      .as[(Long, Long)].collect().sortBy { case (id, h) => (h, id) }
      .map(_._1)
    // stream in hash order: the init rule reads the FIRST batch, so
    // delivering rank order guarantees the three globally-smallest
    // hashes (blobs 0, 1, 2 by construction) are present and chosen
    ranked.zipWithIndex.map { case (id, r) =>
      val b = r % 3
      val rnd = new scala.util.Random(id * 7919L + b)
      val e = Array.tabulate(dim)(j =>
        (if (j == b) 10.0f else 0.0f) + 0.1f * rnd.nextGaussian().toFloat)
      (id, e, b)
    }
  }

  test("drained stream recovers planted blobs with purity 1") {
    val data = corpus()
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val (writer, model) = KMeansStream.fitStream(
      mem.toDS.toDF("vec_id", "embedding"), k = 3)
    val q = writer.start()
    try {
      data.grouped(data.size / 3 + 1).foreach { batch =>
        mem.addData(batch.map(d => (d._1, d._2)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val cents = model.centroids
    assert(cents.size === 3)
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val assigned = VectorOps.assignForTest(
        data.map(d => (d._1, d._2)).toDF("vec_id", "embedding"), cents)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val byBlob = data.groupBy(_._3)
    val blobClusters = byBlob.map { case (b, pts) =>
      val cl = pts.map(p => assigned(p._1)).distinct
      assert(cl.size === 1, s"blob $b split across clusters $cl")
      cl.head
    }.toSet
    assert(blobClusters.size === 3, s"blobs merged: $blobClusters")
    // every centroid sits essentially on its blob center
    cents.foreach { c =>
      val hot = c.indices.filter(j => math.abs(c(j)) > 5.0)
      assert(hot.size === 1 && math.abs(c(hot.head) - 10.0) < 0.5, c.toString)
    }
  }
}
