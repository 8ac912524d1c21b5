package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Multimodal plumbing: schemas, determinism, explode shape, per-partition
  * feature extraction. Decode math is a documented STUB — these tests pin
  * the Spark-side contract, not codec output.
  */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val media = Seq(
    (1L, "image", "some image bytes".getBytes),
    (2L, "video", "a much longer fake video payload 0123456789".getBytes),
    (3L, "audio", Array.empty[Byte]))
    .toDF("media_id", "kind", "bytes")

  test("decodeStub: deterministic, bounded dims, null-safe schema") {
    val d1 = MultimodalOps.decodeStub(media).orderBy("media_id").collect()
    val d2 = MultimodalOps.decodeStub(media).orderBy("media_id").collect()
    def dims(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("width"),
        r.getAs[Int]("height"), r.getAs[Int]("channels"))).toSeq
    assert(dims(d1) == dims(d2)) // same bytes → same decode
    d1.foreach { r =>
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 1920)
      assert(r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 1080)
      assert(r.getAs[Int]("channels") >= 1 && r.getAs[Int]("channels") <= 3)
    }
  }

  test("resizeMeta: aspect preserved, never upscales") {
    val out = MultimodalOps.resizeMeta(MultimodalOps.decodeStub(media), maxDim = 100)
      .collect()
    out.foreach { r =>
      assert(r.getAs[Int]("out_width") <= 100 && r.getAs[Int]("out_height") <= 100)
      assert(r.getAs[Int]("out_width") <= r.getAs[Int]("width"))
    }
  }

  test("frameSample: one row per sampled frame, stub clock") {
    val vid = media.filter(col("kind") === "video")
    val frames = MultimodalOps.frameSample(vid, everyNth = 10).collect()
    assert(frames.nonEmpty)
    assert(frames.map(_.getAs[Int]("frame_idx")).forall(_ % 10 == 0))
    assert(frames.forall(r =>
      r.getAs[Long]("frame_ts_ms") == r.getAs[Int]("frame_idx") * 33L))
  }

  test("features: fixed 8-dim vector per row, empty bytes safe") {
    val f = MultimodalOps.features(spark, media).collect()
    assert(f.length == 3)
    assert(f.forall(_.getAs[Seq[Float]]("features").length == 8))
    val empty = f.find(_.getAs[Long]("media_id") == 3L).get
    assert(empty.getAs[Seq[Float]]("features").forall(_ == 0.0f))
  }
}
