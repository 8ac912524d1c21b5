package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Distributed Lloyd's k-means: argmin property against independently
  * recomputed distances, monotone inertia across iteration budgets,
  * deterministic assignment across runs, bounded cluster ids.
  */
class KMeansSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def vecs(): Map[Long, Array[Double]] =
    Tables.embeddings(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap

  private def sqDist(v: Array[Double], c: Seq[Double]): Double = {
    // the operator's own op order: ||c||^2 - 2*v.c + ||v||^2, each dot a
    // sequential ascending fold
    var cc = 0.0; c.foreach(x => cc += x * x)
    var d = 0.0; var e = 0.0; var i = 0
    while (i < v.length) { d += v(i) * c(i); e += v(i) * v(i); i += 1 }
    math.max(cc - 2.0 * d + e, 0.0)
  }

  test("assignment is the argmin over the fitted centroids") {
    val (cents, out) = VectorOps.kmeansFit(spark, dir, k = 6, iters = 3)
    val vs = vecs()
    val rows = out.collect()
    assert(rows.length === vs.size)
    rows.foreach { r =>
      val (id, cl, dist) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val ds = cents.zipWithIndex.map { case (c, cid) => (sqDist(vs(id), c), cid) }
      val (bd, bc) = ds.min
      assert(cl === bc.toLong, s"vec $id cluster")
      assert(math.abs(dist - bd) < 1e-6, s"vec $id dist $dist vs $bd")
    }
    assert(rows.map(_.getLong(1)).distinct.forall(c => c >= 0 && c < 6))
  }

  test("inertia is non-increasing in the iteration budget") {
    val inertias = Seq(1, 2, 4).map { it =>
      val (_, out) = VectorOps.kmeansFit(spark, dir, k = 6, iters = it)
      out.collect().map(_.getDouble(2)).sum
    }
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"inertia rose: $inertias")
    }
  }

  test("two runs produce identical assignments") {
    def run() = VectorOps.kmeansAssign(spark, dir, k = 5, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run() === run())
  }

  test("fitted centroids hash-pin on a fixed synthetic corpus") {
    // the synthetic corpus is a pure function of the id (ScaleProbe's
    // deterministic generator), so the full fit — init, three Lloyd
    // rounds, 9-dp rounding — must reproduce these exact centroids on
    // any run; a drifting hash means the ITERATION changed, which no
    // driver oracle can catch (SQL cannot replay a fixpoint loop)
    import spark.implicits._
    val emb = spark.range(0, 300).map(i => graft.ScaleProbe.synthVec(i))
      .toDF("vec_id", "embedding", "label")
    val (cents, out) = VectorOps.kmeansFitOver(emb, k = 4, iters = 3,
      "spec-kmeans-pin")
    assert(out.collect().length === 300)
    val canon = cents.map(_.map(d => f"$d%.9f").mkString(",")).mkString(";")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // PINNED: computed from the r8 implementation; see docstring of
    // kmeansFitOver for why this stands in for a DuckDB oracle
    assert(md5 === "2fa2cd120715a26f92a144bc681331a5",
      s"centroid hash drifted: $md5\n$canon")
  }
}
