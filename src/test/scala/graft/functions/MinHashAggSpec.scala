package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The distributed minhash sketch aggregate: signature parity with the
  * row-wise column form, merge correctness under arbitrary partitioning,
  * and estimate accuracy against exact set Jaccard.
  */
class MinHashAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  VectorFunctions.ensureRegistered(spark)

  private def tokensOf(text: String): Seq[String] = text.split(" ").toSeq

  test("aggregate signature is bit-identical to the row-wise minhashSig") {
    // per-document: explode the token hashes and re-aggregate — must
    // reproduce the projection form exactly (same xxhash64 seed chain)
    val docs = graft.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        transform(split(col("text"), " "), t => xxhash64(t)).as("ths"))
      .filter(size(col("ths")) > 0)
    val rowWise = docs
      .select(col("doc_id"),
        graft.operators.TextOps.minhashSig(col("ths")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val agged = docs
      .select(col("doc_id"), explode(col("ths")).as("th"))
      .groupBy("doc_id")
      .agg(VectorFunctions.minhashAgg(col("th")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(agged.keySet == rowWise.keySet)
    agged.foreach { case (id, sig) => assert(sig == rowWise(id), s"doc $id") }
  }

  test("merge: signature is invariant to partitioning of the input") {
    val rows = (1L to 1000L).map(i => (i % 7, i * 2654435761L))
    val sigOf = (parts: Int) => rows.toDF("g", "th")
      .repartition(parts)
      .groupBy("g").agg(VectorFunctions.minhashAgg(col("th")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigOf(1) == sigOf(13))
  }

  test("estimated cross-language Jaccard tracks exact within sketch error") {
    val toks = graft.Tables.documents(spark, dir)
      .select(col("lang"), col("text")).as[(String, String)].collect()
      .groupBy(_._1)
      .map { case (l, rows) => l -> rows.flatMap(r => tokensOf(r._2)).toSet }
    // both profile tiers — the MinHashAgg sketch (production) and the
    // md5-60bit declared-query tier — must track the same exact Jaccard
    for (profile <- Seq(
        graft.operators.TextOps.minhashProfileSketch(spark, dir),
        graft.operators.TextOps.minhashProfile(spark, dir))) {
      val est = profile.as[(String, String, Double)].collect()
      assert(est.nonEmpty)
      est.foreach { case (a, b, e) =>
        val (sa, sb) = (toks(a), toks(b))
        val inter = sa.intersect(sb).size
        val exact = inter.toDouble / (sa.size + sb.size - inter)
        // 16 perms: std <= sqrt(J(1-J)/16) <= 0.125; allow 3 sigma + slack
        assert(math.abs(e - exact) <= 0.4,
          s"($a,$b): est $e vs exact $exact")
      }
    }
  }
}
