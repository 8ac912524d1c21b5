package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Metadata-filtered similarity search: both adaptive paths of
  * annIvfFiltered must equal the exact filtered reference, and every
  * result must carry the query's target label.
  */
class FilteredAnnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("selective filter takes the exact-class path (equal to filteredTopK)") {
    val exact = rows(VectorOps.filteredTopK(spark, dir))
    assert(exact.nonEmpty)
    // sf0.01 classes are ~25 members — far under the default threshold
    val got = rows(VectorOps.annIvfFiltered(spark, dir))
    assert(got === exact)
  }

  test("probe path at full depth equals the exact reference") {
    val exact = rows(VectorOps.filteredTopK(spark, dir))
    // bruteBelow=0 forces the probed plan; deepen past nlist covers every
    // list, so the probed union IS the class and results must match
    val got = rows(VectorOps.annIvfFiltered(spark, dir, deepen = 1000,
      bruteBelow = 0L))
    assert(got === exact)
  }

  test("adaptive decision is per-query: selective classes keep the exact path under a mixed workload") {
    // threshold between the class sizes splits the workload: classes at
    // or under it go exact, the rest probe. With full-depth probing the
    // probe half is exhaustive too, so BOTH halves must equal the exact
    // reference — proving the mixed-path union covers every query
    val sizes = graft.Tables.embeddings(spark, dir)
      .groupBy("label").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val classSizes = (0 to 4).map(l => sizes.getOrElse(l, 0L))
    val mid = classSizes.sorted.apply(classSizes.size / 2)
    val exact = rows(VectorOps.filteredTopK(spark, dir))
    val got = rows(VectorOps.annIvfFiltered(spark, dir, deepen = 1000,
      bruteBelow = mid))
    assert(classSizes.exists(_ <= mid) && classSizes.exists(_ > mid),
      s"fixture no longer mixes paths: $classSizes vs $mid")
    assert(got === exact)
  }

  test("every result carries the query's target label") {
    val labels = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows(VectorOps.filteredTopK(spark, dir)).foreach { case (qid, nid, _, _) =>
      assert(labels(nid) === qid.toInt, s"qid=$qid nid=$nid")
    }
  }
}
