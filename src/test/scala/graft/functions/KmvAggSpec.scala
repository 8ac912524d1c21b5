package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** KMV distinct-count sketch: exact below k, within the concentration
  * bound above it, partitioning-invariant, and consistent with the
  * built-in approx_count_distinct it exists to benchmark against.
  */
class KmvAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  VectorFunctions.ensureRegistered(spark)

  test("below k the sketch is exact, duplicates and all") {
    // 700 distinct values, each repeated 3x → under k=1024 the TreeSet
    // holds every distinct hash and eval returns the exact size
    val df = (1 to 700).flatMap(i => Seq.fill(3)(s"v$i")).toDF("v")
    val got = df.agg(
      VectorFunctions.kmvCountDistinct(xxhash64(col("v"))).as("d"))
      .as[Long].head()
    assert(got == 700L)
  }

  test("above k the estimate lands inside the concentration bound") {
    // 100k distinct values; k=1024 → relative std err ~1/sqrt(k-2) ≈ 3.2%.
    // 5 std devs (16%) makes the assert deterministic-in-practice while
    // still catching an estimator bug (a wrong normalization is off 2x+).
    val n = 100000
    val df = (1 to n).map(i => s"item-$i").toDF("v").repartition(8)
    val got = df.agg(
      VectorFunctions.kmvCountDistinct(xxhash64(col("v"))).as("d"))
      .as[Long].head()
    assert(math.abs(got - n).toDouble / n < 0.16, s"estimate $got for $n")
  }

  test("estimate is invariant to partitioning (merge correctness)") {
    val df = (1 to 50000).map(i => s"item-$i").toDF("v")
    val est = Seq(1, 7, 32).map { p =>
      df.repartition(p).agg(
        VectorFunctions.kmvCountDistinct(xxhash64(col("v"))).as("d"))
        .as[Long].head()
    }
    assert(est.distinct.size == 1, s"partitioning changed the estimate: $est")
  }

  test("KmvMergeAgg refuses a NULL element in a state array LOUDLY — " +
      "getLong on a null slot would silently admit an undefined minimum " +
      "and skew the estimate") {
    val df = Seq(1).toDF("i")
      .select(array(lit(7L), lit(null).cast("long")).as("state"))
    val e = intercept[Exception] {
      df.agg(VectorFunctions.kmvMergeExact(col("state"), 64)).head(): Unit
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} ${msgs(t.getCause)}"
    assert(msgs(e).contains("NULL element"), msgs(e))
    // and a well-formed state still folds fine through the same shape
    val ok = Seq(1).toDF("i")
      .select(array(lit(7L), lit(9L)).as("state"))
      .agg(VectorFunctions.kmvMergeExact(col("state"), 64)).as[Long].head()
    assert(ok == 2L)
  }

  test("multiplicity-invariant: heavy duplication does not move the estimate") {
    val distinct = (1 to 30000).map(i => s"item-$i")
    val dupes = distinct ++ (1 to 3000).flatMap(i => Seq.fill(10)(s"item-$i"))
    val a = distinct.toDF("v").agg(
      VectorFunctions.kmvCountDistinct(xxhash64(col("v"))).as("d")).as[Long].head()
    val b = dupes.toDF("v").repartition(8).agg(
      VectorFunctions.kmvCountDistinct(xxhash64(col("v"))).as("d")).as[Long].head()
    assert(a == b)
  }
}
