package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The quantile-histogram family's universe grid (r15): quantizing to g
  * significant mantissa bits at the leaf must BOUND per-group state by
  * occupied grid cells (not raw distinct-value cardinality) while
  * keeping every percentile within the composed error bound — relative
  * 2^-g from cell truncation plus the band compression's rank slack —
  * and g = 0 must be bit-identical to the grid-free aggregate.
  */
class QuantileAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  graft.functions.VectorFunctions.ensureRegistered(spark)
  import spark.implicits._

  // deterministic LCG uniform draw over [0, 1000) — n near-distinct
  // doubles, the unbounded-cardinality gauge the grid exists for
  private val n = 50000
  private val vals: Seq[Double] = {
    var x = 88172645463325252L
    (0 until n).map { _ =>
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (x >>> 11).toDouble / (1L << 53).toDouble * 1000.0
    }
  }
  private def df = vals.zipWithIndex.map { case (v, i) => (i % 7, v) }
    .toDF("slice", "v")

  private def stateSize(state: org.apache.spark.sql.Column): Int =
    df.agg(state.as("s")).select(size(col("s"))).as[Int].head()

  test("g-bit grid bounds state by occupied cells; g=0 is the identity") {
    val g = 6
    val exact = stateSize(VectorFunctions.qhistState(col("v")))
    val gridded = stateSize(VectorFunctions.qhistStateGrid(col("v"), g))
    // the raw column is effectively all-distinct; the grid holds at
    // most 2^g cells per occupied binary order of magnitude
    val magnitudes = vals.map(v => math.getExponent(v)).distinct.size
    assert(exact > n / 2, s"fixture lost distinctness ($exact)")
    assert(gridded <= (1 << g) * magnitudes,
      s"state $gridded exceeds the ${1 << g}-cells-per-magnitude bound " +
        s"($magnitudes magnitudes)")
    assert(gridded < exact / 20,
      s"grid bought no real state reduction: $gridded vs $exact")
    // g = 0 disables the grid bit-for-bit
    val s0 = df.agg(VectorFunctions.qhistState(col("v")).as("s"))
      .select(col("s")).as[Seq[(Double, Long)]].head()
    val s0g = df.agg(VectorFunctions.qhistStateGrid(col("v"), 0).as("s"))
      .select(col("s")).as[Seq[(Double, Long)]].head()
    assert(s0 === s0g)
  }

  test("gridded percentiles stay within relative 2^-g plus the band's " +
      "rank slack of the exact estimates") {
    val g = 6
    val b = 2048
    val bps = Seq(5000, 9500, 9900)
    def estimates(state: org.apache.spark.sql.Column): Seq[Double] =
      df.groupBy("slice").agg(state.as("state"))
        .agg(VectorFunctions.qhistPercentiles(col("state"), bps, b).as("ps"))
        .select(explode(col("ps"))).as[Double].collect().toSeq
    val exact = estimates(VectorFunctions.qhistState(col("v")))
    val gridded = estimates(VectorFunctions.qhistStateGrid(col("v"), g))
    // value tolerance: cell truncation (relative 2^-g) + the value
    // spread of the band's n/b rank slack on a uniform [0,1000) draw
    val rankSlackValue = 1000.0 * 2.0 * ((n.toDouble / b) + 1.0) / n
    for ((bp, (e, got)) <- bps.zip(exact.zip(gridded))) {
      val tol = math.abs(e) / (1 << g) + rankSlackValue + 1e-9
      assert(math.abs(got - e) <= tol,
        s"bp=$bp gridded=$got exact=$e tol=$tol")
    }
    // monotone map sanity: quantization never raises a value beyond
    // the band-boundary shift (cell-merging moves band edges, so the
    // kept representative may sit up to the rank slack later)
    assert(gridded.zip(exact).forall { case (q, e) =>
      q <= e + rankSlackValue + 1e-9 })
  }
}
