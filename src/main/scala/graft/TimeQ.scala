package graft
import org.apache.spark.sql.SparkSession

/** Single-query timing harness: `runMain graft.TimeQ <query>...` warms
  * each named query on sf0.001, then times it at sf0.1 twice — once
  * under `count()` (the computation), once under [[Bench.force]] (full
  * declared output) — the quick cost check for a new query before it
  * lands in the 88-query bench loop.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args) {
      val fn = SparkEntry.queries(q)
      Bench.force(fn(spark, "/root/testdata/sf0.001")) // warmup
      val t0 = System.nanoTime()
      val n = fn(spark, "/root/testdata/sf0.1").count()
      println(f"[timeq] $q rows=$n t=${(System.nanoTime()-t0)/1e9}%.2fs")
      val t1 = System.nanoTime()
      Bench.force(fn(spark, "/root/testdata/sf0.1"))
      println(f"[timeq] $q forced t=${(System.nanoTime()-t1)/1e9}%.2fs")
    }
    spark.stop()
  }
}
