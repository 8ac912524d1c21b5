package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: `runMain graft.Explain <query> [sfDir]` prints the
  * formatted physical plan of a declared query — the review loop for
  * checking pushdown, exchanges, and codegen spans without running it.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error(s"usage: Explain <query> [sfDir]; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
