package graft

/** Ad-hoc single-query timer: `runMain graft.QTime <name> [sfDir]` —
  * n=3 medians for one `SparkEntry.queries` entry under the bench's
  * forcing discipline, without the 75-query session around it. For
  * separating host/session noise from a real per-query regression.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: QTime <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    try SparkEntry.prepare(spark, sfDir) catch { case _: Throwable => () }
    val times = (1 to 4).map { i =>
      val t0 = System.nanoTime()
      Bench.force(fn(spark, sfDir))
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[qtime] $name run$i $t%.2fs")
      t
    }
    val s = times.drop(1).sorted
    println(f"[qtime] $name warm-median ${s(s.size / 2)}%.2fs cold ${times.head}%.2fs")
    spark.stop()
  }
}
