package graft

/** Ad-hoc query timer: `runMain graft.QTime <query>... [sfDir]` — for
  * each named `SparkEntry.queries` entry, one `count()` pass (the
  * computation without full-output forcing — shows how much of a query's
  * cost is its final projection/sort) and then n=4 runs under the
  * bench's [[Bench.force]] discipline with the warm median, without the
  * 97-query session around it. For separating host/session noise from a
  * real per-query regression, and for costing a NEW query before it
  * lands in the bench loop.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QTime <query>... [sfDir]")
    val (names, sfDir) =
      if (args.length > 1 && args.last.startsWith("/"))
        (args.dropRight(1).toSeq, args.last)
      else (args.toSeq, "/root/testdata/sf0.1")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same instants as the UTC-pinned Verify/oracle run
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.prepare(spark, sfDir) catch { case _: Throwable => () }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val c0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"[qtime] $name count-only rows=$rows t=${(System.nanoTime() - c0) / 1e9}%.2fs")
      val times = (1 to 4).map { i =>
        val t0 = System.nanoTime()
        Bench.force(fn(spark, sfDir))
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[qtime] $name run$i $t%.2fs")
        t
      }
      val s = times.drop(1).sorted
      println(f"[qtime] $name warm-median ${s(s.size / 2)}%.2fs cold ${times.head}%.2fs")
    }
    spark.stop()
  }
}
