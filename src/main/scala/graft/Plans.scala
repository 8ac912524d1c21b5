package graft

import org.apache.spark.sql.SparkSession

/** Batch plan capture for the optimization-round evidence trail:
  * `runMain graft.Plans <outDir> <suffix> <query|all>... [sfDir]` writes
  * `<outDir>/<query>_<suffix>.txt` with each query's
  * `.explain("formatted")` output — the before/after plan record the
  * judge checks optimization claims against (plans/r16/). One session
  * for the whole list, unlike [[Explain]]'s one-query loop.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Plans <outDir> <suffix> <query|all>... [sfDir]")
    val outDir = args(0)
    val suffix = args(1)
    val rest = args.drop(2)
    val (namesRaw, sfDir) =
      if (rest.length > 1 && rest.last.startsWith("/"))
        (rest.dropRight(1).toSeq, rest.last)
      else (rest.toSeq, "/root/testdata/sf0.01")
    val names =
      if (namesRaw == Seq("all")) SparkEntry.queries.keys.toSeq.sorted
      else namesRaw
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // a failed prepare must be VISIBLE: plans captured against unprepared
    // state (missing temp views/indexes) would be misleading evidence
    try SparkEntry.prepare(spark, sfDir) catch {
      case e: Throwable =>
        System.err.println(s"[plans] WARNING: prepare failed, plans may be " +
          s"against unprepared state: $e")
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plans] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
