package graft.plans

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}
import graft.streaming.Ingest

/** LTS routing (SURVEY.md §4): minute-or-coarser bucket aggregates over a
  * registered raw table transparently scan its rollup, with bit-identical
  * results (decimal re-aggregation is exact).
  */
class LtsRouteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // engine-layout raw table (time, event_type, value) + its minute rollup
  private lazy val (rawPath, ltsPath): (String, String) = {
    val base = Files.createTempDirectory("graft_lts").toString
    val raw = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts").as("time"), col("event_type"), col("value"))
    raw.write.parquet(s"$base/raw")
    Ingest.ltsRollup(spark.read.parquet(s"$base/raw"), Seq("event_type"))
      .write.parquet(s"$base/lts")
    (s"$base/raw", s"$base/lts")
  }

  private def minuteQuery = spark.read.parquet(rawPath)
    .groupBy(date_trunc("minute", col("time")).as("bucket"), col("event_type"))
    .agg(sum(col("value").cast("decimal(18,2)")).as("sv"), count(lit(1)).as("n"))

  private def hourlyAvgQuery = spark.read.parquet(rawPath)
    .groupBy(date_trunc("hour", col("time")).as("bucket"))
    .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
      count(lit(1))).as("avg_value"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def routed(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.exists(_.toString.contains(ltsPath))
          case _ => false
        }
    }.exists(identity)

  private def withRoute[A](f: => A): A = {
    LtsRoute.enable(spark)
    LtsRoute.register(spark, rawPath, ltsPath)
    try f finally LtsRoute.deregister(spark, rawPath)
  }

  test("minute sum+count aggregate routes to the rollup, bit-identical") {
    val baseline = rows(minuteQuery) // route not registered yet
    withRoute {
      assert(routed(minuteQuery), minuteQuery.queryExecution.optimizedPlan.toString)
      assert(rows(minuteQuery) == baseline)
    }
  }

  test("coarser grain + derived avg re-aggregates from the rollup") {
    val baseline = rows(hourlyAvgQuery)
    withRoute {
      assert(routed(hourlyAvgQuery))
      assert(rows(hourlyAvgQuery) == baseline)
    }
  }

  test("downstream operators stay bound across the rewrite") {
    // built fresh on each use: a DataFrame's QueryExecution is lazy and
    // cached, so a pre-registration plan would never see the route
    def q = minuteQuery.orderBy(col("bucket"), col("event_type")).limit(7)
    val baseline = q.collect().map(_.toString).toSeq
    withRoute {
      assert(routed(q))
      assert(q.collect().map(_.toString).toSeq == baseline)
    }
  }

  test("non-reaggregable queries are left untouched") {
    withRoute {
      // raw-grain grouping: time is not derivable from minute buckets
      val rawGrain = spark.read.parquet(rawPath)
        .groupBy(col("time")).agg(count(lit(1)).as("n"))
      assert(!routed(rawGrain))
      // percentile needs raw values, not partial sums
      val pct = spark.read.parquet(rawPath)
        .groupBy(col("event_type")).agg(expr("percentile(value, 0.5)").as("p50"))
      assert(!routed(pct))
      // second-grain trunc is finer than the rollup
      val fine = spark.read.parquet(rawPath)
        .groupBy(date_trunc("second", col("time")).as("b"))
        .agg(count(lit(1)).as("n"))
      assert(!routed(fine))
      // sum over a dimension column is not the rollup's measure
      val wrongCol = spark.read.parquet(rawPath)
        .groupBy(date_trunc("minute", col("time")).as("b"))
        .agg(sum(length(col("event_type")).cast("decimal(18,2)")).as("s"))
      assert(!routed(wrongCol))
      // FILTER-clause aggregates count raw rows, not rollup rows
      val filtered = spark.read.parquet(rawPath)
        .groupBy(date_trunc("minute", col("time")).as("b"))
        .agg(count_if(col("event_type") === "click").as("clicks"))
      assert(!routed(filtered))
      // a different decimal scale rounds per row on raw but per total when
      // re-aggregated — not the same answer, must not route
      val wrongScale = spark.read.parquet(rawPath)
        .groupBy(date_trunc("minute", col("time")).as("b"))
        .agg(sum(col("value").cast("decimal(18,0)")).as("s"))
      assert(!routed(wrongScale))
      // DISTINCT is not derivable from partial sums
      val dist = spark.read.parquet(rawPath)
        .groupBy(date_trunc("minute", col("time")).as("b"))
        .agg(sum_distinct(col("value").cast("decimal(18,2)")).as("s"))
      assert(!routed(dist))
    }
  }

  test("upsertByKey heals crashed swap residue at entry and a " +
      "residue-bearing rollup declines to route until healed") {
    import spark.implicits._
    val roll = java.nio.file.Files
      .createTempDirectory("graft-lts-heal").toString + "/lts"
    def batchOf(v: Double) = Seq(
      ("2024-01-01 10:01:00", "cpu", v),
      ("2024-01-02 10:01:00", "mem", v))
      .toDF("b0", "name", "v")
      .select(col("b0").cast("timestamp").as("bucket"), col("name"),
        col("v").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .as("sum_value"))
      .withColumn("n", org.apache.spark.sql.functions.lit(1L))
    graft.streaming.Ingest.upsertByKey(batchOf(1.0), roll,
      Seq("bucket", "name"))
    // fabricate a crashed swap: one date dir renamed aside mid-swap,
    // plus an orphaned stage tree
    val root = new java.io.File(roll)
    val dateDir = root.listFiles().filter(_.getName.startsWith("date=")).head
    val aside = new java.io.File(root, s"${dateDir.getName}.old-deadbeef")
    assert(dateDir.renameTo(aside))
    assert(new java.io.File(root, ".tmp-stage-deadbeef").mkdirs())
    // (the cache-miss DECLINE while an aside exists is pinned at the
    // shared RelationCache in QuantileRouteSpec; the heal below is this
    // entry's contract)
    graft.streaming.Ingest.upsertByKey(batchOf(2.0), roll,
      Seq("bucket", "name"))
    assert(!new java.io.File(root, ".tmp-stage-deadbeef").exists(),
      "orphan stage tree not swept")
    assert(!aside.exists(), "crashed aside not healed")
    spark.catalog.refreshByPath(roll)
    // a SET compare over ALL rows: toMap would collapse a double-kept
    // key to one arbitrary entry and mask exactly the regression this
    // pin exists for (review-found, r14)
    val got = spark.read.parquet(roll)
      .select(col("name"), col("sum_value").cast("double"))
      .as[(String, Double)].collect().toSeq
    // the upsert replaced both keys' rows with the revised values — no
    // row lost to the crashed swap, none double-kept
    assert(got.size == 2 && got.toSet === Set("cpu" -> 2.0, "mem" -> 2.0))
  }

  test("upsertByKey pins its date derivation: an existing table without " +
      "the datekey marker refuses; certifyUtcDateLayout verifies and " +
      "stamps a genuinely-UTC legacy table; null buckets merge " +
      "null-safely") {
    import spark.implicits._
    val roll = java.nio.file.Files
      .createTempDirectory("graft-lts-marker").toString + "/lts"
    def batchOf(b0: Option[String], v: Double) = Seq((b0, "cpu", v))
      .toDF("b0", "name", "v")
      .select(col("b0").cast("timestamp").as("bucket"), col("name"),
        col("v").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .as("sum_value"))
      .withColumn("n", org.apache.spark.sql.functions.lit(1L))
    // a fresh table self-marks
    graft.streaming.Ingest.upsertByKey(
      batchOf(Some("2024-01-01 10:01:00"), 1.0), roll, Seq("bucket", "name"))
    val meta = new java.io.File(roll, "_meta")
    assert(meta.exists(), "fresh upsert table must stamp its datekey")
    // a pre-marker (r14-written) table: live date dirs, no _meta —
    // upsert must refuse rather than risk merging across derivations
    assert(meta.delete())
    val refusal = intercept[IllegalArgumentException] {
      graft.streaming.Ingest.upsertByKey(
        batchOf(Some("2024-01-01 10:02:00"), 2.0), roll,
        Seq("bucket", "name"))
    }
    assert(refusal.getMessage.contains("datekey"))
    // the mechanical upgrade: this table IS UTC-derived, so certify
    // verifies row by row and stamps; upserts then proceed
    graft.streaming.Ingest.certifyUtcDateLayout(spark, roll)
    assert(meta.exists())
    graft.streaming.Ingest.upsertByKey(
      batchOf(None, 5.0) // a NULL bucket lands in the default partition
        .unionByName(batchOf(Some("2024-01-01 10:01:00"), 3.0)),
      roll, Seq("bucket", "name"))
    // and a second null-bucket upsert must MERGE against the stored
    // null-date row (isin(null) matches nothing — the r14-ADVICE gap),
    // replacing it rather than double-keeping
    graft.streaming.Ingest.upsertByKey(batchOf(None, 7.0), roll,
      Seq("bucket", "name"))
    spark.catalog.refreshByPath(roll)
    val got = spark.read.parquet(roll)
      .select(col("bucket").cast("string"), col("sum_value").cast("double"))
      .as[(Option[String], Double)].collect().toSeq
    assert(got.size == 2, s"expected 2 rows (one per bucket key), got $got")
    assert(got.collect { case (None, v) => v } === Seq(7.0),
      "null-bucket row must be replaced, not dropped or double-kept")
    assert(got.collect { case (Some(_), v) => v } === Seq(3.0))
    // a table whose layout genuinely mismatches refuses to certify
    val legacy = java.nio.file.Files
      .createTempDirectory("graft-lts-legacy").toString + "/lts"
    batchOf(Some("2024-01-01 10:01:00"), 1.0)
      .withColumn("date", org.apache.spark.sql.functions
        .to_date(org.apache.spark.sql.functions.lit("2024-06-30")))
      .write.partitionBy("date").parquet(legacy)
    val bad = intercept[IllegalArgumentException] {
      graft.streaming.Ingest.certifyUtcDateLayout(spark, legacy)
    }
    assert(bad.getMessage.contains("rebuild"))
  }

  test("unregistered tables never route") {
    LtsRoute.enable(spark)
    assert(!routed(minuteQuery))
  }

  test("streaming-maintained rollup serves routed queries across a checkpoint restart") {
    import java.nio.file.Paths
    import graft.sources.Wire
    val base = Files.createTempDirectory("graft_lts_stream").toString
    val in = s"$base/in"; Files.createDirectory(Paths.get(in))
    val rawP = s"$base/raw"; val ltsP = s"$base/lts"; val ckpt = s"$base/ckpt"
    def m(min: Int, sec: Int, host: String, v: Double) =
      f"""{"m":[{"t":"2024-01-01T00:$min%02d:$sec%02dZ","m":"gauge","h":"$host","n":"load.1","v":$v}]}"""
    val source = () => Wire.metrics(spark.readStream.text(in))

    // phase 1: two rows in minute 0, one in minute 1
    Files.writeString(Paths.get(s"$in/a.json"),
      m(0, 10, "a", 1.5) + "\n" + m(0, 40, "a", 2.25) + "\n" + m(1, 5, "b", 4.0) + "\n")
    val q1 = Ingest.streamLtsRollupTo(source(), ltsP, ckpt, Seq("host", "name"))
    try q1.processAllAvailable() finally q1.stop()

    // phase 2 lands while the pipeline is down: a LATE row revising minute
    // 0's partial sums (the upsert must REPLACE, not append) + a new minute.
    // Restart from the same checkpoint → aggregate state resumes.
    Files.writeString(Paths.get(s"$in/b.json"),
      m(0, 55, "a", 10.0) + "\n" + m(2, 30, "a", 7.0) + "\n")
    val q2 = Ingest.streamLtsRollupTo(source(), ltsP, ckpt, Seq("host", "name"))
    try q2.processAllAvailable() finally q2.stop()

    // the same rows as a raw batch table (Wire transforms are engine-shared)
    Wire.metrics(spark.read.text(in))
      .select(col("time"), col("host"), col("name"), col("value"))
      .write.parquet(rawP)
    def q = spark.read.parquet(rawP)
      .groupBy(date_trunc("minute", col("time")).as("bucket"),
        col("host"), col("name"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("sv"), count(lit(1)).as("n"))
    val baseline = rows(q)
    assert(baseline.nonEmpty)
    LtsRoute.enable(spark)
    LtsRoute.register(spark, rawP, ltsP)
    try {
      val routedToLts = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.exists(_.toString.contains(ltsP))
            case _ => false
          }
      }.exists(identity)
      assert(routedToLts, q.queryExecution.optimizedPlan.toString)
      assert(rows(q) == baseline) // bit-identical: late-row revision upserted
    } finally LtsRoute.deregister(spark, rawP)
  }
}
