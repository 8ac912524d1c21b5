package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import graft.TestSpark
import graft.model.Metric

/** Storage layer: partitioned writes (D4/D5), downsampling (D1/D2/D3) in
  * batch and streaming, retention (D7). SURVEY.md §5.3-5.4.
  */
class IngestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))

  private val metrics = Seq(
    Metric(ts("2024-01-01T00:00:10Z"), "gauge", "h1", "load.1", 1.0, Map("env" -> "p")),
    Metric(ts("2024-01-01T00:00:40Z"), "gauge", "h1", "load.1", 3.0, Map("env" -> "p")),
    Metric(ts("2024-01-01T00:01:10Z"), "gauge", "h1", "load.1", 5.0, Map("env" -> "p")),
    Metric(ts("2024-01-01T00:00:20Z"), "counter", "h1", "net.rx", 10.0, Map()),
    Metric(ts("2024-01-01T00:00:50Z"), "counter", "h1", "net.rx", 7.0, Map()),
    Metric(ts("2024-01-02T12:00:00Z"), "gauge", "h2", "load.1", 9.0, Map()))

  test("writeTable: date partitions on disk, partition pruning in plan (D5)") {
    val dir = Files.createTempDirectory("graft_tbl").toString
    Ingest.writeTable(metrics.toDF
      .withColumnRenamed("metricType", "type"), dir, Seq("name", "host"))
    val parts = new java.io.File(dir).listFiles.map(_.getName).filter(_.startsWith("date="))
    assert(parts.toSet == Set("date=2024-01-01", "date=2024-01-02"))
    val planned = spark.read.parquet(dir).filter(col("date") === "2024-01-02")
    assert(planned.count() == 1)
    // pruning is visible in the physical plan's partition filters
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("date"))
  }

  test("writeTable: tag_keys/tag_values + derived columns materialize with pushdown (D6)") {
    val dir = Files.createTempDirectory("graft_tagidx").toString
    Ingest.writeTable(metrics.toDF.withColumnRenamed("metricType", "type"),
      dir, Seq("name", "host"),
      derived = Seq("tag_env" -> col("tags").getItem("env")))
    val back = spark.read.parquet(dir)
    assert(Seq("tag_keys", "tag_values", "tag_env").forall(back.columns.contains))
    // the ClickHouse-parity derived arrays hold the map's keys/values
    val r = back.filter(col("name") === "load.1" && col("host") === "h1")
      .select("tag_keys", "tag_values").collect().head
    assert(r.getSeq[String](0) == Seq("env") && r.getSeq[String](1) == Seq("p"))
    // predicates on the materialized tag column reach the parquet scan
    val q = back.filter(col("tag_env") === "p")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(tag_env,p)"), plan)
    assert(q.count() == 3)
  }

  test("downsample batch: gauge avg / counter sum per 1-min bucket (D1/D2)") {
    val out = Ingest.downsample(
        metrics.toDF.withColumnRenamed("metricType", "type"))
      .orderBy("name", "bucket")
      .collect()
    val byKey = out.map(r => (r.getAs[String]("name"),
      r.getAs[Timestamp]("bucket").toInstant.toString) -> r.getAs[Double]("value")).toMap
    assert(byKey(("load.1", "2024-01-01T00:00:00Z")) == 2.0) // avg(1,3)
    assert(byKey(("load.1", "2024-01-01T00:01:00Z")) == 5.0)
    assert(byKey(("net.rx", "2024-01-01T00:00:00Z")) == 17.0) // sum(10,7)
  }

  test("downsample streaming == downsample batch (SURVEY §7.3 equivalence)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Metric]
    val q = Ingest.downsampleStream(
        mem.toDF.withColumnRenamed("metricType", "type"), watermark = "0 seconds")
      .writeStream.format("memory").queryName("lts_test")
      .outputMode("update").start()
    try {
      mem.addData(metrics: _*)
      q.processAllAvailable()
      val streaming = spark.table("lts_test")
        .select("bucket", "type", "host", "name", "tags_key", "value", "n")
      val batch = Ingest.downsample(
        metrics.toDF.withColumnRenamed("metricType", "type"))
      assert(streaming.exceptAll(batch).isEmpty && batch.exceptAll(streaming).isEmpty)
    } finally q.stop()
  }

  test("downsample property: per-series counter sums are conserved (§5.4)") {
    val gen = for {
      n <- Gen.choose(1, 40)
      vals <- Gen.listOfN(n, Gen.choose(0, 1000))
      secs <- Gen.listOfN(n, Gen.choose(0L, 600L))
    } yield vals.zip(secs).map { case (v, s) =>
      Metric(new Timestamp(1704067200000L + s * 1000), "counter", "h", "c", v.toDouble, Map())
    }
    val sample = Iterator.continually(gen.sample).flatten.take(5).toSeq
    sample.foreach { ms =>
      val total = Ingest.downsample(ms.toDF.withColumnRenamed("metricType", "type"))
        .agg(sum("value")).as[Double].collect().head
      assert(total == ms.map(_.value).sum)
    }
  }

  test("streaming exact dedup: duplicate keys within the watermark collapse") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Metric]
    val q = Ingest.dedupStream(
        mem.toDF.withColumnRenamed("metricType", "type"),
        keyCols = Seq("name", "host"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream_test")
      .outputMode("append").start()
    try {
      def m(name: String, host: String, s: Int, v: Double) =
        Metric(ts(f"2024-01-01T00:00:${s}%02dZ"), "gauge", host, name, v, Map())
      mem.addData(m("a", "h1", 1, 1.0), m("a", "h1", 2, 2.0), m("b", "h1", 3, 3.0))
      q.processAllAvailable()
      mem.addData(m("a", "h1", 4, 4.0), m("a", "h2", 5, 5.0))
      q.processAllAvailable()
      val out = spark.table("dedup_stream_test")
        .select("name", "host", "value").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      // first occurrence per (name, host) only — in-batch and cross-batch
      // duplicates both collapse; (a, h2) is a distinct key and survives
      assert(out == Set(("a", "h1", 1.0), ("b", "h1", 3.0), ("a", "h2", 5.0)))
    } finally q.stop()
  }

  test("bucketed tables join with zero exchange (co-located join)") {
    val dir = Files.createTempDirectory("graft_bkt").toString
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    Ingest.writeBucketed(ev.select("event_id", "user_id", "value"),
      "bkt_fact", s"$dir/fact", "user_id", 8)
    Ingest.writeBucketed(
      ev.groupBy("user_id").agg(count(lit(1)).as("n_events")),
      "bkt_agg", s"$dir/agg", "user_id", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bkt_fact").join(spark.table("bkt_agg"), "user_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(j.count() == ev.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("retention drops only expired date partitions (D7)") {
    val dir = Files.createTempDirectory("graft_ttl").toString
    Ingest.writeTable(metrics.toDF.withColumnRenamed("metricType", "type"),
      dir, Seq("name", "host"))
    // 2024-01-01 is >30 days old on Feb 1 (exactly-30-days is NOT expired,
    // matching ClickHouse's `when + INTERVAL 30 DAY < now()`)
    val dropped = Retention.dropExpired(spark, dir, maxAgeDays = 30,
      today = LocalDate.parse("2024-02-01"))
    assert(dropped == Seq("date=2024-01-01"))
    assert(spark.read.parquet(dir).select("date").distinct.as[java.sql.Date]
      .collect().map(_.toString).toSeq == Seq("2024-01-02"))
  }
}
