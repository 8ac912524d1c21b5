package graft.operators

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** TagIndex publication contract: the build lands via atomic rename, so a
  * rebuilt/raced index can never double-append, and temp build dirs never
  * leak next to the published index.
  */
class TagIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rmTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(): Unit
  }

  test("ensure builds once, idempotently, with no temp-dir leakage — " +
      "through the r13 prefix+append+compact maintained chain") {
    val path = TagIndex.ensure(spark, dir)
    rmTree(new File(path)) // force a fresh build through the publish path
    val built = TagIndex.ensure(spark, dir)
    assert(built == path)
    val expected = Tables.events(spark, dir).count()
    assert(spark.read.parquet(path).count() == expected)
    // the in-builder chain compacted to one segment per date dir
    assert(TagIndex.segments(path) == 1)
    // second ensure: no rebuild, no append — row count must not move
    TagIndex.ensure(spark, dir): Unit
    assert(spark.read.parquet(path).count() == expected)
    val siblings = Option(new File(path).getParentFile.listFiles()).get
    assert(siblings.forall(f => !f.getName.contains(".tmp-")),
      s"leaked temp dirs: ${siblings.map(_.getName).mkString(",")}")
    // no staging residue inside the table either
    assert(Option(new File(path).listFiles()).get
      .forall(f => !f.getName.startsWith(".tmp-")))
  }

  test("tagged appends are replay-idempotent; events are bag rows so the " +
      "tag protocol (not value dedup) is what makes replays exact") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-tag-replay").toString
    val ev = Tables.events(spark, dir)
    TagIndex.appendTo(root, ev.filter(col("event_id") % 2 === 0),
      appendTag = Some(("ingest", "0")))
    val base = spark.read.parquet(root).count()
    assert(base > 0)
    val slice = ev.filter(col("event_id") % 2 =!= 0)
    TagIndex.appendTo(root, slice, appendTag = Some(("ingest", "1")))
    spark.catalog.refreshByPath(root)
    val after = spark.read.parquet(root).count()
    assert(after == ev.count())
    // an at-least-once replay of the SAME batch deletes its own tagged
    // files first — converges to exactly-once
    TagIndex.appendTo(root, slice, appendTag = Some(("ingest", "1")))
    spark.catalog.refreshByPath(root)
    assert(spark.read.parquet(root).count() == after)
    // per-event uniqueness held (the bag never double-counted)
    assert(spark.read.parquet(root).select("event_id").distinct().count() == after)
  }

  test("date-local compaction preserves the row bag exactly, restores " +
      "file economy, and a crashed date swap refuses serving then heals") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-tag-compact").toString
    val ev = Tables.events(spark, dir)
    for (m <- 0 until 3)
      TagIndex.appendTo(root, ev.filter(col("event_id") % 3 === m),
        appendTag = Some(("ingest", m.toString)))
    assert(TagIndex.segments(root) == 3)
    def bag(): Map[Long, Long] = {
      spark.catalog.refreshByPath(root)
      spark.read.parquet(root).groupBy("event_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val before = bag()
    TagIndex.compactDates(root, spark, owner = Some("ingest"))
    assert(TagIndex.segments(root) == 1)
    assert(bag() === before)
    // plant the exact residue a crashed swap leaves: dir missing, aside live
    val dd = new File(root).listFiles().filter(_.getName.startsWith("date=")).head
    val aside = new File(root, s"${dd.getName}.old-deadbeef")
    assert(dd.renameTo(aside))
    val e = intercept[IllegalArgumentException] {
      TagIndex.requireNoDateResidue(root)
    }
    assert(e.getMessage.contains("residue"), e.getMessage)
    TagIndex.recover(root)
    assert(bag() === before)
  }
}
