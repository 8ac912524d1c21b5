package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import graft.{Tables, TestSpark}

/** Shard writer end-to-end: `shardPackFrame` argues the
  * `partitionBy(shard)` parquet write is exchange-free because shard ids
  * are nondecreasing in the range partitioning's key order — this spec
  * writes the shards and asserts it on the WRITE's own executed plan,
  * then proves the written table equals the declared query surface.
  */
class ShardWriteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("partitionBy(shard) write: one range exchange total, none added by the write; roundtrip exact") {
    val out = Files.createTempDirectory("graft_shards").toString + "/shards"
    val frame = TextOps.shardPackFrame(
      Tables.documents(spark, dir), shardTokens = 4096, seed = 42, numParts = 4)

    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString): Unit
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      frame.write.partitionBy("shard").parquet(out)
      // the listener bus is async; the write plan arrives shortly after
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (plans.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    } finally spark.listenerManager.unregister(listener)

    val writePlan = plans.toArray.map(_.toString)
      .find(_.contains("WriteFiles")).getOrElse(fail(s"no write plan captured"))
    // the corpus-volume move is the ONE range exchange on the seeded key;
    // partitionBy(shard) must not re-shuffle on the shard column (only
    // the writer's task-local sort may appear)
    assert(writePlan.contains("rangepartitioning"), writePlan)
    assert(!writePlan.contains("hashpartitioning(shard"), writePlan)
    assert(!writePlan.contains("rangepartitioning(shard"), writePlan)
    // every hash exchange in the plan is the partition-TOTALS one: keyed
    // on pid and fed by a partial (map-side) sum, so it moves one row
    // per partition — never corpus volume. This is the assert that
    // caught the r6 Window.partitionBy(pid) formulation, which hid a
    // second full-corpus hashpartitioning(pid) exchange under
    // ENSURE_REQUIREMENTS.
    val hashKeys = "Exchange hashpartitioning\\((\\w+)#".r
      .findAllMatchIn(writePlan).map(_.group(1)).toSet
    assert(hashKeys.subsetOf(Set("pid")), s"hash exchanges on $hashKeys:\n$writePlan")
    assert(writePlan.contains("partial_sum"), writePlan)
    // no window PARTITIONED BY pid (prints as `], [pid#N], [`) — the
    // offsets window orders by pid over one row per partition, which is
    // fine; a pid-partitioned window over the corpus is the exchange bug
    assert("\\], \\[pid#\\d+\\], \\[".r.findFirstIn(writePlan).isEmpty, writePlan)

    // roundtrip: the shard-partitioned table holds exactly the declared
    // query surface (shard comes back as a partition column)
    val back = spark.read.parquet(out)
      .select(col("doc_id"), col("n_tokens"),
        col("shard").cast("long").as("shard"), col("shard_offset"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = TextOps.shardPackOver(
        Tables.documents(spark, dir), 4096, seed = 42, numParts = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(back == want)
    assert(want.map(_._3).size > 1, "one shard only — partition layout untested")

    // physical layout: one directory per shard, and because shards are
    // nondecreasing within each of the 4 range partitions, each shard
    // directory holds at most 2 boundary-straddling task files
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.length == want.map(_._3).size)
    dirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files <= 2, s"${d.getName}: $files files — a consecutive " +
        "shard range per task cannot spread one shard over >2 tasks")
    }
  }
}
