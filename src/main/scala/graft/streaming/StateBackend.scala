package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store backend selection for the stateful streaming family
  * ([[StreamDedup]] bucket state, [[CorpusStream]] /
  * `Ingest.dedupStream` watermark dedup, [[AuditSession]] session
  * buffers).
  *
  * Spark's default provider (HDFSBackedStateStoreProvider) keeps every
  * state key in executor HEAP: fine for LTS downsample state (bounded by
  * watermark window × series cardinality), fatal for dedup state at
  * corpus scale — a continuously ingested 100 TB corpus' seen-key space
  * outgrows any JVM heap long before it outgrows a disk. The built-in
  * RocksDB provider keeps state in native memory + local SSD with
  * bounded block cache, which is the standard production posture for
  * large-keyspace streaming dedup; the heap provider stays the default
  * here only because the test corpus state is KBs.
  *
  * The provider class is a SESSION conf that each streaming query
  * captures at start and PINS into its checkpoint's offset-log metadata
  * (`OffsetSeqMetadata` records `spark.sql.streaming.stateStore.
  * providerClass` alongside shuffle partitions): a query started under
  * RocksDB restarts on RocksDB from the same checkpoint even if the
  * session conf has since changed — which is what makes [[withRocksDB]]'s
  * scoped set-and-restore safe next to concurrently running queries, and
  * what RocksDbStateSpec's restart case proves.
  */
object StateBackend {
  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Start streaming queries inside `body` on the RocksDB state store;
    * restores the prior provider conf after. Already-running queries are
    * unaffected (their provider is pinned in their checkpoints).
    */
  def withRocksDB[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }
}
