package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** B4 — ingest counters (`yamon_ingested_*{result=written|dropped}`,
  * ref: clickhouse/internal_metrics.go:8-23, counted at
  * clickhouse_writer.go:124-150), Spark-first: rows are counted with
  * `Dataset.observe` (a codegen'd aggregate riding the existing plan — no
  * second pass over the data) and surfaced per micro-batch through the
  * engine's `StreamingQueryListener` bus.
  */
object IngestMetrics {

  val observationName = "graft_ingest"

  /** Auth-gate observation ([[graft.sources.Wire.authorized]]): received /
    * dropped envelope counts riding the same plan, no second pass.
    */
  val authObservationName = "graft_auth"

  /** Attach a written-rows observation to a stream; pair with
    * [[Listener]] to accumulate totals.
    */
  def observed(df: DataFrame): DataFrame =
    df.observe(observationName, count(lit(1)).as("written"))

  /** Accumulates observed written-row and auth-drop counts per query name.
    * Register with `spark.streams.addListener(new IngestMetrics.Listener)`.
    */
  final class Listener extends StreamingQueryListener {
    private val counts = new ConcurrentHashMap[String, Long]()
    private val drops = new ConcurrentHashMap[String, Long]()

    def written(queryName: String): Long = counts.getOrDefault(queryName, 0L)

    /** Envelopes rejected by the auth gate (`result=dropped`,
      * ref: clickhouse/internal_metrics.go:8-23 counting semantics).
      */
    def dropped(queryName: String): Long = drops.getOrDefault(queryName, 0L)

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val metrics = e.progress.observedMetrics
      val name = Option(e.progress.name).getOrElse(e.progress.id.toString)
      if (metrics.containsKey(observationName)) {
        val written = metrics.get(observationName).getAs[Long]("written")
        counts.merge(name, written, (a, b) => a + b)
      }
      if (metrics.containsKey(authObservationName)) {
        val d = metrics.get(authObservationName).getAs[Long]("dropped")
        drops.merge(name, d, (a, b) => a + b)
      }
    }
  }
}
