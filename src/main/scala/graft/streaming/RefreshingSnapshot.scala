package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Snapshot lifecycle for the foreachBatch index-refresh pattern shared
  * by [[StreamDedup]]/[[VectorStream]]/[[SpanStream]]: a static-side
  * parquet artifact re-read every `refreshEvery` micro-batches, with a
  * persist/unpersist handoff between snapshots.
  *
  * Closes the r6 ADVICE leak: the refresh closure could never release
  * its FINAL snapshot (it cannot know when its query ends), so every
  * started refreshing query pinned one cached index for the session
  * lifetime. The holder binds itself to the owning query's runId on the
  * first batch — the micro-batch executes on the stream's execution
  * thread, whose name carries `runId = <uuid>`; parsed defensively, an
  * unrecognizable name degrades to the old never-released behavior,
  * never to a wrong release — and one session-level
  * StreamingQueryListener unpersists the bound snapshot when exactly
  * that query terminates.
  *
  * Also hardens the shared-`var` cross-contamination of a double-started
  * writer: a second query driving the same holder fails fast instead of
  * silently sharing (and racing) the first query's snapshot cadence.
  */
private[streaming] final class RefreshingSnapshot(owner: SparkSession,
    load: SparkSession => DataFrame) {

  @volatile private var snap: DataFrame = null
  @volatile private var boundRunId: Option[String] = None

  private def threadRunId: Option[String] =
    "runId = ([0-9a-fA-F-]{36})".r
      .findFirstMatchIn(Thread.currentThread().getName).map(_.group(1))

  /** Bind on first use, refresh when due, return the live snapshot. */
  def forBatch(sp: SparkSession, batchId: Long, refreshEvery: Int): DataFrame =
    this.synchronized {
      (boundRunId, threadRunId) match {
        case (None, rid) =>
          boundRunId = rid
          // register on the OWNER session: foreachBatch hands a cloned
          // session whose StreamingQueryManager filters listener events
          // to queries it started itself - a listener registered there
          // would never see this query's termination
          rid.foreach(_ => RefreshingSnapshot.track(owner, this))
        case (Some(b), Some(r)) if b != r =>
          throw new IllegalStateException(
            s"refreshing writer is already driven by query runId=$b; " +
              s"build a new writer per start() (second query runId=$r)")
        case _ => ()
      }
      if (snap == null || batchId % refreshEvery == 0) {
        if (snap != null) snap.unpersist()
        snap = load(sp).persist()
      }
      snap
    }

  /** Release if bound to `runId`; true exactly when this holder owned it. */
  private[streaming] def terminated(runId: String): Boolean = this.synchronized {
    if (boundRunId.contains(runId)) {
      if (snap != null) { snap.unpersist(); snap = null }
      boundRunId = None
      true
    } else false
  }
}

private[streaming] object RefreshingSnapshot {
  private val live =
    java.util.concurrent.ConcurrentHashMap.newKeySet[RefreshingSnapshot]()
  // per-SESSION listener registration: a StreamingQueryManager only
  // delivers events for queries its own session started, so a single
  // global flag would leave every later session's holders unreleased.
  // WEAK keys: a strong set would pin every session (and its state) for
  // the JVM lifetime in a create-session-per-job application
  private val listenerSessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  private def track(sp: SparkSession, h: RefreshingSnapshot): Unit = {
    live.add(h): Unit
    if (!listenerSessions.contains(sp)) this.synchronized {
      if (listenerSessions.add(sp)) {
        sp.streams.addListener(new StreamingQueryListener {
          override def onQueryStarted(
              e: StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryProgress(
              e: StreamingQueryListener.QueryProgressEvent): Unit = ()
          override def onQueryTerminated(
              e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
            val rid = e.runId.toString
            val it = live.iterator()
            while (it.hasNext) if (it.next().terminated(rid)) it.remove()
          }
        })
      }
    }
  }
}
