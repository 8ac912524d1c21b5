package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.Event

/** T8 — audit-event reassembly (ref: tail.go:62-87): consecutive raw audit
  * lines sharing an event id are coalesced into one semantic event, closing
  * a group after `maxMsgs` messages or `timeoutMs` of inactivity (the
  * go-libaudit Reassembler's 100-msg / 5-s window, ref: tail.go:63).
  *
  * Spark-first shape: `flatMapGroupsWithState` keyed on (host, audit id)
  * with a processing-time timeout — the engine's one custom stateful
  * operator (SURVEY.md §2.5); everything else uses built-in streaming
  * aggregation state.
  */
object AuditSession {

  /** One raw audit line: `type=SYSCALL msg=audit(1700000000.123:456): k=v ...`
    * already split into its id, type and payload.
    */
  final case class AuditLine(ts: Timestamp, host: String, auditId: String,
      auditType: String, payload: String)

  final case class SessionBuf(lines: List[AuditLine]) {
    def add(l: AuditLine): SessionBuf = SessionBuf(lines :+ l)
  }

  private def toEvent(key: (String, String), buf: SessionBuf): Option[Event] =
    buf.lines.headOption.map { first =>
      // event type from the first line; payloads joined in arrival order
      // into one JSON document (ref handler tail.go:21-40 merges messages)
      val payloads = buf.lines.map(l =>
        "{\"type\":\"" + l.auditType + "\",\"data\":\"" +
          l.payload.replace("\\", "\\\\").replace("\"", "\\\"") + "\"}")
      Event(
        time = first.ts,
        host = key._1,
        eventType = s"audit.${first.auditType}",
        data = payloads.mkString("[", ",", "]"),
        tags = Map("audit_id" -> key._2, "n_msgs" -> buf.lines.size.toString))
    }

  /** Sessionize a STREAMING dataset of audit lines: groups emit on size
    * overflow or inactivity timeout. (Batch datasets must use
    * [[sessionizeBatch]] — batch execution never fires timeouts, so
    * buffered state would be silently discarded.)
    */
  def sessionize(lines: Dataset[AuditLine], maxMsgs: Int = 100,
      timeoutMs: Long = 5000): Dataset[Event] = {
    implicit val eventEnc = Encoders.product[Event]
    implicit val keyEnc = Encoders.product[(String, String)]
    implicit val bufEnc = Encoders.product[SessionBuf]

    lines
      .groupByKey(l => (l.host, l.auditId))
      .flatMapGroupsWithState[SessionBuf, Event](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (key, it, state: GroupState[SessionBuf]) =>
          if (state.hasTimedOut) {
            // inactivity flush (ref: Reassembler 5s maintainer, tail.go:71-77)
            val out = state.getOption.flatMap(toEvent(key, _))
            state.remove()
            out.iterator
          } else {
            var buf = state.getOption.getOrElse(SessionBuf(Nil))
            val flushed = List.newBuilder[Event]
            it.foreach { l =>
              buf = buf.add(l)
              if (buf.lines.size >= maxMsgs) { // size flush (100-msg window)
                flushed ++= toEvent(key, buf)
                buf = SessionBuf(Nil)
              }
            }
            if (buf.lines.nonEmpty) {
              state.update(buf)
              state.setTimeoutDuration(timeoutMs)
            } else if (state.exists) {
              state.remove()
            }
            flushed.result().iterator
          }
      }
  }

  /** Batch-mode equivalent: every group flushes at end-of-input (plus the
    * same size-overflow splits) — the replay/backfill path.
    */
  def sessionizeBatch(lines: Dataset[AuditLine], maxMsgs: Int = 100): Dataset[Event] = {
    implicit val eventEnc = Encoders.product[Event]
    implicit val keyEnc = Encoders.product[(String, String)]
    lines
      .groupByKey(l => (l.host, l.auditId))
      .flatMapGroups { (key, it) =>
        val out = List.newBuilder[Event]
        var buf = SessionBuf(Nil)
        it.foreach { l =>
          buf = buf.add(l)
          if (buf.lines.size >= maxMsgs) {
            out ++= toEvent(key, buf)
            buf = SessionBuf(Nil)
          }
        }
        out ++= toEvent(key, buf)
        out.result().iterator
      }
  }

  private val lineRe = raw"type=(\S+) msg=audit\((\d+)\.(\d+):(\d+)\): ?(.*)".r

  /** Parser for the libaudit line format:
    * `type=SYSCALL msg=audit(1700000000.123:456): <payload>`
    * (ref: tail.go:78-87 feeds raw lines to the Reassembler).
    */
  def parseLines(spark: SparkSession, raw: Dataset[String], host: String): Dataset[AuditLine] = {
    import spark.implicits._
    raw.flatMap { line =>
      line match {
        case lineRe(typ, secs, frac, id, payload) =>
          // the digits after '.' are a decimal fraction, not literal ms:
          // audit(…0.5:…) = +500ms. Kernel stamps are fixed 3-digit, but
          // the regex accepts any width, so scale by digit count.
          val millis = frac.padTo(3, '0').take(3).toLong
          Some(AuditLine(new Timestamp(secs.toLong * 1000L + millis),
            host, id, typ, payload))
        case _ => None
      }
    }
  }
}
