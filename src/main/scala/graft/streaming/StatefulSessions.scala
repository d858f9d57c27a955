package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** A session being tracked for one user: bounds in epoch micros + count. */
case class OpenSession(startUs: Long, lastUs: Long, n: Long)

/** One emitted (closed) session — same shape as the batch
  * [[graft.operators.Sessionize]] output rows. */
case class ClosedSession(user_id: Long, session_start_us: Long,
                         session_end_us: Long, n_events: Long)

private[streaming] case class SessionEvent(user_id: Long, event_id: Long,
                                           us: Long, ts: java.sql.Timestamp)

/** Streaming gap-sessionization with EXPLICIT per-key state —
  * `flatMapGroupsWithState` over a watermarked stream, the Structured
  * Streaming pattern for operators whose state machine the built-in windowed
  * aggregates can't express (a session's end time depends on the data, not
  * the clock grid).
  *
  * Semantics match the batch operator: a new session starts when a user's
  * inter-event gap strictly exceeds `gapSeconds`; bounds are exact epoch
  * micros. A session closes two ways: a later event of the same user arrives
  * past the gap (emitted in that micro-batch), or the event-time watermark
  * passes `last + gap` with nothing new (timeout path). Events later than
  * `lateness` are dropped by the watermark; out-of-order events inside the
  * tolerance merge into the open session via min/max bounds. The streaming
  * result equals the batch result whenever no late event would have bridged
  * two already-emitted sessions — the inherent finite-lateness caveat of any
  * streaming sessionizer.
  *
  * Scale: state is ONE fixed-size record per active user (three longs), not
  * per event; Spark partitions groups by user across executors, persists
  * state in the state store between triggers, and drops it on timeout — a
  * 100 TB/day stream holds state only for users active inside the gap
  * horizon. Shuffle per trigger is the micro-batch, never history.
  */
object StatefulSessions {

  /** The same gap state machine on the `transformWithState` API (Spark 4's
    * successor to flatMapGroupsWithState): typed `ValueState` + explicit
    * event-time timers instead of one opaque state object + a single
    * timeout slot. Requires the RocksDB state store provider. */
  private class GapSessionProcessor(gapSeconds: Long)
      extends StatefulProcessor[Long, SessionEvent, ClosedSession] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState("open", Encoders.product[OpenSession],
        TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
        timers: TimerValues): Iterator[ClosedSession] = {
      val gapUs = gapSeconds * 1000000L
      val evs = rows.map(e => (e.us, e.event_id)).toArray.sorted
      val closed = Seq.newBuilder[ClosedSession]
      var cur = if (open.exists()) Some(open.get()) else None
      for ((us, _) <- evs) cur match {
        case Some(o) if us - o.lastUs > gapUs =>
          closed += ClosedSession(user, o.startUs, o.lastUs, o.n)
          cur = Some(OpenSession(us, us, 1L))
        case Some(o) =>
          cur = Some(OpenSession(math.min(o.startUs, us),
            math.max(o.lastUs, us), o.n + 1L))
        case None =>
          cur = Some(OpenSession(us, us, 1L))
      }
      cur.foreach { o =>
        open.update(o)
        // One live timer per key: clear stale ones, then arm last+gap
        // (floored past the watermark, as in the fMGWS path).
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(math.max(
          o.lastUs / 1000L + gapSeconds * 1000L,
          timers.getCurrentWatermarkInMs() + 1L))
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (open.exists()) {
        val s = open.get()
        open.clear()
        Iterator.single(ClosedSession(user, s.startUs, s.lastUs, s.n))
      } else Iterator.empty
    }
  }

  /** [[sessions]] re-expressed on `transformWithState`. Identical
    * semantics; the caller's session must run the RocksDB state store
    * (`spark.sql.streaming.stateStore.providerClass`). */
  def sessionsTws(events: DataFrame, gapSeconds: Long,
                  lateness: String = "10 seconds",
                  userCol: String = "user_id", tsCol: String = "ts",
                  idCol: String = "event_id"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    typedEvents(events, lateness, userCol, tsCol, idCol)
      .groupByKey(_.user_id)
      .transformWithState(new GapSessionProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Project first, watermark last: an alias-of-cast would strip the
    * watermark metadata off the event-time column, and the state timeouts /
    * timers need it on the frame that feeds the stateful operator. */
  private def typedEvents(events: DataFrame, lateness: String,
                          userCol: String, tsCol: String,
                          idCol: String): Dataset[SessionEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(userCol).cast("long").as("user_id"),
        col(idCol).cast("long").as("event_id"),
        unix_micros(col(tsCol)).as("us"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", lateness)
      .as[SessionEvent]
  }

  /** Attach the sessionizer to a streaming frame and append each
    * micro-batch's CLOSED sessions to a serving store (either deployment)
    * under fresh generations — the reference's ingest shape
    * (decode→aggregate→store) with the aggregate swapped for the session
    * state machine. Batches with no closed session skip the append: every
    * watermark-advance tick would otherwise burn a generation and a
    * retention slot, exactly the edge-drop rule the bucket-count path
    * applies. */
  def attachToStore(events: DataFrame, gapSeconds: Long,
                    store: graft.store.GenerationStore,
                    lateness: String = "10 seconds",
                    trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
                    checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    var writer = sessions(events, gapSeconds, lateness).toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.appendStreaming(batch)
        ()
      }
    trigger.foreach(t => writer = writer.trigger(t))
    checkpoint.foreach(dir => writer = writer.option("checkpointLocation", dir))
    writer.start()
  }

  /** Sessionize a streaming frame carrying `userCol`, `idCol`, `tsCol`
    * (timestamp). Returns an append-mode stream of closed sessions. */
  def sessions(events: DataFrame, gapSeconds: Long,
               lateness: String = "10 seconds",
               userCol: String = "user_id", tsCol: String = "ts",
               idCol: String = "event_id"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    typedEvents(events, lateness, userCol, tsCol, idCol)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.startUs, s.lastUs, s.n))
          } else {
            // Batch-local ordering mirrors the batch operator's (us, id) sort.
            val evs = it.map(e => (e.us, e.event_id)).toArray.sorted
            val closed = Seq.newBuilder[ClosedSession]
            var open = state.getOption
            for ((us, _) <- evs) open match {
              case Some(o) if us - o.lastUs > gapUs =>
                closed += ClosedSession(user, o.startUs, o.lastUs, o.n)
                open = Some(OpenSession(us, us, 1L))
              case Some(o) =>
                open = Some(OpenSession(math.min(o.startUs, us),
                  math.max(o.lastUs, us), o.n + 1L))
              case None =>
                open = Some(OpenSession(us, us, 1L))
            }
            open.foreach { o =>
              state.update(o)
              // Close when the watermark passes last+gap. The max() guards
              // the backlog case where that instant is already behind the
              // watermark (Spark rejects a timeout at-or-before it); the
              // session then times out on the next watermark advance.
              state.setTimeoutTimestamp(math.max(
                o.lastUs / 1000L + gapSeconds * 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            closed.result().iterator
          }
      }
  }
}
