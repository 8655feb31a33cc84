package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY.md §2.11): the streaming
  * counterpart of the batch `q_sessionize` query — per-user event streams
  * split into sessions at >`gapSec` silences — implemented with
  * `flatMapGroupsWithState` + event-time timeout, the Structured-Streaming
  * custom-state pattern a 10^12-event training pipeline needs (windowed
  * aggs can't express "gap-based" sessions; state here is O(1) per user:
  * one open session summary, never a buffer of events — and bounded
  * across users: closed-session numbering markers are TTL-evicted after
  * `markerTtlSec`, so the store tracks recently-active users only).
  *
  * Semantics (identical to the batch window-lag plan):
  *  - a session is a maximal run of a user's events (time order, ties by
  *    event_id) where consecutive gaps are ≤ gapSec;
  *  - session_id numbers a user's sessions 1,2,… in time order;
  *  - output rows (user_id, session_id, n_events, sum_val), sum_val summed
  *    in 0.01-scaled longs (order-invariant exact, see q_sessionize).
  *
  * A session is emitted exactly once: either when a later in-stream event
  * closes it (gap > gapSec) or when the event-time watermark passes its
  * close deadline (EventTimeTimeout). Append output mode → an idempotent
  * append sink (parquet/memory) needs no dedup.
  *
  * Ordering contract: within a micro-batch events are sorted before
  * folding; ACROSS batches events must not arrive later than the
  * watermark allows (the standard Structured-Streaming contract —
  * late-beyond-watermark events would start a spurious session; the
  * batch plan has global order so it cannot). The spec feeds time-ordered
  * files and a restart mid-stream to pin exactly-once resume.
  */
object Sessionize {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long, valScaled: Long) {
    def tsSec: Long = ts.getTime / 1000
  }
  case class OpenSession(sessionId: Int, lastTs: Long, n: Long, sumScaled: Long)
  case class SessionRow(user_id: Long, session_id: Int, n_events: Long, sum_val: Double)

  /** Fold one user's new (sorted) events into the open-session state,
    * emitting every session that closes. */
  private[graft] def step(gapSec: Long, markerTtlSec: Long)(
      userId: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[SessionRow] = {
    if (state.hasTimedOut) { // values iterator is empty by contract
      state.getOption match {
        case Some(s) if s.n == 0 =>
          // a numbering marker reached its TTL: drop it, or state grows by
          // one entry per user EVER seen (unbounded on churny streams).
          // Trade-off: a user returning after markerTtlSec restarts
          // numbering at 1 — downstream must key sessions by
          // (user_id, session_id, first-seen time) if that matters.
          state.remove()
          return Iterator.empty
        case _ =>
      }
      // watermark passed the open session's deadline: emit the session,
      // but DON'T remove() yet — numbering must survive the close, so the
      // state degrades to an n=0 marker carrying nextSessionId (O(1) per
      // user; the next event resumes from it, and the TTL timeout above
      // eventually evicts it). An immediate remove() here restarted every
      // user's numbering at 1 after each quiet period — duplicate ids.
      val out = state.getOption.filter(_.n > 0).map(s =>
        SessionRow(userId, s.sessionId, s.n, s.sumScaled / 100.0)).iterator
      state.getOption.foreach { s =>
        state.update(OpenSession(s.sessionId + 1, s.lastTs, 0, 0))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + markerTtlSec * 1000L)
      }
      return out
    }
    val sorted = events.toArray.sortBy(e => (e.tsSec, e.event_id))
    val closed = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
    var cur = state.getOption.orNull
    sorted.foreach { e =>
      if (cur == null)
        cur = OpenSession(1, e.tsSec, 1, e.valScaled)
      else if (cur.n == 0)
        // marker left by a timeout-close: this event opens the session the
        // marker numbered. No gap check — the old session's deadline is
        // behind the watermark, so any on-time event is > gap past it.
        cur = OpenSession(cur.sessionId, e.tsSec, 1, e.valScaled)
      else if (e.tsSec - cur.lastTs > gapSec) {
        closed += SessionRow(userId, cur.sessionId, cur.n, cur.sumScaled / 100.0)
        cur = OpenSession(cur.sessionId + 1, e.tsSec, 1, e.valScaled)
      } else
        cur = cur.copy(lastTs = math.max(cur.lastTs, e.tsSec), n = cur.n + 1,
          sumScaled = cur.sumScaled + e.valScaled)
    }
    if (cur != null) {
      state.update(cur)
      if (cur.n > 0) {
        // close deadline: one tick past lastTs + gap (timeout must be set
        // strictly beyond the current watermark — guard for replayed batches)
        val deadline = (cur.lastTs + gapSec) * 1000L + 1
        state.setTimeoutTimestamp(math.max(deadline, state.getCurrentWatermarkMs() + 1))
      }
    }
    closed.iterator
  }

  /** events: (event_id, ts timestamp, user_id, value, …). Returns the
    * streaming Dataset of closed sessions; attach any append sink. */
  def sessions(events: DataFrame, gapSec: Long = 1800,
               watermarkDelay: String = "1 second",
               markerTtlSec: Long = 30L * 24 * 3600): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      // keep the watermarked ts ATTRIBUTE through the typed boundary (a
      // .map would detach it and EventTimeTimeout requires it upstream)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("valScaled"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step(gapSec, markerTtlSec))
  }

  /** Drain `eventsDir` with AvailableNow into a DURABLE parquet append
    * sink (memory sinks restart empty — useless for resume). Re-invoking
    * with the same `checkpointDir` resumes exactly-once: already-emitted
    * sessions are not re-appended, new files only extend the sink. */
  def runAvailableNow(spark: SparkSession, eventsDir: String, checkpointDir: String,
                      sinkDir: String, gapSec: Long = 1800,
                      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val schema = spark.read.parquet(eventsDir).schema
    val reader = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n)).parquet(eventsDir)
    val q = sessions(src, gapSec).writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet").option("path", sinkDir)
      .start()
    q.awaitTermination()
  }
}
