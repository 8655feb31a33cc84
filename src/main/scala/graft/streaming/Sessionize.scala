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
  * watermark allows (the standard Structured-Streaming contract; the
  * batch plan has global order so it cannot violate it). Events BELOW the
  * watermark are explicitly dropped in `step` (flatMapGroupsWithState
  * does not auto-drop them) and counted via the optional `lateDropped`
  * accumulator — deterministic discard, never a spurious split session.
  * The spec feeds time-ordered files and a restart mid-stream to pin
  * exactly-once resume, plus a late-event batch to pin the drop path.
  */
object Sessionize {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long, valScaled: Long) {
    def tsSec: Long = ts.getTime / 1000
  }
  case class OpenSession(sessionId: Int, lastTs: Long, n: Long, sumScaled: Long)
  case class SessionRow(user_id: Long, session_id: Int, n_events: Long, sum_val: Double)

  /** Fold one user's new (sorted) events into the open-session state,
    * emitting every session that closes.
    *
    * Late-beyond-watermark events are DROPPED here (optionally counted by
    * `lateDropped`): flatMapGroupsWithState does NOT auto-drop rows below
    * the watermark, so without this filter an event with
    * ts ≤ lastTs + gap arriving up to watermarkDelay after the timeout
    * fired would split one logical session into two — nondeterministic
    * divergence from the batch plan. With the filter the behavior under a
    * contract violation is deterministic: the row is discarded and
    * counted, exactly what a built-in windowed aggregation would do. */
  private[graft] def step(gapSec: Long, markerTtlSec: Long,
      lateDropped: Option[org.apache.spark.util.LongAccumulator] = None)(
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
    // watermark floor: getCurrentWatermarkMs() is 0 in the first batch
    // (nothing dropped), then the global event-time watermark.
    val wmMs = state.getCurrentWatermarkMs()
    val all = events.toArray
    val sorted = all.filter(_.ts.getTime >= wmMs).sortBy(e => (e.tsSec, e.event_id))
    if (sorted.length < all.length)
      lateDropped.foreach(_.add(all.length - sorted.length))
    val closed = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
    var cur = state.getOption.orNull
    sorted.foreach { e =>
      if (cur == null)
        cur = OpenSession(1, e.tsSec, 1, e.valScaled)
      else if (cur.n == 0)
        // marker left by a timeout-close: this event opens the session the
        // marker numbered. No gap check needed: the marker exists because
        // the watermark passed (lastTs + gap + 1) whole seconds, and the
        // filter above discarded anything below the watermark, so every
        // event reaching this branch has tsSec > lastTs + gap even after
        // second-flooring — the gap check would pass vacuously.
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
        // close deadline: one WHOLE SECOND past lastTs + gap, because the
        // gap rule floors timestamps to seconds — a 1 ms margin let the
        // timeout fire while a sub-second on-time event (e.g. lastTs+gap
        // + 0.5 s, same session under the batch rule) could still arrive,
        // splitting one logical session. Beyond (lastTs+gap+1) s every
        // on-time event floors to tsSec > lastTs + gap — a new session in
        // the batch plan too. (Timeout must also sit strictly beyond the
        // current watermark — guard for replayed batches.)
        val deadline = (cur.lastTs + gapSec + 1) * 1000L
        state.setTimeoutTimestamp(math.max(deadline, state.getCurrentWatermarkMs() + 1))
      } else
        // a marker that saw only late (filtered) events: the GroupState
        // contract clears the stored timeout on EVERY invocation unless
        // re-set, so without this re-arm the marker would never TTL out —
        // one permanent state entry per such user, exactly the unbounded
        // growth markerTtlSec exists to prevent
        state.setTimeoutTimestamp(
          math.max(wmMs + markerTtlSec * 1000L, wmMs + 1))
    }
    closed.iterator
  }

  /** events: (event_id, ts timestamp, user_id, value, …). Returns the
    * streaming Dataset of closed sessions; attach any append sink. */
  def sessions(events: DataFrame, gapSec: Long = 1800,
               watermarkDelay: String = "1 second",
               markerTtlSec: Long = 30L * 24 * 3600,
               lateDropped: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[SessionRow] = {
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
        step(gapSec, markerTtlSec, lateDropped))
  }

  /** Drain `eventsDir` with AvailableNow into a DURABLE parquet append
    * sink (memory sinks restart empty — useless for resume). Re-invoking
    * with the same `checkpointDir` resumes exactly-once: already-emitted
    * sessions are not re-appended, new files only extend the sink. */
  def runAvailableNow(spark: SparkSession, eventsDir: String, checkpointDir: String,
                      sinkDir: String, gapSec: Long = 1800,
                      maxFilesPerTrigger: Option[Int] = None,
                      lateDropped: Option[org.apache.spark.util.LongAccumulator] = None): Unit = {
    val schema = spark.read.parquet(eventsDir).schema
    val reader = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n)).parquet(eventsDir)
    val q = sessions(src, gapSec, lateDropped = lateDropped).writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet").option("path", sinkDir)
      .start()
    q.awaitTermination()
  }
}
