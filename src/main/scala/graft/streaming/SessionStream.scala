package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming twin of [[graft.operators.Sessionize]]: gap-based user
  * sessions via flatMapGroupsWithState with event-time timeout.
  *
  * State per user = the one open session (start, last, count). Each
  * micro-batch's events for a user are sorted in-memory (micro-batches
  * deliver unordered) and folded into the state; a gap > gapUs closes a
  * session and emits it downstream. The watermark closes idle sessions:
  * the timeout fires once event time passes last + gap, flushing the
  * final session without unbounded state. State size is O(users with an
  * open session), not O(events) — the shape that survives an unbounded
  * stream.
  */
object SessionStream {

  // event_time rides along: the watermark is attached to that column and
  // must still be present when the stateful operator is analyzed
  case class Ev(user_id: Long, ts_us: Long, event_time: java.sql.Timestamp)
  case class OpenSession(start_us: Long, last_us: Long, n: Long)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  def fold(userId: Long, batch: Iterator[Ev], state: GroupState[OpenSession],
           gapUs: Long): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.start_us, s.last_us, s.n))
    }
    val evs = batch.toArray.sortBy(_.ts_us)
    val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
    var open = state.getOption
    evs.foreach { e =>
      open match {
        case Some(s) if e.ts_us - s.last_us <= gapUs =>
          // a pre-watermark straggler from an earlier micro-batch may arrive
          // with ts_us < last_us — merging must never move the session end
          // backward (or start forward), else the next gap test uses a stale
          // bound and the timeout could land at/before the watermark
          open = Some(OpenSession(math.min(s.start_us, e.ts_us), math.max(s.last_us, e.ts_us), s.n + 1))
        case Some(s) =>
          closed += Session(userId, s.start_us, s.last_us, s.n)
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      // Spark rejects a timeout at or before the current watermark
      val floor = state.getCurrentWatermarkMs() + 1
      // expiry is STRICTLY AFTER last + gap in ms: flooring each term
      // separately could fire ~2 ms early, closing the session while a
      // sub-ms event at the inclusive gap boundary (ts <= last + gap)
      // is still same-session — the funnel seal bug's sibling
      state.setTimeoutTimestamp(math.max((s.last_us + gapUs) / 1000 + 1, floor)) // ms epoch
    }
    closed.iterator
  }

  /** Start the sessionizer over a parquet event stream (events schema of
    * TESTDATA.md), writing closed sessions to an in-memory sink named
    * `outputTable`. Watermark delay bounds how long a session stays open
    * past its last event.
    */
  def run(spark: SparkSession, eventsDir: String, outputTable: String,
          gapUs: Long = 30L * 60 * 1000 * 1000, watermarkDelay: String = "1 hour") = {
    import spark.implicits._
    val events: Dataset[Ev] = graft.core.Tables.eventStream(spark, eventsDir)
      .withColumn("event_time", col("ts"))
      .withWatermark("event_time", watermarkDelay)
      .select(col("user_id"), unix_micros(col("event_time")).as("ts_us"), col("event_time"))
      .as[Ev]
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (k: Long, it: Iterator[Ev], st: GroupState[OpenSession]) => fold(k, it, st, gapUs))
      .writeStream
      .outputMode("append")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The BUILT-IN operator twin: Spark's own `session_window`
    * aggregation instead of custom state — the compose-existing-ops
    * path when merged-window semantics fit (per SURVEY's preference
    * order; the flatMapGroupsWithState form above remains the shape for
    * semantics session_window can't express, e.g. per-session ordered
    * folds). Emitted columns are normalized to the custom form's
    * (start_us, end_us = LAST EVENT, n_events): session_window.end is
    * last event + gap, so the gap is subtracted back out.
    *
    * BOUNDARY SEMANTICS DIFFER from the gap-islands form by design:
    * per-event windows are half-open [ts, ts+gap), so a successor
    * exactly gap after its predecessor does NOT overlap and starts a
    * NEW session — the islands formulation (`diff > gap` stays
    * together) keeps it. The oracle encodes `>= gap` accordingly. */
  def runNative(spark: SparkSession, eventsDir: String, outputTable: String,
                gapUs: Long = 30L * 60 * 1000 * 1000, watermarkDelay: String = "1 hour") =
    graft.core.Tables.eventStream(spark, eventsDir)
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapUs microseconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        (unix_micros(col("session_window.end")) - gapUs).as("end_us"),
        col("n_events"))
      .writeStream
      .outputMode("append")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
      .start()
}
