package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming twin of [[graft.operators.Temporal.mergeIntervals]]:
  * gaps-and-islands over VARIABLE-LENGTH activity intervals via
  * flatMapGroupsWithState — the continuous form of the warehouse
  * operator, for live coverage/uptime monitoring over an unbounded
  * event stream.
  *
  * State per user = the ONE open island `(start, maxEnd, n)` — the
  * running-maximum-end construction carried as state instead of a
  * window: an arriving interval extends the island when its start is
  * at or before the island's max end (a long early interval keeps
  * swallowing later short ones, exactly like the batch cumulative
  * max), and STRICTLY AFTER it closes the island, emits it, and opens
  * the next. Each micro-batch's intervals are sorted in-memory before
  * folding (micro-batches deliver unordered); a pre-watermark
  * straggler merges with min/max clamps so the island never shrinks.
  * The event-time timeout flushes an idle island once the watermark
  * passes its max end. State is O(users with an open island) — the
  * shape that survives an unbounded stream. */
object IntervalStream {

  // event_time rides along: the watermark is attached to that column and
  // must still be present when the stateful operator is analyzed
  case class Iv(user_id: Long, s_us: Long, e_us: Long,
                event_time: java.sql.Timestamp)
  case class OpenIsland(start_us: Long, end_us: Long, n: Long)
  case class Island(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  def fold(userId: Long, batch: Iterator[Iv],
           state: GroupState[OpenIsland]): Iterator[Island] = {
    if (state.hasTimedOut) {
      val o = state.get
      state.remove()
      return Iterator(Island(userId, o.start_us, o.end_us, o.n))
    }
    val ivs = batch.toArray.sortBy(iv => (iv.s_us, iv.e_us))
    val closed = scala.collection.mutable.ArrayBuffer.empty[Island]
    var open = state.getOption
    ivs.foreach { iv =>
      open match {
        case Some(o) if iv.s_us <= o.end_us =>
          open = Some(OpenIsland(math.min(o.start_us, iv.s_us),
            math.max(o.end_us, iv.e_us), o.n + 1))
        case Some(o) =>
          closed += Island(userId, o.start_us, o.end_us, o.n)
          open = Some(OpenIsland(iv.s_us, iv.e_us, 1))
        case None =>
          open = Some(OpenIsland(iv.s_us, iv.e_us, 1))
      }
    }
    open.foreach { o =>
      state.update(o)
      // strictly after the island's max end in ms, never at/before the
      // current watermark (Spark rejects that) — the SessionStream rule
      val floor = state.getCurrentWatermarkMs() + 1
      state.setTimeoutTimestamp(math.max(o.end_us / 1000 + 1, floor))
    }
    closed.iterator
  }

  /** Start the island merger over a parquet event stream (events schema
    * of TESTDATA.md): each event opens `[ts, ts + (event_id%600+60)s)`
    * — the same deterministic variable duration as the batch
    * interval_merge query — and closed islands land in the in-memory
    * sink `outputTable`. */
  def run(spark: SparkSession, eventsDir: String, outputTable: String,
          watermarkDelay: String = "1 hour") = {
    import spark.implicits._
    val ivs: Dataset[Iv] = graft.core.Tables.eventStream(spark, eventsDir)
      .withColumn("event_time", col("ts"))
      .withWatermark("event_time", watermarkDelay)
      .select(col("user_id"), unix_micros(col("event_time")).as("s_us"),
        (unix_micros(col("event_time")) +
          (col("event_id") % 600 + 60) * lit(1000000L)).as("e_us"),
        col("event_time"))
      .as[Iv]
    ivs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (k: Long, it: Iterator[Iv], st: GroupState[OpenIsland]) => fold(k, it, st))
      .writeStream
      .outputMode("append")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
