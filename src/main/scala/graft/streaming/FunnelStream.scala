package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming twin of [[graft.operators.Funnel]]: per-user ordered
  * conversion funnel via flatMapGroupsWithState.
  *
  * Funnel semantics are ORDER-SENSITIVE (a click counts only strictly
  * after the earliest view), and micro-batches deliver events
  * unordered — so an incremental fold over raw arrival order would be
  * wrong the moment a straggler view lowered the stage-1 arrival.
  * Instead events BUFFER in state until the watermark passes them,
  * then fold in global event-time order, which makes stage arrivals
  * exact for every non-late event (late-past-watermark events are
  * dropped — the standard streaming contract, same as every watermarked
  * op in this package). A user's state is its pending funnel events
  * within the watermark horizon plus one timestamp per reached stage;
  * each newly REACHED stage emits exactly one append-mode row
  * (reaching a stage is immutable under in-order processing, so
  * append never retracts). */
object FunnelStream {

  case class Ev(user_id: Long, stage_idx: Int, ts_us: Long,
                event_time: java.sql.Timestamp)
  case class FState(pending: List[(Int, Long)], arr: List[Long])
  case class Reach(user_id: Long, stage_no: Int, arr_us: Long, prev_us: Option[Long])

  def fold(userId: Long, batch: Iterator[Ev], state: GroupState[FState],
           nStages: Int): Iterator[Reach] = {
    // The ms watermark is a FLOOR of the max event time: an event with
    // a sub-ms component equal to the max would never satisfy
    // ts <= wm*1000, leaving it pending forever at drain end. Sealing
    // at ts < (wm+1)ms treats every event the ms watermark has passed
    // as ready without admitting anything a later event could precede.
    val sealUs = (state.getCurrentWatermarkMs() + 1L) * 1000L
    val prev = state.getOption.getOrElse(FState(Nil, Nil))
    val pending = prev.pending ++ batch.map(e => (e.stage_idx, e.ts_us))
    // fold events the watermark has sealed, in (ts, stage) order — the
    // held remainder is all later than every ready event, so global
    // event-time order is preserved across invocations
    val (ready, hold) = pending.partition(_._2 < sealUs)
    var arr = prev.arr
    val out = scala.collection.mutable.ArrayBuffer.empty[Reach]
    for ((si, ts) <- ready.sortBy(t => (t._2, t._1))) {
      if (si == arr.length && si < nStages && (si == 0 || ts > arr(si - 1))) {
        arr = arr :+ ts
        out += Reach(userId, arr.length, ts,
          if (arr.length > 1) Some(arr(arr.length - 2)) else None)
      }
    }
    if (hold.isEmpty && arr.length == nStages) state.remove()
    else {
      state.update(FState(hold, arr))
      // flush the buffer on the next watermark advance
      state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
    }
    out.iterator
  }

  /** Start the funnel over a parquet event stream (events schema of
    * TESTDATA.md), emitting one row per (user, reached stage) to an
    * in-memory sink. Zero watermark delay: every event seen in batch N
    * is sealed by batch N+1's watermark, so an AvailableNow drain
    * processes the complete set and the drained report equals the
    * batch operator exactly (the q29 oracle checks precisely that). */
  def run(spark: SparkSession, eventsDir: String, outputTable: String,
          stages: Seq[String], watermarkDelay: String = "0 seconds") = {
    import spark.implicits._
    val idx = stages.zipWithIndex.foldLeft(lit(-1)) { case (acc, (st, i)) =>
      when(col("event_type") === st, lit(i)).otherwise(acc)
    }
    val n = stages.size
    val events: Dataset[Ev] = graft.core.Tables.eventStream(spark, eventsDir)
      .withColumn("event_time", col("ts"))
      .withWatermark("event_time", watermarkDelay)
      .select(col("user_id"), idx.as("stage_idx"),
        unix_micros(col("event_time")).as("ts_us"), col("event_time"))
      .filter(col("stage_idx") >= 0)
      .as[Ev]
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (k: Long, it: Iterator[Ev], st: GroupState[FState]) => fold(k, it, st, n))
      .writeStream
      .outputMode("append")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
