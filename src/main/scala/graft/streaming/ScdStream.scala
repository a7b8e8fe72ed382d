package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming twin of [[graft.operators.Temporal.scd2History]]: SCD
  * type-2 dimension maintenance ON ARRIVAL — each key's attribute
  * change log folds into half-open validity intervals as rows stream
  * in, the warehouse-history shape kept current without a nightly
  * rebuild.
  *
  * Change detection is ORDER-SENSITIVE (a straggler landing between
  * two existing rows can split or merge a run of equal attributes), so
  * this reuses the [[FunnelStream]] chassis: rows BUFFER in state until
  * the watermark passes them, then fold in global (ts, id) event-time
  * order — exact for every non-late row. Per key the state is the
  * watermark-horizon buffer plus ONE open interval (attr, valid_from);
  * each attribute CHANGE emits exactly one append-mode row closing the
  * previous interval (a closed interval is immutable under in-order
  * processing, so append never retracts). The still-open interval is
  * never emitted — the drained result is the batch history MINUS each
  * key's current row, which is what shares the batch oracle (the
  * streamSession minus-the-final-session pattern).
  *
  * Duplicate delivery is absorbed structurally: replayed rows sort
  * adjacent to their originals and equal-attribute rows collapse, so a
  * re-delivered file changes nothing (ScdStreamSpec replays a two-copy
  * staging and asserts the identical table).
  */
object ScdStream {

  case class Ch(k: Long, attr: String, ts_us: Long, id: Long,
                event_time: java.sql.Timestamp)
  case class SState(pending: List[(Long, Long, String)],
                    open: Option[(String, Long)])
  case class Closed(custkey: Long, priority: String, from_us: Long, to_us: Long)

  def fold(k: Long, batch: Iterator[Ch],
           state: GroupState[SState]): Iterator[Closed] = {
    // ms watermark is a floor of max event time — seal strictly below
    // the next ms so a sub-ms row the watermark passed is never held
    // forever (the FunnelStream seal rule)
    val sealUs = (state.getCurrentWatermarkMs() + 1L) * 1000L
    val prev = state.getOption.getOrElse(SState(Nil, None))
    val pending = prev.pending ++ batch.map(e => (e.ts_us, e.id, e.attr))
    val (ready, hold) = pending.partition(_._1 < sealUs)
    var open = prev.open
    val out = scala.collection.mutable.ArrayBuffer.empty[Closed]
    for ((ts, _, attr) <- ready.sortBy(t => (t._1, t._2))) {
      open match {
        case Some((a, from)) if a != attr =>
          out += Closed(k, a, from, ts)
          open = Some((attr, ts))
        case Some(_) => () // equal attribute: runs collapse (and replays no-op)
        case None => open = Some((attr, ts))
      }
    }
    state.update(SState(hold, open))
    // flush the remaining buffer on the next watermark advance; the
    // open interval persists — only a future CHANGE can close it
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
    out.iterator
  }

  /** Start SCD-2 maintenance over a staged orders directory: key =
    * o_custkey, tracked attribute = o_orderpriority, event time =
    * o_orderdate (ties broken by o_orderkey, the batch operator's
    * total order). Zero watermark delay: an AvailableNow drain seals
    * and folds every row, so the emitted closed intervals equal the
    * batch history minus current rows exactly. */
  def run(spark: SparkSession, ordersDir: String, outputTable: String,
          watermarkDelay: String = "0 seconds",
          maxFilesPerTrigger: Option[Int] = None) = {
    import spark.implicits._
    val rows: Dataset[Ch] = graft.core.Tables
      .parquetStream(spark, ordersDir, maxFilesPerTrigger)
      .select(col("o_custkey").cast("long").as("k"),
        col("o_orderpriority").as("attr"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"),
        col("o_orderkey").cast("long").as("id"),
        col("o_orderdate").cast("timestamp").as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[Ch]
    rows
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (k: Long, it: Iterator[Ch], st: GroupState[SState]) => fold(k, it, st))
      .writeStream
      .outputMode("append")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
