package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.Tables

/** Streaming CDC apply — the change log consumed AS IT ARRIVES instead
  * of compacted after the fact (the batch twin is the `cdc_apply`
  * declared query): last-writer-wins by sequence number as one
  * associative `max(struct(seq, op, payload))` aggregate, which is
  * exactly the shape that runs forever — per-key state is ONE struct
  * however many updates a key receives, each micro-batch merges
  * map-side partials into the state store, and a replayed/duplicated
  * change record is absorbed idempotently (max of a multiset ignores
  * multiplicity — the at-least-once delivery guarantee most CDC
  * transports give you is handled by the algebra, not by bookkeeping).
  * DELETE tombstones ride in the struct and win like any other change;
  * they are dropped at READ time (the drained query filters `op = 'D'`),
  * never inside the state — dropping them in-state would resurrect a
  * deleted key if a late pre-delete update arrived.
  *
  * Complete-mode drain for the gate; an unbounded deployment runs
  * update mode against a keyed sink (the state IS the table).
  */
object CdcStream {

  /** The deterministic change log both engines derive from `orders`:
    * key = orderkey mod 5000 (so each key sees ~n/5000 changes),
    * sequence = the orderkey itself, every 11th change a DELETE,
    * payload = the price in integer cents. Shared by the batch
    * `cdc_apply` query and the stream so the two can never drift. */
  def changeLog(orders: DataFrame): DataFrame =
    orders.select(
      (col("o_orderkey") % 5000).as("k"),
      col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 11 === 0, lit("D")).otherwise(lit("U")).as("op"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))

  /** Start the streaming apply over a staged orders directory; state =
    * one winning struct per key, drained complete into `outputTable`
    * as (k, m{seq, op, cents}). */
  def run(spark: SparkSession, ordersDir: String, outputTable: String,
          maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    changeLog(Tables.parquetStream(spark, ordersDir, maxFilesPerTrigger))
      .groupBy(col("k"))
      .agg(max(struct(col("seq"), col("op"), col("cents"))).as("m"))
      .writeStream
      .outputMode("complete")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
      .start()
}
