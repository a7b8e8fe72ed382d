package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream–stream join with watermark-bounded state: the canonical
  * attribution join — each purchase matched to the same user's views
  * in the preceding hour, both sides unbounded streams.
  *
  * The time-range predicate (`p.ts BETWEEN v.ts AND v.ts + 1h`)
  * combined with watermarks on BOTH sides lets Spark bound the join
  * state: a buffered view can be dropped once the purchase-side
  * watermark passes view.ts + 1h, so state is O(events in the join
  * window), not O(stream history) — the only shape that runs forever.
  */
object StreamJoin {

  private def eventStream(spark: SparkSession, dir: String, kind: String): DataFrame =
    graft.core.Tables.eventStream(spark, dir).filter(col("event_type") === kind)

  /** Start the attribution join over a parquet event stream directory,
    * writing (purchase_id, view_id, user_id, lag_us) pairs to an
    * in-memory sink named `outputTable`. The window interval is built
    * in MICROSECONDS — dividing down to whole seconds would silently
    * shrink a sub-second window vs the batch/oracle predicate.
    */
  def attributionJoin(spark: SparkSession, eventsDir: String, outputTable: String,
                      windowUs: Long = 3600L * 1000 * 1000) = {
    val views = eventStream(spark, eventsDir, "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = eventStream(spark, eventsDir, "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr(s"INTERVAL $windowUs MICROSECOND"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("lag_us"))
      .writeStream
      .outputMode("append")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** LEFT OUTER variant — the "every purchase exactly once, attributed
    * or not" report. Same watermarks and time-range condition; the
    * engine holds an unmatched purchase in state until the watermark
    * proves no qualifying view can still arrive (every future view has
    * v_ts ≥ watermark, and the purchase only matches v_ts ≤ p_ts, so a
    * purchase with p_ts < watermark is sealed), then emits it once with
    * a null view side. That seal condition is deterministic for a
    * static drain — the declared query and its oracle restrict to the
    * sealed region with the same predicate (the stream_window_append
    * pattern); the emission mechanics are pinned in StreamJoinSpec.
    * `p_ts_us` rides in the output so the seal predicate is computable
    * downstream. */
  def attributionJoinOuter(spark: SparkSession, eventsDir: String, outputTable: String,
                           windowUs: Long = 3600L * 1000 * 1000) = {
    val views = eventStream(spark, eventsDir, "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = eventStream(spark, eventsDir, "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr(s"INTERVAL $windowUs MICROSECOND"),
        "leftOuter")
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("lag_us"),
        unix_micros(col("p_ts")).as("p_ts_us"))
      .writeStream
      .outputMode("append")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Batch twin for the equivalence spec. */
  def attributionBatch(spark: SparkSession, dir: String,
                       windowUs: Long = 3600L * 1000 * 1000): DataFrame = {
    val e = graft.core.Tables.t(spark, dir, "events")
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"), col("ts").as("v_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr(s"INTERVAL $windowUs MICROSECOND"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("lag_us"))
  }
}
