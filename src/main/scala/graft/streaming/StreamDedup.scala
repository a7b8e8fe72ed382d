package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming deduplication with watermark-bounded state — the
  * streaming-native form of the reference's UNIQUE-constraint
  * insert-and-catch (scraper.py:211-218). `dropDuplicatesWithinWatermark`
  * keeps one row per key while a key's state lives only until the
  * watermark passes its event time + delay: exact dedup within the
  * re-delivery horizon, O(keys in the horizon) state, runs forever.
  * (The EtlStream foreachBatch path instead re-checks against the sink —
  * that gives all-time exactness at the cost of a sink read per batch;
  * this operator is the unbounded-stream tradeoff.)
  */
object StreamDedup {

  /** Drain `eventsDir` (one file per trigger, so duplicates arrive in
    * DIFFERENT micro-batches and the dedup state is actually exercised)
    * into the in-memory sink `outputTable`, keeping one row per
    * event_id within the watermark horizon.
    */
  def run(spark: SparkSession, eventsDir: String, outputTable: String,
          delay: String = "40 days") = {
    graft.core.Tables.eventStream(spark, eventsDir, maxFilesPerTrigger = Some(1))
      .withColumn("event_time", col("ts"))
      .withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "event_type")
      .writeStream
      .outputMode("append")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
