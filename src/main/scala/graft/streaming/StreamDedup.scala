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

  private val eventsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))

  /** Drain `eventsDir` (one file per trigger, so duplicates arrive in
    * DIFFERENT micro-batches and the dedup state is actually exercised)
    * into the in-memory sink `outputTable`, keeping one row per
    * event_id within the watermark horizon.
    */
  def run(spark: SparkSession, eventsDir: String, outputTable: String,
          delay: String = "40 days") = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(eventsDir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
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
