package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.etl.Pipeline

/** The reference's hand-rolled micro-batch loop (etl_process.py:294-347)
  * as Structured Streaming (SURVEY §2.7).
  *
  * Mapping:
  *   - poll + sleep(600) → `Trigger.ProcessingTime`/`Trigger.AvailableNow`
  *   - anti-join-against-destination progress tracking → checkpointed
  *     file-source offsets (no re-scan of the warehouse per batch)
  *   - `LIMIT 50` batch cap → `maxFilesPerTrigger`
  *   - UNIQUE-constraint insert-and-catch → `dropDuplicates` +
  *     anti-join-then-append inside `foreachBatch` (the anti-join
  *     survives as an idempotency re-check under replay, exactly-once
  *     effective semantics on top of at-least-once delivery)
  *   - in-memory `cannot_load` set → durable quarantine parquet sink
  */
object EtlStream {

  /** Run the streaming ETL until no more input (AvailableNow) or forever
    * (ProcessingTime, when `drainAndStop` is false).
    */
  def run(spark: SparkSession, rawDir: String, dimPath: String,
          warehouseDir: String, quarantineDir: String, checkpointDir: String,
          drainAndStop: Boolean = true, maxFilesPerTrigger: Int = 50,
          pollSeconds: Int = 600): Unit = {

    val dim = Pipeline.siteDim(spark, dimPath)
    val rawStream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(rawDir)

    val query = rawStream.writeStream
      .queryName("graft_etl")
      .option("checkpointLocation", checkpointDir)
      .trigger(if (drainAndStop) Trigger.AvailableNow()
               else Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val parsed = Pipeline.parseRaw(batch).dropDuplicates("uniq_id")
        val res = Pipeline.enrich(Pipeline.cleanData(parsed), dim)
        res.warehouse.persist()
        try {
          // an empty batch (e.g. a replayed trigger whose rows all fell
          // to quarantine) must not pay the warehouse key scan at all
          if (res.warehouse.limit(1).count() > 0) {
            // idempotency re-check: at-least-once file delivery + anti-join
            // against already-landed keys = effective exactly-once append.
            val minPost = Option(
              res.warehouse.agg(min(col("post_date"))).head.getTimestamp(0))
            val fresh = landedKeys(batch.sparkSession, warehouseDir, minPost) match {
              case Some(keys) => res.warehouse.join(keys, Seq("uniq_id"), "left_anti")
              case None       => res.warehouse
            }
            fresh.write.mode("append").partitionBy("state").parquet(warehouseDir)
          }
          if (res.quarantine.limit(1).count() > 0)
            res.quarantine.withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(quarantineDir)
        } finally res.warehouse.unpersist()
        ()
      }
      .start()

    if (drainAndStop) query.awaitTermination()
  }

  /** Already-landed uniq_ids an incoming row could collide with. The
    * pruning column must be STABLE per uniq_id across scrape runs —
    * uniq_id embeds post_date (post_date-ad_id-site_id-category,
    * sources/Ingest.uniqId), so a colliding landed row always has the
    * SAME post_date as the incoming one, and the anti-join only needs
    * warehouse rows with post_date >= the batch's minimum. (scrape_date
    * would be wrong here: a re-scraped ad carries a NEW scrape_date, so
    * its landed copy would fall below the bound and slip through as a
    * duplicate.) The predicate pushes into the parquet scan, so files
    * whose post_date range is entirely older are skipped on footer
    * stats — per-batch cost tracks the live-ad window, not warehouse
    * size; the original form re-read the whole warehouse key column
    * every micro-batch.
    */
  def landedKeys(spark: SparkSession, warehouseDir: String,
                 minPost: Option[java.sql.Timestamp]): Option[DataFrame] =
    if (!Files.exists(java.nio.file.Paths.get(warehouseDir))) None
    else {
      val wh = spark.read.parquet(warehouseDir)
      val pruned = minPost match {
        case Some(ts) =>
          wh.filter(col("post_date").isNull || col("post_date") >= lit(ts))
        case None => wh
      }
      Some(pruned.select("uniq_id"))
    }

  /** Streaming tumbling-window aggregation over the events schema
    * (q18's semantics, stream-native): watermarked event time, per-day
    * per-type counts and sums. Returns the started query writing to an
    * in-memory sink named `outputTable` (callers drain with
    * processAllAvailable in tests; production would write a real sink).
    */
  def eventWindowCounts(spark: SparkSession, eventsDir: String, outputTable: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema).parquet(eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("day"), col("event_type"), col("cnt"), col("sum_value"))
      // complete mode: a static drain advances the watermark only between
      // batches, so append mode would hold back the final windows forever.
      .writeStream.outputMode("complete")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
