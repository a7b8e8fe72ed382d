package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Uniform access to the driver testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet reads — scans get Catalyst's parquet
  * pushdown/pruning for free. The one normalization: `events.ts` has
  * been written by the driver in two different physical types across
  * testdata generations, and we promise callers exactly one logical
  * shape — `ts: TimestampType` (micros, session timezone UTC):
  *
  *   - parquet TIMESTAMP(NANOS): Spark cannot represent nanos as
  *     TimestampType, so we read them as a nanosecond Long
  *     (`spark.sql.legacy.parquet.nanosAsLong`) and convert losslessly
  *     with integer math (`timestamp_micros(ns div 1000)`) — never via
  *     Double, which would lose precision above 2^53.
  *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 reads
  *     this as TimestampNTZType; under the UTC session timezone a cast
  *     to TimestampType is an exact relabeling of the same micros
  *     (DuckDB reads the identical instants, so oracles agree).
  *
  * Both batch ([[t]]) and streaming ([[eventStream]]) go through the
  * same [[normalizeTs]] so the two paths can never diverge again
  * (EventsContractSpec pins this against every sf dir).
  */
object Tables {

  /** Read a testdata table by name, e.g. t(spark, dir, "lineitem"). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      // Spark (4.x included) throws PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS)
      // unless it may surface them as raw Long nanos. Harmless for the
      // other physical types.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df, "ts") else df
  }

  /** Streaming twin of `t(spark, dir, "events")`: a `readStream` over an
    * events parquet directory with the same normalized `ts: TimestampType`
    * column. The on-disk type is probed once, driver-side, from the
    * parquet footer (a batch-schema read — no data scan), because
    * streaming sources need an explicit schema up front.
    *
    * `maxFilesPerTrigger` is threaded through for sources that need
    * multi-batch behavior (StreamDedup exercises cross-batch state by
    * draining one file per trigger).
    */
  def eventStream(spark: SparkSession, dir: String,
                  maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(parquetStream(spark, dir, maxFilesPerTrigger), "ts")
  }

  /** Generic streaming parquet-directory source (schema probed once,
    * driver-side, from the footer — streaming sources need it up
    * front). [[eventStream]] is this plus the `ts` normalization; the
    * document-stream operators (ingest-time decontam, LSH index
    * maintenance) read their staged corpus directories through it
    * unmodified. */
  def parquetStream(spark: SparkSession, dir: String,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val onDisk = spark.read.parquet(dir).schema
    val reader = spark.readStream.schema(onDisk)
    val withOpts = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    withOpts.parquet(dir)
  }

  /** Normalize an event-time column to TimestampType micros whatever
    * physical type the writer used (see object doc). Fails loudly on an
    * unrecognized type so the NEXT testdata regeneration breaks one
    * unit test with a clear message instead of nine oracle rows.
    */
  private[graft] def normalizeTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case LongType         => df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case TimestampNTZType => df.withColumn(c, col(c).cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.$c has unsupported type $other — expected ns-epoch Long, " +
          "TIMESTAMP_NTZ (us), or TIMESTAMP; extend Tables.normalizeTs for the new testdata shape")
    }
}
