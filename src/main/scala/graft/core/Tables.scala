package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Uniform access to the driver testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet reads — scans get Catalyst's parquet
  * pushdown/pruning for free. The one normalization: `events.ts` is
  * written as parquet TIMESTAMP(NANOS), which Spark cannot represent as
  * TimestampType (micros); we read it as a nanosecond Long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and convert losslessly with
  * integer math (`timestamp_micros(ns div 1000)`) — never via Double,
  * which would lose precision above 2^53.
  */
object Tables {

  /** Read a testdata table by name, e.g. t(spark, dir, "lineitem"). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      // Spark (4.x included) throws PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS)
      // unless it may surface them as raw Long nanos.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** events.ts arrives as ns-epoch Long (see object doc); expose it as a
    * proper TimestampType column with microsecond precision, matching
    * what DuckDB sees when it reads the same file.
    */
  private def normalizeEvents(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.LongType
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
