package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table storage layout: the join side of the 100 TB story.
  *
  * A fact table bucketed AND sorted by its join key joins against
  * another table bucketed the same way with NO exchange and NO sort —
  * the shuffle is paid once at write time and amortized over every
  * subsequent join/aggregation on that key. This is the storage
  * counterpart of `repartition`: `repartition` co-locates for one job,
  * bucketing co-locates for the table's lifetime. (The reference keeps
  * its warehouse in Postgres with a unique index — `scraper.py:153-156`;
  * bucketing by `uniq_id` is the distributed analogue for the engine's
  * dedup/anti-join maintenance.)
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted managed table (overwrites). */
  def write(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
