package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC warehouse option (SURVEY §2.1): the reference's storage layer
  * is a Postgres warehouse (scraper.py:153-156, etl_process.py:271-289);
  * parquet is this engine's default, but a user pointing at the
  * original database gets `spark.read/write.jdbc` behind this one seam
  * (CLI: `etl --jdbc-url --jdbc-table`).
  *
  * Scale notes: JDBC is the FIDELITY path, not the 100 TB path. Reads
  * parallelize only when given (partitionColumn, bounds, numPartitions)
  * — an unpartitioned JDBC read is one executor pulling the whole table
  * through one connection, so [[readPartitioned]] is the default entry
  * for anything beyond dimension-table size. Writes batch per partition
  * (`batchsize`); the reference's UNIQUE-constraint insert-and-catch
  * (etl_process.py:271-289) is re-expressed as an anti join against the
  * destination's key column — a single-column pushed-down scan plus one
  * distributed join, never a row-at-a-time upsert loop.
  */
object JdbcWarehouse {

  /** Whole-table read — dimension-table sized inputs only (single
    * connection, single partition). */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * connections each scanning one stride of `partCol`. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partCol: String, lower: Long, upper: Long,
                      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partCol)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** Write a frame to a JDBC table; `batchSize` rows per INSERT batch
    * per partition. Overwrite drops and recreates the table (the batch
    * CLI path, like the parquet warehouseOverwrite). */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Overwrite, batchSize: Int = 1000): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize)
      .mode(mode).save()

  /** Dedup append — the reference's UNIQUE(uniq_id) insert-and-catch as
    * a set operation: anti join the incoming batch against the
    * destination's existing keys (single-column scan), append only the
    * fresh rows. Returns the number of rows appended. Same at-least-
    * once caveat as any non-transactional two-step: concurrent writers
    * of the SAME key can both pass the screen — the reference's loop
    * has the identical window between its SELECT and INSERT. */
  def appendDedup(df: DataFrame, url: String, table: String,
                  keyCol: String): Long = {
    val existing = read(df.sparkSession, url, table).select(keyCol)
    // DURABLY materialize the anti-joined batch before touching the
    // destination: a persist()ed partition evicted mid-write would be
    // RECOMPUTED against the mutated destination (now holding part of
    // this batch) and silently drop rows. localCheckpoint severs the
    // lineage, so the appended set is fixed at screen time.
    val fresh = df.join(existing, Seq(keyCol), "left_anti").localCheckpoint()
    val n = fresh.count()
    if (n > 0) write(fresh, url, table, SaveMode.Append)
    n
  }
}
