package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal warehouse operators: slowly-changing-dimension history
  * builds and interval algebra — the maintenance queries the reference
  * approximates with its conform/dedup passes (frontPage
  * etl_process.py:227-241 reconciles raw vs clean state; a warehouse
  * doing that properly keeps per-key VALIDITY RANGES, i.e. SCD
  * type 2), generalized to the two canonical formulations every
  * dimension pipeline needs.
  *
  * Both operators are single-window-pass constructions: one shuffle on
  * the entity key, per-partition sort, no self-join, no driver state —
  * the shape that survives a 100 TB change log, where the per-key
  * history (orders of one customer, intervals of one user) is the unit
  * of locality and skew is bounded by the largest single entity.
  */
object Temporal {

  /** SCD type-2 history from a change-event log: collapse consecutive
    * equal values of `attr` per `key` (change detection via `lag`),
    * then derive half-open validity ranges `[valid_from, valid_to)`
    * with `lead`, `valid_to IS NULL` marking the current row. Events
    * are totally ordered by `(ts, id)` so same-timestamp changes
    * resolve deterministically.
    *
    * One window partition per key evaluates BOTH the lag and the lead
    * (same ordering ⇒ Catalyst runs them in one Window operator each
    * side of the change filter, both inside the single exchange on
    * `key`). */
  def scd2History(df: DataFrame, key: String, attr: String,
                  ts: String, id: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(id))
    val changes = df
      .withColumn("_prev", lag(col(attr), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(attr))
    changes
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(col(key), col(attr),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Gaps-and-islands merge of VARIABLE-LENGTH intervals
    * `[startUs, endUs)` per `key`: an interval opens a new island iff
    * its start exceeds the running maximum end of every earlier
    * interval (cumulative `max` over the `(start, id)` order — the
    * lag-based gap test is WRONG here, since a long early interval can
    * swallow several later short ones); island ids are the running sum
    * of new-island flags. Returns one row per island:
    * `(key, island_no, start_us, end_us, n)`.
    *
    * Two window passes + one aggregate, all inside a single exchange
    * on `key` (identical partitioning, compatible sort). */
  def mergeIntervals(df: DataFrame, key: String, startUs: Column,
                     endUs: Column, id: String): DataFrame = {
    val base = df.select(col(key), col(id).as("_id"),
      startUs.as("_s"), endUs.as("_e"))
    val ord = Window.partitionBy(col(key)).orderBy(col("_s"), col("_id"))
    val prevMax = ord.rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("_pmax", max(col("_e")).over(prevMax))
      .withColumn("_new",
        when(col("_pmax").isNull || col("_s") > col("_pmax"), 1L).otherwise(0L))
      .withColumn("island_no", sum(col("_new")).over(ord))
      .groupBy(col(key), col("island_no"))
      .agg(min(col("_s")).as("start_us"), max(col("_e")).as("end_us"),
        count(lit(1)).as("n"))
  }
}
