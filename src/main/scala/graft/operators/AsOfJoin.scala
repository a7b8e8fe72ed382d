package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the single right row with
  * the greatest right timestamp ≤ (or < when `strict`) the left
  * timestamp, per key. The canonical "most recent quote for each
  * trade" / "last state before each event" operator; Spark has no
  * built-in (SURVEY §2.3 lists it absent from the reference too — this
  * is engine surface).
  *
  * Physical strategy — union + running window, NOT a range join:
  * right rows (tagged 0) and left rows (tagged 1) are unioned and
  * sorted per key by (ts, tag); a running `last(payload, ignoreNulls)`
  * over rowsBetween(unboundedPreceding, currentRow) carries each right
  * payload forward to exactly the left rows it is the best match for.
  * One shuffle on the key, one sort, O(n) per partition — a non-equi
  * range join would rescan every right row per left row and explode on
  * hot keys. At 100 TB this is the only shape that survives: the
  * shuffle is the same one any per-key windowing needs, and skewed
  * keys degrade to a sort, not a quadratic join.
  *
  * Returns every left column plus a struct column `asof` holding the
  * matched right payload (null when no right row precedes). Ties on
  * (key, ts) among right rows are resolved by whichever sorts last —
  * pre-deduplicate the right side per (key, ts) for determinism.
  */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
           payloadCols: Seq[String], strict: Boolean = false): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs at least one payload column")
    val payT = right.select(struct(payloadCols.map(col): _*).as("p")).schema("p").dataType
    // tag order decides equal-ts visibility: right-first (0,1) makes the
    // match inclusive (ts ≤), left-first flips it to strict (ts <)
    val (rTag, lTag) = if (strict) (1, 0) else (0, 1)
    val leftOther = left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    val lUnion = left.select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(lTag).as("__tag")) ++
        leftOther.map(col) :+ lit(null).cast(payT).as("__pay"): _*)
    val rUnion = right.select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(rTag).as("__tag")) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadCols.map(col): _*).as("__pay"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lUnion.unionByName(rUnion)
      .withColumn("asof", F.last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === lTag)
      .select(keys.map(col) ++ Seq(col("__ts").as(tsCol)) ++
        leftOther.map(col) :+ col("asof"): _*)
  }
}
