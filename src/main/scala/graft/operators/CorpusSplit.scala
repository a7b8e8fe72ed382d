package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test splitting — the reproducibility
  * primitive of a training-data pipeline. Assignment is a pure function
  * of the row's key (content hash bucket vs cumulative weight
  * thresholds), so it is stable across runs, cluster sizes, partition
  * layouts, and incremental re-ingestion: a document keeps its split
  * forever, and near-identical corpora produce near-identical splits.
  * (randomSplit, by contrast, depends on partition layout and seed
  * plumbing.) No shuffle — a projection over the scan.
  */
object CorpusSplit {

  private val Buckets = 10000L

  /** A `split` column from `key`: e.g. assign(col("text"),
    * Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)). Weights are
    * normalized; hash is xxhash64 of the key. */
  def assign(key: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive split weights required")
    val total = splits.map(_._2).sum
    val bucket = pmod(xxhash64(key), lit(Buckets))
    val cuts = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val thresholds = cuts.map(c => math.min(Buckets, math.round(c * Buckets)))
    splits.zip(thresholds).reverse.foldLeft(lit(splits.last._1)) {
      case (acc, ((name, _), cut)) => when(bucket < cut, lit(name)).otherwise(acc)
    }
  }

  /** df + `split` column. */
  def split(df: DataFrame, keyCol: String, splits: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", assign(col(keyCol), splits))
}
