package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget chunks —
  * the step that turns a deduplicated, filtered corpus into training
  * sequences. A document joins the chunk its cumulative-weight prefix
  * falls in (greedy in-order packing: chunk_no = floor(tokens-before /
  * budget) within its bucket), so a chunk may run over budget by at
  * most one document — the standard pack-then-truncate shape.
  *
  * Scale design: GLOBAL greedy packing needs a total order — a single
  * window partition through one task, a cliff at any scale. Packing
  * here is per deterministic hash bucket (id mod buckets): each bucket
  * packs independently and in parallel, the bucket count scales with
  * the cluster, and the assignment is a pure function of (id, weight)
  * — stable across runs, partition layouts, and engines (the DuckDB
  * oracle reproduces it with the same window arithmetic).
  */
object Packing {

  /** (bucket, seq_no) chunk assignment per row. `weightCol` is the
    * row's token count (any additive weight); `budget` the per-chunk
    * target; `buckets` the parallelism of the packing itself. */
  def packSequences(df: DataFrame, idCol: String, weightCol: String,
                    budget: Long, buckets: Int): DataFrame = {
    require(budget > 0 && buckets > 0, "positive budget and buckets required")
    val w = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(pmod(col(idCol), lit(buckets)).cast("long").as("bucket"),
        col(idCol), col(weightCol))
      .withColumn("cum_before",
        sum(col(weightCol)).over(w) - col(weightCol))
      .withColumn("seq_no",
        floor(col("cum_before") / lit(budget.toDouble)).cast("long"))
      .drop("cum_before")
  }

  /** Chunk-level rollup: documents and total weight per packed chunk. */
  def chunkStats(packed: DataFrame, weightCol: String): DataFrame =
    packed.groupBy("bucket", "seq_no")
      .agg(count(lit(1)).as("n_docs"), sum(col(weightCol)).as("sum_weight"))
}
