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

  /** Sliding token-window chunking WITHIN each document — the other
    * half of sequence preparation: a document longer than the model
    * context is cut into overlapping windows of `window` tokens taken
    * every `stride` tokens (overlap = window − stride preserves
    * context across cuts), short documents yield exactly one chunk.
    * n_chunks = 1 + ceil(max(0, n − window) / stride), so the final
    * window always covers the document's tail.
    *
    * Scale design: a pure per-row generator — tokenize once, explode a
    * 0..n_chunks−1 sequence, slice the token array per chunk. Narrow
    * operators only (no shuffle, no window function); chunk parallelism
    * is the scan's. Tokens split on [[TextAnalysis.WsClass]] like every
    * text operator, so the DuckDB oracle reproduces chunk hashes
    * bit-for-bit.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    docs
      .select(col(idCol), split(trim(col(textCol)), TextAnalysis.WsClass).as("tk"))
      .withColumn("n_chunks",
        (lit(1) + ceil(greatest(lit(0), size(col("tk")) - window) / lit(stride.toDouble)))
          .cast("int"))
      .select(col(idCol), col("tk"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("tk"), col("chunk_id") * stride + 1, lit(window)).as("ch"))
      .select(col(idCol), col("chunk_id"),
        size(col("ch")).cast("long").as("n_tok"),
        md5(concat_ws(" ", col("ch"))).as("chunk_md5"))
  }
}
