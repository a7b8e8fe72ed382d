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
  /** Global exclusive prefix sum over a total order — the offset
    * assignment that lays a corpus into one contiguous token stream
    * (offset(doc) = tokens of every doc with a smaller id; the index a
    * packed-binary corpus writer needs). The result depends ONLY on
    * (id, weight), never on partitioning.
    *
    * Scale design: the naive `sum() over (order by id)` window has no
    * PARTITION BY — Spark plans it as Exchange SinglePartition and one
    * task scans the entire corpus, a cliff at any scale. This is the
    * classic two-phase scan instead: (1) range-bucket by id (bucket
    * width from the max id — a one-row driver artifact like the IVF
    * codebook; NB `max(id) div buckets + 1` in integer arithmetic, no
    * double rounding at 2^63) and aggregate one total per bucket; (2)
    * broadcast the ~`buckets` cumulative bases back and run the running
    * sum WITHIN each bucket, every window partition a bucket, all
    * buckets in parallel. Cost: one tiny aggregate + one partitioned
    * window — no single-partition stage anywhere. */
  def assignOffsets(df: DataFrame, idCol: String, weightCol: String,
                    buckets: Int = 256): DataFrame = {
    require(buckets > 0, "positive bucket count required")
    val spark = df.sparkSession
    // eager action: bounded driver artifact (one row) sizing the buckets
    val maxId = Option(df.agg(max(col(idCol))).head.get(0))
      .map(_.asInstanceOf[Number].longValue).getOrElse(0L)
    val width = maxId / buckets + 1
    val bucketed = df.select(col(idCol), col(weightCol),
      expr(s"$idCol div $width").as("_b"))
    // eager action: per-bucket totals, ≤ `buckets` rows — scanned once
    // on the driver into exclusive cumulative bases
    val totals = bucketed.groupBy(col("_b"))
      .agg(sum(col(weightCol)).as("_t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(0L)(_ + _).init)
    val baseDf = spark.createDataFrame(bases.toSeq).toDF("_bb", "_base")
    val w = Window.partitionBy("_b").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(baseDf), col("_b") === col("_bb"))
      .withColumn("offset",
        (col("_base") + coalesce(sum(col(weightCol)).over(w), lit(0L))).cast("long"))
      .select(col(idCol), col(weightCol), col("offset"))
  }

  /** Token-balanced contiguous output sharding — the corpus-writer
    * layout step: shard k holds the documents whose global token
    * offset falls in the k-th equal span of the total token stream, so
    * every shard carries ~total/n TOKENS regardless of how document
    * sizes are distributed (hash-mod sharding balances document
    * COUNTS, which heavy-tailed documents skew into lopsided files).
    * Built on [[assignOffsets]]' two-phase scan — no single-partition
    * stage; one extra map-side-combined aggregate for the total (a
    * one-row driver artifact); the shard id is a pure integer function
    * of (id, weight) — `offset div (total div n + 1)` — so it is
    * stable across runs, partitionings, and engines. */
  def shardByTokens(df: DataFrame, idCol: String, weightCol: String,
                    nShards: Int, buckets: Int = 256): DataFrame = {
    require(nShards > 0, "positive shard count required")
    // eager action: one-row total (exact long sum, map-side combined)
    val total = Option(df.agg(sum(col(weightCol))).head.get(0))
      .map(_.asInstanceOf[Number].longValue).getOrElse(0L)
    val width = total / nShards + 1
    assignOffsets(df, idCol, weightCol, buckets)
      .withColumn("shard", expr(s"offset div $width"))
  }

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
