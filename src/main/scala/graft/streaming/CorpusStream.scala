package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.Tables
import graft.functions.Sketches
import graft.operators.Dedup

/** Ingest-time corpus curation as Structured Streaming — the two checks
  * a training-data pipeline runs ON ARRIVAL, before a document is ever
  * admitted to the corpus, rather than as after-the-fact batch sweeps:
  *
  *  - [[decontamFlags]]: every incoming training document is screened
  *    against a STATIC benchmark-n-gram blocklist (the eval suites are
  *    fixed and tiny; the corpus is the unbounded side) — a
  *    stream-static broadcast join, the one join shape that needs NO
  *    state at all: the static side ships with the task, each
  *    micro-batch is a plain hash join, and state is O(1) regardless
  *    of stream lifetime. This is the shape [[graft.operators.Decontam]]
  *    inverts: batch decontam reports contaminated EVAL docs after the
  *    fact; the stream screens incoming TRAIN docs before admission.
  *
  *  - [[lshIndex]]: the banded MinHash bucket index maintained
  *    incrementally as documents arrive — `(band_key, owning min
  *    doc_id, bucket size)`. The index IS the artifact an ingest-time
  *    near-dup check queries (new doc's band keys probe the index;
  *    any hit → near-dup candidate), and maintaining it as a streaming
  *    aggregation means the 100 TB corpus never recomputes signatures
  *    for documents it already admitted. min/count are associative, so
  *    each micro-batch merges map-side partials into the state store —
  *    per-key state is two longs however large the bucket.
  *
  * Both run the SAME codegen'd kernels as their batch twins
  * ([[graft.functions.WordShingles]], [[graft.functions.MinHashSig]],
  * the xxhash band keys), so stream and batch can never drift — the
  * specs assert drained-state ≡ batch-aggregate bit-for-bit, with
  * multi-file staging forcing genuine cross-micro-batch state merges.
  *
  * Plan note: the signature projection is staged but NOT checkpointed
  * (streams have no localCheckpoint); that is safe here because
  * CollapseProject refuses to inline a non-cheap expression referenced
  * more than once (the 16 band slices all reference the one `sig`
  * attribute), and nothing downstream infers a pushable filter over
  * the banded output — the two hazards that force the batch pipeline's
  * lineage cuts ([[graft.operators.Dedup.minhashPairs]]) don't arise
  * in this topology.
  */
object CorpusStream {

  /** Screen the training slice of a streaming document source against
    * a static blocklist of benchmark n-grams: emits one row per
    * (train doc, distinct flagged n-gram count), docs with no hit
    * produce no row. `blocklist` must have a single `g` column of
    * distinct n-grams; it is broadcast — eval suites are a sliver of
    * corpus scale by construction. Stateless (the aggregation is the
    * only stateful node, running in complete mode for the drain; an
    * unbounded deployment would emit per-batch updates instead). */
  def decontamFlags(spark: SparkSession, docsDir: String, outputTable: String,
                    blocklist: DataFrame,
                    splits: Seq[(String, Double)], n: Int = 8): StreamingQuery = {
    val docs = Tables.parquetStream(spark, docsDir)
      .withColumn("split", graft.operators.CorpusSplit.assign(col("text"), splits))
      .filter(col("split") === "train")
      .select(col("doc_id"),
        explode(array_distinct(Sketches.wordShingles(col("text"), n))).as("g"))
    docs.join(broadcast(blocklist), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_flagged"))
      .writeStream
      .outputMode("complete")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Maintain the banded MinHash LSH bucket index over a streaming
    * document source: state per band bucket = (min doc_id = the
    * bucket's canonical owner, bucket size). Complete-mode drain for
    * the gate; production runs update mode against a keyed sink. */
  def lshIndex(spark: SparkSession, docsDir: String, outputTable: String,
               shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
               maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val rowsPerBand = numHashes / bands
    bandedKeys(Tables.parquetStream(spark, docsDir, maxFilesPerTrigger),
        shingleN, numHashes, bands, rowsPerBand)
      .groupBy(col("band_key"))
      .agg(min(col("doc_id")).as("owner"), count(lit(1)).as("n_docs"))
      .writeStream
      .outputMode("complete")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The streaming curation capstone — the admission pipeline run ON
    * ARRIVAL, end to end in one streaming plan: quality gate (≥
    * `minTokens` whitespace tokens) → deterministic md5 split → exact
    * content dedup ACROSS micro-batches (`dropDuplicates` on the
    * content hash — Spark's chained-stateful dedup-then-aggregate
    * shape) → per-split doc/token rollup. Every aggregated value
    * (split, token count) is a pure function of the deduped TEXT
    * itself, so whichever physical copy the dedup state keeps, the
    * rollup is identical — that functional-dependency argument is what
    * makes a streaming dedup capstone oracle-checkable at all (an
    * aggregate over a non-functional column would depend on arrival
    * order). Unwatermarked dedup state grows with distinct content;
    * the unbounded deployment adds `dropDuplicatesWithinWatermark`
    * over an arrival-time column to bound it (the StreamDedup
    * pattern). */
  def curate(spark: SparkSession, docsDir: String, outputTable: String,
             splits: Seq[(String, Double)], minTokens: Int = 16,
             maxFilesPerTrigger: Option[Int] = None,
             checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = Tables.parquetStream(spark, docsDir, maxFilesPerTrigger)
      .select(col("doc_id"), col("text"),
        graft.operators.TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tok"))
      .filter(col("n_tok") >= minTokens)
      .withColumn("split", graft.operators.CorpusSplit.assign(col("text"), splits))
      .withColumn("h", md5(col("text")))
      .dropDuplicates("h")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
      .writeStream
      .outputMode("complete")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
    // explicit checkpoint = the crash-recovery path: dedup + agg state
    // versions persist and a replayed batch reloads its predecessor
    // state instead of double-counting (CorpusStreamSpec kills and
    // resumes a drain against a doctored checkpoint to prove it)
    checkpointDir.fold(writer)(cp => writer.option("checkpointLocation", cp))
      .start()
  }

  /** Streaming nearest-centroid classification census — the
    * similarity-search cell of the ingest pipeline: arriving embedding
    * vectors are int8-quantized and scored against a STATIC integer
    * centroid table ([[graft.operators.Similarity.labelCentroidsQ8]],
    * trained batch-side over the historical corpus — the ship-the-
    * codebook-as-a-constant pattern), then rolled up to the
    * (true label, predicted label) confusion census. Scoring is
    * STATELESS (the table rides the constant pool inside whole-stage
    * codegen, exactly as in batch); the census aggregation is the only
    * stateful node. Exact integer distances end to end, which is what
    * lets the drained census share the batch emb_classify oracle
    * verbatim — a float-distance argmin would flip near-ties across
    * engines and could never be hash-matched. */
  def classifyCensus(spark: SparkSession, embDir: String, outputTable: String,
                     labels: Array[Long], ns: Array[Long], sums: Array[Long],
                     maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    Tables.parquetStream(spark, embDir, maxFilesPerTrigger)
      .select(col("label").cast("long").as("label"),
        graft.functions.Vecs.quantizeI8(col("embedding").cast("array<double>")).as("qi"))
      .select(col("label"),
        graft.functions.Vecs.nearestLabelQ8(col("qi"), labels, ns, sums).as("pred"))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("complete")
      .format("memory").queryName(outputTable)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Batch twin of [[lshIndex]] over the same kernels — the spec's
    * equality reference and the backfill path a deployment runs once
    * over the historical corpus before switching on the stream. */
  def lshIndexBatch(docs: DataFrame, shingleN: Int = 3, numHashes: Int = 128,
                    bands: Int = 32): DataFrame =
    bandedKeys(docs, shingleN, numHashes, bands, numHashes / bands)
      .groupBy(col("band_key"))
      .agg(min(col("doc_id")).as("owner"), count(lit(1)).as("n_docs"))

  private def bandedKeys(docs: DataFrame, shingleN: Int, numHashes: Int,
                         bands: Int, rowsPerBand: Int): DataFrame = {
    val hashed = docs.select(col("doc_id"),
      Dedup.shingleHashes(
        Sketches.sortedDistinct(Dedup.wordShingles(col("text"), shingleN))).as("shash"))
    val signed = hashed.select(col("doc_id"),
      Dedup.minhashSignature(col("shash"), numHashes).as("sig"))
    signed.select(col("doc_id"),
      explode(Dedup.lshBandKeys(col("sig"), bands, rowsPerBand)).as("band_key"))
  }
}
