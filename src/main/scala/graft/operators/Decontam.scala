package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Train/eval contamination detection — the decontamination step of a
  * training-data pipeline: find evaluation documents whose word n-grams
  * also appear in training documents (a contaminated benchmark doc
  * inflates eval scores and must be dropped or re-split).
  *
  * Shape at scale: per-doc DISTINCT n-gram shingles (the codegen'd
  * [[graft.functions.WordShingles]] kernel, one pass per row), exploded
  * and equi-joined on the shingle — never a doc×doc comparison. The
  * boilerplate guard doubles as the skew guard: an n-gram present in
  * more than `maxTrainDf` training docs is boilerplate (headers,
  * licenses), not contamination — and it is exactly the hot key that
  * would skew the shuffle join, so it is filtered BEFORE the join. The
  * train side is shuffled by shingle once: the guard's aggregation and
  * the join consume the same exchange (ReusedExchange), and the
  * shingled projection is localCheckpoint'ed so the scan+shingle pass
  * runs once, not once per consumer.
  */
object Decontam {

  /** Per-eval-doc contamination report: distinct shared n-grams and
    * distinct training docs sharing at least one. Eval docs with no
    * overlap produce no row (a report, not a scoreboard).
    */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    splitCol: String, trainLabel: String, evalLabels: Seq[String],
                    n: Int = 8, maxTrainDf: Long = 100): DataFrame = {
    val sh = docs.select(col(idCol), col(splitCol),
        explode(array_distinct(Sketches.wordShingles(col(textCol), n))).as("g"))
      .localCheckpoint()
    contaminationFrom(sh, idCol, splitCol, trainLabel, evalLabels, maxTrainDf,
      bloomPrefilter = false)
  }

  /** [[contamination]] with a Bloom-filter runtime prefilter on the
    * train side — the explicit form of Spark's own runtime row-level
    * filtering (`InjectRuntimeFilter`): the EVAL n-gram set (the small
    * side — eval suites are a sliver of the corpus) is summarized into
    * a Bloom filter over `xxhash64(g)`, and TRAIN shingle rows whose
    * n-gram definitely isn't in any eval document are dropped at the
    * scan side, BEFORE the document-frequency aggregation and the join
    * shuffle ever see them. At 100 TB the train side is the corpus
    * itself, and nearly all of its n-grams appear in no eval doc — the
    * prefilter turns both train-side shuffles from O(corpus n-grams)
    * into O(n-grams that might match).
    *
    * Exactness is preserved: the Bloom filter admits false positives
    * but never false negatives, every surviving n-gram still goes
    * through the exact equi-join, and a per-n-gram filter drops all
    * copies of an n-gram or none — so the train-df guard counts are
    * unchanged for survivors and the output is bit-identical to
    * [[contamination]] (same DuckDB oracle; equality also asserted in
    * DecontamSpec). The filter bytes are a bounded driver artifact
    * (numBits/8, ~1 MB here) shipped as a literal into a codegen'd
    * `might_contain` — the same constant-pool pattern as the IVF
    * codebook.
    */
  def contaminationBloom(docs: DataFrame, idCol: String, textCol: String,
                         splitCol: String, trainLabel: String, evalLabels: Seq[String],
                         n: Int = 8, maxTrainDf: Long = 100): DataFrame = {
    val sh = docs.select(col(idCol), col(splitCol),
        explode(array_distinct(Sketches.wordShingles(col(textCol), n))).as("g"))
      .localCheckpoint()
    contaminationFrom(sh, idCol, splitCol, trainLabel, evalLabels, maxTrainDf,
      bloomPrefilter = true)
  }

  private def contaminationFrom(sh: DataFrame, idCol: String, splitCol: String,
                                trainLabel: String, evalLabels: Seq[String],
                                maxTrainDf: Long, bloomPrefilter: Boolean): DataFrame = {
    val ev = sh.filter(col(splitCol).isin(evalLabels: _*))
      .select(col(idCol), col("g"))
    val trainAll = sh.filter(col(splitCol) === lit(trainLabel))
      .select(col("g"), col(idCol).as("train_id"))
    val train =
      if (!bloomPrefilter) trainAll
      else trainAll.filter(
        graft.functions.Sketches.mightContain(
          buildBloom(ev, xxhash64(col("g"))), xxhash64(col("g"))))
    // boilerplate/skew guard (train rows are distinct per doc already,
    // so count(*) is the train document frequency). Applied after the
    // bloom prefilter: the prefilter keeps all copies of an n-gram or
    // none, so train_df is unchanged for every n-gram that can match.
    val kept = train.groupBy("g").agg(count(lit(1)).as("train_df"))
      .filter(col("train_df") <= maxTrainDf).select("g")
    // the guard must land on the TRAIN side before the eval join: the
    // train relation carries the hot keys (a license header in millions
    // of docs), and joining it unfiltered would shuffle every copy to
    // one reducer even though none can match
    ev.join(train.join(kept, "g"), "g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared_ngrams"),
        countDistinct(col("train_id")).as("n_train_docs"))
  }

  /** Aggregate `hashed` (a long hash column over `df`) into Bloom
    * filter bytes on the driver — bounded by numBits/8 regardless of
    * row count. NOTE: the `.head` is an EAGER Spark action at
    * plan-construction time (one aggregation job over the eval side),
    * not a lazy plan node — the same bounded driver-side index build as
    * the IVF centroid scan, accepted because the filter must exist as a
    * literal before the train-side plan can embed it. */
  private def buildBloom(df: DataFrame, hashed: org.apache.spark.sql.Column): Array[Byte] =
    df.select(graft.functions.Sketches.bloomAgg(hashed,
        expectedItems = 1L << 20, numBits = 1L << 23).as("bf"))
      .head.getAs[Array[Byte]](0)
}
