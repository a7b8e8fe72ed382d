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
    val train = sh.filter(col(splitCol) === lit(trainLabel))
      .select(col("g"), col(idCol).as("train_id"))
    // boilerplate/skew guard (train rows are distinct per doc already,
    // so count(*) is the train document frequency)
    val kept = train.groupBy("g").agg(count(lit(1)).as("train_df"))
      .filter(col("train_df") <= maxTrainDf).select("g")
    val ev = sh.filter(col(splitCol).isin(evalLabels: _*))
      .select(col(idCol), col("g"))
    // the guard must land on the TRAIN side before the eval join: the
    // train relation carries the hot keys (a license header in millions
    // of docs), and joining it unfiltered would shuffle every copy to
    // one reducer even though none can match
    ev.join(train.join(kept, "g"), "g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared_ngrams"),
        countDistinct(col("train_id")).as("n_train_docs"))
  }
}
