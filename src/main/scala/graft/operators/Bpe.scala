package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer training — the vocabulary-building step of a training
  * pipeline, structured like the IVF codebook: TRAIN driver-side on a
  * bounded deterministic sample, APPLY corpus-wide through a codegen'd
  * kernel ([[graft.functions.BpeStats]]) with the merge table riding
  * the constant pool. At 100 TB nobody trains a tokenizer on the full
  * corpus — a fixed-fraction md5 sample is the production shape, and
  * the md5 threshold makes the sample (hence the learned merges)
  * reproducible across runs, partitionings, and cluster sizes. */
object Bpe {

  /** Learn `nMerges` merge rules from the md5-sampled corpus slice.
    * Eager action: the sample collect is a bounded driver artifact
    * (sampleFrac caps it; IVF-centroid precedent). Deterministic: the
    * sample is an md5 threshold, pair selection is totally ordered
    * (count DESC, then lexicographically smallest pair), and merges
    * with count < 2 stop training early. */
  def train(df: DataFrame, textCol: String, sampleFrac: Double,
            nMerges: Int): Seq[(String, String)] = {
    require(nMerges > 0 && sampleFrac > 0, "positive nMerges and sampleFrac")
    val cut = CorpusSplit.hexCut(sampleFrac)
    val texts = df
      .filter(substring(md5(col(textCol)), 1, 8) < lit(cut))
      .select(col(textCol)).collect().map(_.getString(0))
    // word frequencies over the shared pre-tokenizer
    val wordFreq = mutable.HashMap.empty[String, Long]
    for (t <- texts; if t != null) {
      val toks = graft.functions.BpeUtil.preTokens(t)
      var i = 0
      while (i < toks.size) {
        wordFreq.updateWith(toks.get(i))(c => Some(c.getOrElse(0L) + 1)); i += 1
      }
    }
    // symbol sequences, sorted for a deterministic starting order
    var words: Array[(Array[String], Long)] = wordFreq.toArray.sortBy(_._1)
      .map { case (w, f) => (w.map(String.valueOf(_)).toArray[String], f) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < nMerges) {
      val pc = mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          pc.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f)); i += 1
        }
      }
      if (pc.isEmpty) continue = false
      else {
        // total order: count DESC, then smallest (a, b) — unique winner
        val ((a, b), n) = pc.reduceLeft { (x, y) =>
          if (y._2 > x._2 || (y._2 == x._2 &&
            (y._1._1 < x._1._1 || (y._1._1 == x._1._1 && y._1._2 < x._1._2)))) y else x
        }
        if (n < 2) continue = false
        else {
          merges += ((a, b))
          val ab = a + b
          words = words.map { case (syms, f) =>
            if (syms.length < 2) (syms, f)
            else {
              val out = mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                  out += ab; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.toArray, f)
            }
          }
        }
      }
    }
    merges.toSeq
  }

  /** Per-document counts under a learned merge table: (id, n_pre,
    * n_sub) — pre-tokens vs post-merge subword units. A pure codegen'd
    * projection over the scan; no shuffle. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame =
    df.select(col(idCol),
        graft.functions.Bpes.bpeStats(col(textCol), merges).as("st"))
      .select(col(idCol), col("st").getItem(0).as("n_pre"),
        col("st").getItem(1).as("n_sub"))
}
