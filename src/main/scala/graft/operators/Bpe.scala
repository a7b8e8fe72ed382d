package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer training — the vocabulary-building step of a training
  * pipeline, structured like the IVF codebook: the merge loop runs
  * driver-side over a DISTRIBUTED word-frequency aggregate (never raw
  * text), APPLY runs corpus-wide through a codegen'd kernel
  * ([[graft.functions.BpeStats]]) with the merge table riding the
  * constant pool. At 100 TB nobody trains a tokenizer on the full
  * corpus — a fixed-fraction md5 sample is the production shape, and
  * the md5 threshold makes the sample (hence the learned merges)
  * reproducible across runs, partitionings, and cluster sizes. */
object Bpe {

  /** Vocabulary caps for the collected word-frequency table: the one
    * driver artifact [[train]] materializes. The cut keeps the MOST
    * FREQUENT words (ties broken lexicographically, so the cut is
    * deterministic); BPE merge counts are frequency-weighted, so
    * dropping singleton-tail junk tokens is the standard
    * frequency-cutoff every production tokenizer applies. Enforced as
    * BOTH a row cap and a BYTE budget: rows stream to the driver via
    * `toLocalIterator` in frequency order and ingestion stops at
    * whichever cap hits first, so a pathological corpus of huge
    * "words" (minified JS, base64 blobs) cannot blow the driver heap —
    * the byte-budget cut is as deterministic as the row cut because
    * the stream order is total. */
  val MaxTrainVocab: Int = 4 * 1000 * 1000
  /** Driver-heap budget for the streamed vocabulary (estimated as
    * 2·chars + fixed per-entry overhead): 256 MB. */
  val MaxTrainVocabBytes: Long = 256L * 1024 * 1024

  /** Learn `nMerges` merge rules from the md5-sampled corpus slice.
    * Eager action — but the only collect is the WORD-FREQUENCY table
    * (pre-tokenize → explode → groupBy(word).count(), capped at
    * [[MaxTrainVocab]] by frequency), never raw text: BPE's merge loop
    * consumes word freqs only, so the driver artifact is bounded by
    * vocabulary size (Heaps-law sublinear) instead of scaling with the
    * sampled bytes. Deterministic: the sample is an md5 threshold, the
    * vocab cut and pair selection are totally ordered (count DESC, then
    * lexicographically smallest), and merges with count < 2 stop
    * training early. */
  def train(df: DataFrame, textCol: String, sampleFrac: Double,
            nMerges: Int, maxVocabBytes: Long = MaxTrainVocabBytes): Seq[(String, String)] = {
    require(nMerges > 0 && sampleFrac > 0, "positive nMerges and sampleFrac")
    val cut = CorpusSplit.hexCut(sampleFrac)
    val freqIt = df
      .filter(col(textCol).isNotNull &&
        substring(md5(col(textCol)), 1, 8) < lit(cut))
      .select(explode(graft.functions.Bpes.preTokens(col(textCol))).as("w"))
      .groupBy("w").count()
      .orderBy(desc("count"), asc("w")).limit(MaxTrainVocab)
      .toLocalIterator()
    // stream in frequency order under a byte budget — the driver never
    // holds rows it won't keep (scaladoc on [[MaxTrainVocabBytes]])
    val acc = mutable.ArrayBuffer.empty[(String, Long)]
    var bytes = 0L
    while (freqIt.hasNext && bytes < maxVocabBytes) {
      val r = freqIt.next()
      val w = r.getString(0)
      // chars + retained-object overhead: String header + backing
      // byte/char array header + boxed tuple fields + ArrayBuffer
      // growth slack — ~112 bytes/entry measured conservative, so the
      // budget tracks real heap, not just character payload
      bytes += 2L * w.length + 112
      acc += ((w, r.getLong(1)))
    }
    val wordFreq: Array[(String, Long)] = acc.toArray
    // symbol sequences, sorted for a deterministic starting order
    var words: Array[(Array[String], Long)] = wordFreq.sortBy(_._1)
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
