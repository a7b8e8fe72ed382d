package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level (paragraph-level) corpus deduplication — the CCNet-style
  * curation pass: a line whose content appears in more than `maxDocDf`
  * distinct documents is boilerplate (navigation chrome, cookie
  * banners, license headers, signatures) and is removed from every
  * document; the remaining lines are reassembled in their original
  * order.
  *
  * Shape at scale:
  *  - the duplicate-line table groups by `md5(line)` — the shuffle for
  *    the document-frequency count carries 16-byte hashes plus doc ids,
  *    never line text, and map-side partial aggregation collapses
  *    within-partition repeats before the exchange;
  *  - that table is then filtered to hashes with df > maxDocDf — the
  *    boilerplate set, a small fraction of distinct lines in a real
  *    corpus — and broadcast back as the join side, so flagging is a
  *    broadcast hash join against every exploded line (swap to a
  *    `shuffle_hash` hint if a corpus's boilerplate set outgrows the
  *    broadcast threshold; the join stays a guarded equi-join either
  *    way);
  *  - the only full-content movement is the per-document reassembly
  *    shuffle — unavoidable for any operator that REWRITES documents
  *    (the content has to reach its document's reducer once), and it
  *    carries kept lines only, after the boilerplate is dropped.
  */
object LineDedup {

  /** Per-document line-dedup report: total lines, kept lines, and the
    * md5 of the document reassembled from kept lines (original order,
    * '\n'-joined; a document whose every line is boilerplate reassembles
    * to the empty string). `maxDocDf = 1` removes any line shared by two
    * or more documents.
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 maxDocDf: Long = 1): DataFrame =
    cleanLines(docs, idCol, textCol, maxDocDf)
      .select(col(idCol), col("n_lines"), col("n_kept"),
        md5(col("clean_text")).as("clean_md5"))

  /** [[dedupLines]] keeping the reassembled document itself
    * (`clean_text`) instead of its md5 — the form downstream curation
    * stages (quality gate, exact dedup, decontamination) consume when
    * line dedup runs as a pipeline stage rather than a report. Same
    * single explode-and-reassemble shuffle; the md5 report is just a
    * projection of this.
    */
  def cleanLines(docs: DataFrame, idCol: String, textCol: String,
                 maxDocDf: Long = 1): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    // document frequency per distinct line content (16-byte hash key)
    val dup = lines
      .select(md5(col("line")).as("h"), col(idCol))
      .groupBy("h").agg(countDistinct(col(idCol)).as("doc_df"))
      .filter(col("doc_df") > maxDocDf)
      .select("h")
    // left join the (small) boilerplate set; a null match means keep.
    // One groupBy then computes totals AND the kept reassembly together
    // (collect_list skips the nulls the `when` leaves on dropped lines),
    // so the corpus is exploded and shuffled exactly once.
    lines
      .join(broadcast(dup), md5(col("line")) === col("h"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("h").isNull, 1)).as("n_kept"),
        concat_ws("\n",
          transform(
            array_sort(collect_list(when(col("h").isNull,
              struct(col("pos"), col("line"))))),
            x => x.getField("line"))).as("clean_text"))
  }
}
