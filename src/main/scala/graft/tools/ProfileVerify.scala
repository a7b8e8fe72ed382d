package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables.t
import graft.operators.Dedup

/** Dev-only scratch: per-stage timing of dedup_minhash_verify. */
object ProfileVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tme[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    tme("warmup")(t(spark, sfDir, "documents").count())
    val base = t(spark, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("lb"), col("text"))
    val keep = tme("bucket sizes") {
      val k = base.groupBy("lb").agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") <= 100 && col("bsz") > 1).select("lb")
      k.count(); k
    }
    val pruned = tme("shingle+sort+checkpoint") {
      base.join(broadcast(keep), Seq("lb"))
        .select(col("lb"), col("doc_id"),
          graft.functions.Sketches.sortedDistinct(
            Dedup.charShingles(col("text"), 5)).as("sg"))
        .localCheckpoint()
    }
    val a = pruned.select(col("lb"), col("doc_id").as("id_a"), col("sg").as("sg_a"))
    val b = pruned.select(col("lb"), col("doc_id").as("id_b"), col("sg").as("sg_b"))
    val joined = a.join(b, Seq("lb"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Dedup.jaccardSorted(col("sg_a"), col("sg_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy("id_a", "id_b")
    tme("pair join + jaccard (1st)")(
      joined.write.format("noop").mode("overwrite").save())
    tme("pair join + jaccard (2nd)")(
      joined.write.format("noop").mode("overwrite").save())

    val joinedShuffle = a.join(b.hint("shuffle_hash"), Seq("lb"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Dedup.jaccardSorted(col("sg_a"), col("sg_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy("id_a", "id_b")
    tme("shuffle-hash variant (1st)")(
      joinedShuffle.write.format("noop").mode("overwrite").save())
    tme("shuffle-hash variant (2nd)")(
      joinedShuffle.write.format("noop").mode("overwrite").save())

    // kernel-only bound: evaluate the merge jaccard over the same pairs
    // driver-side to see what the arithmetic itself costs
    val byLb = pruned.collect().groupBy(_.getLong(0))
    tme("driver-side merge jaccard") {
      var n = 0
      byLb.values.foreach { rows =>
        var i = 0
        while (i < rows.length) {
          var j = i + 1
          while (j < rows.length) {
            val sa = rows(i).getSeq[String](2); val sb = rows(j).getSeq[String](2)
            var x = 0; var y = 0; var inter = 0
            while (x < sa.length && y < sb.length) {
              val c = sa(x).compareTo(sb(y))
              if (c == 0) { inter += 1; x += 1; y += 1 }
              else if (c < 0) x += 1 else y += 1
            }
            n += 1
            j += 1
          }
          i += 1
        }
      }
      println(s"[prof] pairs=$n")
    }
    spark.stop()
  }
}
