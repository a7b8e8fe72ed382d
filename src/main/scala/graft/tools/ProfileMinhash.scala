package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables.t
import graft.operators.Dedup

/** Dev-only scratch: per-stage timing of the MinHash dedup pipeline. */
object ProfileMinhash {
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
    val docs = t(spark, sfDir, "documents")
    tme("warmup")(docs.count())
    val shingled = tme("shingle+checkpoint") {
      docs.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("shingles"))
        .localCheckpoint()
    }
    val hashed = shingled.select(col("doc_id"), Dedup.shingleHashes(col("shingles")).as("shash"))
    val signed = hashed.select(col("doc_id"), Dedup.minhashSignature(col("shash"), 64).as("sig"))
    val banded = tme("hash+sign+band+checkpoint") {
      signed.select(col("doc_id"), Dedup.lshBandKeys(col("sig"), 16, 4).as("band_keys"))
        .localCheckpoint()
    }
    val cands = tme("candidatePairs")(Dedup.candidatePairs(banded, "doc_id").localCheckpoint())
    println(s"[prof] n_cands=${cands.count()}")
    val sa = shingled.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col("doc_id").as("id_b"), col("shingles").as("sh_b"))
    val pairs = tme("verify") {
      cands.join(sa, "id_a").join(sb, "id_b")
        .select(col("id_a"), col("id_b"), Dedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .localCheckpoint()
    }
    println(s"[prof] n_pairs=${pairs.count()}")
    tme("clusters")(Dedup.clusters(docs.select("doc_id"), "doc_id", pairs).count())
    spark.stop()
  }
}
