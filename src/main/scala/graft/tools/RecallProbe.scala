// temp dev probe, not committed
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables.t
import graft.operators.{Dedup, Similarity}
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = t(spark, dir, "embeddings")
      val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
      val exact = e.crossJoin(broadcast(q))
        .select(col("qid"), col("vec_id").as("id"),
          round(graft.functions.Vecs.cosineSim(col("v"), col("qv")), 4).as("sim"))
        .groupBy("qid")
        .agg(graft.functions.TopKAgg.topK(struct(col("sim"), (-col("id")).as("nid")), 10).as("t"))
        .select(col("qid"), explode(col("t")).as("s"))
        .select(col("qid"), (-col("s.nid")).as("id"))
      def recall(name: String, ann: org.apache.spark.sql.DataFrame): Unit = {
        val hits = exact.join(ann.select(col("qid"), col("id")).distinct(), Seq("qid","id"), "left_semi")
          .groupBy("qid").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        println(s"$dir $name: " + (0L to 4L).map(k => hits.getOrElse(k, 0L)).mkString(","))
      }
      recall("lsh", Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "vec_id", "embedding", k = 10, nbits = 8))
      val cents = Similarity.sampleCentroids(emb, "vec_id", "embedding", nlist = 16)
      recall("ivf", Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "vec_id", "embedding", k = 10, cents, nprobe = 4))
      val refined = Similarity.kmeansRefine(emb, "vec_id", "embedding", cents, iters = 2)
      recall("kmeans", Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "vec_id", "embedding", k = 10, refined, nprobe = 4))
      val books = Similarity.trainPq(emb, "vec_id", "embedding", m = 8, ksub = 16)
      recall("pq", Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "vec_id", "embedding", k = 10, cents, nprobe = 4, books))
    }
    spark.stop()
  }
}
