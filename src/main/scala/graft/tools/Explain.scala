package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted physical plans for the declared queries
  * (args: [queryName ...] [/abs/sfDir] — default: a scale-critical
  * subset at sf0.001; an absolute-path arg overrides the sf dir). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (dirs, qargs) = args.toSeq.partition(_.startsWith("/"))
    val sfDir = dirs.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (qargs.nonEmpty) qargs else Seq(
      "q1_derived_key", "q2_anti_join", "q3_dim_join", "q5_groupby_agg",
      "q11_topk", "q14_range_join", "q15_phone_regex", "q20_cosine_topk",
      "q22_asof_join", "q23_sessionize", "ann_lsh_topk")
    for (n <- names) {
      println(s"\n===================== $n =====================")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
