package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time a SUBSET of declared queries with the Bench
  * methodology (noop sink so nothing is pruned, one untimed warmup
  * query, three whole-subset passes, per-query min) — the fast
  * inner loop for optimization work, where a full 225-query pass
  * would cost 17 minutes per data point.
  * Args: name [name ...] [/abs/sfDir] (default sf0.1, cpus from
  * SPARK_GRAFT_CPUS or 32). */
object SubBench {
  def main(args: Array[String]): Unit = {
    val (dirs, names) = args.toSeq.partition(_.startsWith("/"))
    val sfDir = dirs.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    def timeOnce(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val nPasses = sys.env.getOrElse("SUBBENCH_PASSES", "3").toInt
    val passes = (1 to nPasses).map(_ => names.map(n => n -> timeOnce(n)))
    names.zipWithIndex.foreach { case (n, i) =>
      val ts = passes.map(_(i)._2)
      println(f"SUBBENCH $n%-28s min=${ts.min}%6.2f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    println(f"SUBBENCH_TOTAL ${names.zipWithIndex.map { case (_, i) => passes.map(_(i)._2).min }.sum}%.2f")
    spark.stop()
  }
}
