package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print a declared query's executed plan (args: name [sfDir]). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
