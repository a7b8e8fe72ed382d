package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: inspect how Spark reads the driver testdata (ns timestamps). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "lineitem", "orders", "embeddings", "documents")) {
      println(s"=== $t")
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        df.printSchema()
        df.show(2, 60)
      } catch { case e: Throwable => println(s"FAIL: ${e.getMessage}") }
    }
    spark.stop()
  }
}
