package graft.cli

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.etl.Pipeline

/** CLI mirroring the reference's `frontpage` console script
  * (cli.py:5-16): `etl` runs the batch pipeline, `query` runs one
  * declared inventory query, `conform` runs the maintenance job.
  *
  * Usage:
  *   graft.cli.Main etl <raw.jsonl> <site_dim.csv> <outDir>
  *   graft.cli.Main query <name> <sfDir>
  *   graft.cli.Main conform <warehouseParquet> <raw.jsonl> <outDir>
  */
object Main {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "etl" :: rawPath :: dimPath :: outDir :: Nil =>
      val spark = session()
      val raw = Pipeline.dedupIngest(Pipeline.parseRaw(spark.read.text(rawPath)), None)
      val res = Pipeline.enrich(Pipeline.cleanData(raw), Pipeline.siteDim(spark, dimPath))
      // state-partitioned layout (SURVEY §2.1 warehouse-sink mapping):
      // geography predicates prune whole directories at scale
      res.warehouse.write.mode("overwrite").partitionBy("state")
        .parquet(s"$outDir/warehouse")
      res.quarantine.write.mode("overwrite").parquet(s"$outDir/quarantine")
      println(s"etl: warehouse=${spark.read.parquet(s"$outDir/warehouse").count()} " +
        s"quarantine=${spark.read.parquet(s"$outDir/quarantine").count()}")
      spark.stop()

    case "query" :: name :: sfDir :: Nil =>
      val spark = session()
      SparkEntry.queries.get(name) match {
        case Some(fn) => fn(spark, sfDir).show(20, false)
        case None =>
          System.err.println(s"unknown query '$name'; available: " +
            SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
          spark.stop(); sys.exit(2)
      }
      spark.stop()

    case "etl-stream" :: rawDir :: dimPath :: outDir :: Nil =>
      val spark = session()
      graft.streaming.EtlStream.run(spark, rawDir, dimPath,
        s"$outDir/warehouse", s"$outDir/quarantine", s"$outDir/checkpoint")
      println(s"etl-stream: warehouse=${spark.read.parquet(s"$outDir/warehouse").count()}")
      spark.stop()

    case "conform" :: warehousePath :: rawPath :: outDir :: Nil =>
      val spark = session()
      val wh = spark.read.parquet(warehousePath)
      val raw = Pipeline.parseRaw(spark.read.text(rawPath))
      val kept = Pipeline.conform(wh, raw)
      kept.write.mode("overwrite").parquet(s"$outDir/warehouse_conformed")
      println(s"conform: kept=${spark.read.parquet(s"$outDir/warehouse_conformed").count()}")
      spark.stop()

    case _ =>
      System.err.println(
        """usage: etl <raw.jsonl> <site_dim.csv> <outDir>
          |       etl-stream <rawDir> <site_dim.csv> <outDir>
          |       query <name> <sfDir>
          |       conform <warehouseParquet> <raw.jsonl> <outDir>""".stripMargin)
      sys.exit(2)
  }
}
