package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only: run named queries while capturing each BSP loop
  * iteration's PRE-checkpoint frame (graft.core.BspLoop.stepSink) and
  * write one representative step's `.explain("formatted")` per
  * (query, loop label) to plans/r22/. `localCheckpoint` severs lineage,
  * so the plain PlanDump plans show only a Scan over the loop output —
  * round 21's verdict called that out: the per-iteration shape
  * (Exchange count per step, join strategy inside the loop) is only
  * visible HERE. Args: tag stepK name [name ...] [/abs/sfDir]; for
  * loops shorter than stepK the deepest captured step is written. */
object PlanDumpStep {
  def main(args: Array[String]): Unit = {
    val (dirs, rest) = args.toSeq.partition(_.startsWith("/"))
    val sfDir = dirs.headOption.getOrElse("/root/testdata/sf0.1")
    val tag = rest.head
    val stepK = rest(1).toInt
    val names = rest.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_LOOP_AQE=true reproduces the pre-round-22 loop
    // posture (AQE on inside BSP loops) for before/after plan evidence
    sys.env.get("SPARK_GRAFT_LOOP_AQE").foreach(v =>
      spark.conf.set("spark.graft.loop.aqe", v))
    Files.createDirectories(Paths.get("plans/r22"))
    for (n <- names) {
      val plans = scala.collection.mutable.Map.empty[(String, Int), String]
      graft.core.BspLoop.stepSink = Some { (label, step, df) =>
        if (step <= stepK)
          plans((label, step)) = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
      }
      try graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      finally graft.core.BspLoop.stepSink = None
      for ((label, keys) <- plans.keys.groupBy(_._1)) {
        val k = keys.map(_._2).max
        val plan = plans((label, k))
        val f = Paths.get(s"plans/r22/${n}__${label}_step${k}_$tag.txt")
        Files.writeString(f, plan)
        println(s"PLANDUMPSTEP $n $label step$k -> $f (${plan.length} chars)")
      }
    }
    spark.stop()
  }
}
