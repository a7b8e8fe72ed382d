package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: interleaved A/B of the BSP loop posture
  * (graft.core.BspLoop.pinned) in ONE session — arm ON runs loops with
  * AQE off and the shuffle width pinned to the loop inputs' width, arm
  * OFF sets `spark.graft.loop.aqe=true` (the pre-round-22 behavior:
  * AQE replans every per-step exchange). Same alternation discipline
  * as [[ABBench]] so host drift hits both arms equally.
  * Args: name [name ...] [/abs/sfDir]; AB_PASSES pairs (default 3). */
object LoopAqeAB {
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
    val nPasses = sys.env.getOrElse("AB_PASSES", "3").toInt
    val a = Array.fill(names.size)(List.empty[Double])
    val b = Array.fill(names.size)(List.empty[Double])
    for (_ <- 1 to nPasses; arm <- Seq(true, false)) {
      spark.conf.set("spark.graft.loop.aqe", if (arm) "false" else "true")
      names.zipWithIndex.foreach { case (n, i) =>
        val t = timeOnce(n)
        if (arm) a(i) ::= t else b(i) ::= t
      }
    }
    spark.conf.unset("spark.graft.loop.aqe")
    names.zipWithIndex.foreach { case (n, i) =>
      println(f"LOOPAQEAB $n%-26s PINNED=${a(i).min}%6.2f AQE=${b(i).min}%6.2f  " +
        f"(pinned: ${a(i).reverse.map(t => f"$t%.2f").mkString(" ")} | aqe: ${b(i).reverse.map(t => f"$t%.2f").mkString(" ")})")
    }
    println(f"LOOPAQEAB_TOTAL PINNED=${a.map(_.min).sum}%.2f AQE=${b.map(_.min).sum}%.2f")
    spark.stop()
  }
}
