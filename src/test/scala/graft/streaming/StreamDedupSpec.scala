package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Tables.t

class StreamDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("cross-batch duplicates collapse to one row per event_id") {
    val dir = "/root/testdata/sf0.001"
    // the same file twice -> every event re-delivered in a LATER
    // micro-batch (maxFilesPerTrigger=1), exercising the dedup state
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sdedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("b.parquet"))
    val q = StreamDedup.run(spark, streamDir.toString, "dedup_out")
    q.awaitTermination()

    val streamed = spark.table("dedup_out")
    val expected = t(spark, dir, "events").count()
    assert(streamed.count() == expected, "duplicates survived")
    assert(streamed.select("event_id").distinct().count() == expected)
  }
}
