package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SkewJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // one pathologically hot key (90% of rows) + a long tail
  lazy val facts = ((1 to 900).map(i => (42L, i.toLong)) ++
    (1 to 100).map(i => (i.toLong % 7, 1000L + i)))
    .toDF("key", "payload")
  lazy val dim = Seq((42L, "hot"), (1L, "a"), (2L, "b"), (99L, "absent"))
    .toDF("key", "name")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("key", "payload", "name")
      .as[(Long, Long, String)].collect().sorted.toSeq

  test("salted inner join equals the plain join") {
    val plain = facts.join(dim, Seq("key"))
    val salted = SkewJoin.saltedJoin(facts, dim, Seq("key"), salts = 8)
    assert(canon(salted) == canon(plain))
  }

  test("salted left join keeps unmatched left rows exactly once") {
    val plain = facts.join(dim, Seq("key"), "left").na.fill("(none)", Seq("name"))
    val salted = SkewJoin.saltedJoin(facts, dim, Seq("key"), 8, "left")
      .na.fill("(none)", Seq("name"))
    assert(canon(salted) == canon(plain))
  }

  test("salted left_anti equals plain anti join") {
    val plain = facts.join(dim, Seq("key"), "left_anti")
    val salted = SkewJoin.saltedJoin(facts, dim, Seq("key"), 8, "left_anti")
    assert(salted.select("key", "payload").as[(Long, Long)].collect().sorted.toSeq ==
      plain.select("key", "payload").as[(Long, Long)].collect().sorted.toSeq)
  }

  test("the hot key spreads across multiple shuffle partitions") {
    val spread = SkewJoin.saltedJoin(facts, dim, Seq("key"), 8)
      .filter(col("key") === 42L)
      .select(spark_partition_id().as("pid"))
      .distinct().count()
    assert(spread > 1, s"hot key stayed in $spread partition(s)")
  }

  test("full/right joins are rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(facts, dim, Seq("key"), 8, "full")
    }
  }
}
