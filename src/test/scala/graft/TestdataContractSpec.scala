package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Pins the logical schema of EVERY driver testdata table, in every sf
  * dir ([[EventsContractSpec]] generalized: round 15 lost nine oracle
  * queries to a silent events.ts physical-type change between testdata
  * generations — this spec turns the next such drift, on any table,
  * into one failing test with the drifted column in the message).
  *
  * `events` is asserted POST-normalization (the [[Tables.t]] contract:
  * ts is TimestampType whatever the writer did); everything else is the
  * raw parquet read the queries actually consume. o_orderdate /
  * l_shipdate are pinned at their CURRENT on-disk shape (TIMESTAMP_NTZ
  * micros) — if a regeneration changes them, re-pin here after checking
  * the date-cast call sites still agree with the DuckDB oracle.
  * Types compare by `simpleString`, so nullability flips (which Spark
  * query semantics absorb) don't false-alarm.
  */
class TestdataContractSpec extends AnyFunSuite with SparkSpec {

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp", // post-normalization
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    .filter(d => new java.io.File(d).isDirectory)

  for (dir <- sfDirs; (table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$dir/$table matches the pinned schema") {
      val actual = Tables.t(spark, dir, table).schema
        .map(f => f.name -> f.dataType.simpleString)
      assert(actual == cols,
        s"$table schema drifted.\n  expected: $cols\n  actual:   $actual\n" +
          "Testdata was likely regenerated with new physical types — " +
          "check the reading queries and the DuckDB oracle agree before re-pinning.")
    }
  }
}
