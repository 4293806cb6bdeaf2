package graft

import org.apache.spark.sql.types._
import graft.sources.Tables

/** Schema-drift canary for the driver-generated testdata.
  *
  * Round-7 post-mortem: the driver regenerated /root/testdata mid-round and
  * `events.ts` silently changed from INT64 nanos to parquet TIMESTAMP_MICROS
  * (→ TIMESTAMP_NTZ in Spark). 31 tests went red with the same opaque
  * `DATATYPE_MISMATCH` buried in unrelated suites. This spec exists so the
  * NEXT drift produces exactly one failing test whose message names the
  * table, the column, the old and new dtype, and the adaptation point.
  *
  * `events.ts` is deliberately pinned to a SET of types (the vintages the
  * engine adapts to via [[Tables.tsMicros]]); everything else is pinned
  * exactly.
  */
class SchemaCanarySpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  // events.ts: the engine adapts to these via Tables.tsMicros — a drift to
  // any OTHER type must fail here with a pointer at the adaptation site.
  private val tsVintages: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory)

  for (dir <- sfDirs) {
    test(s"canary: pinned dtypes for ${expected.size + 1} tables in $dir") {
      val drifts = scala.collection.mutable.Buffer[String]()
      for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
        val actual = Tables.table(spark, dir, table).schema
          .map(f => f.name -> f.dataType)
        val exp = cols
        if (actual != exp)
          drifts += s"$table: expected $exp but read $actual — testdata " +
            "schema drifted; adapt the operators reading this table " +
            "(grep Tables." + table + ") and re-pin here"
      }
      val ev = Tables.events(spark, dir).schema
      val evNames = ev.map(_.name)
      val expNames = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
      if (evNames != expNames)
        drifts += s"events: expected columns $expNames but read $evNames"
      val tsType = ev("ts").dataType
      if (!tsVintages.contains(tsType))
        drifts += s"events.ts arrived as $tsType (known vintages: " +
          s"$tsVintages) — extend graft.sources.Tables.tsMicros for the new " +
          "type; that one helper is the single adaptation point"
      Seq("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType).foreach { case (n, t) =>
        if (ev(n).dataType != t)
          drifts += s"events.$n: expected $t but read ${ev(n).dataType}"
      }
      assert(drifts.isEmpty, "\n" + drifts.mkString("\n"))
    }
  }
}
