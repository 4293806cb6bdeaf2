package graft

import org.apache.spark.sql.functions._
import graft.operators.{OrderEvents, Skew}

/** Salted aggregation must be bit-identical to the direct aggregation
  * (decimal exactness makes re-aggregation safe), with two shuffles instead
  * of one hot one.
  */
class SkewSpec extends SparkSpec {

  test("salted sum == direct sum, exactly") {
    val ev = OrderEvents(spark, sfTiny) // pool is a 5-value hot key by design
    val direct = ev.groupBy("pool").agg(sum(col("val")).as("total"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Skew.saltedSum(ev, "pool", "val", "total",
        saltCol = "event_id", salts = 16)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted == direct)
    assert(salted.size == 5)
  }

  test("salt is deterministic and spreads a single key") {
    val ev = OrderEvents(spark, sfTiny).filter(col("pool") === "click")
    val spread = ev.select(Skew.salt(col("event_id"), 16).as("s"))
      .distinct().count()
    assert(spread > 8, s"salt only hit $spread of 16 buckets")
    val a = ev.select(Skew.salt(col("event_id"), 16).as("s")).collect().map(_.getInt(0)).toSeq
    val b = ev.select(Skew.salt(col("event_id"), 16).as("s")).collect().map(_.getInt(0)).toSeq
    assert(a == b)
  }
}
