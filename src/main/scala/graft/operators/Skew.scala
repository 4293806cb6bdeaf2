package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys (SURVEY §7.2 M9 / SCALING.md): two-phase
  * salted aggregation. A 100 TB event log concentrates on a few hot pools;
  * a single hash-agg on the pool key puts an entire hot key's rows in one
  * task. Salting splits each key across `salts` partial groups (phase 1 —
  * the map-side spread), then combines the partials (phase 2 — `salts` rows
  * per key, trivially small).
  *
  * Applies to ALGEBRAIC aggregates (sum/count/min/max); the engine's
  * decimal-exact policy means the re-aggregation is bit-identical to the
  * direct form — asserted in SkewSpec. AQE's skew-join splitting handles
  * the join-side analogue automatically; this utility is for aggregations,
  * which AQE does not re-salt.
  */
object Skew {

  /** Deterministic salt from existing columns, not `rand()` — keeps every
    * run and both phases reproducible.
    */
  def salt(c: Column, salts: Int): Column = pmod(hash(c), lit(salts))

  /** `df.groupBy(key).agg(sum(value))`, salted. `value` must be summable;
    * the result schema is (key, alias).
    */
  def saltedSum(df: DataFrame, key: String, value: String, alias: String,
                saltCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", salt(col(saltCol), salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(alias))
}
