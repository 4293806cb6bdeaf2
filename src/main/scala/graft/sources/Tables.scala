package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference (`akbaridria/hive-server`) reads JSON blobs out of Redis
  * (`src/models/order-book.ts:75-84`) and event logs over JSON-RPC
  * (`src/services/hive-listener.ts:150-175`); our engine's durable source is
  * columnar parquet, so scans get predicate pushdown + column pruning for free.
  *
  * At 100 TB these reads become `spark.read.parquet` over a partitioned
  * directory tree (partitioned by date/block-range); nothing here changes —
  * only the path and partition filters.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoize the base relations per (session, dir, table): `spark.read.parquet`
  // re-lists the directory and re-reads footers for schema on every call,
  // which charges every one of the ~50 bench queries ~100ms of identical
  // driver-side setup. The cached value is the analyzed plan (file index +
  // schema), NOT materialized data — executors still scan parquet with full
  // pushdown/pruning per query. BOUNDED like the cluster-view cache
  // ([[graft.functions.DedupOps]]): entries are tiny, but a long-lived
  // service cycling many (session, dir) pairs should not accrete them —
  // 4 dirs × all tables stay live, insertion-ordered eviction beyond that.
  private val memo =
    new java.util.LinkedHashMap[(SparkSession, String, String), DataFrame]() {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, String), DataFrame]): Boolean =
        size > 4 * all.size
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val k = (spark, dir, name)
    val hit = memo.synchronized(memo.get(k))
    if (hit != null) hit
    else {
      // build OUTSIDE the monitor: the ~100ms footer/listing read must not
      // stall other sessions' cache hits; a concurrent duplicate build is
      // harmless (both values are equivalent analyzed plans, last put wins)
      val v = spark.read.parquet(s"$dir/$name.parquet")
      memo.synchronized(memo.put(k, v))
      v
    }
  }

  /** `events.ts` as epoch-MICROS long, whatever physical type the driver
    * wrote this round. The testdata generator has shipped the column two
    * ways already: INT64 nanos (reads as BIGINT under
    * `spark.sql.legacy.parquet.nanosAsLong`) and parquet
    * TIMESTAMP_MICROS/isAdjustedToUTC=false (reads as TIMESTAMP_NTZ).
    * Both canonicalize to micros — micros is the shared precision floor
    * with the DuckDB oracle's `epoch_us(ts)`. Requires
    * `spark.sql.session.timeZone=UTC` (all graft sessions set it) so the
    * NTZ→instant cast matches DuckDB's tz-naive epoch arithmetic.
    * Resolves against the column's dtype at plan time: pure projection,
    * codegen'd, nothing here shuffles or blocks pushdown.
    */
  def tsMicros(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(col(name).cast(TimestampType))
      case LongType => expr(s"$name div 1000") // INT64 nanos → micros
      case other =>
        throw new IllegalStateException(
          s"events.$name arrived as $other — testdata schema drifted again; " +
            "extend graft.sources.Tables.tsMicros for the new type")
    }

  // memoized row counts: count(*) over parquet is footer-metadata-only but
  // still a Spark job — callers that need a cardinality at PLAN time (e.g.
  // DedupOps.shardDedup's broadcast-safety guard) should not re-pay it per
  // call. Tables are driver-written and immutable within a round.
  private val countMemo =
    new scala.collection.concurrent.TrieMap[(SparkSession, String, String), Long]()

  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    countMemo.getOrElseUpdate((spark, dir, name), table(spark, dir, name).count())

  /** Evict every memoized plan and count for `dir` — required after data
    * under the dir is regenerated in place, because the cached analyzed
    * plans hold the OLD file listing (and the counts the old cardinality).
    * Derived-view caches are evicted alongside by
    * `graft.functions.DedupOps.invalidateDerived`.
    */
  def invalidate(dir: String): Unit = {
    memo.synchronized {
      val it = memo.keySet.iterator()
      while (it.hasNext) if (it.next()._2 == dir) it.remove()
    }
    countMemo.keys.filter(_._2 == dir).foreach(countMemo.remove)
  }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
