package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
