package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{WireEvents, WireFixture}

/** Pool catalog from the FACTORY event stream (S3/S4): fold HiveCoreCreated
  * (pool birth, base/quote token binding — hive-factory.json:152-176,
  * consumed at hive-listener.ts:54-79) and QuoteTokenAdded (the growing
  * quote-token registry — hive-factory.json:177-189, hive-listener.ts:81-111)
  * into one row per pool.
  *
  * The reference replays the factory log at boot and mutates an in-memory
  * map; here the catalog is a one-pass aggregation of the same stream — at
  * 100 TB the factory log is still tiny relative to order flow (pools are
  * born once), so this is a small shuffled agg feeding broadcast joins
  * downstream (J3 enrichment).
  */
object WireCatalog {

  def poolCatalog(frames: DataFrame): DataFrame =
    WireEvents.parse(frames)
      .filter(col("event_type").isin("HiveCoreCreated", "QuoteTokenAdded"))
      .groupBy(col("pool"))
      .agg(
        max(col("p_HiveCoreCreated.baseToken")).as("base_token"),
        max(col("p_HiveCoreCreated.quoteToken")).as("quote_token"),
        sum(when(col("event_type") === "QuoteTokenAdded", 1L).otherwise(0L))
          .as("n_quote_tokens"),
        // deterministic registry rendering: sorted CSV of quote tokens
        array_join(array_sort(collect_list(col("p_QuoteTokenAdded.quoteToken"))), ",")
          .as("quote_tokens"),
        min(when(col("event_type") === "HiveCoreCreated", col("block_number")))
          .as("created_block"))

  /** The gated query: factory fixture frames → full parse → catalog fold. */
  def wirePoolCatalog(spark: SparkSession, dir: String): DataFrame =
    poolCatalog(WireFixture.factoryFrames(spark, dir))
}
