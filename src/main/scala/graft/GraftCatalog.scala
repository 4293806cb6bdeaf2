package graft

import org.apache.spark.sql.SparkSession
import graft.operators._
import graft.sources.Tables
import graft.functions.VectorExpressions

/** SQL entry surface: register every base table and derived view as a temp
  * view so the whole engine is queryable from `spark.sql` — the "switch from
  * the reference" story: its REST reads become SQL over these relations
  * (SURVEY §2.8 right-hand column), and the custom `cosine_native` function
  * is available in SQL too.
  */
object GraftCatalog {

  /** Register base tables (`<name>`) + derived views over `dir`. */
  def register(spark: SparkSession, dir: String): Unit = {
    Tables.all.foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
    val ev = OrderEvents(spark, dir)
    ev.createOrReplaceTempView("order_events")
    val oc = OrderState.ordersCurrent(ev)
    oc.createOrReplaceTempView("orders_current")
    BookViews.priceLevels(oc).createOrReplaceTempView("price_levels")
    BookViews.latestPrice(ev).createOrReplaceTempView("latest_price")
    BookViews.marketOrders(ev).createOrReplaceTempView("market_orders")
    BookViews.pools(ev).createOrReplaceTempView("pools")
    VectorExpressions.register(spark)
    // the A5 fold as a SQL aggregate:
    //   order_fold(pool, trader, event_id, action, cents, block_time)
    spark.udf.register("order_fold",
      org.apache.spark.sql.functions.udaf(
        new OrderFold.FoldSqlAggregator(),
        org.apache.spark.sql.Encoders.product[OrderFold.Ev]))
    // the heavy-hitters sketch as a SQL aggregate: mg_topk(token) → map
    spark.udf.register("mg_topk",
      org.apache.spark.sql.functions.udaf(
        new graft.functions.MisraGriesAgg(64)))
  }

  /** The 100 TB layout, concretely (SCALING.md "Data layout"): write the
    * current-state view bucketed by pool so every per-pool serving query is
    * a single-bucket read, with the trader filter served by in-bucket
    * sorting — the configuration that replaces the reference's Redis
    * secondary indexes (SURVEY §4). Local demo of the cluster DDL.
    */
  def writeBucketedState(spark: SparkSession, dir: String,
                         table: String = "orders_current_bucketed",
                         buckets: Int = 8): Unit = {
    val oc = OrderState.ordersCurrent(OrderEvents(spark, dir))
    oc.write.mode("overwrite")
      .bucketBy(buckets, "pool")
      .sortBy("trader")
      .format("parquet")
      .saveAsTable(table)
  }
}
