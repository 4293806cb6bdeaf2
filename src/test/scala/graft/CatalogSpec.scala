package graft

/** The SQL entry surface: the reference's REST queries expressed as plain
  * SQL over registered views (SURVEY §2.8 right-hand column, verbatim).
  */
class CatalogSpec extends SparkSpec {

  test("REST surface as SQL over registered views") {
    GraftCatalog.register(spark, sfTiny)

    val poolCount = spark.sql(
      "SELECT count(*) FROM pools WHERE pool IS NOT NULL AND base_token IS NOT NULL")
      .collect()(0).getLong(0)
    assert(poolCount == 5)

    val book = spark.sql(
      """SELECT pool, side, price_lvl, CAST(volume AS DOUBLE) AS volume
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY pool, side
        |        ORDER BY CASE WHEN side='BUY' THEN -price_lvl ELSE price_lvl END) AS rk
        |      FROM price_levels) t
        |WHERE rk <= 10""".stripMargin).collect()
    assert(book.nonEmpty)

    val traderOrders = spark.sql(
      "SELECT * FROM orders_current WHERE trader % 7 = 3").count()
    assert(traderOrders > 0)

    // cosine_native is registered for SQL too
    val sim = spark.sql(
      """SELECT a.vec_id, b.vec_id, cosine_native(a.embedding, b.embedding) AS c
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |LIMIT 5""".stripMargin).collect()
    assert(sim.length == 5 && sim.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }

  test("order_fold UDAF from SQL equals the relational fold") {
    GraftCatalog.register(spark, sfTiny)
    val viaSql = spark.sql(
      """SELECT pool, trader, st.orderId, st.remainingCents, st.active
        |FROM (
        |  SELECT pool, trader,
        |    order_fold(pool, trader, event_id, action,
        |               CAST(val * 100 AS BIGINT), block_time) AS st
        |  FROM order_events WHERE action <= 7
        |  GROUP BY pool, trader) t
        |WHERE st IS NOT NULL""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val relational = spark.sql(
      """SELECT pool, trader, order_id,
        |  CAST(remaining * 100 AS BIGINT), active
        |FROM orders_current""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(viaSql == relational)
    assert(viaSql.nonEmpty)
  }

  test("mg_topk UDAF from SQL: sketch estimates undercount and find the heavy head") {
    GraftCatalog.register(spark, sfTiny)
    val row = spark.sql(
      """SELECT mg_topk(tok) AS mg, COUNT(*) AS n FROM (
        |  SELECT explode(regexp_extract_all(text, '[a-z0-9]+', 0)) AS tok
        |  FROM documents) t""".stripMargin).collect()(0)
    val mg = row.getMap[String, Long](0)
    val n = row.getLong(1)
    assert(mg.nonEmpty && mg.size <= 64)
    val exact = spark.sql(
      """SELECT tok, COUNT(*) AS c FROM (
        |  SELECT explode(regexp_extract_all(text, '[a-z0-9]+', 0)) AS tok
        |  FROM documents) t GROUP BY tok""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    mg.foreach { case (t, est) => assert(est <= exact(t), s"overestimate for $t") }
    exact.foreach { case (t, c) =>
      assert((c - mg.getOrElse(t, 0L)) * 65 <= n, s"MG bound violated for $t")
    }
  }

  test("bucketed state layout: single-bucket reads for per-pool queries") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    GraftCatalog.writeBucketedState(spark, sfTiny, "oc_bucketed_test", buckets = 4)
    try {
      val df = spark.table("oc_bucketed_test").filter("pool = 'click'")
      assert(df.count() > 0)
      // bucketed scan: no shuffle needed to group by the bucket key
      val grouped = spark.table("oc_bucketed_test")
        .groupBy("pool").count()
      grouped.collect()
      val plan = grouped.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning") ||
        plan.contains("SelectedBucketsCount"),
        s"bucketed table still shuffles for a bucket-key groupBy:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS oc_bucketed_test")
  }
}
