package graft.oracle

/** DuckDB oracle SQL for every entry in [[graft.SparkEntry.queries]].
  *
  * Each string mirrors its Spark query's semantics *and numeric pathway*: all
  * money/volume arithmetic is DECIMAL (exact in both engines, immune to
  * aggregation order), doubles appear only (a) at the final serving cast and
  * (b) in single divisions whose result is rounded straight back to DECIMAL —
  * so hash-exact comparison is deterministic.
  *
  * Integer-division note: Spark `(col/10).cast("long")` truncates via double,
  * DuckDB `CAST(x/10 AS BIGINT)` *rounds* — both sides therefore use an
  * explicit FLOOR before casting.
  */
object OracleSql {

  /** Shared CTE: the derived order-event stream (see
    * [[graft.operators.OrderEvents]] for the mapping rationale).
    */
  val orderEventsCte: String =
    """order_events AS (
      |  SELECT event_type AS pool, user_id AS trader, event_id,
      |         CAST(FLOOR(event_id / 10) AS BIGINT) AS block_number,
      |         epoch_us(ts) AS block_time,
      |         CAST(event_id % 10 AS INT) AS action,
      |         CAST(value AS DECIMAL(18,2)) AS val
      |  FROM events
      |)""".stripMargin

  /** Shared CTE chain: the order-lifecycle fold (see
    * [[graft.operators.OrderState.ordersCurrent]]).
    */
  val ordersCurrentCte: String =
    s"""$orderEventsCte,
       |seg AS (
       |  SELECT *, MAX(CASE WHEN action <= 3 THEN event_id END) OVER (
       |      PARTITION BY pool, trader ORDER BY event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS create_id
       |  FROM order_events WHERE action <= 7
       |),
       |folded AS (
       |  SELECT pool, trader, create_id,
       |    MAX(CASE WHEN event_id = create_id THEN val END) AS price,
       |    MAX(CASE WHEN event_id = create_id THEN val * 10 END) AS amount0,
       |    SUM(CASE WHEN action IN (4,5) THEN val ELSE CAST(0 AS DECIMAL(18,2)) END) AS filled,
       |    MAX(CASE WHEN action = 6 THEN 1 ELSE 0 END) AS cancelled,
       |    ARG_MAX(CASE WHEN action = 7 THEN val * 5 END,
       |            CASE WHEN action = 7 THEN event_id ELSE -1 END) AS upd_amount,
       |    MAX(CASE WHEN event_id = create_id THEN block_time END) AS created_at
       |  FROM seg WHERE create_id IS NOT NULL
       |  GROUP BY pool, trader, create_id
       |),
       |latest AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY pool, trader
       |        ORDER BY create_id DESC) AS rn
       |    FROM folded) t
       |  WHERE rn = 1
       |),
       |orders_current AS (
       |  -- NOT GREATEST: DuckDB coerces GREATEST over mixed-scale decimals to
       |  -- DOUBLE; the CASE keeps the exact-decimal pathway in both engines
       |  SELECT pool, trader, create_id AS order_id,
       |    CASE WHEN create_id % 2 = 0 THEN 'BUY' ELSE 'SELL' END AS side,
       |    price,
       |    CAST(COALESCE(upd_amount, amount0) AS DECIMAL(28,2)) AS amount,
       |    filled,
       |    CASE WHEN COALESCE(upd_amount, amount0) > filled
       |         THEN CAST(COALESCE(upd_amount, amount0) - filled AS DECIMAL(28,2))
       |         ELSE CAST(0 AS DECIMAL(28,2)) END AS remaining,
       |    (cancelled = 0 AND COALESCE(upd_amount, amount0) > filled) AS active,
       |    created_at
       |  FROM latest
       |)""".stripMargin

  /** Shared CTE: active-order price levels (see
    * [[graft.operators.BookViews.priceLevels]]).
    */
  val priceLevelsCte: String =
    s"""$ordersCurrentCte,
       |price_levels AS (
       |  SELECT pool, side, CAST(FLOOR(price) AS BIGINT) AS price_lvl,
       |         SUM(remaining) AS volume, COUNT(*) AS n_orders
       |  FROM orders_current WHERE active
       |  GROUP BY 1, 2, 3
       |)""".stripMargin

  val ordersCurrentSql: String =
    s"""WITH $ordersCurrentCte
       |SELECT pool, trader, order_id, side,
       |  CAST(price AS DOUBLE) AS price,
       |  CAST(amount AS DOUBLE) AS amount,
       |  CAST(filled AS DOUBLE) AS filled,
       |  CAST(remaining AS DOUBLE) AS remaining,
       |  active
       |FROM orders_current""".stripMargin

  val priceLevelsSql: String =
    s"""WITH $priceLevelsCte
       |SELECT pool, side, price_lvl, CAST(volume AS DOUBLE) AS volume, n_orders
       |FROM price_levels""".stripMargin

  val latestPriceSql: String =
    s"""WITH $orderEventsCte
       |SELECT pool,
       |  CAST(ARG_MAX(val, event_id) AS DOUBLE) AS latest_price
       |FROM order_events WHERE action = 8 GROUP BY pool""".stripMargin

  val orderbookSql: String =
    s"""WITH $priceLevelsCte
       |SELECT pool, side, level_rank, price_lvl,
       |  CAST(volume AS DOUBLE) AS volume, n_orders
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY pool, side
       |    ORDER BY CASE WHEN side = 'BUY' THEN -price_lvl ELSE price_lvl END)
       |    AS level_rank
       |  FROM price_levels) t
       |WHERE level_rank <= 10""".stripMargin

  val orderbookSummarySql: String =
    s"""WITH $priceLevelsCte,
       |book AS (
       |  SELECT pool, side, level_rank, price_lvl, CAST(volume AS DOUBLE) AS volume
       |  FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY pool, side
       |      ORDER BY CASE WHEN side = 'BUY' THEN -price_lvl ELSE price_lvl END)
       |      AS level_rank
       |    FROM price_levels) t
       |  WHERE level_rank <= 10)
       |SELECT pool, side,
       |  CAST(COUNT(*) AS BIGINT) AS n_levels,
       |  CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE) AS total_volume,
       |  MIN(price_lvl) AS min_price,
       |  MAX(price_lvl) AS max_price
       |FROM book GROUP BY pool, side""".stripMargin

  /** The BUY-direction swap-scan tail: runs against whichever `price_levels`
    * CTE precedes it (synthetic book or wire-built book) — mirrors
    * [[graft.operators.BookQueries.amountOutBuyFrom]].
    */
  private val amountOutBuyTail: String =
    """sim AS (
      |  SELECT *, SUM(cost) OVER (PARTITION BY pool ORDER BY price_lvl
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cost
      |  FROM (
      |    SELECT *, volume * price_lvl AS cost,
      |      ROW_NUMBER() OVER (PARTITION BY pool ORDER BY price_lvl) AS lvl_rank
      |    FROM price_levels WHERE side = 'SELL') t
      |  WHERE lvl_rank <= 100
      |),
      |sim2 AS (
      |  SELECT *,
      |    CASE WHEN cum_cost <= 50000.00 THEN CAST(volume AS DECIMAL(18,6))
      |         WHEN (cum_cost - cost) < 50000.00 THEN
      |           CAST(CAST(50000.00 - (cum_cost - cost) AS DOUBLE) / price_lvl
      |                AS DECIMAL(18,6))
      |         ELSE CAST(0 AS DECIMAL(18,6)) END AS base_taken
      |  FROM sim
      |),
      |agg AS (
      |  SELECT pool,
      |    CAST(SUM(base_taken) AS DOUBLE) AS amount_out,
      |    CAST(SUM(CASE WHEN base_taken > 0 THEN 1 ELSE 0 END) AS BIGINT) AS levels_hit,
      |    MAX(CASE WHEN base_taken > 0 THEN price_lvl END) AS worst_price,
      |    (MAX(cum_cost) < 50000.00) AS insufficient_liquidity,
      |    array_to_string(list_sort(list(price_lvl) FILTER (WHERE base_taken > 0)), ',')
      |      AS hit_prices
      |  FROM sim2 GROUP BY pool)
      |-- empty-book pools still answer: 0 out, insufficient (order-book.ts:272-279)
      |SELECT p.pool,
      |  COALESCE(agg.amount_out, 0.0) AS amount_out,
      |  COALESCE(agg.levels_hit, 0) AS levels_hit,
      |  agg.worst_price,
      |  COALESCE(agg.insufficient_liquidity, true) AS insufficient_liquidity,
      |  CAST(50000.00 AS DOUBLE) AS amount_in,
      |  COALESCE(agg.hit_prices, '') AS hit_prices
      |FROM (SELECT DISTINCT pool FROM order_events) p
      |LEFT JOIN agg ON p.pool = agg.pool""".stripMargin

  val amountOutBuySql: String =
    s"""WITH $priceLevelsCte,
       |$amountOutBuyTail""".stripMargin

  private val amountOutSellTail: String =
    """sim AS (
       |  SELECT *, SUM(volume) OVER (PARTITION BY pool ORDER BY price_lvl DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_vol
       |  FROM (
       |    SELECT *,
       |      ROW_NUMBER() OVER (PARTITION BY pool ORDER BY price_lvl DESC) AS lvl_rank
       |    FROM price_levels WHERE side = 'BUY') t
       |  WHERE lvl_rank <= 100
       |),
       |sim2 AS (
       |  SELECT *,
       |    CASE WHEN cum_vol <= 500.00 THEN volume
       |         WHEN (cum_vol - volume) < 500.00 THEN
       |           CAST(500.00 - (cum_vol - volume) AS DECIMAL(18,2))
       |         ELSE CAST(0 AS DECIMAL(18,2)) END AS base_sold
       |  FROM sim
       |),
       |agg AS (
       |  SELECT pool,
       |    CAST(SUM(base_sold * price_lvl) AS DOUBLE) AS amount_out,
       |    CAST(SUM(CASE WHEN base_sold > 0 THEN 1 ELSE 0 END) AS BIGINT) AS levels_hit,
       |    MIN(CASE WHEN base_sold > 0 THEN price_lvl END) AS worst_price,
       |    (MAX(cum_vol) < 500.00) AS insufficient_liquidity,
       |    array_to_string(list_sort(list(price_lvl) FILTER (WHERE base_sold > 0),
       |      'DESC'), ',') AS hit_prices
       |  FROM sim2 GROUP BY pool)
       |SELECT p.pool,
       |  COALESCE(agg.amount_out, 0.0) AS amount_out,
       |  COALESCE(agg.levels_hit, 0) AS levels_hit,
       |  agg.worst_price,
       |  COALESCE(agg.insufficient_liquidity, true) AS insufficient_liquidity,
       |  CAST(500.00 AS DOUBLE) AS amount_in,
       |  COALESCE(agg.hit_prices, '') AS hit_prices
       |FROM (SELECT DISTINCT pool FROM order_events) p
       |LEFT JOIN agg ON p.pool = agg.pool""".stripMargin

  val amountOutSellSql: String =
    s"""WITH $priceLevelsCte,
       |$amountOutSellTail""".stripMargin

  val userOrdersSql: String =
    s"""WITH $ordersCurrentCte
       |SELECT pool, trader, order_id, side,
       |  CAST(price AS DOUBLE) AS price,
       |  CAST(amount AS DOUBLE) AS amount,
       |  CAST(filled AS DOUBLE) AS filled,
       |  CAST(remaining AS DOUBLE) AS remaining,
       |  active
       |FROM orders_current WHERE trader % 7 = 3""".stripMargin

  val orderLookupSql: String =
    s"""WITH $ordersCurrentCte
       |SELECT pool, trader, order_id, side,
       |  CAST(price AS DOUBLE) AS price,
       |  CAST(amount AS DOUBLE) AS amount,
       |  CAST(filled AS DOUBLE) AS filled,
       |  CAST(remaining AS DOUBLE) AS remaining,
       |  active
       |FROM orders_current WHERE pool = 'click' AND trader = 42""".stripMargin

  val userMarketOrdersSql: String =
    s"""WITH $orderEventsCte
       |SELECT pool, trader, event_id,
       |  CASE WHEN block_number % 2 = 0 THEN 'BUY' ELSE 'SELL' END AS side,
       |  CAST(val AS DOUBLE) AS amount,
       |  CAST(val AS DOUBLE) AS price,
       |  CAST(val AS DOUBLE) AS filled_amount
       |FROM order_events WHERE action = 9 AND trader % 7 = 3""".stripMargin

  /** Oracle for [[graft.operators.WireOrderFold.wireOrdersCurrent]]: the
    * order_id-keyed fold (the reference's native key, order-book.ts:80-182),
    * computed directly from `events` — deliberately WITHOUT the JSON/
    * fixed-point roundtrip the Spark side runs, so the wire ingest path
    * (payload parse, multi-decimals scaling, enum decode) is verified
    * end-to-end by an independent derivation. One row per order ever
    * created, superseded orders included.
    */
  /** Shared CTE chain: the order_id-keyed wire fold (one row per order ever
    * created) — used by `wire_orders_current` and the wire-built-book
    * amount-out gate.
    */
  private val wireFoldCte: String =
    s"""$orderEventsCte,
       |seg AS (
       |  SELECT *, MAX(CASE WHEN action <= 3 THEN event_id END) OVER (
       |      PARTITION BY pool, trader ORDER BY event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_id
       |  FROM order_events WHERE action <= 7
       |),
       |folded AS (
       |  SELECT pool, order_id,
       |    MAX(CASE WHEN event_id = order_id THEN trader END) AS trader,
       |    MAX(CASE WHEN event_id = order_id THEN val END) AS price,
       |    MAX(CASE WHEN event_id = order_id THEN val * 10 END) AS amount0,
       |    SUM(CASE WHEN action IN (4,5) THEN val ELSE CAST(0 AS DECIMAL(18,2)) END) AS filled,
       |    MAX(CASE WHEN action = 6 THEN 1 ELSE 0 END) AS cancelled,
       |    ARG_MAX(CASE WHEN action = 7 THEN val * 5 END,
       |            CASE WHEN action = 7 THEN event_id ELSE -1 END) AS upd_amount,
       |    MAX(CASE WHEN event_id = order_id THEN block_time END) AS created_at
       |  FROM seg WHERE order_id IS NOT NULL
       |  GROUP BY pool, order_id
       |)""".stripMargin

  val wireOrdersCurrentSql: String =
    s"""WITH $wireFoldCte
       |SELECT pool, order_id, trader,
       |  CASE WHEN order_id % 2 = 0 THEN 'BUY' ELSE 'SELL' END AS side,
       |  CAST(price AS DOUBLE) AS price,
       |  CAST(CAST(COALESCE(upd_amount, amount0) AS DECIMAL(28,2)) AS DOUBLE) AS amount,
       |  CAST(CAST(filled AS DECIMAL(28,2)) AS DOUBLE) AS filled,
       |  CAST(CASE WHEN COALESCE(upd_amount, amount0) > filled
       |       THEN CAST(COALESCE(upd_amount, amount0) - filled AS DECIMAL(28,2))
       |       ELSE CAST(0 AS DECIMAL(28,2)) END AS DOUBLE) AS remaining,
       |  (cancelled = 0 AND COALESCE(upd_amount, amount0) > filled) AS active,
       |  created_at
       |FROM folded""".stripMargin

  /** Oracle for [[graft.operators.WireViews.wireLatestPrice]]: identical
    * values to the synthetic `latest_price` gate, but the Spark side arrives
    * through the wire path (JSON parse → fixed-point scaling → max_by over
    * the injective (block, log) order) — this derivation stays independent.
    */
  val wireLatestPriceSql: String =
    s"""WITH $orderEventsCte
       |SELECT pool,
       |  CAST(ARG_MAX(val, event_id) AS DOUBLE) AS latest_price
       |FROM order_events WHERE action = 8 GROUP BY pool""".stripMargin

  /** Oracle for [[graft.operators.WireViews.wireMarketOrders]]: block/log
    * position and orderType parity re-derived from event_id exactly as the
    * fixture encodes them (block := id div 25, log := id mod 25,
    * orderType := block % 2).
    */
  val wireMarketOrdersSql: String =
    s"""WITH $orderEventsCte
       |SELECT pool, trader,
       |  CAST(FLOOR(event_id / 25) AS BIGINT) AS block_number,
       |  CAST(event_id % 25 AS INT) AS log_index,
       |  CASE WHEN CAST(FLOOR(event_id / 25) AS BIGINT) % 2 = 0
       |       THEN 'BUY' ELSE 'SELL' END AS side,
       |  CAST(val AS DOUBLE) AS amount,
       |  CAST(val AS DOUBLE) AS price,
       |  CAST(val AS DOUBLE) AS filled_amount,
       |  block_time AS executed_at
       |FROM order_events WHERE action = 9 AND trader % 7 = 3""".stripMargin

  /** Oracle for [[graft.operators.WireViews.wireAmountOutBuy]]: the full
    * §3.3 read chain — order_id fold → active price levels → greedy
    * cumulative swap scan — rebuilt independently from `events`. The book
    * here keeps EVERY order (order_id key space), unlike `amount_out_buy`'s
    * latest-per-(pool, trader) book.
    */
  val wireAmountOutBuySql: String =
    s"""WITH $wireFoldCte,
       |oc AS (
       |  SELECT pool, price,
       |    CASE WHEN order_id % 2 = 0 THEN 'BUY' ELSE 'SELL' END AS side,
       |    CASE WHEN COALESCE(upd_amount, amount0) > filled
       |         THEN CAST(COALESCE(upd_amount, amount0) - filled AS DECIMAL(28,2))
       |         ELSE CAST(0 AS DECIMAL(28,2)) END AS remaining,
       |    (cancelled = 0 AND COALESCE(upd_amount, amount0) > filled) AS active
       |  FROM folded),
       |price_levels AS (
       |  SELECT pool, side, CAST(FLOOR(price) AS BIGINT) AS price_lvl,
       |         SUM(remaining) AS volume, COUNT(*) AS n_orders
       |  FROM oc WHERE active
       |  GROUP BY 1, 2, 3),
       |$amountOutBuyTail""".stripMargin

  /** SELL direction of [[wireAmountOutBuySql]] — same wire-fold book, the
    * bid-side cumulative volume scan.
    */
  val wireAmountOutSellSql: String =
    s"""WITH $wireFoldCte,
       |oc AS (
       |  SELECT pool, price,
       |    CASE WHEN order_id % 2 = 0 THEN 'BUY' ELSE 'SELL' END AS side,
       |    CASE WHEN COALESCE(upd_amount, amount0) > filled
       |         THEN CAST(COALESCE(upd_amount, amount0) - filled AS DECIMAL(28,2))
       |         ELSE CAST(0 AS DECIMAL(28,2)) END AS remaining,
       |    (cancelled = 0 AND COALESCE(upd_amount, amount0) > filled) AS active
       |  FROM folded),
       |price_levels AS (
       |  SELECT pool, side, CAST(FLOOR(price) AS BIGINT) AS price_lvl,
       |         SUM(remaining) AS volume, COUNT(*) AS n_orders
       |  FROM oc WHERE active
       |  GROUP BY 1, 2, 3),
       |$amountOutSellTail""".stripMargin

  /** Oracle for [[graft.operators.WireCatalog.wirePoolCatalog]]: the factory
    * registry derived directly from the pool universe — independent of the
    * JSON envelope roundtrip the Spark side parses.
    */
  val wirePoolCatalogSql: String =
    """WITH pools AS (SELECT DISTINCT event_type AS pool FROM events),
      |q AS (
      |  SELECT pool, 'q' || i || '_' || pool AS qt
      |  FROM (SELECT pool, 1 + ascii(substring(pool, 1, 1)) % 3 AS nq FROM pools) n,
      |       UNNEST(generate_series(0, nq - 1)) AS u(i))
      |SELECT pool,
      |  'tok_' || pool AS base_token,
      |  'quote_' || pool AS quote_token,
      |  CAST(COUNT(*) AS BIGINT) AS n_quote_tokens,
      |  string_agg(qt, ',' ORDER BY qt) AS quote_tokens,
      |  CAST(0 AS BIGINT) AS created_block
      |FROM q GROUP BY pool""".stripMargin

  val poolInfoSql: String =
    s"""WITH $orderEventsCte,
       |pools AS (
       |  SELECT pool, 'base_' || pool AS base_token, 'quote_' || pool AS quote_token,
       |         MIN(block_time) AS created_at, COUNT(*) AS n_events
       |  FROM order_events GROUP BY pool),
       |lp AS (
       |  SELECT pool, ARG_MAX(val, event_id) AS latest_price
       |  FROM order_events WHERE action = 8 GROUP BY pool)
       |SELECT p.pool, p.base_token, p.quote_token, p.created_at, p.n_events,
       |  CAST(lp.latest_price AS DOUBLE) AS latest_price
       |FROM pools p LEFT JOIN lp ON p.pool = lp.pool""".stripMargin
}
