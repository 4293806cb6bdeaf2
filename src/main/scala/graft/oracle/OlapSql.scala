package graft.oracle

/** DuckDB mirrors of [[graft.operators.Olap]] — same decimal pathway, same
  * final DOUBLE casts. SUMs of integers are cast to BIGINT (DuckDB widens to
  * HUGEINT, Spark to LONG).
  */
object OlapSql {

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
      |           (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  val q6Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |                CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.06
      |  AND l_quantity < 24""".stripMargin

  val q3Sql: String =
    """SELECT l_orderkey,
      |  epoch_us(o_orderdate) AS o_orderdate_us,
      |  o_orderpriority,
      |  CAST(rev_dec AS DOUBLE) AS revenue
      |FROM (
      |  SELECT l_orderkey, o_orderdate, o_orderpriority,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |        (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment = 'BUILDING'
      |    AND o_orderdate < TIMESTAMP '1998-01-01'
      |    AND l_shipdate > TIMESTAMP '1998-01-01'
      |  GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |  ORDER BY rev_dec DESC, l_orderkey
      |  LIMIT 10) t""".stripMargin

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name""".stripMargin

  val qTopPartsSql: String =
    """SELECT p_brand, rank, p_partkey, CAST(rev_dec AS DOUBLE) AS revenue
      |FROM (
      |  SELECT p_brand, p_partkey, rev_dec,
      |    ROW_NUMBER() OVER (PARTITION BY p_brand
      |      ORDER BY rev_dec DESC, p_partkey) AS rank
      |  FROM (
      |    SELECT p_brand, p_partkey,
      |      SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |          (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    GROUP BY p_brand, p_partkey) a) b
      |WHERE rank <= 3""".stripMargin

  val qRollupSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  val qDistinctAggSql: String =
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_orders,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  COUNT(DISTINCT o_orderpriority) AS n_priorities,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  val qSemiAntiSql: String =
    """SELECT n_name,
      |  CAST(SUM(CASE WHEN has_o THEN 1 ELSE 0 END) AS BIGINT) AS with_orders,
      |  CAST(SUM(CASE WHEN has_o THEN 0 ELSE 1 END) AS BIGINT) AS without_orders
      |FROM (
      |  SELECT c_nationkey,
      |    EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
      |  FROM customer) c
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  val qCumulativeMonthlySql: String =
    """SELECT o_year, o_month, n_orders,
      |  CAST(rev_dec AS DOUBLE) AS revenue,
      |  CAST(SUM(rev_dec) OVER (PARTITION BY o_year ORDER BY o_month
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(month(o_orderdate) AS BIGINT) AS o_month,
      |    COUNT(*) AS n_orders,
      |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
      |  FROM orders GROUP BY 1, 2) t""".stripMargin

  val qSessionizeSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    CAST(value AS DECIMAL(12,2)) AS val
      |  FROM events),
      |gapped AS (
      |  SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sessioned AS (
      |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM gapped)
      |SELECT user_id,
      |  CAST(MAX(session_id) + 1 AS BIGINT) AS n_sessions,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(val) AS DOUBLE) AS total_value
      |FROM sessioned GROUP BY user_id""".stripMargin

  // DIFFERENT formulation from the Spark side on purpose: chained
  // min-aggregate joins instead of row-local array HOFs — the gate proves
  // the two equivalent
  val qFunnelSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |u0 AS (SELECT COUNT(DISTINCT user_id) AS n0 FROM ev),
      |u1 AS (SELECT user_id, MIN(ts_us) AS s1 FROM ev
      |       WHERE event_type = 'view' GROUP BY user_id),
      |u2 AS (SELECT e.user_id, MIN(ts_us) AS s2 FROM ev e
      |       JOIN u1 USING (user_id)
      |       WHERE event_type = 'click' AND ts_us > s1 GROUP BY e.user_id),
      |u3 AS (SELECT e.user_id, MIN(ts_us) AS s3 FROM ev e
      |       JOIN u2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts_us > s2 GROUP BY e.user_id),
      |c AS (SELECT
      |  (SELECT n0 FROM u0) AS n0,
      |  (SELECT COUNT(*) FROM u1) AS n1,
      |  (SELECT COUNT(*) FROM u2) AS n2,
      |  (SELECT COUNT(*) FROM u3) AS n3)
      |SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
      |  CAST(n1 AS BIGINT) AS n_users, CAST(n1 AS BIGINT) * 1000 // n0 AS reach_permille FROM c
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'click', CAST(n2 AS BIGINT),
      |  CAST(n2 AS BIGINT) * 1000 // n0 FROM c
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), 'purchase', CAST(n3 AS BIGINT),
      |  CAST(n3 AS BIGINT) * 1000 // n0 FROM c""".stripMargin

  val qRetentionCohortsSql: String =
    """WITH evw AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
      |w0 AS (SELECT user_id, MIN(wk) AS cohort_wk FROM evw GROUP BY user_id),
      |cs AS (SELECT cohort_wk, COUNT(*) AS n_cohort FROM w0 GROUP BY cohort_wk),
      |act AS (
      |  SELECT w0.cohort_wk, e.wk - w0.cohort_wk AS k, COUNT(*) AS n_active
      |  FROM evw e JOIN w0 USING (user_id) GROUP BY 1, 2)
      |SELECT act.cohort_wk, CAST(act.k AS BIGINT) AS k,
      |  CAST(act.n_active AS BIGINT) AS n_active,
      |  CAST(cs.n_cohort AS BIGINT) AS n_cohort,
      |  CAST(act.n_active AS BIGINT) * 1000 // cs.n_cohort AS retention_permille
      |FROM act JOIN cs USING (cohort_wk)""".stripMargin

  val qEventPivotSql: String = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val cols = types.map { t =>
      s"""  CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS ${t}_cnt,
         |  CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(12,2))
         |           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS ${t}_sum""".stripMargin
    }.mkString(",\n")
    s"""SELECT user_id,
       |$cols
       |FROM events GROUP BY user_id""".stripMargin
  }

  val qJsonBucketSql: String =
    """SELECT CAST(CAST(json_extract_string(props, 'k') AS INT) % 10 AS BIGINT) AS k_bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1""".stripMargin

  val qQuantilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.5) AS median,
      |  quantile_cont(l_quantity, 0.75) AS q75,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Oracle for the HLL-sketch claim query: the exact side is re-derived;
    * `within_bound` is the constant-true claim the Spark side computes from
    * its real estimate (the estimate itself is engine-specific and never
    * hashed).
    */
  val qApproxDistinctSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS exact_users,
      |  TRUE AS within_bound
      |FROM events GROUP BY event_type""".stripMargin

  /** Oracle for the percentile-sketch claim query — see [[qApproxDistinctSql]]. */
  val qApproxQuantilesSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.5) AS median,
      |  quantile_cont(l_quantity, 0.75) AS q75,
      |  TRUE AS q25_within_bound,
      |  TRUE AS median_within_bound,
      |  TRUE AS q75_within_bound
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  val qExistsHavingSql: String =
    """SELECT o_orderstatus,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
      |              GROUP BY l_orderkey HAVING COUNT(*) >= 5)
      |GROUP BY o_orderstatus""".stripMargin

  val qGroupingSetsSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin

  val qValueStatsSql: String =
    """WITH sums AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_v,
      |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
      |         AS DOUBLE) AS sum_v2
      |  FROM events GROUP BY event_type)
      |SELECT event_type, n, sum_v, sum_v2,
      |  sum_v / n AS mean,
      |  sqrt((sum_v2 - sum_v * sum_v / n) / (n - 1)) AS stddev
      |FROM sums""".stripMargin

  val qStringFuncsSql: String =
    """SELECT lower(p_brand) || ':' || upper(substring(p_type, 1, 3)) AS key,
      |  COUNT(*) AS n,
      |  CAST(SUM(p_size) AS BIGINT) AS total_size,
      |  MAX(length(p_name)) AS max_name_len
      |FROM part
      |WHERE p_name LIKE '%e%'
      |GROUP BY 1""".stripMargin

  val qCubeSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(ship_year, -1) AS ship_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_rows
      |FROM (
      |  SELECT l_returnflag, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
      |    l_extendedprice, l_quantity
      |  FROM lineitem) t
      |GROUP BY CUBE(l_returnflag, ship_year)""".stripMargin

  val qDailyDeltaSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    SUM(CAST(value AS DECIMAL(12,2))) AS rev_dec, COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day, n_events,
      |  CAST(rev_dec AS DOUBLE) AS revenue,
      |  CAST(LAG(rev_dec) OVER w AS DOUBLE) AS prev_revenue,
      |  CAST(rev_dec - LAG(rev_dec) OVER w AS DOUBLE) AS delta,
      |  CAST(SUM(rev_dec) OVER w7 AS DOUBLE) / COUNT(*) OVER w7 AS ma7
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day),
      |  w7 AS (PARTITION BY event_type ORDER BY day
      |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin

  val qSetOpsSql: String =
    """WITH early AS (
      |  SELECT DISTINCT o_custkey FROM orders
      |  WHERE o_orderdate < TIMESTAMP '1998-01-01'),
      |big AS (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000.0)
      |SELECT 'early_and_big' AS set_op, COUNT(*) AS n
      |  FROM (SELECT * FROM early INTERSECT SELECT * FROM big) t1
      |UNION ALL
      |SELECT 'early_only', COUNT(*)
      |  FROM (SELECT * FROM early EXCEPT SELECT * FROM big) t2
      |UNION ALL
      |SELECT 'big_only', COUNT(*)
      |  FROM (SELECT * FROM big EXCEPT SELECT * FROM early) t3""".stripMargin

  // Same semantics as the Spark broadcast-NLJ band join, expressed as a CASE
  // classification — the differential gate compares results, not plans.
  val qRangeBandJoinSql: String =
    """SELECT band, COUNT(*) AS n_orders,
      |  CAST(SUM(p) AS DOUBLE) AS total_price,
      |  CAST(MIN(p) AS DOUBLE) AS min_price,
      |  CAST(MAX(p) AS DOUBLE) AS max_price
      |FROM (
      |  SELECT CASE
      |      WHEN o_totalprice < 100000.0 THEN 'p0_100k'
      |      WHEN o_totalprice < 200000.0 THEN 'p100_200k'
      |      WHEN o_totalprice < 300000.0 THEN 'p200_300k'
      |      WHEN o_totalprice < 400000.0 THEN 'p300_400k'
      |      ELSE 'p400k_up' END AS band,
      |    CAST(o_totalprice AS DECIMAL(12,2)) AS p
      |  FROM orders WHERE o_totalprice >= 0.0) t
      |GROUP BY band""".stripMargin

  // cross-multiplied avg comparison (price × n > Σ price): decimal-exact,
  // engine-independent — a decimal AVG would divide with engine-specific
  // scale/rounding rules
  val qCorrelatedSubquerySql: String =
    """SELECT o_custkey, COUNT(*) AS n_above,
      |  CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_above
      |FROM orders o
      |WHERE CAST(o_totalprice AS DECIMAL(12,2)) * (
      |    SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      |  > (SELECT SUM(CAST(o_totalprice AS DECIMAL(12,2))) FROM orders i
      |     WHERE i.o_custkey = o.o_custkey)
      |GROUP BY o_custkey""".stripMargin

  val qTrailing30dSql: String =
    """WITH daily AS (
      |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
      |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT day, n_orders,
      |  CAST(rev_dec AS DOUBLE) AS revenue,
      |  CAST(SUM(rev_dec) OVER (ORDER BY day
      |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
      |FROM daily""".stripMargin

  val qCustomerDecilesSql: String =
    """WITH spend AS (
      |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend_dec
      |  FROM orders GROUP BY 1),
      |d AS (
      |  SELECT *, CAST(NTILE(10) OVER (ORDER BY spend_dec DESC, o_custkey)
      |    AS BIGINT) AS decile
      |  FROM spend)
      |SELECT decile, COUNT(*) AS n_customers,
      |  CAST(SUM(spend_dec) AS DOUBLE) AS total_spend,
      |  CAST(MIN(spend_dec) AS DOUBLE) AS min_spend,
      |  CAST(MAX(spend_dec) AS DOUBLE) AS max_spend
      |FROM d GROUP BY decile""".stripMargin
}
