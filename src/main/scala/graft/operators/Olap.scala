package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** OLAP / bench surface (SURVEY §7.2 M7): the relational operator classes the
  * reference only exercises implicitly (equi-joins J1-J5, hash aggregation
  * A1-A4, top-k W1-W2) plus the classes Spark provides natively that
  * BASELINE.json puts in scope — multi-way joins, rollup, distinct
  * aggregates, semi/anti joins, windows, sessionization, JSON extraction.
  *
  * Numeric policy (same as the book engine): parquet doubles are verified
  * 2-decimal, so they cast losslessly to DECIMAL; every aggregation runs in
  * decimal (exact under any partial-agg order) and results cast to DOUBLE at
  * the edge. Averages divide two exact numbers as doubles — one deterministic
  * operation per output cell.
  *
  * Scale notes per query in the Scaladoc; common themes: dimension joins are
  * explicitly `broadcast()` (region/nation/part/customer/supplier are tiny
  * relative to facts at every SF — at 100 TB these stay < 10s of MB while
  * lineitem grows), fact-fact joins shuffle on the join key once, and
  * filters sit directly on scans so parquet row-group pruning applies.
  */
object Olap {

  // orders/lineitem date columns are micro-precision TIMESTAMP_NTZ — compare
  // against NTZ literals (events.ts is handled by Tables.tsMicros, which
  // adapts to whichever physical type the testdata generator shipped)
  private def d(date: String) = lit(date).cast("timestamp_ntz")

  private def dec(c: String, t: String = "decimal(12,2)") = col(c).cast(t)
  private val one = lit(1).cast("decimal(4,2)")

  /** TPC-H Q1-style pricing summary: single scan, hash agg on two low-card
    * keys. Partial aggregation collapses ~600k rows to 6 groups map-side, so
    * the shuffle moves a few KB regardless of SF — the canonical
    * scan-dominated query.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= d("2000-12-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (one - dec("l_discount", "decimal(4,2)")))
          .cast("double").as("sum_disc_price"),
        sum(dec("l_extendedprice") * (one - dec("l_discount", "decimal(4,2)"))
          * (one + dec("l_tax", "decimal(4,2)")))
          .cast("double").as("sum_charge"),
        (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec("l_discount", "decimal(4,2)")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q6-style revenue delta: pure filter+sum. All three predicates push
    * to the parquet scan (verify: PushedFilters in explain); no shuffle at
    * all after partial agg.
    */
  def q6Revenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(
        col("l_shipdate") >= d("1997-01-01") &&
        col("l_shipdate") < d("1998-01-01") &&
        col("l_discount").between(0.02, 0.06) &&
        col("l_quantity") < 24)
      .agg(sum(dec("l_extendedprice") * dec("l_discount", "decimal(4,2)"))
        .cast("double").as("revenue"))
  }

  /** TPC-H Q3-style shipping priority: selective dim filter broadcast into a
    * fact-fact join, then top-10. customer is broadcast (small); orders ⋈
    * lineitem shuffles once on the order key. The final TakeOrderedAndProject
    * keeps only 10 rows per partition before the driver merge.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir).filter(col("o_orderdate") < d("1998-01-01"))
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > d("1998-01-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") * (one - dec("l_discount", "decimal(4,2)")))
        .as("rev_dec"))
      .orderBy(col("rev_dec").desc, col("l_orderkey"))
      .limit(10)
      .select(
        col("l_orderkey"),
        // NTZ → epoch micros (session TZ is UTC, so the cast is identity)
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_orderpriority"),
        col("rev_dec").cast("double").as("revenue"))
  }

  /** TPC-H Q5-style local-supplier volume: 6-way join. region/nation/
    * supplier/customer all broadcast; the only shuffle is lineitem ⋈ orders.
    * The same-nation predicate (customer nation = supplier nation) is applied
    * post-join as in the spec.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= d("1996-01-01") &&
              col("o_orderdate") < d("1998-01-01"))
    val li = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
                             col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec("l_extendedprice") * (one - dec("l_discount", "decimal(4,2)")))
        .cast("double").as("revenue"))
  }

  /** Top-N per group (W1/W2 generalized): top-3 parts by revenue within each
    * brand. Decimal revenue makes the rank ties exact; `row_number` breaks
    * residual ties by key so the result is total-order deterministic.
    */
  def qTopPartsPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    val rev = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(sum(dec("l_extendedprice") * (one - dec("l_discount", "decimal(4,2)")))
        .as("rev_dec"))
    rev.withColumn("rank", row_number().over(
        Window.partitionBy("p_brand").orderBy(col("rev_dec").desc, col("p_partkey"))))
      .filter(col("rank") <= 3)
      .select(col("p_brand"), col("rank").cast("long").as("rank"), col("p_partkey"),
        col("rev_dec").cast("double").as("revenue"))
  }

  /** ROLLUP (SURVEY §2.4 note: absent from the reference, in scope per the
    * driver contract). Group keys are COALESCEd to 'ALL' so both engines
    * agree on the subtotal rows' representation.
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.rollup("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n_rows"))
  }

  /** Distinct aggregates per segment (customer ⋈ orders). Spark plans the
    * distinct agg as a two-phase expand+agg; the broadcast keeps the join
    * shuffle-free.
    */
  def qDistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        sum(dec("o_totalprice")).cast("double").as("total_price"))
  }

  /** Semi/anti join (J2 and its complement): per nation, customers with and
    * without orders. Spark side genuinely uses left_semi + left_anti (the
    * plans the reference's trader index stands in for); the oracle expresses
    * the same with EXISTS — different plan, same semantics, which is the
    * point of the differential gate.
    */
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    val okeys = Tables.orders(spark, dir).select(col("o_custkey"))
    val withO = cust.join(okeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_nationkey").agg(count(lit(1)).as("with_orders"))
    val withoutO = cust.join(okeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("without_orders"))
    broadcast(nation)
      .join(withO, col("n_nationkey") === withO("c_nationkey"), "left")
      .drop("c_nationkey")
      .join(withoutO, col("n_nationkey") === withoutO("c_nationkey"), "left")
      .select(col("n_name"),
        coalesce(col("with_orders"), lit(0L)).as("with_orders"),
        coalesce(col("without_orders"), lit(0L)).as("without_orders"))
  }

  /** Monthly revenue with a running cumulative per year (the W4 pattern on
    * the OLAP schema). The window input is the *aggregated* 84-row monthly
    * series, so the window cost is trivial at any SF — aggregate first,
    * window second.
    */
  def qCumulativeMonthly(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val ts = col("o_orderdate")
    val monthly = ord
      .groupBy(year(ts).cast("long").as("o_year"), month(ts).cast("long").as("o_month"))
      .agg(sum(dec("o_totalprice")).as("rev_dec"), count(lit(1)).as("n_orders"))
    monthly
      .withColumn("cum_dec", sum(col("rev_dec")).over(
        Window.partitionBy("o_year").orderBy("o_month")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("o_year"), col("o_month"), col("n_orders"),
        col("rev_dec").cast("double").as("revenue"),
        col("cum_dec").cast("double").as("cum_revenue"))
  }

  /** Gap-based sessionization over the event stream (ST3 extension — the
    * reference has no windows at all, SURVEY §2.7): a 30-minute-gap session
    * break per user via lag + running sum, then per-user session stats. Both
    * window passes share one shuffle on user_id.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val ev = raw
      .select(col("user_id"), col("event_id"), Tables.tsMicros(raw).as("ts_us"),
        col("value").cast("decimal(12,2)").as("val"))
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val gapped = ev.withColumn("new_session",
      when(col("ts_us") - lag("ts_us", 1).over(byUser) > 1800L * 1000000L, 1)
        .otherwise(lit(0)))
    val sessioned = gapped.withColumn("session_id",
      sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessioned
      .groupBy("user_id")
      .agg(
        (max(col("session_id")) + 1).as("n_sessions"),
        count(lit(1)).as("n_events"),
        sum(col("val")).cast("double").as("total_value"))
  }

  /** Ordered funnel over the event stream (view → click → purchase, strict
    * temporal order): per step, how many users reached it. The classic
    * product-analytics query an events engine must answer.
    *
    * ONE shuffle: events collapse to a per-user (ts, type) list and each
    * step time resolves ROW-LOCALLY by chained array HOFs — s2 = min click
    * ts strictly after s1, s3 = min purchase ts strictly after s2 (a step
    * not reached is NULL and nulls propagate through the chain, so skipping
    * a step never counts). The oracle deliberately uses a DIFFERENT
    * formulation (chained min-aggregate joins) — the gate proves the two
    * equivalent, which neither alone would show. At 100 TB the per-user
    * list is bounded by that user's funnel events (the event_type filter
    * prunes at the scan), not the corpus.
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val steps = Seq("view", "click", "purchase")
    val perUser = raw
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), Tables.tsMicros(raw).as("ts_us"), col("event_type"))
      .groupBy("user_id")
      .agg(collect_list(struct(col("ts_us"), col("event_type"))).as("evs"))
      .withColumn("s1", array_min(expr(
        "transform(filter(evs, e -> e.event_type = 'view'), e -> e.ts_us)")))
      .withColumn("s2", array_min(expr(
        "transform(filter(evs, e -> e.event_type = 'click' AND e.ts_us > s1), e -> e.ts_us)")))
      .withColumn("s3", array_min(expr(
        "transform(filter(evs, e -> e.event_type = 'purchase' AND e.ts_us > s2), e -> e.ts_us)")))
    perUser
      .agg(count(lit(1)).as("n0"), count(col("s1")).as("n1"),
        count(col("s2")).as("n2"), count(col("s3")).as("n3"))
      .select(explode(array(
        struct(lit(1L).as("step"), lit("view").as("step_name"),
          col("n1").as("n_users"), expr("n1 * 1000 div n0").as("reach_permille")),
        struct(lit(2L).as("step"), lit("click").as("step_name"),
          col("n2").as("n_users"), expr("n2 * 1000 div n0").as("reach_permille")),
        struct(lit(3L).as("step"), lit("purchase").as("step_name"),
          col("n3").as("n_users"), expr("n3 * 1000 div n0").as("reach_permille"))))
        .as("r"))
      .select(col("r.step").as("step"), col("r.step_name").as("step_name"),
        col("r.n_users").as("n_users"), col("r.reach_permille").as("reach_permille"))
  }

  /** Weekly retention cohorts: users grouped by their first active week,
    * activity counted per week offset k — the cohort table behind every
    * retention curve. All arithmetic is integer micros (week = ts_us div
    * 7·86400·10⁶), so the result is engine- and partitioning-exact.
    *
    * Scale shape: (user, week) activity dedups in one exchange keyed by
    * exactly those two longs; the cohort assignment is a user-keyed
    * aggregate co-partitioned with the activity join; the final rollup is
    * dimension-bounded (weeks × offsets). Nothing carries more than two
    * longs per row through any exchange.
    */
  def qRetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val evw = raw
      .select(col("user_id"), Tables.tsMicros(raw).as("ts_us"))
      .select(col("user_id"), expr("ts_us div 604800000000").as("wk"))
      .distinct()
    val w0 = evw.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    val cohortSize = w0.groupBy("cohort_wk").agg(count(lit(1)).as("n_cohort"))
    evw.join(w0, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("k"))
      .agg(count(lit(1)).as("n_active"))
      .join(cohortSize, "cohort_wk")
      .withColumn("retention_permille", expr("n_active * 1000 div n_cohort"))
  }

  /** Manual pivot (conditional aggregation) over event types — the demux the
    * reference hand-codes as six parallel scans (S2) collapses into one scan
    * with per-type conditional aggregates.
    */
  def qEventPivot(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def cnt(t: String) = sum(when(col("event_type") === t, 1).otherwise(0)).as(s"${t}_cnt")
    def amt(t: String) = sum(when(col("event_type") === t, col("value").cast("decimal(12,2)"))
      .otherwise(lit(0).cast("decimal(12,2)"))).cast("double").as(s"${t}_sum")
    ev.groupBy("user_id").agg(
      cnt("click"), amt("click"), cnt("view"), amt("view"),
      cnt("purchase"), amt("purchase"), cnt("signup"), amt("signup"),
      cnt("error"), amt("error"))
  }

  /** JSON extraction (the reference round-trips ALL state through JSON,
    * SURVEY §2.6): parse `props.k`, bucket, aggregate.
    */
  def qJsonBucket(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // from_json with an explicit schema over get_json_object: one typed
    // parse instead of a path query per row (~1.7× faster measured)
    ev.select(from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .getField("k").as("k"),
        col("value").cast("decimal(12,2)").as("val"))
      .groupBy((col("k") % 10).cast("long").as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("val")).cast("double").as("sum_value"))
  }

  /** Exact percentiles per group. Only dyadic quantiles (0.25/0.5/0.75):
    * the linear interpolation `a + (b-a)·g` is then exact in binary fp for
    * the small-integer-valued quantity column, so Spark's `percentile` and
    * DuckDB's `quantile_cont` agree bit-for-bit. Non-dyadic p (0.9, 0.99)
    * would round differently in the last ulp between engines.
    */
  def qQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("median"),
        expr("percentile(l_quantity, 0.75)").as("q75"),
        count(lit(1)).as("n"))
  }

  /** EXISTS + HAVING subquery (J2 family): order statuses of orders with at
    * least 5 line items — left-semi against a filtered aggregate.
    */
  def qExistsHaving(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") >= 5)
      .select("l_orderkey")
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec("o_totalprice")).cast("double").as("total_price"))
  }

  /** GROUPING SETS through the SQL surface (the driver contract includes
    * SQL entry points; `spark.sql` over a registered view is the idiomatic
    * route — grouping-set plans expand to the same Expand operator ROLLUP
    * uses).
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_gs")
    spark.sql(
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
  }

  /** Moment-based variance/stddev from exact decimal sums: Σx and Σx² are
    * DECIMAL (order-independent), the final combination is a handful of
    * deterministic double ops — unlike Welford-style `stddev_samp`, whose
    * accumulation order differs per engine and partitioning.
    */
  def qValueStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value").cast("decimal(12,2)").as("v"))
    ev.groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).cast("double").as("sum_v"),
        sum(col("v") * col("v")).cast("double").as("sum_v2"))
      .select(col("event_type"), col("n"), col("sum_v"), col("sum_v2"),
        (col("sum_v") / col("n")).as("mean"),
        sqrt((col("sum_v2") - col("sum_v") * col("sum_v") / col("n")) /
          (col("n") - 1)).as("stddev"))
  }

  /** Scalar string functions (SURVEY §2.6): the reference's key-construction
    * idioms (concat/lower/substring) as a query.
    */
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    part.filter(col("p_name").like("%e%"))
      .select(
        concat(lower(col("p_brand")), lit(":"), upper(substring(col("p_type"), 1, 3))).as("key"),
        length(col("p_name")).as("name_len"),
        col("p_size"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("p_size")).cast("long").as("total_size"),
        max("name_len").cast("long").as("max_name_len"))
  }

  /** Full CUBE over (returnflag, ship year) — all four grouping combinations
    * in one pass. Spark plans cube as a single Expand + hash agg: the scan is
    * read once and each row fans into 4 grouping sets map-side, so the
    * shuffle carries pre-aggregated partials per set, not 4× the input.
    */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.select(col("l_returnflag"),
        year(col("l_shipdate")).cast("long").as("ship_year"),
        dec("l_extendedprice").as("price"), dec("l_quantity").as("qty"))
      .cube("l_returnflag", "ship_year")
      .agg(sum(col("price")).cast("double").as("sum_price"),
        sum(col("qty")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("ship_year"), lit(-1L)).as("ship_year"),
        col("sum_price"), col("sum_qty"), col("n_rows"))
  }

  /** Per-type daily revenue with lag delta and a 7-row trailing moving
    * average. Aggregate-first discipline: the windows run over the ~150-row
    * daily series (|types| × |days|), never the raw events — at 100 TB the
    * window input is still tiny. Delta is computed in DECIMAL (exact) and
    * cast at the edge; the moving average divides two exact window values.
    */
  def qDailyDelta(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val ev = raw.select(col("event_type"),
      Tables.tsMicros(raw).as("ts_us"),
      col("value").cast("decimal(12,2)").as("val"))
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
        col("val"))
    val daily = ev.groupBy("event_type", "day")
      .agg(sum(col("val")).as("rev_dec"), count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val w7 = w.rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("prev_dec", lag(col("rev_dec"), 1).over(w))
      .withColumn("ma7",
        sum(col("rev_dec")).over(w7).cast("double") / count(lit(1)).over(w7))
      .select(col("event_type"), col("day"), col("n_events"),
        col("rev_dec").cast("double").as("revenue"),
        col("prev_dec").cast("double").as("prev_revenue"),
        (col("rev_dec") - col("prev_dec")).cast("double").as("delta"),
        col("ma7"))
  }

  /** Set operations (INTERSECT / EXCEPT) — absent from the reference
    * (SURVEY §2.6), native in Spark: customer sets by two independent
    * predicates, compared as sets. Spark plans INTERSECT as a distinct
    * hash aggregation + left-semi join and EXCEPT as + left-anti, shuffling
    * only the distinct custkeys (8 bytes/row) — never the orders.
    */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val early = ord.filter(col("o_orderdate") < d("1998-01-01"))
      .select("o_custkey").distinct()
    val big = ord.filter(col("o_totalprice") > 300000.0)
      .select("o_custkey").distinct()
    def counted(df: DataFrame, tag: String) =
      df.agg(count(lit(1)).as("n")).select(lit(tag).as("set_op"), col("n"))
    counted(early.intersect(big), "early_and_big")
      .unionByName(counted(early.except(big), "early_only"))
      .unionByName(counted(big.except(early), "big_only"))
  }

  /** Non-equi range (band) join — a theta join the reference cannot express:
    * each order lands in a price band via `lo <= price < hi`. The band dim
    * is 5 rows, so Spark plans a BroadcastNestedLoopJoin: every executor
    * holds the bands and classifies its partition locally — zero shuffle of
    * the facts, O(|orders| × 5) comparisons. At 100 TB an equi-joinable
    * bucketing (floor(price/width)) would be preferred for fine bands; for
    * a handful of bands broadcast NLJ is already the right plan.
    */
  def qRangeBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val bands = spark.createDataFrame(Seq(
      ("p0_100k", 0.0, 100000.0), ("p100_200k", 100000.0, 200000.0),
      ("p200_300k", 200000.0, 300000.0), ("p300_400k", 300000.0, 400000.0),
      ("p400k_up", 400000.0, Double.MaxValue)))
      .toDF("band", "lo", "hi")
    ord.join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec("o_totalprice")).cast("double").as("total_price"),
        min(dec("o_totalprice")).cast("double").as("min_price"),
        max(dec("o_totalprice")).cast("double").as("max_price"))
  }

  /** HLL sketch cardinality (approx_count_distinct) — cross-engine hash
    * equality on the raw estimate is impossible by construction (DuckDB's
    * HLL is a different sketch), so the gated output carries the CLAIM
    * instead: the exact count plus `within_bound`, computed in-query from
    * the real estimate (|est − exact| ≤ 15% + 3 — 3× the 5% rsd, and HLL is
    * order-independent so the estimate is deterministic). The oracle checks
    * the exact side and the constant-true claim; the spec additionally
    * asserts the tighter 5% rsd. At 100 TB the sketch is THE distinct-count
    * operator: a few KB per group, merged associatively, where exact
    * distinct shuffles every key.
    */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id")).as("est"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * 0.15 + 3.0).as("within_bound"))
  }

  /** Correlated scalar subquery: orders priced above their own customer's
    * average. Catalyst decorrelates the subquery into an aggregate + join
    * (DecorrelateInnerQuery) — the per-row "loop" the imperative form
    * implies never exists in the plan. The comparison is DECIMAL-exact:
    * avg = sum/count both engines compute identically from exact inputs.
    */
  def qCorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    // expressed through the SQL surface — the idiomatic route for a
    // correlated subquery; same text runs in DuckDB modulo the avg form
    ord.createOrReplaceTempView("orders_v")
    spark.sql("""
      SELECT o_custkey, COUNT(*) AS n_above,
        CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_above
      FROM orders_v o
      WHERE CAST(o_totalprice AS DECIMAL(12,2)) * (
          SELECT COUNT(*) FROM orders_v i WHERE i.o_custkey = o.o_custkey)
        > (SELECT SUM(CAST(o_totalprice AS DECIMAL(12,2))) FROM orders_v i
           WHERE i.o_custkey = o.o_custkey)
      GROUP BY o_custkey""")
  }

  /** RANGE-frame window: 30-day trailing revenue per order date. Unlike the
    * ROWS frames elsewhere, the frame is defined on the VALUE of the sort
    * key (epoch days), so gaps in the calendar shrink the window. Runs on
    * the per-day aggregate (aggregate-first), all in DECIMAL.
    */
  def qTrailing30d(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val daily = ord
      .groupBy(expr("unix_timestamp(o_orderdate) div 86400").as("day"))
      .agg(sum(dec("o_totalprice")).as("rev_dec"), count(lit(1)).as("n_orders"))
    daily
      .withColumn("trail30_dec", sum(col("rev_dec")).over(
        Window.orderBy("day").rangeBetween(-29, Window.currentRow)))
      .select(col("day"), col("n_orders"),
        col("rev_dec").cast("double").as("revenue"),
        col("trail30_dec").cast("double").as("trailing_30d"))
  }

  /** Sketch percentiles (approx_percentile) — like [[qApproxDistinct]], the
    * raw estimate is engine-specific, so the gated output carries the exact
    * percentiles plus per-percentile `within_bound` claims computed in-query:
    * accuracy=1000 guarantees rank error ≤ n/1000, so the estimate must lie
    * between the exact percentiles at p ± 0.005 (5× slack; holds for groups
    * ≥ ~750 rows — the smallest gated group is ~1.5k at sf0.001). At 100 TB
    * this replaces `quantiles`: the exact form materializes every group's
    * values, the sketch is a bounded-size mergeable summary with one
    * map-side combine.
    */
  def qApproxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("ex"),
        expr("percentile(l_quantity, array(0.245, 0.495, 0.745))").as("lo"),
        expr("percentile(l_quantity, array(0.255, 0.505, 0.755))").as("hi"),
        expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 1000)")
          .as("est"))
      .select(col("l_returnflag"), col("n"),
        col("ex")(0).as("q25"), col("ex")(1).as("median"), col("ex")(2).as("q75"),
        (col("est")(0) >= col("lo")(0) && col("est")(0) <= col("hi")(0))
          .as("q25_within_bound"),
        (col("est")(1) >= col("lo")(1) && col("est")(1) <= col("hi")(1))
          .as("median_within_bound"),
        (col("est")(2) >= col("lo")(2) && col("est")(2) <= col("hi")(2))
          .as("q75_within_bound"))
  }

  /** Customer spend deciles — NTILE(10) semantics over a total order,
    * computed WITHOUT a single-partition window (round 1 used
    * `Window.orderBy(...)`, which funnels every customer row through ONE
    * task — the classic global-window scale-killer).
    *
    * Distributed exact rank, the standard two-phase plan:
    *  1. range-partition on the sort key (spend desc, custkey) — globally
    *     ordered, disjoint partitions;
    *  2. row_number within each range partition (bounded partition-local
    *     sort, P-way parallel);
    *  3. global rank = partition offset + local row number, where the P
    *     per-partition counts are METADATA (one tiny aggregate, collected
    *     like AQE stats / RangePartitioner samples — never row data);
    *  4. decile from the exact NTILE fill rule: with n rows, the first
    *     n%10 buckets take ceil(n/10) rows, the rest floor(n/10).
    * Result is independent of the partition count — boundaries shift ranks
    * between partitions but offset+local is the same total order.
    */
  def qCustomerDeciles(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val spend = ord.groupBy("o_custkey")
      .agg(sum(dec("o_totalprice")).as("spend_dec"))
    val parts = spark.sparkContext.defaultParallelism
    // materialize: the counts job and the main query MUST see the same
    // range boundaries (the range sampler reseeds per job — unpinned, the
    // offset map could describe a different partitioning than the one
    // ranked). localCheckpoint, NOT a transient cache: a cached frame can
    // be unpersisted-and-recomputed, and recompute of this subtree is not
    // semantics-preserving (ADVICE r12) — a checkpoint leaf cannot
    // recompute, so the pid/offset pairing is immutable for the frame's
    // lifetime; blocks reclaim when the reference drops
    val ranged = spend
      .repartitionByRange(parts, col("spend_dec").desc, col("o_custkey"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val local = ranged.withColumn("lrn", row_number().over(
      Window.partitionBy("pid").orderBy(col("spend_dec").desc, col("o_custkey"))))
    // P rows of (pid, count): metadata, not data — same category as the
    // range sampler's own driver-side boundary collect
    val counts = ranged.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .collect().map(rw => (rw.getInt(0), rw.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsetRows = counts.map { case (pid, c) => val o = acc; acc += c; (pid, o) }
    val n = acc
    val offsets = broadcast(
      spark.createDataFrame(offsetRows.toSeq).toDF("pid", "offset"))
    val base = n / 10; val r = n % 10
    val rk = (col("offset") + col("lrn")).cast("long")
    // NTILE fill rule; ceil(a/b) via floor of a double division — exact for
    // counts < 2^52, far beyond any customer cardinality
    val decile =
      if (base == 0) rk // fewer rows than buckets: row k → bucket k
      else when(rk <= lit(r * (base + 1)),
          floor((rk + base) / lit((base + 1).toDouble)))
        .otherwise(lit(r) + floor((rk - r * (base + 1) + base - 1) / lit(base.toDouble)))
    local.join(offsets, "pid")
      .withColumn("decile", decile.cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend_dec")).cast("double").as("total_spend"),
        min(col("spend_dec")).cast("double").as("min_spend"),
        max(col("spend_dec")).cast("double").as("max_spend"))
  }
}
