package graft

/** Smoke over the whole driver contract: every registered query runs at
  * sf0.001, `entry` returns rows, and every query has either an oracle or a
  * documented reason not to.
  */
class QuerySurfaceSpec extends SparkSpec {

  test("entry (flagship orderbook) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, sfTiny).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}") }
    }
    assert(failures.isEmpty, s"queries failed:\n${failures.mkString("\n")}")
  }

  test("oracle coverage: every query has oracle SQL") {
    // sketch-based ops can't hash-match a different engine's sketch; each
    // member here must carry its own error-bound test in this suite
    val sketchOnly = Set("approx_distinct", "approx_quantiles")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- sketchOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("approx_distinct: HLL estimate within 5% of exact per group") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("approx_distinct")(spark, sfTiny)
      .select("event_type", "approx_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.events(spark, sfTiny)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.05,
        s"$k: approx $a vs exact $n exceeds 5% rsd")
    }
  }

  test("approx_quantiles: sketch percentiles within rank tolerance of exact") {
    val approx = SparkEntry.queries("approx_quantiles")(spark, sfTiny).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = SparkEntry.queries("quantiles")(spark, sfTiny).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (e25, e50, e75)) =>
      val (a25, a50, a75) = approx(k)
      // accuracy=1000 → rank error ≤ n/1000; quantity spans ~[1,50], so a
      // loose value tolerance of 1.0 covers it comfortably
      assert(math.abs(a25 - e25) <= 1.0 && math.abs(a50 - e50) <= 1.0 &&
        math.abs(a75 - e75) <= 1.0, s"$k: approx $approx vs exact $exact")
    }
  }

  test("query outputs are deterministic across runs") {
    // re-running a representative subset must give identical collected rows
    Seq("orderbook", "cosine_topk", "minhash_lsh", "sessionize").foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sfTiny).collect().map(_.toString).sorted.toSeq
      val b = fn(spark, sfTiny).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$name nondeterministic across runs")
    }
  }
}
