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
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("COVERAGE.md header count matches the registered query surface (doc drift guard)") {
    // round-8 verdict: the doc said "92" while the surface was 112. Pin the
    // header's "<N> gated queries" to SparkEntry.queries.size so the doc
    // cannot drift silently again.
    val header = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")),
      java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.take(10).mkString(" ")
    val stated = "(\\d+) gated queries".r.findFirstMatchIn(header)
      .map(_.group(1).toInt)
    assert(stated.contains(SparkEntry.queries.size),
      s"COVERAGE.md header says $stated gated queries; " +
        s"SparkEntry.queries has ${SparkEntry.queries.size}")
  }

  test("approx_distinct: claim holds and HLL estimate is within 5% of exact") {
    import org.apache.spark.sql.functions._
    // the gated claim (15% + 3 slack) must be all-true…
    val gated = SparkEntry.queries("approx_distinct")(spark, sfTiny).collect()
    assert(gated.forall(_.getAs[Boolean]("within_bound")),
      s"gated within_bound claim failed: ${gated.mkString(",")}")
    // …and the raw sketch also meets the tighter documented 5% rsd
    val both = graft.sources.Tables.events(spark, sfTiny)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"),
        approx_count_distinct(col("user_id")).as("a"))
      .collect()
    both.foreach { r =>
      val (n, a) = (r.getAs[Long]("n"), r.getAs[Long]("a"))
      assert(math.abs(a - n).toDouble / n <= 0.05,
        s"${r.getString(0)}: approx $a vs exact $n exceeds 5% rsd")
    }
  }

  test("approx_topk: MG guarantee holds on a crafted stream and on the gated query") {
    import graft.functions.MisraGriesAgg
    // crafted stream: one heavy item (40%), the rest spread thin
    val n = 2000
    val stream = (0 until n).map(i =>
      if (i % 5 < 2) "heavy" else s"t${i % 97}")
    val k = 16
    val agg = new MisraGriesAgg(k)
    // split into 8 "partitions", reduce each, merge pairwise in a skewed
    // order — the guarantee must not depend on merge shape
    val parts = stream.grouped(n / 8).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val sketch = parts.reduceLeft(agg.merge)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(sketch.size <= k)
    sketch.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overestimated: $est > ${exact(t)}")
    }
    exact.foreach { case (t, c) =>
      val est = sketch.getOrElse(t, 0L)
      assert((c - est) * (k + 1) <= n, s"$t bound violated: $est vs $c")
    }
    // an item heavier than n/(k+1) can never be evicted to zero
    assert(sketch.getOrElse("heavy", 0L) > 0)
    // gated claim: all-true at sfTiny
    val gated = SparkEntry.queries("approx_topk")(spark, sfTiny).collect()
    assert(gated.length == 5)
    assert(gated.forall(_.getAs[Boolean]("within_bound")),
      s"gated MG claim failed: ${gated.mkString(",")}")
  }

  test("approx_quantiles: claims hold and sketch is within value tolerance") {
    val gated = SparkEntry.queries("approx_quantiles")(spark, sfTiny).collect()
    gated.foreach { r =>
      assert(r.getAs[Boolean]("q25_within_bound") &&
        r.getAs[Boolean]("median_within_bound") &&
        r.getAs[Boolean]("q75_within_bound"),
        s"gated rank-bound claim failed: $r")
    }
    // value-level tolerance against the exact gate (quantity spans ~[1,50]):
    // accuracy=1000 → rank error ≤ n/1000 → value error ≤ 1.0 here
    import org.apache.spark.sql.functions._
    val approx = graft.sources.Tables.lineitem(spark, sfTiny)
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 1000)")
        .as("e"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Any](1).map(_.toString.toDouble))
      .toMap
    val exact = SparkEntry.queries("quantiles")(spark, sfTiny).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (e25, e50, e75)) =>
      val Seq(a25, a50, a75) = approx(k)
      assert(math.abs(a25 - e25) <= 1.0 && math.abs(a50 - e50) <= 1.0 &&
        math.abs(a75 - e75) <= 1.0, s"$k: approx ${approx(k)} vs exact $exact")
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
