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
