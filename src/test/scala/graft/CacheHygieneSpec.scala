package graft

/** Cache hygiene (verdict r11 item 3): session-lifetime CacheManager
  * entries tax every later query's plan canonicalization — the exact
  * mechanism behind the r10 `ivf_recall` regression — and serve stale warm
  * blocks to live-form measurements (the r11 `bm25_live` bytes artifact).
  * The discipline: intra-query pins go through
  * [[graft.functions.TransientCache]] (released by whoever executed the
  * frame), and every deliberate long-lived view memo has an invalidation
  * hook that releases its storage. This spec proves the discipline is
  * COMPLETE: a full sweep of every gated query, followed by the transient
  * release and the memo invalidation hooks, leaves the CacheManager empty
  * — any surviving entry is a leak with no owner.
  */
class CacheHygieneSpec extends SparkSpec {

  test("full gated-query sweep + scoped releases leave the CacheManager empty") {
    // start from a clean slate — suites share the session, and this test
    // owns the global cache state for its duration
    spark.catalog.clearCache()
    graft.functions.TransientCache.release(spark)

    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfTiny).collect()
      catch { case e: Throwable =>
        fail(s"query $name failed during the hygiene sweep: ${e.getMessage}")
      }
      // the Verify/IndexBench discipline: release the query's transient
      // scope once its frame has been executed
      graft.functions.TransientCache.release(spark)
    }

    // drop the deliberate view memos through their hooks (cluster views,
    // delta bases, IVF assignments, order-book fold, per-dir table plans)
    graft.functions.DedupOps.invalidateDerived(sfTiny)
    graft.operators.BookQueries.invalidateViewCache()

    assert(spark.sharedState.cacheManager.isEmpty,
      "CacheManager entries survived a full sweep + release: some query " +
        "form pins storage outside the TransientCache scope and the memo " +
        "hooks — a session-lifetime leak")
  }
}
