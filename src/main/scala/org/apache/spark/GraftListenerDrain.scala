package org.apache.spark

/** Bench-only accessor into the `private[spark]` listener bus: quiesce the
  * async event queues DETERMINISTICALLY between measured reps.
  * `graft.IndexBench`'s byte/CPU ledger is listener-fed
  * (QueryExecutionListener for file-scan bytes, SparkListener task metrics
  * for CPU/shuffle), and both ride the async LiveListenerBus — without a
  * drain, straggler events from a warm-up rep land inside the next
  * measured window and inflate multi-action probe rows past their
  * du-verified layout sizes (verdict r12 item 3: `cluster_delta_warm`
  * "reading" more file bytes than `cluster_fresh`, physically absurd for a
  * warm memoized read). A fixed sleep only shrinks the race; an empty bus
  * removes it. Production code never touches this — it exists for the
  * measurement harness alone.
  */
object GraftListenerDrain {
  /** Block until every queued listener event has been dispatched, or
    * `timeoutMillis` passes (TimeoutException).
    */
  def drain(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
