package graft

/** Per-process Spark SQL warehouse location, shared by every entry point
  * (Bench / Verify / BenchOne / Serve / Explain).
  *
  * Per-PROCESS on purpose: index writers (`DedupOps.clearIndexLayout` and
  * its BM25/PQ twins) drop tables and delete their managed directories by
  * name, so two concurrent graft processes sharing one warehouse — the
  * documented 3-way parallel gate, or a Bench running alongside a Verify —
  * would race (one deletes/rewrites files the other is mid-read on),
  * yielding flaky failures or a corrupt probe (ADVICE r8). A PID suffix
  * gives every process its own namespace; the in-memory catalog is already
  * per-process, so nothing ever shared the files on purpose. Stale dirs in
  * /tmp are reaped by the OS tmp cleaner.
  */
object Warehouse {
  val dir: String = s"/tmp/graft-warehouse-${ProcessHandle.current().pid()}"
}
