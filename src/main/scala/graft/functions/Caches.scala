package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-key lazily-computed memo cell: the bounded memo maps key → cell
  * under the MAP's monitor (cheap), while the expensive COMPUTE runs under
  * the CELL's own monitor — so a cold build of one (session, dir) no longer
  * serializes cluster-view reads of every other key behind it (ADVICE r11;
  * the old pattern ran the full LSH edge materialization + fixpoint while
  * holding the shared cache monitor).
  *
  * Eviction discipline (ADVICE r12): `evict()` NEVER blocks — it flags the
  * cell and releases only an already-published value lock-free, so an
  * eviction triggered from inside the map monitor (removeEldestEntry)
  * cannot stall other keys' readers behind this key's in-flight build, and
  * the only lock order anywhere is map → cell (a memo body that re-enters
  * a memo cannot deadlock on a cell it doesn't own). A cell evicted
  * MID-compute is released by `force` on completion instead of leaking its
  * pinned storage (the value is still returned to the caller that computed
  * it — unpersist only unpins, it never invalidates). `release` fires at
  * most ONCE per value (CAS-guarded), so it need not be idempotent.
  */
private[graft] final class LazyCell[A](body: () => A, release: A => Unit) {
  @volatile private[this] var evicted = false
  // published OUTSIDE the cell monitor so evict() can read it lock-free;
  // the monitor only serializes the compute itself
  private[this] val computed =
    new java.util.concurrent.atomic.AtomicReference[Option[A]](None)
  private[this] val released =
    new java.util.concurrent.atomic.AtomicBoolean(false)
  def force: A = {
    val a = synchronized {
      computed.get() match {
        case Some(v) => v
        case None => val v = body(); computed.set(Some(v)); v
      }
    }
    // Dekker pairing with evict(): force publishes `computed` then reads
    // `evicted`; evict() writes `evicted` then reads `computed` — both are
    // volatile/atomic, so at least one side observes the other and the
    // CAS in releaseOnce collapses the overlap to a single release.
    if (evicted) releaseOnce(a)
    a
  }
  def evict(): Unit = {
    evicted = true
    computed.get().foreach(releaseOnce)
  }
  private def releaseOnce(a: A): Unit =
    if (released.compareAndSet(false, true)) release(a)
}

/** Bounded insertion-ordered memo (the shared discipline of the cluster /
  * delta-base / IVF view caches): at most `max` values stay live, eviction
  * and invalidation release a value's pinned storage via `release`.
  * Lock order is map → cell only (get-or-create under the map monitor,
  * compute under the cell monitor), so builders and readers of different
  * keys never contend — and because [[LazyCell.evict]] is non-blocking,
  * the map-monitor critical sections (insert-with-eviction, invalidate)
  * never wait on any cell monitor either (ADVICE r12: the old evict
  * blocked on an in-flight build, stalling every other key's getOrBuild
  * behind it whenever an insert overflowed `max`).
  */
private[graft] final class BoundedMemo[K, A](max: Int, release: A => Unit) {
  private val map = new java.util.LinkedHashMap[K, LazyCell[A]]() {
    override def removeEldestEntry(e: java.util.Map.Entry[K, LazyCell[A]]): Boolean = {
      val evict = size > max
      if (evict) e.getValue.evict()
      evict
    }
  }
  def getOrBuild(k: K)(body: => A): A = {
    val cell = map.synchronized {
      val hit = map.get(k)
      if (hit != null) hit
      else {
        val c = new LazyCell[A](() => body, release)
        map.put(k, c)
        c
      }
    }
    cell.force
  }
  def invalidate(): Unit = map.synchronized {
    map.forEach((_, c) => c.evict())
    map.clear()
  }
}

/** Intra-query cache scope (verdict r11 item 3): live query forms pin
  * multi-consumer subtrees with `TransientCache(df)` instead of a bare
  * `.cache()`, which REGISTERS the pin so whoever executed the returned
  * frame (Verify after each gated query, IndexBench between reps, a spec,
  * or any caller) can release every intra-query pin in one call. A bare
  * `.cache()` left session-lifetime CacheManager entries that (a) tax
  * every later query's plan canonicalization — the exact mechanism behind
  * the r10 `ivf_recall` regression — and (b) serve stale warm blocks to
  * any later measurement of a "live" form (the r11 `bm25_live` bytes
  * artifact: a flat 140–164 KB from sf0.1 to sf10 for a live text scan).
  *
  * Deliberate long-lived views (memoized cluster state, IVF assignment,
  * the order-book fold) are NOT transients — they live in [[BoundedMemo]]s
  * with eviction/invalidation hooks instead.
  */
object TransientCache {
  private val live = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]()

  /** Cache `df` (MEMORY_AND_DISK, the Dataset default — spills instead of
    * recomputing per consumer) and register it with its session's scope.
    */
  def apply(df: DataFrame): DataFrame = {
    df.cache()
    live.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(df)
    df
  }

  /** Unpersist every transient pinned since the last release (non-blocking:
    * block cleanup proceeds async). Contract (ADVICE r12): call this only
    * AFTER the consuming query of every registered frame has fully
    * executed. An unpersisted-but-still-referenced frame silently
    * recomputes, and recompute is NOT always semantics-preserving — a
    * nondeterministic subtree (repartitionByRange resamples boundaries per
    * job, shuffles resend in a different order under `spark_partition_id`
    * or `monotonically_increasing_id`) can recompute to a DIFFERENT value
    * mid-query and corrupt results. Correctness-load-bearing
    * nondeterministic pins must not be transients at all — materialize
    * them with `localCheckpoint()` instead (see `Olap.qCustomerDeciles`).
    */
  def release(spark: SparkSession): Unit = {
    val q = live.remove(spark)
    if (q != null) q.forEach(_.unpersist(false))
  }
}
