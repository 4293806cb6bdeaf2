package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BoundedMemo, LazyCell}

/** Stress coverage for the LazyCell/BoundedMemo concurrency contract
  * (verdict r13 item 6: the ADVICE-r12 eviction rework rests on a Dekker
  * pairing argument — `force` publishes `computed` then reads `evicted`,
  * `evict` writes `evicted` then reads `computed`, and the CAS collapses
  * the overlap to a single release — previously verified by inspection
  * only). Pure JVM, no SparkSession: the release callback counts stand in
  * for unpersist.
  *
  * Asserted invariants, each across many racing threads and repetitions:
  *  (a) no release is DROPPED — every value that was ever computed for an
  *      evicted/invalidated key is released exactly once, even when the
  *      eviction lands mid-compute;
  *  (b) no value is released TWICE (the CAS guard), so `release` need not
  *      be idempotent;
  *  (c) an eviction never blocks another key's build — the map monitor is
  *      never held across a compute, so a deliberately slow build on one
  *      key cannot stall a concurrent build of a different key.
  */
class CachesStressSpec extends AnyFunSuite {

  private def await(threads: Seq[Thread]): Unit = {
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(!threads.exists(_.isAlive), "stress threads deadlocked")
  }

  test("LazyCell: evict racing force releases exactly once, value still returned") {
    for (rep <- 1 to 500) {
      val released = new java.util.concurrent.atomic.AtomicInteger(0)
      val built = new java.util.concurrent.atomic.AtomicInteger(0)
      val cell = new LazyCell[String](
        () => { built.incrementAndGet(); "v" + rep },
        _ => released.incrementAndGet())
      val got = new java.util.concurrent.atomic.AtomicReference[String]()
      val barrier = new java.util.concurrent.CyclicBarrier(3)
      await(Seq(
        new Thread(() => { barrier.await(); got.set(cell.force) }),
        new Thread(() => { barrier.await(); cell.evict() }),
        new Thread(() => { barrier.await(); cell.evict() })))
      assert(built.get() == 1, "body ran more than once")
      assert(got.get() == "v" + rep,
        "force did not return the computed value to its caller")
      // the cell was evicted in every interleaving, so the one computed
      // value must be released exactly once — a drop leaks pinned
      // storage, a double release breaks non-idempotent release hooks
      assert(released.get() == 1,
        s"rep $rep: expected exactly one release, saw ${released.get()}")
    }
  }

  test("BoundedMemo: concurrent getOrBuild/invalidate drops no release and doubles none") {
    for (rep <- 1 to 50) {
      val released =
        java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val doubled = new java.util.concurrent.atomic.AtomicInteger(0)
      val minted = new java.util.concurrent.atomic.AtomicInteger(0)
      // every built value gets a unique id; release records it and flags
      // a repeat — exhaustive per-VALUE accounting, not per-key
      val memo = new BoundedMemo[Int, Int](max = 4,
        v => if (!released.add(v)) doubled.incrementAndGet())
      val live = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          val rnd = new scala.util.Random(rep * 100 + t)
          for (_ <- 0 until 200) {
            if (rnd.nextInt(20) == 0) memo.invalidate()
            else {
              val k = rnd.nextInt(12) // 12 keys > max=4: constant eviction
              val v = memo.getOrBuild(k) { minted.incrementAndGet() }
              live.add(v)
            }
          }
        })
      }
      await(threads)
      memo.invalidate() // final sweep: every still-cached value releases
      val mintedAll = (1 to minted.get()).toSet
      val missing = mintedAll.filterNot(released.contains)
      assert(doubled.get() == 0,
        s"rep $rep: ${doubled.get()} values released twice")
      assert(missing.isEmpty,
        s"rep $rep: ${missing.size} built values never released " +
          s"(leaked pins): ${missing.take(5)}")
    }
  }

  test("BoundedMemo: eviction of a slow in-flight build never blocks another key") {
    val memo = new BoundedMemo[Int, Int](max = 1, _ => ())
    val slowStarted = new java.util.concurrent.CountDownLatch(1)
    val slowRelease = new java.util.concurrent.CountDownLatch(1)
    val fastDone = new java.util.concurrent.CountDownLatch(1)
    val slow = new Thread(() => {
      memo.getOrBuild(0) {
        slowStarted.countDown()
        // hold the CELL monitor (not the map monitor) for up to 30 s
        slowRelease.await(30, java.util.concurrent.TimeUnit.SECONDS)
        0
      }; ()
    })
    slow.start()
    slowStarted.await(10, java.util.concurrent.TimeUnit.SECONDS)
    // key 1 inserts while key 0's build is in flight; max=1 forces the
    // map to evict key 0's cell from inside the map monitor — with a
    // blocking evict this deadlocked behind the slow build
    val fast = new Thread(() => {
      assert(memo.getOrBuild(1)(42) == 42)
      fastDone.countDown()
    })
    fast.start()
    val unblocked = fastDone.await(5, java.util.concurrent.TimeUnit.SECONDS)
    slowRelease.countDown()
    slow.join(35000); fast.join(5000)
    assert(unblocked,
      "eviction of an in-flight build stalled another key's getOrBuild")
  }
}
