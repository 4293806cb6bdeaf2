package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.OrderFold
import graft.operators.OrderFold.Ev

/** Property-style invariants of the fold (SURVEY §5.3), exercised over 500
  * seeded random event logs — pure Scala, no Spark session needed.
  */
class FoldPropertySpec extends AnyFunSuite {

  private def genLog(rnd: scala.util.Random): List[Ev] = {
    val n = rnd.nextInt(40)
    List.tabulate(n) { i =>
      Ev("p", 1L, i.toLong, rnd.nextInt(8), rnd.nextLong(50000L) + 1, i.toLong * 1000)
    }
  }

  private def logs: Seq[List[Ev]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(500)(genLog(rnd))
  }

  test("prefix-incrementality: foldFrom(foldFrom(∅,a),b) == fold(a++b) at every cut") {
    logs.foreach { log =>
      (0 to log.size).foreach { cut =>
        val (a, b) = log.splitAt(cut)
        assert(OrderFold.foldFrom(OrderFold.foldFrom(None, a), b) == OrderFold.fold(log),
          s"mismatch at cut=$cut for log=$log")
      }
    }
  }

  test("invariants: remaining ≥ 0; active ⟺ ¬cancelled ∧ remaining > 0") {
    logs.foreach { log =>
      OrderFold.fold(log).foreach { s =>
        assert(s.remainingCents >= 0)
        assert(s.filledCents >= 0)
        assert(s.active == (!s.cancelled && s.remainingCents > 0))
        assert(s.remainingCents == math.max(s.amountCents - s.filledCents, 0L))
      }
    }
  }

  test("fold ignores pre-create noise") {
    logs.foreach { log =>
      val firstCreate = log.indexWhere(_.action <= 3)
      if (firstCreate >= 0)
        assert(OrderFold.fold(log) == OrderFold.fold(log.drop(firstCreate)))
      else
        assert(OrderFold.fold(log).isEmpty)
    }
  }

  test("empty and no-create logs fold to None") {
    assert(OrderFold.fold(Nil).isEmpty)
    assert(OrderFold.fold(List(Ev("p", 1, 0, 4, 100, 0), Ev("p", 1, 1, 6, 0, 0))).isEmpty)
  }

  test("Misra-Gries: est ≤ true and true − est ≤ n/(k+1) under random streams and merge shapes") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val k = 2 + rnd.nextInt(30)
      val n = 1 + rnd.nextInt(3000)
      // skewed alphabet: small vocab + a zipf-ish hot head
      val vocab = 1 + rnd.nextInt(150)
      val stream = Seq.fill(n) {
        if (rnd.nextInt(3) == 0) "hot" else s"w${rnd.nextInt(vocab)}"
      }
      val agg = new graft.functions.MisraGriesAgg(k)
      // random partitioning into 1..8 chunks, random fold order of merges
      val chunks = {
        val nc = 1 + rnd.nextInt(8)
        val cuts = (Seq(0, n) ++ Seq.fill(nc - 1)(rnd.nextInt(n + 1)))
          .distinct.sorted
        cuts.zip(cuts.tail).map { case (a, b) => stream.slice(a, b) }
      }
      val partials = rnd.shuffle(chunks.map(_.foldLeft(agg.zero)(agg.reduce)))
      val sketch = partials.reduceLeft(agg.merge)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(sketch.size <= k, s"k=$k overflowed: ${sketch.size}")
      sketch.foreach { case (t, est) =>
        assert(est <= exact.getOrElse(t, 0L), s"overestimate for $t")
      }
      exact.foreach { case (t, c) =>
        val est = sketch.getOrElse(t, 0L)
        assert((c - est) * (k + 1) <= n,
          s"bound violated: k=$k n=$n item=$t exact=$c est=$est")
      }
    }
  }
}
