package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Misra-Gries frequent-items (heavy-hitters) sketch as a typed
  * [[Aggregator]] — the third mergeable sketch of the surface next to HLL
  * (`approx_distinct`) and KLL-style percentiles (`approx_quantiles`).
  *
  * At 100 TB "what are the most frequent tokens/domains/users" cannot be an
  * exact global group-by-count when the key space is huge; the MG summary is
  * k counters per partition, merged associatively (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): sum counters, subtract the (k+1)-th
  * largest, keep positives. The merged sketch keeps the one-pass guarantee
  *   est(x) ≤ true(x)  and  true(x) − est(x) ≤ n / (k+1)
  * for EVERY item x over n total observations, independent of merge order —
  * which is exactly what makes the claim below deterministic even though
  * Spark's partition-merge order is not.
  *
  * Like the other sketch queries, the gated output carries the CLAIM (exact
  * counts from the small-SF group-by plus a `within_bound` computed from the
  * real sketch), not the raw estimate: the oracle checks the exact side and
  * the constant-true bound, the spec asserts the estimates themselves.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, scala.collection.Map[String, Long], Map[String, Long]] {

  import scala.collection.mutable

  // The buffer lives as an OBJECT between reduce calls (udaf → typed
  // imperative aggregate; the encoder only runs at partition boundaries),
  // so the hot path mutates a HashMap in place: hit/insert are O(1) and the
  // decrement step is two in-place passes with zero allocation — the
  // immutable-Map version rebuilt the whole k-entry map per untracked
  // element once full, O(k) alloc per element on heavy-tail streams.
  // Semantics (and the n/(k+1) merge bound) are unchanged.
  private def asMutable(
      b: scala.collection.Map[String, Long]): mutable.HashMap[String, Long] =
    b match {
      case m: mutable.HashMap[String, Long] @unchecked => m
      case other => mutable.HashMap.from(other)
    }

  def zero: scala.collection.Map[String, Long] =
    mutable.HashMap.empty[String, Long]

  def reduce(b0: scala.collection.Map[String, Long], x: String): scala.collection.Map[String, Long] = {
    val b = asMutable(b0)
    b.get(x) match {
      case Some(c)            => b(x) = c + 1
      case None if b.size < k => b(x) = 1L
      case None               =>
        // classic MG step: decrement all k counters, drop the zeroed ones
        b.mapValuesInPlace((_, c) => c - 1)
        b.filterInPlace((_, c) => c > 0)
    }
    b
  }

  def merge(a0: scala.collection.Map[String, Long],
            b0: scala.collection.Map[String, Long]): scala.collection.Map[String, Long] = {
    val (big, small) =
      if (a0.size >= b0.size) (asMutable(a0), b0) else (asMutable(b0), a0)
    small.foreach { case (t, c) => big(t) = big.getOrElse(t, 0L) + c }
    if (big.size > k) {
      val cut = big.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      big.mapValuesInPlace((_, c) => c - cut)
      big.filterInPlace((_, c) => c > 0)
    }
    big
  }

  def finish(b: scala.collection.Map[String, Long]): Map[String, Long] = b.toMap

  def bufferEncoder: ExpressionEncoder[scala.collection.Map[String, Long]] =
    ExpressionEncoder[scala.collection.Map[String, Long]]()
  def outputEncoder: ExpressionEncoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object FrequentItems {

  /** Gated claim query: exact top-`top` tokens over the documents corpus
    * (count desc, token asc — deterministic under ties) with the MG bound
    * checked in-query against the real sketch. One token explode feeds both
    * the exact group-by (small-SF yardstick) and the sketch (the 100 TB
    * path); the single-row sketch side is broadcast, so the claim join adds
    * no shuffle. The bound test is pure integer arithmetic:
    * (exact − est) · (k+1) ≤ n.
    */
  def approxTopK(spark: SparkSession, dir: String,
                 k: Int = 64, top: Int = 5): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    val mg = udaf(new MisraGriesAgg(k))
    val sketch = toks.agg(mg(col("token")).as("mg"), count(lit(1)).as("n"))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token").asc)
      .limit(top)
    val est = coalesce(element_at(col("mg"), col("token")), lit(0L))
    exact.crossJoin(broadcast(sketch))
      .select(col("token"), col("exact_cnt"),
        (est <= col("exact_cnt") &&
          (col("exact_cnt") - est) * (k + 1) <= col("n")).as("within_bound"))
  }
}
