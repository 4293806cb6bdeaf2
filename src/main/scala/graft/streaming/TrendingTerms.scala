package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{MisraGriesAgg, TextAnalysis}

/** Windowed streaming heavy-hitters — "trending terms": per event-time
  * window, a Misra-Gries token sketch plus the window's total token count.
  * The streaming monitor every ingest pipeline wants next to its dedup
  * gate: which tokens/domains/templates are spiking in THIS window, without
  * a per-token exact group-by over an unbounded key space.
  *
  * ONE definition serves batch and stream (the [[graft.streaming.WireStream]]
  * discipline): on a streaming frame the same `groupBy(window).agg(mg(...))`
  * keeps the MG buffer as aggregation STATE, merged incrementally per
  * micro-batch by the aggregator's own `merge`. Misra-Gries is a mergeable
  * summary (Agarwal et al., PODS 2012), so the one-pass error guarantee
  *   est(x) ≤ true(x)  and  true(x) − est(x) ≤ n_window / (k+1)
  * holds for EVERY micro-batch split — batching changes which sketch you
  * get, never whether the bound holds (spec-asserted under two different
  * splits). This is the streaming lift of [[graft.functions.FrequentItems]]:
  * the same Aggregator instance, now as incremental window state.
  *
  * At 100 TB: state per window is k counters (k = 8 here, k = thousands in
  * production) regardless of vocabulary size; the watermark seals windows
  * and evicts their state; partial aggregation runs map-side before the
  * window-keyed shuffle, so the exchange carries sketches, not tokens.
  */
object TrendingTerms {

  /** Per event-time window: MG sketch (token → lower-bound count) + total
    * token mass. Input needs (ts: timestamp, text: string); works unchanged
    * on batch or streaming frames. Update/complete output modes carry the
    * evolving sketch; with the watermark, append mode emits sealed windows.
    */
  def windowedTokenSketch(df: DataFrame, windowDur: String = "1 minute",
                          watermarkDelay: String = "10 minutes",
                          k: Int = 8): DataFrame = {
    val mg = udaf(new MisraGriesAgg(k))
    val base = if (df.isStreaming) df.withWatermark("ts", watermarkDelay) else df
    base
      .select(col("ts"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(window(col("ts"), windowDur))
      .agg(mg(col("token")).as("mg"), count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("mg"), col("n"))
  }
}
