package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.sources.Tables
import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.{FEv, FOut}

/** Streaming ordered funnel == the batch min-after chain, under any
  * micro-batch split of the ordered replay, cross-checked against the gated
  * batch query (`funnel`).
  */
class FunnelStreamSpec extends SparkSpec {

  private def loadEvents(): Seq[FEv] = {
    val raw = Tables.events(spark, sfTiny)
    raw.filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), Tables.tsMicros(raw).as("ts_us"), col("event_type"))
      .collect()
      .map(r => FEv(r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq
      .sortBy(e => (e.tsUs, e.step))
  }

  /** Plain Scala oracle: the batch rule verbatim — s1 = min view ts,
    * s2 = min click ts strictly after s1, s3 = min purchase ts strictly
    * after s2 (NOT the online fold: mins over the whole multiset, so it
    * would catch an order-dependence bug in the streaming register).
    */
  private def oracleFunnel(events: Seq[FEv]): Map[Long, FOut] =
    events.groupBy(_.userId).map { case (u, g) =>
      val s1 = g.collect { case e if e.step == "view" => e.tsUs }
        .minOption.getOrElse(0L)
      val s2 = if (s1 == 0L) 0L
        else g.collect { case e if e.step == "click" && e.tsUs > s1 => e.tsUs }
          .minOption.getOrElse(0L)
      val s3 = if (s2 == 0L) 0L
        else g.collect { case e if e.step == "purchase" && e.tsUs > s2 => e.tsUs }
          .minOption.getOrElse(0L)
      val reached = if (s3 != 0L) 3 else if (s2 != 0L) 2 else if (s1 != 0L) 1 else 0
      u -> FOut(u, s1, s2, s3, reached)
    }

  private def runBatches(events: Seq[FEv], splits: Seq[Int]): Map[Long, FOut] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[FEv]
    val query = FunnelStream.funnelStream(source.toDS()).writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName("funnel_out")
      .start()
    try {
      var rest = events
      splits.foreach { n =>
        val (batch, tail) = rest.splitAt(n)
        rest = tail
        if (batch.nonEmpty) { source.addData(batch); query.processAllAvailable() }
      }
      if (rest.nonEmpty) { source.addData(rest); query.processAllAvailable() }
      // Update mode: the LAST row per user is the current state
      spark.table("funnel_out").as[FOut].collect()
        .foldLeft(Map.empty[Long, FOut])((m, s) => m + (s.userId -> s))
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS funnel_out")
    }
  }

  test("online funnel: 1 batch == uneven batches == min-after oracle") {
    // an ordered PREFIX of the replay, early enough that users sit at every
    // depth (the full month saturates all 15 users at depth 3, which would
    // make the equalities vacuous for partial states)
    val events = loadEvents().take(100)
    val oracle = oracleFunnel(events)
    val oneBatch = runBatches(events, Seq(events.size))
    val uneven = runBatches(events, Seq(1, 7, 43, 30, 11))
    assert(oneBatch == oracle, "single-batch streaming != min-after oracle")
    assert(uneven == oracle, "uneven-batch streaming != min-after oracle")
    // the fixture must exercise every depth, or the equalities are vacuous
    val depths = oracle.values.map(_.reached).toSet
    assert(Set(1, 2, 3).subsetOf(depths),
      s"fixture funnel depths $depths do not cover 1, 2 and 3")
  }

  test("streamed reach counts == the gated batch funnel query") {
    val events = loadEvents()
    val streamed = runBatches(events, Seq(events.size / 4, events.size / 4,
      events.size / 4))
    val reach = (1 to 3).map(k =>
      k.toLong -> streamed.values.count(_.reached >= k).toLong).toMap
    val batch = graft.operators.Olap.qFunnel(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(reach == batch,
      s"streamed step reach $reach != gated batch funnel $batch")
  }
}
