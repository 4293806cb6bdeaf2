package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.sources.Tables
import graft.streaming.SessionizeStream
import graft.streaming.SessionizeStream.{SEv, SOut}

/** Streaming sessionization == batch gap rule, under any micro-batch split,
  * cross-checked against the gated batch query (`sessionize`).
  */
class SessionStreamSpec extends SparkSpec {

  private def loadEvents(): Seq[SEv] = {
    val raw = Tables.events(spark, sfTiny)
    raw.select(col("user_id"), col("event_id"),
        Tables.tsMicros(raw).as("ts_us"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => SEv(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
      .sortBy(e => (e.tsUs, e.eventId))
  }

  /** Plain Scala gap-fold oracle: per user, sessions split on > 30 min. */
  private def oracleSessions(events: Seq[SEv]): Map[(Long, Long), SOut] =
    events.groupBy(_.userId).flatMap { case (u, g) =>
      val sorted = g.sortBy(e => (e.tsUs, e.eventId))
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
        if (e.tsUs - acc.head.head.tsUs > SessionizeStream.GapUs)
          List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }.map(_.reverse).reverse
      sessions.zipWithIndex.map { case (s, i) =>
        (u, s.head.tsUs) -> SOut(u, s.head.tsUs, s.last.tsUs, s.size,
          s.map(_.cents).sum, closed = i < sessions.size - 1)
      }
    }

  private def runBatches(events: Seq[SEv], splits: Seq[Int]): Map[(Long, Long), SOut] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[SEv]
    val query = SessionizeStream.sessionStream(source.toDS()).writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName("session_out")
      .start()
    try {
      var rest = events
      splits.foreach { n =>
        val (batch, tail) = rest.splitAt(n)
        rest = tail
        if (batch.nonEmpty) { source.addData(batch); query.processAllAvailable() }
      }
      if (rest.nonEmpty) { source.addData(rest); query.processAllAvailable() }
      spark.table("session_out").as[SOut].collect()
        .foldLeft(Map.empty[(Long, Long), SOut]) { (m, s) =>
          m + ((s.userId, s.startUs) -> s)
        }
    } finally query.stop()
  }

  test("gap-fold sessions: 1 batch == uneven batches == Scala oracle") {
    val events = loadEvents().take(600)
    val oracle = oracleSessions(events)
    val oneBatch = runBatches(events, Seq(events.size))
    spark.sql("DROP TABLE IF EXISTS session_out")
    val uneven = runBatches(events, Seq(1, 13, 200, 7, 250))
    assert(oneBatch == oracle, "single-batch streaming != gap-fold oracle")
    assert(uneven == oracle, "uneven-batch streaming != gap-fold oracle")
  }

  test("per-user rollup of streamed sessions == the gated batch sessionize query") {
    val events = loadEvents()
    val streamed = runBatches(events, Seq(events.size / 3, events.size / 3))
    val rollup = streamed.values.groupBy(_.userId).map { case (u, ss) =>
      u -> ((ss.size.toLong, ss.map(_.nEvents).sum, ss.map(_.cents).sum))
    }
    val batch = graft.operators.Olap.qSessionize(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 100)))).toMap
    assert(rollup.keySet == batch.keySet, "user sets differ")
    rollup.foreach { case (u, v) =>
      assert(v == batch(u), s"user $u: streamed rollup $v != batch ${batch(u)}")
    }
  }
}
