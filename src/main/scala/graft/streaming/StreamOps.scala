package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException, StreamingQueryListener}

/** Operational plumbing around the streaming pipelines: the observability
  * sink (SURVEY §2.1 S13) and the reconnect/health supervisor (§2.7 ST7) —
  * the two reference components previously scoped out as non-data-plane,
  * re-expressed in Spark's own operational model.
  */
object StreamOps {

  /** S13 — structured metrics sink. The reference logs ingest progress
    * through winston (reference `src/utils/logger.ts:3-15`); the Spark-native
    * analogue is a [[StreamingQueryListener]] capturing per-micro-batch
    * progress (batch id, input rows, durations) as DATA, not log text, so
    * the engine's own query surface can aggregate its operational history.
    *
    * Listener callbacks run on the driver's listener bus — they must never
    * block, so events land in a lock-free queue and `toDF` materializes on
    * demand. At cluster scale the same rows stream to any table sink; the
    * queue is bounded by `maxEvents` (oldest dropped) so an always-on query
    * cannot grow driver memory without bound.
    */
  case class BatchMetric(queryName: String, batchId: Long, numInputRows: Long,
                         processedRowsPerSecond: Double, durationMs: Long,
                         stateRows: Long, timestamp: String)

  final class MetricsSink(maxEvents: Int = 10000) extends StreamingQueryListener {
    private val buf = new ConcurrentLinkedQueue[BatchMetric]()
    // ConcurrentLinkedQueue.size is an O(n) traversal — track the count
    // beside the queue so per-event eviction is O(1) and the "never block
    // the listener bus" discipline holds at the cap, not only below it
    private val n = new java.util.concurrent.atomic.AtomicInteger(0)

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      buf.add(BatchMetric(
        Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
        p.processedRowsPerSecond,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
        // total stateful-operator rows this batch — the state-size signal
        // an operator (e.g. the RocksDB-backed book fold) is sized by
        p.stateOperators.map(_.numRowsTotal).sum,
        p.timestamp))
      var over = n.incrementAndGet() - maxEvents
      while (over > 0 && buf.poll() != null) {
        n.decrementAndGet(); over -= 1
      }
    }

    def metrics: Seq[BatchMetric] = buf.iterator().asScala.toSeq

    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      metrics.toDF()
    }
  }

  /** ST7 — reconnect/health supervision. The reference health-checks its
    * block provider every 30 s and re-listens after a 5 s backoff
    * (reference `src/services/block-event-manager.ts:48-60`). Spark's unit
    * of reconnection is the QUERY: a failed micro-batch kills the
    * [[StreamingQuery]], and restarting it from the same checkpoint resumes
    * exactly-once from the last committed offsets. This supervisor is that
    * loop: await termination, and on failure restart with backoff up to
    * `maxRestarts` times.
    *
    * `start` must build a FRESH query against the same checkpoint each
    * attempt (a terminated query object cannot be restarted). Returns the
    * number of restarts performed; rethrows when the budget is exhausted.
    */
  def superviseWithRetry(start: () => StreamingQuery,
                         maxRestarts: Int = 3,
                         backoffMs: Long = 5000L): Int = {
    var restarts = 0
    var done = false
    while (!done) {
      val q = start()
      try { q.awaitTermination(); done = true }
      catch {
        case e: StreamingQueryException =>
          if (restarts >= maxRestarts) throw e
          restarts += 1
          Thread.sleep(backoffMs)
      }
    }
    restarts
  }
}
