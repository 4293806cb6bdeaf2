package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.functions.DedupOps
import graft.streaming.IngestDedup

/** Ingest-time dedup must agree with the batch MinHash-LSH pipeline: same
  * signatures, and — once the stream has drained — the same candidate set
  * with the same estimated Jaccard, regardless of micro-batch boundaries.
  */
class IngestDedupSpec extends SparkSpec {

  private def docRows: Seq[(Long, String)] =
    graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)

  test("row-local HOF signature == batch explode+aggregate signature") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
    val streamed = IngestDedup.bandedStream(docs)
      .select(col("docId"), col("sig")).distinct().collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val batch = DedupOps.minhashSignatures(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(i => r.getLong(i)).toSeq).toMap
    assert(batch.nonEmpty && streamed.keySet == batch.keySet,
      s"doc coverage differs: ${streamed.size} vs ${batch.size}")
    streamed.foreach { case (id, sig) =>
      assert(sig == batch(id), s"signature drift for doc $id")
    }
  }

  test("drained candidate stream == batch minhash_lsh, any batch boundaries") {
    import spark.implicits._
    val expected = DedupOps.minhashLsh(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(expected.nonEmpty, "fixture produced no LSH candidates to compare")

    def run(splits: Seq[Int]): Map[(Long, Long), Double] = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val source = MemoryStream[(Long, String)]
      val query = IngestDedup.candidateStream(
          source.toDF().toDF("doc_id", "text"))
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("ingest_cand").start()
      try {
        var rest = docRows
        splits.foreach { n =>
          val (batch, tail) = rest.splitAt(n)
          rest = tail
          if (batch.nonEmpty) { source.addData(batch); query.processAllAvailable() }
        }
        if (rest.nonEmpty) { source.addData(rest); query.processAllAvailable() }
        spark.table("ingest_cand").collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      } finally {
        query.stop()
        spark.sql("DROP TABLE IF EXISTS ingest_cand")
      }
    }

    val n = docRows.size
    assert(run(Seq(n)) == expected, "single-batch stream != batch LSH")
    assert(run(Seq.fill(10)(n / 10 + 1)) == expected, "10-batch stream != batch LSH")
    assert(run(Seq(1, 3, n / 2)) == expected, "uneven batches != batch LSH")
  }

  test("replayed documents are ignored (idempotent ingest)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val query = IngestDedup.candidateStream(
        source.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ingest_replay").start()
    try {
      val rows = docRows.take(20)
      source.addData(rows); query.processAllAvailable()
      val once = spark.table("ingest_replay").count()
      source.addData(rows); query.processAllAvailable() // exact replay
      assert(spark.table("ingest_replay").count() == once,
        "replay emitted duplicate candidates")
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS ingest_replay")
    }
  }
}
