package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.functions.SimilarityOps
import graft.streaming.SemIngest

/** Ingest-time semantic dedup must agree with the batch SemDeDup pass:
  * same cell assignment per vector, and — once the stream has drained —
  * the same τ-near pair set with the same rounded cosine, regardless of
  * micro-batch boundaries.
  */
class SemIngestSpec extends SparkSpec {

  private def centroids: Seq[(Int, Seq[Double])] =
    SimilarityOps.centroidVectors(spark, sfTiny).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toSeq

  private def vecRows: Seq[(Long, Seq[Float])] =
    graft.sources.Tables.embeddings(spark, sfTiny)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)

  test("row-local streaming assignment == batch broadcast assignment, every vector") {
    import spark.implicits._
    val batch = SimilarityOps.semDedup(spark, sfTiny)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val streamed = SemIngest.assignedStream(
        vecRows.toDF("vec_id", "embedding"), centroids)
      .collect().map(a => a.vecId -> a.cell).toMap
    assert(batch.nonEmpty && streamed.keySet == batch.keySet,
      s"vector coverage differs: ${streamed.size} vs ${batch.size}")
    streamed.foreach { case (id, cell) =>
      assert(cell == batch(id), s"cell drift for vector $id: $cell vs ${batch(id)}")
    }
  }

  test("drained pair stream == batch semDedupPairs, any batch boundaries") {
    val expected = SimilarityOps.semDedupPairs(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(expected.nonEmpty, "fixture produced no τ-near pairs to compare")

    def run(splits: Seq[Int]): Map[(Long, Long), Double] = {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val source = MemoryStream[(Long, Seq[Float])]
      val query = SemIngest.pairStream(
          source.toDF().toDF("vec_id", "embedding"), centroids)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("sem_pairs").start()
      try {
        var rest = vecRows
        splits.foreach { n =>
          val (batch, tail) = rest.splitAt(n)
          rest = tail
          if (batch.nonEmpty) { source.addData(batch); query.processAllAvailable() }
        }
        if (rest.nonEmpty) { source.addData(rest); query.processAllAvailable() }
        spark.table("sem_pairs").collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      } finally {
        query.stop()
        spark.sql("DROP TABLE IF EXISTS sem_pairs")
      }
    }

    // one shot, uneven batches, and per-replay re-delivery of a prefix
    // (idempotence: re-added vectors must not duplicate or re-pair)
    val oneShot = run(Seq(vecRows.size))
    assert(oneShot == expected,
      s"one-batch drain: ${oneShot.size} pairs vs batch ${expected.size}")
    val uneven = run(Seq(7, 31, 2))
    assert(uneven == expected,
      s"uneven drain: ${uneven.size} pairs vs batch ${expected.size}")
  }

  test("scaled quantizer: streaming (cell, tile) == batch reassignment; drained pairs == batch") {
    import spark.implicits._
    val subCents = SimilarityOps.scaledCentroidVectors(spark, sfTiny)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .groupBy(_._1).map { case (c, xs) =>
        c -> xs.map(x => (x._2, x._3)).toSeq.sortBy(_._1) }
    // the fixture must genuinely split (otherwise this test gates nothing)
    assert(subCents.values.exists(_.size > 1),
      "scaled quantizer produced no splits at the default dial")
    val batchAssign = SimilarityOps.scaledCells(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val streamedAssign = SemIngest.scaledAssignedStream(
        vecRows.toDF("vec_id", "embedding"), centroids, subCents)
      .collect().map(a => a.vecId -> ((a.cell, a.tile))).toMap
    assert(streamedAssign == batchAssign,
      s"scaled cell drift: ${streamedAssign.size} vs ${batchAssign.size}, " +
        s"diff=${(streamedAssign.toSet -- batchAssign.toSet).take(3)}")

    val expected = SimilarityOps.semDedupPairsScaled(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(expected.nonEmpty, "no scaled τ-near pairs to compare")
    def run(splits: Seq[Int]): Map[(Long, Long), Double] = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val source = MemoryStream[(Long, Seq[Float])]
      val query = SemIngest.scaledPairStream(
          source.toDF().toDF("vec_id", "embedding"), centroids, subCents)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("sem_pairs_scaled").start()
      try {
        var rest = vecRows
        splits.foreach { n =>
          val (batch, tail) = rest.splitAt(n)
          rest = tail
          if (batch.nonEmpty) { source.addData(batch); query.processAllAvailable() }
        }
        if (rest.nonEmpty) { source.addData(rest); query.processAllAvailable() }
        spark.table("sem_pairs_scaled").collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      } finally {
        query.stop()
        spark.sql("DROP TABLE IF EXISTS sem_pairs_scaled")
      }
    }
    val oneShot = run(Seq(vecRows.size))
    assert(oneShot == expected,
      s"one-batch scaled drain: ${oneShot.size} pairs vs batch ${expected.size}")
    val uneven = run(Seq(13, 5, 41))
    assert(uneven == expected,
      s"uneven scaled drain: ${uneven.size} pairs vs batch ${expected.size}")
  }

  test("tree probe: streaming descent == batch (cell, branch, tile); drained pairs == batch") {
    import spark.implicits._
    // the tree gate dial (below the scaled one so the tiny fixture
    // genuinely BRANCHES: 50-member label cells -> 7 tiles -> bw=3 ->
    // 3 branches) — the same dial the gated sf0.01 tree queries use
    val dial = SimilarityOps.treeTargetCell
    val (branchCents, tilesByBranch) =
      SimilarityOps.treeProbeStructures(spark, sfTiny, dial)
    // the fixture must genuinely branch (≥2 branches somewhere),
    // otherwise the descent degenerates to the flat probe and the test
    // gates nothing
    assert(branchCents.values.exists(_.size > 1),
      "tree probe produced no branching at the default dial")
    val batchAssign = SimilarityOps.treeCells(spark, sfTiny, dial).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    val streamedAssign = SemIngest.treeAssignedStream(
        vecRows.toDF("vec_id", "embedding"), centroids,
        branchCents, tilesByBranch)
      .collect().map(a => a.vecId -> ((a.cell, a.branch, a.tile))).toMap
    assert(streamedAssign == batchAssign,
      s"tree descent drift: ${streamedAssign.size} vs ${batchAssign.size}, " +
        s"diff=${(streamedAssign.toSet -- batchAssign.toSet).take(3)}")

    val expected = SimilarityOps.treePairs(spark, sfTiny, targetCell = dial).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(expected.nonEmpty, "no tree τ-near pairs to compare")
    def run(splits: Seq[Int]): Map[(Long, Long), Double] = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val source = MemoryStream[(Long, Seq[Float])]
      val query = SemIngest.treePairStream(
          source.toDF().toDF("vec_id", "embedding"), centroids,
          branchCents, tilesByBranch)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("sem_pairs_tree").start()
      try {
        var rest = vecRows
        splits.foreach { n =>
          val (batch, tail) = rest.splitAt(n)
          rest = tail
          if (batch.nonEmpty) { source.addData(batch); query.processAllAvailable() }
        }
        if (rest.nonEmpty) { source.addData(rest); query.processAllAvailable() }
        spark.table("sem_pairs_tree").collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      } finally {
        query.stop()
        spark.sql("DROP TABLE IF EXISTS sem_pairs_tree")
      }
    }
    val oneShot = run(Seq(vecRows.size))
    assert(oneShot == expected,
      s"one-batch tree drain: ${oneShot.size} pairs vs batch ${expected.size}")
    val uneven = run(Seq(17, 3, 29))
    assert(uneven == expected,
      s"uneven tree drain: ${uneven.size} pairs vs batch ${expected.size}")
  }

  test("replayed prefix is idempotent — no duplicate pairs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, Seq[Float])]
    val query = SemIngest.pairStream(
        source.toDF().toDF("vec_id", "embedding"), centroids)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sem_pairs_replay").start()
    try {
      val (head, tail) = vecRows.splitAt(20)
      source.addData(head); query.processAllAvailable()
      source.addData(head); query.processAllAvailable() // replay
      source.addData(tail); query.processAllAvailable()
      val got = spark.table("sem_pairs_replay").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.distinct.length,
        s"replay produced ${got.length - got.distinct.length} duplicate pairs")
      val expected = SimilarityOps.semDedupPairs(spark, sfTiny).count()
      assert(got.length == expected,
        s"replayed drain: ${got.length} pairs vs batch $expected")
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS sem_pairs_replay")
    }
  }
}
