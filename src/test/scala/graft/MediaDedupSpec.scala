package graft

import org.apache.spark.sql.functions._
import graft.functions.{DedupOps, MultimodalOps}

/** Codec-free media near-dup (round-9 addition): byte-window MinHash-LSH
  * over the blob column and frame-hash overlap over the sampled frames.
  * Ground truth is recomputed on the driver from the raw bytes (an
  * entirely different code path from the distributed pipeline), and the
  * plans are pinned candidate-bounded.
  */
class MediaDedupSpec extends SparkSpec {

  private def byteWindows(text: String, width: Int = 16, stride: Int = 8): Set[String] = {
    val bytes = text.getBytes("UTF-8")
    if (bytes.length < width) Set.empty
    else (0 to (bytes.length - width) / stride)
      .map(i => new String(bytes.slice(i * stride, i * stride + width), "UTF-8"))
      .toSet
  }

  test("media_dedup: pair arithmetic matches driver-side byte-window ground truth; plan is candidate-bounded") {
    val df = MultimodalOps.mediaDedup(spark, sfTiny)
    val rows = df.collect()
    assert(rows.nonEmpty, "no media near-dup pairs at sf0.001 — degenerate")
    assert(rows.exists(_.getDouble(5) < 1.0),
      "only exact duplicates found — the NEAR-dup class is untested")
    val texts = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(10).foreach { r =>
      val (a, b) = (byteWindows(texts(r.getLong(0))), byteWindows(texts(r.getLong(1))))
      assert(r.getLong(2) == (a & b).size.toLong, s"n_inter wrong for $r")
      assert(r.getLong(3) == a.size.toLong && r.getLong(4) == b.size.toLong,
        s"per-doc window counts wrong for $r")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"media_dedup became an all-pairs join:\n$plan")
  }

  test("frame_dedup: shared-frame counts match driver-side ground truth; stop-frame pruning bounds the join") {
    val df = MultimodalOps.frameDedup(spark, sfTiny)
    val rows = df.collect()
    assert(rows.nonEmpty, "no frame-overlap pairs at sf0.001 — degenerate")
    // driver-side ground truth: frame hashes recomputed from raw bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    def frames(text: String): Set[String] = {
      val bytes = text.getBytes("UTF-8")
      val n = math.max(bytes.length / 64, 1)
      (0 until n by 4).map { i =>
        val slice = bytes.slice(i * 64, math.min(i * 64 + 64, bytes.length))
        md.digest(slice).map("%02x".format(_)).mkString.take(16)
      }.toSet
    }
    val texts = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // document frequency for the pruning mirror
    val dfreq = texts.values.toSeq.flatMap(t => frames(t).toSeq)
      .groupBy(identity).map { case (h, g) => h -> g.size }
    def pruned(id: Long): Set[String] = frames(texts(id)).filter(dfreq(_) <= 50)
    rows.take(10).foreach { r =>
      val (a, b) = (pruned(r.getLong(0)), pruned(r.getLong(1)))
      assert(r.getLong(2) == (a & b).size.toLong, s"n_shared wrong for $r")
      assert(r.getLong(3) == a.size.toLong && r.getLong(4) == b.size.toLong,
        s"pruned frame counts wrong for $r")
    }
    // pruning is live: with maxDf=0 every frame is a stop-frame → no pairs
    assert(MultimodalOps.frameDedup(spark, sfTiny, maxDf = 0).isEmpty,
      "maxDf=0 should prune every frame before the self-join")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"frame_dedup became an all-pairs join:\n$plan")
    // the pruned frame set is persisted and REUSED (denominators + both
    // join sides read the cache, not three recomputes of the semi-join)
    assert(plan.contains("InMemoryTableScan"),
      s"pruned frame set not served from cache:\n$plan")
  }

  test("byte shingles stay BINARY: distinct invalid-UTF-8 windows never alias (ADVICE r9)") {
    // Two blobs sharing six valid byte windows plus ONE invalid-UTF-8
    // window EACH — 0xFFFE… vs 0xFEFF…, distinct as bytes but both
    // collapsing to U+FFFD runs under a UTF-8 decode. The old
    // decode(…, 'UTF-8') shingle pipeline would count them as an
    // intersection (n_inter 7, jaccard 1.0); the binary pipeline must
    // score exactly the true overlap: n_inter 6 of 7, jaccard 6/8.
    import spark.implicits._
    val common = (1 to 6).map(k => f"commonwindow-$k%03d".getBytes("UTF-8"))
    common.foreach(w => assert(w.length == 16))
    val inv1 = Array.fill(8)(Seq(0xFF.toByte, 0xFE.toByte)).flatten.toArray
    val inv2 = Array.fill(8)(Seq(0xFE.toByte, 0xFF.toByte)).flatten.toArray
    val ex = ((common :+ inv1).map(s => (1L, s)) ++
              (common :+ inv2).map(s => (2L, s))).toDF("doc_id", "s")
    val rows = DedupOps.lshJaccardOver(ex, minJaccard = 0.05).collect()
    assert(rows.length == 1, s"expected the one candidate pair, got ${rows.toSeq}")
    val r = rows.head
    assert(r.getLong(2) == 6L,
      s"n_inter ${r.getLong(2)} != 6 — invalid byte windows aliased into the intersection")
    assert(r.getLong(3) == 7L && r.getLong(4) == 7L,
      s"per-doc distinct window counts collapsed: $r")
    assert(math.abs(r.getDouble(5) - 0.75) < 1e-9, s"jaccard ${r.getDouble(5)} != 0.75")
  }
}
