package graft

import java.nio.file.{Files, Paths}

/** At-scale evidence drift guard (round-9 verdict item 5): round 9 BUILT
  * the IndexBench/StreamBench harnesses but never ran-and-recorded them,
  * and nothing failed. This spec makes that gap a test failure: the
  * recorded evidence JSONs must exist, must cover every stored layout and
  * every stateful pipeline the code ships, and the newest full-surface
  * bench evidence must cover the CURRENT query surface — growing
  * `SparkEntry.queries` without re-running the full-surface evidence run
  * goes red here, the same discipline `QuerySurfaceSpec` applies to
  * COVERAGE.md's header count.
  */
class EvidenceSpec extends SparkSpec {

  private def read(p: String): String = {
    val path = Paths.get(p)
    assert(Files.exists(path), s"missing at-scale evidence file: $p — " +
      "run the harness and check in its JSON output")
    new String(Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  test("index bench evidence exists at sf0.1 AND sf1 and covers every stored layout") {
    for (p <- Seq("tools/index_bench_sf01.json", "tools/index_bench_sf1.json")) {
      val j = read(p)
      // every stored layout the code ships must have a recorded build...
      for (b <- Seq("minhash_index", "bm25_postings", "pq_index", "cell_index",
        "pq_base_90pct", "pq_gen_delta_10pct",
        "minhash_base_80pct", "minhash_gen_delta_10pct",
        "bm_base_90pct", "bm_gen_delta_10pct",
        "compact_minhash_tombs", "compact_bm_tombs", "compact_pq_tombs",
        "cluster_base_cold", "sem_cluster_base_cold"))
        assert(j.contains("\"" + b + "\""), s"$p: no build timing for $b")
      // ...and every probe-vs-live crossover claim a recorded pair,
      // including the tombstone-probe overhead and its compacted twin,
      // and the incremental-cluster steady-state reads (r11: the warm
      // delta-vs-fresh numbers the r10 verdict found missing)
      for (pr <- Seq("shard_dedup_live", "shard_dedup_indexed", "bm25_live",
        "bm25_indexed", "pq_live", "pq_indexed", "cell_read_1cell",
        "pq_gen_fanin", "minhash_gen_fanin", "bm_gen_fanin",
        "minhash_tomb_probe", "minhash_compacted",
        "bm_tomb_probe", "bm_compacted", "pq_tomb_probe", "pq_compacted",
        "cluster_fresh", "cluster_delta_warm",
        "sem_cluster_fresh", "sem_cluster_delta_warm",
        "cluster_deleted_warm", "sem_cluster_deleted_warm"))
        assert(j.contains("\"" + pr + "\""), s"$p: no probe timing for $pr")
    }
  }

  test("streaming rehearsal evidence exists at sf1 AND sf3 on RocksDB, every pipeline converged, and the cluster/mixed sinks carry written-bytes evidence") {
    for (p <- Seq("tools/stream_bench_sf1.json", "tools/stream_bench_sf3.json")) {
      val j = read(p)
      assert(j.contains("\"state_store\":\"rocksdb\""),
        s"$p was not recorded on the RocksDB provider")
      for (s <- Seq("wire_fold", "ingest_dedup", "sem_ingest",
        "pq_ingest", "bm_ingest", "cluster_ingest", "takedown_ingest",
        "mixed_ingest", "mixed_compact_resume")) {
        val at = j.indexOf("\"" + s + "\"")
        assert(at >= 0, s"$p: no stream bench record for pipeline $s")
        val rec = j.substring(at, math.min(j.length, at + 400))
        assert(rec.contains("\"converged\":true"),
          s"$p: pipeline $s recorded without converged:true")
        // the delta-layout write claim (verdict r13 item 1): the
        // maintained-view sinks must record per-version durable write
        // bytes — the O(batch)-not-O(state) evidence
        if (s == "cluster_ingest" || s == "mixed_ingest")
          assert(rec.contains("\"write_bytes_per_version\""),
            s"$p: pipeline $s recorded without write_bytes_per_version")
      }
    }
  }

  test("scaled-quantizer rehearsal evidence exists at sf1, sf3 AND sf10, converged, k growing with the corpus") {
    // verdict r15 item 1 done-criteria: the k ∝ N dial must carry decade
    // evidence of its own — flat per-op cost is a claim about the LADDER,
    // so all three files must exist and each drained stream must have
    // except-matched its batch twin
    var lastK = 0
    for (p <- Seq("tools/stream_bench_scaled_sf1.json",
        "tools/stream_bench_scaled_sf3.json",
        "tools/stream_bench_scaled_sf10.json")) {
      val j = read(p)
      assert(j.contains("\"state_store\":\"rocksdb\""),
        s"$p was not recorded on the RocksDB provider")
      val at = j.indexOf("\"sem_ingest_scaled\"")
      assert(at >= 0, s"$p: no sem_ingest_scaled record")
      val rec = j.substring(at, math.min(j.length, at + 400))
      assert(rec.contains("\"converged\":true"),
        s"$p: sem_ingest_scaled recorded without converged:true")
      val k = """"k_cells":(\d+)""".r.findFirstMatchIn(rec).map(_.group(1).toInt)
      assert(k.isDefined, s"$p: no k_cells in the scaled record")
      assert(k.get > lastK,
        s"$p: k must grow with the corpus (k ∝ N), got ${k.get} after $lastK")
      lastK = k.get
    }
    // the takedown-burst shape (r15 stretch item 6) rides the sf10 file
    val sf10 = read("tools/stream_bench_scaled_sf10.json")
    val at = sf10.indexOf("\"mixed_burst\"")
    assert(at >= 0, "sf10 scaled evidence has no mixed_burst record")
    val rec = sf10.substring(at, math.min(sf10.length, at + 500))
    assert(rec.contains("\"converged\":true") &&
      rec.contains("\"write_bytes_per_version\""),
      "mixed_burst must converge and carry write-bytes evidence")
  }

  test("tree-probe rehearsal evidence exists at sf10: head-to-head at the branching dial + parity at the production dial") {
    // the probe's claim is comparative (same dial, same corpus, fewer
    // per-arrival cosines) — so the evidence must carry BOTH sides of
    // the head-to-head and the cost-neutrality point, all converged
    val j = read("tools/stream_bench_tree_sf10.json")
    assert(j.contains("\"state_store\":\"rocksdb\""),
      "tree evidence was not recorded on the RocksDB provider")
    // every sem_ingest_tree record must be converged, and the set of
    // dials they carry must include BOTH the branching head-to-head (32)
    // and the production-dial parity point (2000) — a stale or failed
    // parity record must not ship under a passing guard
    val treeRecs = "\"sem_ingest_tree\"".r.findAllMatchIn(j)
      .map { m =>
        // one flat JSON object per stream record — cut at ITS closing
        // brace so a neighboring record's fields can't satisfy a check
        val end = j.indexOf('}', m.start)
        j.substring(m.start, if (end < 0) j.length else end + 1)
      }
      .toSeq
    assert(treeRecs.nonEmpty, "tree evidence has no sem_ingest_tree record")
    treeRecs.foreach(r => assert(r.contains("\"converged\":true"),
      s"a sem_ingest_tree record is not converged: ${r.take(200)}"))
    val dials = treeRecs.flatMap(r =>
      "\"target_cell\":(\\d+)".r.findFirstMatchIn(r).map(_.group(1).toInt))
    assert(dials.contains(32) && dials.contains(2000),
      s"sem_ingest_tree must carry dials 32 AND 2000, got $dials")
    val scAt = j.indexOf("\"sem_ingest_scaled\"")
    assert(scAt >= 0, "tree evidence has no sem_ingest_scaled comparator record")
    assert(j.substring(scAt, math.min(j.length, scAt + 400))
      .contains("\"converged\":true"),
      "sem_ingest_scaled comparator recorded without converged:true")
  }

  test("skew rehearsal evidence exists at sf1 and covers the rehearsed operators") {
    val j = read("tools/skew_bench_sf1.json")
    for (q <- Seq("wire_fold", "minhash_lsh", "components_fresh", "orderbook",
      "cluster_delta_warm", "cluster_deleted_warm"))
      assert(j.contains("\"" + q + "\""), s"no skew bench record for $q")
  }

  test("newest full-surface bench evidence covers the current query surface") {
    val dir = new java.io.File("tools")
    val fullN = "full(\\d+)".r
    val ns = dir.listFiles().toSeq
      .filter(f => f.getName.startsWith("bench_evidence") && f.getName.endsWith(".json"))
      .flatMap(f => fullN.findFirstMatchIn(f.getName).map(_.group(1).toInt))
    assert(ns.nonEmpty, "no full-surface bench evidence file in tools/")
    assert(ns.max == SparkEntry.queries.size,
      s"newest full-surface evidence covers ${ns.max} queries but the " +
        s"surface is ${SparkEntry.queries.size} — re-run the full evidence " +
        "bench (tools/bench_evidence_*_full<N>.json)")
  }
}
