package graft

import org.apache.spark.sql.functions._
import graft.functions.{CurationOps, DedupOps, MultimodalOps, SimilarityOps, TextAnalysis}

/** M8 behavioral checks beyond the oracle gate: approximation quality of the
  * scale-path operators against their exact baselines, and the multimodal
  * mapPartitions plumbing.
  */
class LlmOpsSpec extends SparkSpec {

  test("MinHash estimate tracks exact Jaccard on candidate pairs") {
    val exact = DedupOps.ngramJaccard(spark, sfTiny, maxDocId = 500, minJaccard = 0.0)
      .select(col("id1"), col("id2"), col("jaccard").cast("double"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val est = DedupOps.minhashLsh(spark, sfTiny)
      .select(col("id1"), col("id2"), col("est_jaccard").cast("double"))
      .collect()
    assert(est.nonEmpty, "LSH produced no candidate pairs")
    // every LSH candidate with a high estimate should have nonzero true overlap
    val strong = est.filter(_.getDouble(2) >= 0.5)
    val errs = strong.flatMap { r =>
      exact.get((r.getLong(0), r.getLong(1))).map(j => math.abs(j - r.getDouble(2)))
    }
    if (errs.nonEmpty)
      assert(errs.sum / errs.length < 0.6, "MinHash estimates wildly off true Jaccard")
  }

  test("shard_dedup: asymmetric admission agrees with exact cross-split ground truth") {
    val rows = DedupOps.shardDedup(spark, sfTiny).collect()
    // exactly one verdict row per shard doc, corpus docs never re-judged
    val shardIds = spark.read.parquet(s"$sfTiny/documents.parquet")
      .filter(col("doc_id") % 10 === 7).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == shardIds, "verdict rows != shard docs")
    // internal consistency: admit <=> no verified dup; dups are candidates
    rows.foreach { r =>
      assert(r.getBoolean(5) == (r.getLong(2) == 0L), s"admit inconsistent: $r")
      assert(r.getLong(2) <= r.getLong(1), s"n_dup > n_cand: $r")
      if (!r.getBoolean(5)) {
        assert(r.getLong(3) % 10 != 7, s"best match is a shard doc (not corpus): $r")
        assert(r.getDouble(4) >= 0.5, s"rejected without a >=tau match: $r")
      }
    }
    // differential: every exact cross-split pair at j >= 0.5 must be caught
    // (near-identical pairs sit where the 4x2 banding S-curve is ~1)
    val truth = DedupOps.ngramJaccard(spark, sfTiny, maxDocId = 500, minJaccard = 0.5)
      .select("id1", "id2", "jaccard").collect()
      .flatMap { t =>
        val (a, b) = (t.getLong(0), t.getLong(1))
        if (a % 10 == 7 && b % 10 != 7) Some(a -> t.getDouble(2))
        else if (b % 10 == 7 && a % 10 != 7) Some(b -> t.getDouble(2))
        else None
      }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(truth.nonEmpty, "ground truth degenerate — no cross-split dups in data")
    val byDoc = rows.map(r => r.getLong(0) -> r).toMap
    truth.foreach { case (doc, bestJ) =>
      val r = byDoc(doc)
      assert(!r.getBoolean(5), s"doc $doc has a >=0.5 corpus dup (j=$bestJ) but was admitted")
      assert(r.getDouble(4) == bestJ, s"best_jaccard ${r.getDouble(4)} != truth max $bestJ")
    }
    // non-vacuous in all three classes: clean admit, reject, and a banding
    // candidate below tau that is still admitted
    assert(rows.exists(r => r.getBoolean(5) && r.getLong(1) == 0), "no clean admits")
    assert(rows.exists(!_.getBoolean(5)), "no rejections")
    assert(rows.exists(r => r.getBoolean(5) && r.getLong(1) > 0),
      "no below-threshold candidate was admitted — tau gate untested")
  }

  test("shard_dedup_indexed: stored-index probe is row-identical to the live gate and never scans corpus text") {
    DedupOps.writeMinhashIndex(spark, sfTiny, "minhash_idx_spec", buckets = 8)
    val live = DedupOps.shardDedup(spark, sfTiny).collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val probeDf = DedupOps.shardDedupFromIndex(spark, sfTiny, "minhash_idx_spec")
    val probe = probeDf.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(probe.toSeq == live.toSeq,
      "stored-index probe verdicts differ from the live gate")
    // the 100 TB property the layout exists for, proven at EXECUTION level
    // (plan-string scan counting is unreliable under cached/adaptive plan
    // renderings): probe a dir whose documents table contains ONLY the
    // shard rows — if any corpus-derived input still came from document
    // text rather than the index tables, the verdicts would change.
    val shardOnly = "/tmp/graft-shardonly-docs"
    spark.read.parquet(s"$sfTiny/documents.parquet")
      .filter(col("doc_id") % 10 === 7)
      .write.mode("overwrite").parquet(s"$shardOnly/documents.parquet")
    val blind = DedupOps.shardDedupFromIndex(spark, shardOnly, "minhash_idx_spec")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(blind.toSeq == live.toSeq,
      "probe with corpus text REMOVED differs — corpus data leaked past " +
        "the index tables into the probe path")
    val plan = probeDf.queryExecution.executedPlan.toString
    assert(plan.contains("minhash_idx_spec_bands") &&
      plan.contains("minhash_idx_spec_shingles") &&
      plan.contains("minhash_idx_spec_counts"),
      s"probe plan does not read all three index tables:\n$plan")
    // candidate-bounded verify discipline survives the stored layout
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"stored-index probe became an all-pairs join:\n$plan")
  }

  test("minhash index generations: admitted docs append as a delta, replay self-rejects, compaction is row-identical") {
    DedupOps.writeMinhashIndex(spark, sfTiny, "mhgen_base", buckets = 8)
    val verdicts = DedupOps.shardDedupFromIndex(spark, sfTiny, "mhgen_base")
      .collect()
    val admitted = verdicts.filter(_.getBoolean(5)).map(_.getLong(0))
    assert(admitted.nonEmpty, "no admitted docs — lifecycle test degenerate")
    // the ingest lifecycle: admitted docs join the corpus as a generation
    // (cost linear in the shard — the base index is untouched)
    DedupOps.writeMinhashGeneration(spark, sfTiny,
      col("doc_id").isin(admitted: _*), "mhgen_delta", buckets = 8)
    val replay = DedupOps.shardDedupFromGenerations(spark, sfTiny,
      Seq("mhgen_base", "mhgen_delta")).collect()
      .map(r => r.getLong(0) -> r).toMap
    admitted.foreach { id =>
      val r = replay(id)
      assert(!r.getBoolean(5), s"replayed doc $id re-admitted — not idempotent")
      assert(r.getDouble(4) == 1.0, s"replayed doc $id best_jaccard != 1.0: $r")
    }
    // docs rejected against the base stay rejected (the delta only adds)
    verdicts.filterNot(_.getBoolean(5)).foreach { r =>
      assert(!replay(r.getLong(0)).getBoolean(5),
        s"doc ${r.getLong(0)} rejected by base but admitted after append")
    }
    // compaction: one bucketed rewrite, probe row-identical to the fan-in
    DedupOps.compactMinhashIndex(spark, Seq("mhgen_base", "mhgen_delta"),
      "mhgen_compact", buckets = 8)
    val compacted = DedupOps.shardDedupFromIndex(spark, sfTiny, "mhgen_compact")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val fanin = replay.values.toSeq.map(_.toSeq)
      .sortBy(_.head.asInstanceOf[Long])
    assert(compacted.toSeq == fanin,
      "compacted probe differs from the multi-generation probe")
  }

  test("lsh_recall: empirical S-curve — monotone in similarity, top band fully recalled") {
    val rows = DedupOps.lshRecall(spark, sfTiny)
      .orderBy("band")
      .select(col("band"), col("n_pairs"), col("recall"))
      .collect()
    assert(rows.length >= 2, "recall curve degenerate — fewer than two bands")
    // banding probability 1-(1-s^r)^b is increasing in s, so measured
    // recall must be non-decreasing across similarity bands
    val recalls = rows.map(_.getDouble(2))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in similarity: ${recalls.mkString(", ")}")
    // near-identical pairs (top populated band >= 0.9) must never be missed
    val top = rows.last
    assert(top.getInt(0) >= 9 && top.getDouble(2) == 1.0,
      "banding misses near-duplicate pairs — dedup would leak dups")
  }

  test("LSH top-k neighbors are a subset of brute-force candidates with sane recall") {
    val brute = SimilarityOps.cosineTopK(spark, sfTiny, nQueries = 20, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityOps.lshTopK(spark, sfTiny, nQueries = 20, k = 3)
      .select("query_id", "neighbor_id", "rank").collect()
    assert(lsh.nonEmpty, "LSH search returned nothing")
    // recall of LSH top-1 against brute-force top-5: permissive bound — an
    // 8-bit random-hyperplane bucket on 64-dim data is coarse by design
    val top1 = lsh.filter(_.getLong(2) == 1).map(r => (r.getLong(0), r.getLong(1)))
    val hits = top1.count(brute.contains)
    assert(hits.toDouble / top1.length > 0.2,
      s"LSH top-1 recall ${hits.toDouble / top1.length} implausibly low")
  }

  test("IVF top-k: neighbors are true vectors and single-cell probe recall is sane") {
    val brute = SimilarityOps.cosineTopK(spark, sfTiny, nQueries = 20, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.ivfTopK(spark, sfTiny, nQueries = 20, k = 3)
      .select("query_id", "neighbor_id", "rank").collect()
    assert(ivf.nonEmpty, "IVF probe returned nothing")
    // top-1 of a 1-probe IVF against brute-force top-5: label cells are
    // semantic clusters, so same-cell top-1 should often be a true top-5
    val top1 = ivf.filter(_.getLong(2) == 1).map(r => (r.getLong(0), r.getLong(1)))
    val hits = top1.count(brute.contains)
    assert(hits.toDouble / top1.length > 0.2,
      s"IVF top-1 recall ${hits.toDouble / top1.length} implausibly low")
  }

  test("SemDeDup: kept set is a τ-independent set and the cell's least-central member always survives") {
    val tau = 0.3
    val rows = SimilarityOps.semDedup(spark, sfTiny, minCosine = tau)
    val got = rows.collect()
    val n = spark.read.parquet(s"$sfTiny/embeddings.parquet").count()
    assert(got.length == n, s"one verdict per vector expected: ${got.length} vs $n")
    // verdict/n_near consistency: a drop needs at least one τ-near neighbor
    got.foreach { r =>
      if (!r.getBoolean(4)) assert(r.getLong(3) >= 1L,
        s"vec ${r.getLong(0)} dropped with n_near=0")
    }
    assert(got.exists(!_.getBoolean(4)) && got.exists(_.getBoolean(4)),
      "fixture should produce a keep/drop mix at τ=0.3")
    // the paper's keep policy: the member FARTHEST from its centroid (min
    // cscore, tie → min id) is never dominated, so it always survives
    got.groupBy(_.getInt(1)).foreach { case (cell, members) =>
      val least = members.minBy(r => (r.getDouble(2), r.getLong(0)))
      assert(least.getBoolean(4), s"least-central member of cell $cell was dropped")
    }
    // independence: within a τ-near pair the more-central member is always
    // dominated, so no two KEPT vectors in a cell may be τ-near — verify
    // with an exact cosine recomputation over the kept set
    import org.apache.spark.sql.functions._
    val kept = rows.filter(col("keep"))
      .join(graft.sources.Tables.embeddings(spark, sfTiny), Seq("vec_id"))
      .select(col("vec_id"), col("cell"), col("embedding").as("v"))
    val violations = kept.as("x").join(kept.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .select(SimilarityOps.cosine(col("x.v"), col("y.v")).as("cos"))
      .filter(col("cos") >= tau)
      .count()
    assert(violations == 0, s"$violations τ-near pairs survived in the kept set")
  }

  test("IVF multi-probe: recall@5 vs brute force is monotone in nprobe") {
    val brute = SimilarityOps.cosineTopK(spark, sfTiny, nQueries = 20, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall@5: fraction of brute-force top-5 pairs the probe recovers
    val recall = Seq(1, 2, 4).map { p =>
      val got = SimilarityOps.ivfTopK(spark, sfTiny, nQueries = 20, k = 5, nprobe = p)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      p -> brute.count(got.contains).toDouble / brute.size
    }
    // widening the probe set can only ADD candidate neighbors, so true
    // top-5 hits can only be found, never lost — recall is monotone.
    // (Strict gain at some step is a property of the current fixture, not
    // an invariant — missed neighbors could all live beyond cell 4 — so
    // only monotonicity and baseline sanity are asserted.)
    recall.sliding(2).foreach { case Seq((p1, r1), (p2, r2)) =>
      assert(r2 >= r1, s"recall fell widening nprobe $p1->$p2: $r1 -> $r2")
    }
    assert(recall.head._2 > 0.1, s"implausibly low recall curve: $recall")
  }

  test("embedding dedup: LSH candidates are a subset of brute force, recall measured") {
    val brute = SimilarityOps.embeddingDedupBruteForce(spark, sfTiny)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityOps.embeddingDedup(spark, sfTiny)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // soundness: every LSH-found dup IS a true dup (threshold verify is exact)
    assert(lsh.subsetOf(brute), s"LSH found non-dup pairs: ${lsh -- brute}")
    // recall: informational unless brute force found enough pairs to judge
    if (brute.size >= 5)
      assert(lsh.size.toDouble / brute.size > 0.2,
        s"LSH dedup recall ${lsh.size.toDouble / brute.size} implausibly low")
  }

  test("freq_score matches a straight-line recomputation; train docs have zero OOV") {
    val rows = TextAnalysis.freqScore(spark, sfTiny).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "text").collect()
      .map(d => d.getLong(0) -> "[a-z0-9]+".r.findAllIn(d.getString(1)).toSeq)
    val vocab = docs.filter(_._1 % 10 < 8).flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    docs.filter(_._2.nonEmpty).foreach { case (id, toks) =>
      val r = rows(id)
      assert(r.getAs[Long]("n_tokens") == toks.size, s"doc $id n_tokens")
      assert(r.getAs[Long]("n_oov") == toks.count(!vocab.contains(_)), s"doc $id n_oov")
      assert(r.getAs[Long]("sum_freq") == toks.map(vocab.getOrElse(_, 0L)).sum,
        s"doc $id sum_freq")
      // every train token is in the vocab by construction
      if (id % 10 < 8) assert(r.getAs[Long]("n_oov") == 0, s"train doc $id has OOV")
    }
  }

  test("score_select keeps exactly the per-language top half by freq_score") {
    val sel = TextAnalysis.scoreSelect(spark, sfTiny).collect()
    assert(sel.nonEmpty)
    val scores = TextAnalysis.freqScore(spark, sfTiny)
      .join(graft.sources.Tables.documents(spark, sfTiny).select("doc_id", "lang"),
        Seq("doc_id"))
      .select("doc_id", "lang", "freq_score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val expected = scores.groupBy(_._2).flatMap { case (_, docs) =>
      val ranked = docs.sortBy(d => (-d._3, d._1))
      ranked.take(ranked.size * 500 / 1000) // rk*1000 <= n*500
    }.map(_._1).toSet
    assert(sel.map(_.getAs[Long]("doc_id")).toSet == expected,
      "selection differs from straight-line per-language ranking")
    // every kept rank is within the permille bound
    sel.foreach { r =>
      assert(r.getAs[Long]("rk") * 1000 <= r.getAs[Long]("n_lang") * 500)
    }
  }

  test("fuzzy_pairs finds exactly the brute-force lev<=1 name pairs, non-vacuous") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = graft.sources.Tables.part(spark, sfTiny)
      .groupBy("p_name").agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("cnt")).toMap
      .filter(_._1.length >= 6)
    val brute = (for {
      a <- names.keys; b <- names.keys
      if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(brute.nonEmpty, "fixture has no lev<=1 name pairs to find")
    val got = TextAnalysis.fuzzyPairs(spark, sfTiny).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet == brute,
      "q-gram-filtered pairs != brute force (recall bound violated?)")
    got.foreach { r =>
      val (n1, n2) = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("dist") == lev(n1, n2))
      val expectCanon =
        if (names(n1) > names(n2)) n1
        else if (names(n2) > names(n1)) n2
        else Seq(n1, n2).min
      assert(r.getAs[String]("canonical") == expectCanon, s"canonical for ($n1,$n2)")
    }
  }

  test("bpe_merges matches a straight-line first-merge recomputation") {
    val got = TextAnalysis.bpeMerges(spark, sfTiny).collect()
    assert(got.length == 20)
    val words = graft.sources.Tables.documents(spark, sfTiny)
      .select("text").collect()
      .flatMap(r => "[a-z0-9]+".r.findAllIn(r.getString(0)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairCounts = words.toSeq.flatMap { case (w, cnt) =>
      w.sliding(2).filter(_.length == 2).map(p => (p, w, cnt))
    }
    val expected = pairCounts.groupBy(_._1).map { case (p, xs) =>
      p -> (xs.map(_._2).distinct.size.toLong, xs.map(_._3).sum)
    }
    val ranked = expected.toSeq
      .sortBy { case (p, (_, tot)) => (-tot, p) }.take(20)
    got.sortBy(_.getAs[Long]("rank")).zip(ranked).foreach {
      case (row, (p, (nw, tot))) =>
        assert(row.getAs[String]("pair") == p, s"rank ${row.getAs[Long]("rank")}")
        assert(row.getAs[Long]("n_words") == nw, s"n_words for $p")
        assert(row.getAs[Long]("total_count") == tot, s"total_count for $p")
    }
  }

  test("bpe_encode: frozen vocab equals the learned ranking; passes converged; counts sane") {
    // 1) vocabulary pin: the shipped constant IS bpeMerges' top-8 on the
    // training corpus — drift fails here, not as a silent count change
    val learned = TextAnalysis.bpeMerges(spark, sfTiny)
      .orderBy("rank").limit(TextAnalysis.bpeVocab.length)
      .collect().map(_.getAs[String]("pair")).toSeq
    assert(learned == TextAnalysis.bpeVocab,
      s"frozen bpeVocab ${TextAnalysis.bpeVocab} != learned $learned")
    // 2) encode counts: every doc compresses (or stays equal), never grows,
    // and the unit count matches the raw letter count
    val enc = TextAnalysis.bpeEncode(spark, sfTiny).collect()
    assert(enc.length == 500)
    enc.foreach { r =>
      val units = r.getAs[Long]("n_units")
      val toks = r.getAs[Long]("n_tokens_bpe")
      assert(toks >= (units + 1) / 2 && toks <= units,
        s"doc ${r.getAs[Long]("doc_id")}: $toks tokens from $units units")
    }
    // 3) the defined 3-pass semantics has converged at the reference
    // scale: straight-line re-encode with a 4th pass changes nothing
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def encode(text: String, passes: Int): Int = {
      var s = "|" + text.map(c => s"$c|").mkString
      for (m <- TextAnalysis.bpeVocab; _ <- 1 to passes)
        s = s.replace(s"|${m.charAt(0)}|${m.charAt(1)}|", s"|$m|")
      s.count(_ == '|') - 1 - text.count(_ == ' ')
    }
    enc.foreach { r =>
      val t = docs(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tokens_bpe") == encode(t, 3),
        s"engine disagrees with straight-line 3-pass encode on ${r.getAs[Long]("doc_id")}")
      assert(encode(t, 3) == encode(t, 4),
        s"3 passes not converged on doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("repetition signals match a straight-line recomputation") {
    val got = TextAnalysis.repSignals(spark, sfTiny).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { d =>
      val toks = "[a-z0-9]+".r.findAllIn(d.getString(1)).toSeq
      val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val row = got(d.getLong(0))
      assert(row.getAs[Long]("n_tokens") == toks.size)
      assert(row.getAs[Long]("top_token_count") ==
        toks.groupBy(identity).values.map(_.size).max)
      assert(row.getAs[Long]("n_bigrams") == bigrams.size)
      assert(row.getAs[Long]("dup_bigram_excess") ==
        bigrams.size - bigrams.distinct.size)
      val f = row.getAs[Double]("dup_bigram_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("dup_spans matches a straight-line recomputation and is non-vacuous") {
    val got = DedupOps.dupSpans(spark, sfTiny).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "text").collect()
      .map(d => d.getLong(0) -> "[a-z0-9]+".r.findAllIn(d.getString(1)).toSeq)
    val grams = docs.map { case (id, toks) =>
      id -> toks.sliding(8).filter(_.size == 8).map(_.mkString(" ")).toSeq
    }.toMap
    val docFreq = grams.toSeq
      .flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    grams.foreach { case (id, gs) =>
      if (gs.isEmpty) assert(!got.contains(id), s"doc $id has <8 tokens but a row")
      else {
        val row = got(id)
        assert(row.getAs[Long]("n_grams") == gs.size)
        assert(row.getAs[Long]("n_dup_grams") == gs.count(docFreq(_) >= 2))
      }
    }
    assert(got.values.exists(_.getAs[Long]("n_dup_grams") > 0),
      "corpus has no cross-doc duplicated 8-grams — the gate would be vacuous")
  }

  test("dedup_spans_apply: cleaned text = tokens minus covered positions, both outcomes") {
    val signal = DedupOps.dupSpans(spark, sfTiny).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_grams")).toMap
    val rows = DedupOps.dedupSpansApply(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val clean = r.getAs[String]("clean_text")
      val nTok = r.getAs[Long]("n_tokens")
      val nDrop = r.getAs[Long]("n_dropped")
      // rejoining kept [a-z0-9]+ tokens with spaces preserves token count
      val keptToks = "[a-z0-9]+".r.findAllIn(clean).size
      assert(keptToks == nTok - nDrop,
        s"doc $id: clean_text has $keptToks tokens, expected ${nTok - nDrop}")
      // a doc is trimmed iff dup_spans measured a duplicated gram in it:
      // every dup gram start covers >= L positions, none covers zero
      val hasDup = signal.getOrElse(id, 0L) > 0
      assert((nDrop > 0) == hasDup,
        s"doc $id: n_dropped=$nDrop but dup_spans n_dup_grams=${signal.getOrElse(id, 0L)}")
      if (hasDup) assert(nDrop >= 8, s"doc $id: dup gram covers >= L positions")
    }
    assert(rows.exists(_.getAs[Long]("n_dropped") > 0) &&
      rows.exists(_.getAs[Long]("n_dropped") == 0),
      "apply pass is vacuous: need both trimmed and untouched docs")
  }

  test("gopher filter: verdict consistent with reasons, both outcomes present") {
    val rows = TextAnalysis.gopherFilter(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    val allowed = Set("length", "word_length", "no_stopwords", "top_token",
      "dup_bigrams", "boilerplate")
    rows.foreach { r =>
      val passed = r.getAs[Boolean]("passed")
      val reasons = r.getAs[String]("reject_reasons")
      assert(passed == reasons.isEmpty,
        s"verdict/reasons inconsistent: $r")
      if (reasons.nonEmpty)
        assert(reasons.split(",").forall(allowed), s"unknown reason in $r")
    }
    assert(rows.exists(_.getAs[Boolean]("passed")), "no doc passes — vacuous")
    assert(rows.exists(!_.getAs[Boolean]("passed")), "no doc fails — vacuous")
  }

  test("simhash pairs: banded candidates reproduce the exact all-pairs result") {
    import spark.implicits._
    // pigeonhole banding has PERFECT recall for hamming <= maxHamming —
    // the banded join must equal the brute-force pair set exactly
    val fp = DedupOps.simhash(spark, sfTiny, maxDocId = 300)
    val brute = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash32").bitwiseXOR(col("b.simhash32"))).cast("long"))
      .as[(Long, Long, Long)].collect().filter(_._3 <= 6).toSet
    val banded = DedupOps.simhashPairs(spark, sfTiny)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute,
      s"banding lost pairs: ${brute -- banded}; invented: ${banded -- brute}")
  }

  test("simhash: near-identical docs land at small Hamming distance") {
    import spark.implicits._
    // doc pairs sharing 95% of tokens should have closer fingerprints than
    // random pairs on average
    val fps = DedupOps.simhash(spark, sfTiny, maxDocId = 200)
      .as[(Long, Long)].collect().toMap
    assert(fps.size == 200)
    assert(fps.values.forall(v => v >= 0 && v <= 0xFFFFFFFFL))
  }

  test("text stats: ratios well-formed; tokenizer agrees with doc n_chars") {
    val rows = TextAnalysis.textStats(spark, sfTiny).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val nTokens = r.getAs[Long]("n_tokens")
      val nDistinct = r.getAs[Long]("n_distinct")
      val ttr = r.getAs[Double]("ttr")
      assert(nDistinct <= nTokens)
      assert(ttr > 0 && ttr <= 1.0)
    }
  }

  test("multimodal decode stub: mapPartitions plumbing produces typed features") {
    val media = MultimodalOps.mediaTable(spark, sfTiny)
    val feats = MultimodalOps.decodeImageStub(spark, media).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.width >= 16 && f.width < 656)
      assert(f.height >= 16 && f.height < 496)
      assert(f.n_channels == 3)
      assert(f.mean_luma > 0) // documents are non-empty ASCII
    }
    // deterministic: same input → same features
    val again = MultimodalOps.decodeImageStub(spark, media).collect()
    assert(feats.sortBy(_.doc_id).toSeq == again.sortBy(_.doc_id).toSeq)
  }

  test("multimodal frame sampler: deterministic one-to-many with bounded frames") {
    val media = MultimodalOps.mediaTable(spark, sfTiny)
    val frames = MultimodalOps.sampleFramesStub(spark, media).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.size == 500) // every doc yields ≥ 1 frame
    frames.foreach { f =>
      assert(f.frame_idx % 4 == 0)
      assert(f.n_bytes > 0 && f.n_bytes <= 64)
      assert(f.frame_hash.length == 16)
    }
    val again = MultimodalOps.sampleFramesStub(spark, media).collect()
    assert(frames.sortBy(f => (f.doc_id, f.frame_idx)).toSeq ==
      again.sortBy(f => (f.doc_id, f.frame_idx)).toSeq)
    // the frame_sample oracle slices by CHARACTER; byte == char only while
    // the corpus stays ASCII — fail loudly here rather than hash-mismatch
    // mysteriously in the gate if the generator ever emits multibyte text
    val nonAscii = graft.sources.Tables.documents(spark, sfTiny)
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    assert(nonAscii == 0, "corpus no longer ASCII — frame_sample oracle invalid")
  }

  test("shingles: short docs yield empty shingle sets, not errors") {
    import spark.implicits._
    val df = Seq((1L, "one two"), (2L, "one two three"), (3L, "")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"),
      DedupOps.shingles(TextAnalysis.tokens(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).isEmpty)
    assert(sh(2L) == Seq("one two three"))
    assert(sh(3L).isEmpty)
  }

  test("chunking: dropping each chunk's overlap reassembles the original tokens") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
    val orig = docs
      .select(col("doc_id"), concat_ws(" ", TextAnalysis.tokens(col("text"))).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      .filter(_._2.nonEmpty)
    val stride = 30 // chunkSize 40, overlap 10
    val rebuilt = TextAnalysis.chunkDocs(spark, sfTiny)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        val ordered = rows.sortBy(_.getLong(1))
        // chunk 0 whole; later chunks contribute tokens after the overlap
        val toks = ordered.flatMap { r =>
          val words = r.getString(2).split(" ").toSeq
          if (r.getLong(1) == 0L) words else words.drop(40 - stride)
        }
        id -> toks.mkString(" ")
      }
    assert(rebuilt.keySet == orig.keySet)
    rebuilt.foreach { case (id, s) =>
      assert(s == orig(id), s"doc $id: chunk reassembly diverges")
    }
  }

  test("dedup clusters: valid components of the candidate graph") {
    val edges = DedupOps.minhashLsh(spark, sfTiny)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = DedupOps.dedupClusters(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val cluster = rows.map(r => r._1 -> r._2).toMap
    // every candidate edge's endpoints share a cluster
    edges.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"edge ($a,$b) spans clusters")
    }
    // the representative is the minimum member and the only kept row
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"cluster $cid: id is not the min member")
      assert(members.count(_._4) == 1 && members.find(_._4).get._1 == cid)
      assert(members.forall(_._3 == members.length), s"cluster $cid: bad size")
    }
    // exactly the edge-incident nodes are clustered
    assert(rows.map(_._1).toSet == edges.flatMap(e => Seq(e._1, e._2)).toSet)
  }

  test("tfidf: per-doc ranks are consecutive and scores non-increasing") {
    val rows = TextAnalysis.tfidfTopK(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(4), r.getLong(5)))
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to byRank.length).toSeq,
        s"doc $doc: ranks not consecutive")
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2),
            s"doc $doc: rank order violates (score desc, term asc)")
        case _ =>
      }
    }
    assert(rows.nonEmpty)
  }

  test("bm25: top-k matches a straight-line in-memory BM25 on the tiny corpus") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tok = "[a-z0-9]+".r
    val toks = docs.map { case (id, t) => id -> tok.findAllIn(t).toVector }.toMap
    val qt = TextAnalysis.bm25Terms
    val n = docs.length.toLong
    val dTot = toks.values.map(_.length.toLong).sum
    val dfm = qt.map(t => t -> toks.values.count(_.contains(t)).toLong).toMap
    // same expression tree as the engine and the oracle — correctly-rounded
    // IEEE ops make this comparison bit-exact, no tolerance needed
    def score(id: Long): Double = {
      val dl = toks(id).length.toDouble
      qt.map { t =>
        val tf = toks(id).count(_ == t).toDouble
        val idf = (dfm(t) * -2 + (n * 2 + 1)).toDouble / (dfm(t) * 2 + 1).toDouble
        idf * (tf * 2.2 / (tf + 0.3 + 0.9 * dl * n / dTot))
      }.reduceLeft(_ + _)
    }
    val expected = docs.map(_._1).filter(id => qt.exists(toks(id).contains))
      .map(id => (id, score(id)))
      .sortBy { case (id, s) => (-s, id) }.take(10).toSeq
    val got = TextAnalysis.bm25TopK(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getDouble(r.fieldIndex("score")))).toSeq
    assert(got == expected, s"BM25 top-10 diverged:\n got=$got\n exp=$expected")
  }

  test("score_select_scaled: claims hold and the cutoff set recalls the exact-rank set") {
    val report = TextAnalysis.scoreSelectScaled(spark, sfTiny).collect()
    assert(report.nonEmpty)
    report.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("within_bound")),
        s"lang ${r.getString(0)}: two-pass kept count outside tolerance of the exact target")
    }
    val exact = TextAnalysis.scoreSelect(spark, sfTiny).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getString(r.fieldIndex("lang")))).toSet
    val cutoff = TextAnalysis.scoreSelectScaledRows(spark, sfTiny).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getString(r.fieldIndex("lang")))).toSet
    val recall = (exact & cutoff).size.toDouble / exact.size
    // the two selections may legitimately differ at the tied boundary
    // score; away from it they must agree
    assert(recall >= 0.9, f"two-pass selection recalls only $recall%.2f of the exact-rank set")
  }

  test("pq_topk: ADC ranking recalls the exact same-cell scorer; shape is deterministic") {
    val k = 3
    val pq = SimilarityOps.pqTopK(spark, sfTiny, k = k).collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")), r.getLong(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("neighbor_id"))))
    // per-query: ranks consecutive from 1
    pq.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq,
        s"query $q: ranks not consecutive")
    }
    // recall@k vs the EXACT scorer over the same IVF candidates (ivfTopK):
    // candidates are identical and the final stage re-ranks exactly, so a
    // true top-k row is lost only when the ADC shortlist (top-16) misses
    // it — measured 0.93 at this SF; 0.75 leaves noise margin
    val exact = SimilarityOps.ivfTopK(spark, sfTiny, k = k).collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")), r.getLong(r.fieldIndex("neighbor_id"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = pq.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val hits = exact.keys.toSeq.map(q => (exact(q) & got.getOrElse(q, Set())).size).sum
    val total = exact.values.map(_.size).sum
    val recall = hits.toDouble / total
    assert(recall >= 0.75, f"PQ recall@$k vs exact same-cell scorer is $recall%.2f (< 0.75)")
  }

  test("ivf_recall: gated curve is monotone in nprobe and bounded by 100%") {
    val rows = SimilarityOps.ivfRecall(spark, sfTiny).collect()
      .map(r => (r.getLong(r.fieldIndex("nprobe")),
        r.getLong(r.fieldIndex("n_hits")), r.getLong(r.fieldIndex("recall_ppm"))))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L),
      s"expected one gated row per probed nprobe, got ${rows.toSeq}")
    assert(rows.forall(_._3 <= 1000000L))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._3,
        s"recall not monotone: nprobe ${a._1} → ${b._1} went ${a._3} → ${b._3}")
      case _ =>
    }
  }

  test("bm25 stored postings index: bucket-pruned probe is row-identical to the one-pass query") {
    TextAnalysis.writePostingsIndex(spark, sfTiny, "bm25_postings_test", buckets = 8)
    // autoBucketedScan silently converts the scan to non-bucketed when the
    // plan has no join/agg on the bucket key — which also forfeits bucket
    // PRUNING, the entire point of the layout for a term probe. Production
    // index probes pin it off; mirror that here.
    val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val probe = TextAnalysis.bm25TopKFromIndex(spark, "bm25_postings_test")
      val got = probe.collect().map(_.toSeq).toSeq
      val want = TextAnalysis.bm25TopK(spark, sfTiny).collect().map(_.toSeq).toSeq
      assert(got == want,
        s"stored-index probe diverges from the one-pass query:\n got=$got\n want=$want")
      // the probe's term filter must prune buckets, not scan all postings
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"postings probe reads every bucket (no bucket pruning):\n$plan")
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
      spark.sql("DROP TABLE IF EXISTS bm25_postings_test")
      spark.sql("DROP TABLE IF EXISTS bm25_postings_test_stats")
    }
  }

  test("memoizedPostingsIndex: content-only regeneration rebuilds; probe tracks live") {
    val dir = "/tmp/graft-bm25-memo"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    spark.read.parquet(s"$sfTiny/documents.parquet")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    DedupOps.invalidateDerived(dir)
    def probe(): Seq[Seq[Any]] =
      TextAnalysis.bm25TopKFromIndex(spark,
          TextAnalysis.memoizedPostingsIndex(spark, dir))
        .collect().map(_.toSeq).toSeq
    def live(): Seq[Seq[Any]] =
      TextAnalysis.bm25TopK(spark, dir).collect().map(_.toSeq).toSeq
    val before = probe()
    assert(before == live())
    // in-place regeneration that preserves row count AND max doc_id but
    // changes text (longer docs shift the BM25 length normalization): the
    // file-signature fingerprint term must force a rebuild unaided
    spark.read.parquet(s"$sfTiny/documents.parquet")
      .withColumn("text", concat(col("text"), lit(" regenerated shard body text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val after = probe()
    assert(after == live(),
      "post-regeneration postings probe diverged from the one-pass query — stale index served")
    assert(after != before, "regeneration changed no scores — mutation too weak to detect staleness")
  }

  test("bm25 incremental index: base∪delta probe == one-pass query; compaction preserves it") {
    import org.apache.spark.sql.functions.col
    // base = already-indexed corpus, delta = newly ingested shard
    TextAnalysis.writePostingsGeneration(spark, sfTiny,
      col("doc_id") % 10 < 8, "bm25_inc_base", buckets = 8)
    TextAnalysis.writePostingsGeneration(spark, sfTiny,
      col("doc_id") % 10 >= 8, "bm25_inc_delta", buckets = 8)
    val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val gens = Seq("bm25_inc_base", "bm25_inc_delta")
      val probe = TextAnalysis.bm25TopKIncremental(spark, gens)
      val got = probe.collect().map(_.toSeq).toSeq
      val want = TextAnalysis.bm25TopK(spark, sfTiny).collect().map(_.toSeq).toSeq
      assert(got == want,
        s"incremental probe diverges from the one-pass query:\n got=$got\n want=$want")
      // the union must NOT defeat bucket pruning: every generation scan in
      // the plan (they appear once per consumer — df agg + scoring) prunes
      // to the query terms' buckets, reading strictly fewer than all 8
      val plan = probe.queryExecution.executedPlan.toString
      val prunes = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findAllMatchIn(plan).map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
      assert(prunes.size >= 2, s"generation scans not bucket-pruned:\n$plan")
      prunes.foreach { case (sel, tot) =>
        assert(sel < tot, s"a scan read every bucket ($sel of $tot):\n$plan")
      }
      // compaction: one merged generation, probe unchanged
      TextAnalysis.compactPostings(spark, gens, "bm25_inc_merged", buckets = 8)
      val merged = TextAnalysis.bm25TopKIncremental(spark, Seq("bm25_inc_merged"))
        .collect().map(_.toSeq).toSeq
      assert(merged == got, "compacted probe diverges from the generational probe")
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
      Seq("bm25_inc_base", "bm25_inc_delta", "bm25_inc_merged").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"DROP TABLE IF EXISTS ${t}_stats")
      }
    }
  }

  test("semantic_clusters: components agree with the τ-near edge set") {
    val edges = SimilarityOps.semDedupPairs(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = SimilarityOps.semanticClusters(spark, sfTiny).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")), r.getLong(r.fieldIndex("cluster_id")),
        r.getLong(r.fieldIndex("cluster_size")), r.getBoolean(r.fieldIndex("keep"))))
    val label = rows.map(r => r._1 -> r._2).toMap
    // every τ-near pair ends up in one cluster
    edges.foreach { case (a, b) =>
      assert(label(a) == label(b), s"edge ($a,$b) straddles clusters")
    }
    // cluster id is the min member, exactly one keep per cluster, sizes hold
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"cluster $cid: id is not the min member")
      assert(members.count(_._4) == 1 && members.find(_._4).get._1 == cid)
      assert(members.forall(_._3 == members.length), s"cluster $cid: bad size")
    }
    // exactly the edge-incident vectors are clustered
    assert(rows.map(_._1).toSet == edges.flatMap(e => Seq(e._1, e._2)).toSet)
  }

  test("cluster_cap_sample: at most cap keeps per semantic cluster, singletons always kept") {
    val cap = 2
    val rows = graft.functions.CurationOps.clusterCapSample(spark, sfTiny, cap)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("cluster_id")),
        r.getLong(r.fieldIndex("cluster_size")),
        r.getLong(r.fieldIndex("rank")),
        r.getBoolean(r.fieldIndex("keep"))))
    // one verdict per embedded doc — the policy must judge the whole corpus
    val nVecs = spark.read.parquet(s"$sfTiny/embeddings.parquet").count()
    assert(rows.length == nVecs, "not every embedded doc got a verdict")
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.count(_._5) == math.min(cap, members.length),
        s"cluster $cid: keeps != min(cap, size)")
      assert(members.forall(m => m._3 == members.length), s"cluster $cid: bad size")
      assert(members.map(_._4).sorted.toSeq == (1L to members.length).toSeq,
        s"cluster $cid: ranks not consecutive")
      // the kept members are exactly the top-ranked ones
      members.foreach(m => assert(m._5 == (m._4 <= cap)))
    }
    // singleton docs (no τ-near neighbor) form their own cluster and survive
    val singles = rows.filter(_._3 == 1)
    assert(singles.nonEmpty && singles.forall(_._5), "singletons not all kept")
    // the cluster map agrees with semantic_clusters on clustered vectors
    val sc = SimilarityOps.semanticClusters(spark, sfTiny).collect()
      .map(r => r.getLong(r.fieldIndex("vec_id")) ->
        r.getLong(r.fieldIndex("cluster_id"))).toMap
    val byDoc = rows.map(r => r._1 -> r._2).toMap
    sc.foreach { case (v, c) => assert(byDoc(v) == c,
      s"doc $v: cap-sample cluster ${byDoc(v)} != semantic cluster $c") }
    // non-vacuous: some cluster actually exceeds the cap
    assert(rows.exists(r => r._3 > cap), "no cluster above cap — policy untested")
  }

  test("minhash_containment: dominates jaccard on shared pairs and is a true max") {
    val cont = DedupOps.minhashContainment(spark, sfTiny).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(r.fieldIndex("containment_1")),
          r.getDouble(r.fieldIndex("containment_2")),
          r.getDouble(r.fieldIndex("containment"))))).toMap
    assert(cont.nonEmpty)
    cont.values.foreach { case (c1, c2, cm) =>
      assert(cm == math.max(c1, c2))
      assert(c1 > 0 && c1 <= 1 && c2 > 0 && c2 <= 1)
    }
    // C(A,B) = |A∩B|/|A| ≥ |A∩B|/|A∪B| = J(A,B) — on every pair both emit
    val jac = DedupOps.ngramJaccardLsh(spark, sfTiny).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(r.fieldIndex("jaccard")))).toMap
    val shared = cont.keySet & jac.keySet
    assert(shared.nonEmpty)
    shared.foreach { k =>
      assert(cont(k)._3 >= jac(k),
        s"pair $k: max containment ${cont(k)._3} < jaccard ${jac(k)}")
    }
  }

  test("export_shards: complete, balanced, and gap-free per-shard positions") {
    val rows = CurationOps.exportShards(spark, sfTiny).collect()
      .map(r => (r.getLong(r.fieldIndex("shard")), r.getLong(r.fieldIndex("pos")),
        r.getLong(r.fieldIndex("doc_id"))))
    val total = graft.sources.Tables.documents(spark, sfTiny).count()
    assert(rows.length == total, "export must deal out every document exactly once")
    assert(rows.map(_._3).distinct.length == rows.length)
    val byShard = rows.groupBy(_._1)
    assert(byShard.keySet.forall(s => s >= 0 && s < 16))
    byShard.foreach { case (s, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq,
        s"shard $s: positions not 1..n")
    }
    // hash-mod dealing keeps shards statistically balanced
    val sizes = byShard.values.map(_.length)
    assert(sizes.min * 4 >= sizes.max,
      s"shard imbalance beyond hash-uniform expectation: ${sizes.toSeq.sorted}")
  }

  test("knn_graph: restricted to the query ids it equals ivfTopK at nprobe=1") {
    val graph = SimilarityOps.knnGraph(spark, sfTiny, k = 5).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")), r.getLong(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("neighbor_id")), r.getDouble(r.fieldIndex("cos"))))
    val probe = SimilarityOps.ivfTopK(spark, sfTiny, nQueries = 20, k = 5).collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")), r.getLong(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("neighbor_id")), r.getDouble(r.fieldIndex("score"))))
      .toSet
    assert(graph.filter(_._1 < 20).toSet == probe,
      "kNN graph rows for the query ids diverge from the per-query IVF probe")
    // per-vertex sanity: ranks consecutive, scores non-increasing
    graph.groupBy(_._1).foreach { case (v, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length).toSeq,
        s"vec $v: ranks not consecutive")
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4; case _ => true
      }, s"vec $v: cos not non-increasing in rank")
    }
    assert(graph.nonEmpty)
  }
}
