package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.functions.{CurationOps, DedupOps, FrequentItems, MultimodalOps, SimilarityOps, TextAnalysis}
import graft.oracle.{OlapSql, OracleSql, TextSql}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a SURVEY §2 operator (or an LLM-pipeline
  * operator per the driver contract) expressed as a declarative Spark query;
  * every entry in [[oracleSql]] is its DuckDB mirror for the hash-exact
  * correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the two-sided top-k order book (SURVEY §3.2).
    */
  def entry(spark: SparkSession): DataFrame =
    BookQueries.orderbook(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── order-book engine (SURVEY §2.3-2.5, §2.8) ──────────────────────────
    "orders_current"    -> ((s, d) => BookQueries.ordersCurrentQ(s, d)),
    "price_levels"      -> ((s, d) => BookQueries.priceLevelsQ(s, d)),
    "latest_price"      -> ((s, d) => BookQueries.latestPriceQ(s, d)),
    "orderbook"         -> ((s, d) => BookQueries.orderbook(s, d)),
    "orderbook_summary" -> ((s, d) => BookQueries.orderbookSummary(s, d)),
    "amount_out_buy"    -> ((s, d) => BookQueries.amountOutBuy(s, d)),
    "amount_out_sell"   -> ((s, d) => BookQueries.amountOutSell(s, d)),
    "user_orders"       -> ((s, d) => BookQueries.userOrders(s, d)),
    "order_lookup"      -> ((s, d) => BookQueries.orderLookup(s, d)),
    "user_market_orders" -> ((s, d) => BookQueries.userMarketOrders(s, d)),
    "pool_info"         -> ((s, d) => BookQueries.poolInfo(s, d)),
    // the reference's NATIVE core: order_id-keyed fold over the full wire
    // ingest path (JSON payloads → fixed-point scaling → one hash agg)
    "wire_orders_current" -> ((s, d) => WireOrderFold.wireOrdersCurrent(s, d)),
    // fidelity mode: trusts OrderFilled's event-carried running accounting
    // (order-book.ts:146-167) — identical to derived on a clean stream, so
    // the same oracle gates both folds
    "wire_orders_fidelity" -> ((s, d) =>
      WireOrderFold.wireOrdersCurrent(s, d, fidelity = true)),
    // factory stream → pool registry (S3/S4 + QuoteTokenAdded through the
    // wire parse path)
    "wire_pool_catalog" -> ((s, d) => WireCatalog.wirePoolCatalog(s, d)),
    // the remaining reference views through the wire path: latest_price
    // (order-book.ts:361-368), per-trader market-order history (:184-194),
    // and amount-out composed over the wire-built book (:262-333) — the full
    // ingest→fold→view→scan chain under one oracle
    "wire_latest_price"  -> ((s, d) => WireViews.wireLatestPrice(s, d)),
    "wire_market_orders" -> ((s, d) => WireViews.wireMarketOrders(s, d)),
    "wire_amount_out"    -> ((s, d) => WireViews.wireAmountOutBuy(s, d)),
    "wire_amount_out_sell" -> ((s, d) => WireViews.wireAmountOutSell(s, d)),
    // ── OLAP / bench surface (SURVEY §7.2 M7) ──────────────────────────────
    "q1_pricing_summary"  -> ((s, d) => Olap.q1PricingSummary(s, d)),
    "q6_revenue"          -> ((s, d) => Olap.q6Revenue(s, d)),
    "q3_shipping_priority" -> ((s, d) => Olap.q3ShippingPriority(s, d)),
    "q5_local_supplier"   -> ((s, d) => Olap.q5LocalSupplier(s, d)),
    "top_parts_per_brand" -> ((s, d) => Olap.qTopPartsPerBrand(s, d)),
    "rollup_lineitem"     -> ((s, d) => Olap.qRollup(s, d)),
    "distinct_agg"        -> ((s, d) => Olap.qDistinctAgg(s, d)),
    "semi_anti_join"      -> ((s, d) => Olap.qSemiAnti(s, d)),
    "cumulative_monthly"  -> ((s, d) => Olap.qCumulativeMonthly(s, d)),
    "sessionize"          -> ((s, d) => Olap.qSessionize(s, d)),
    // ordered view->click->purchase funnel: one shuffle, row-local HOF chain
    "funnel"              -> ((s, d) => Olap.qFunnel(s, d)),
    // weekly cohort x offset retention table, integer-exact
    "retention_cohorts"   -> ((s, d) => Olap.qRetentionCohorts(s, d)),
    "event_pivot"         -> ((s, d) => Olap.qEventPivot(s, d)),
    "json_bucket"         -> ((s, d) => Olap.qJsonBucket(s, d)),
    "string_funcs"        -> ((s, d) => Olap.qStringFuncs(s, d)),
    "quantiles"           -> ((s, d) => Olap.qQuantiles(s, d)),
    "exists_having"       -> ((s, d) => Olap.qExistsHaving(s, d)),
    "grouping_sets"       -> ((s, d) => Olap.qGroupingSets(s, d)),
    "value_stats"         -> ((s, d) => Olap.qValueStats(s, d)),
    "cube_returns"        -> ((s, d) => Olap.qCube(s, d)),
    "daily_revenue_delta" -> ((s, d) => Olap.qDailyDelta(s, d)),
    "set_ops"             -> ((s, d) => Olap.qSetOps(s, d)),
    "customer_deciles"    -> ((s, d) => Olap.qCustomerDeciles(s, d)),
    "range_band_join"     -> ((s, d) => Olap.qRangeBandJoin(s, d)),
    "correlated_subquery" -> ((s, d) => Olap.qCorrelatedSubquery(s, d)),
    "trailing_30d"        -> ((s, d) => Olap.qTrailing30d(s, d)),
    // sketch CLAIM queries: cross-engine sketches differ, so the gated
    // output is (exact side, within_bound) — the estimate is computed but
    // never hashed; the oracle checks the exact columns and the claim
    "approx_distinct"     -> ((s, d) => Olap.qApproxDistinct(s, d)),
    "approx_quantiles"    -> ((s, d) => Olap.qApproxQuantiles(s, d)),
    // ── LLM-data-pipeline operators (driver contract / SURVEY §7.2 M8) ────
    "text_stats"      -> ((s, d) => TextAnalysis.textStats(s, d)),
    "lang_id"         -> ((s, d) => TextAnalysis.langId(s, d)),
    "fingerprint"     -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "dedup_exact"     -> ((s, d) => DedupOps.exactDedup(s, d)),
    "ngram_jaccard"   -> ((s, d) => DedupOps.ngramJaccard(s, d)),
    // the scale-path composition: exact jaccard verify on LSH candidates
    // only, no doc-id bound (the all-pairs form above is the yardstick)
    "ngram_jaccard_lsh" -> ((s, d) => DedupOps.ngramJaccardLsh(s, d)),
    // asymmetric containment verify on the same candidates (partial dups)
    "minhash_containment" -> ((s, d) => DedupOps.minhashContainment(s, d)),
    "dup_spans"       -> ((s, d) => DedupOps.dupSpans(s, d)),
    // the transform the signal motivates: duplicated spans removed,
    // cleaned text re-emitted (Lee et al. substring dedup, apply side)
    "dedup_spans_apply" -> ((s, d) => DedupOps.dedupSpansApply(s, d)),
    "minhash_lsh"     -> ((s, d) => DedupOps.minhashLsh(s, d)),
    // incremental admission: dedupe an incoming shard against the immutable
    // corpus (batch analog of streaming/IngestDedup), asymmetric banding probe
    "shard_dedup"     -> ((s, d) => DedupOps.shardDedup(s, d)),
    // the same gate probing the STORED corpus index (built once per dir —
    // the 100 TB form: probe-time plans never scan corpus text); same
    // oracle as shard_dedup because the output contract is identical
    "shard_dedup_indexed" -> ((s, d) =>
      DedupOps.shardDedupFromIndex(s, d, DedupOps.memoizedMinhashIndex(s, d))),
    // deletion without a rebuild: tombstoned corpus docs stop producing
    // admission candidates (broadcast anti-join on the candidate set) —
    // oracle recomputes admission over a corpus never containing them
    "shard_dedup_deleted" -> ((s, d) => DedupOps.shardDedupDeleted(s, d)),
    "dedup_clusters"  -> ((s, d) => DedupOps.dedupClusters(s, d)),
    // the un-memoized fixpoint: same result, but BENCH times the iterative
    // algorithm here while dedup_clusters times the materialized-view read
    "dedup_clusters_fresh" -> ((s, d) => DedupOps.dedupClustersFresh(s, d)),
    // incremental maintenance: the shard's edges merged into the converged
    // corpus assignment via the delta-sized label-graph fixpoint — same
    // converged output, corpus never re-folded (componentsDelta)
    "dedup_clusters_delta" -> ((s, d) => DedupOps.dedupClustersDelta(s, d)),
    // takedown maintenance: deletion can SPLIT a component, so affected
    // components recompute locally from the view's persisted edge set
    // pruned to surviving members; untouched components pass through
    "dedup_clusters_deleted" -> ((s, d) => DedupOps.dedupClustersDeleted(s, d)),
    // MIXED maintenance (one pass): shard edges merge in AND the takedown
    // set applies — componentsDelta composed with componentsDeleteDelta
    // over the persisted base ∪ delta edge list; oracle is the closure
    // over a corpus containing the shard, never containing the deleted
    "dedup_clusters_mixed" -> ((s, d) => DedupOps.dedupClustersMixed(s, d)),
    "dedup_select"    -> ((s, d) => CurationOps.dedupSelect(s, d)),
    // topic balancing: at most `cap` docs per semantic (embedding τ-near)
    // cluster, ranked by the deterministic dedup_select election rule
    "cluster_cap_sample" -> ((s, d) => CurationOps.clusterCapSample(s, d)),
    // eval-integrity split: hash of the near-dup CLUSTER id, so near-dups
    // can never straddle train/val/test
    "leakage_split"   -> ((s, d) => CurationOps.leakageSplit(s, d)),
    "decontaminate"   -> ((s, d) => CurationOps.decontaminate(s, d)),
    "decontaminate_bloom" -> ((s, d) => CurationOps.decontaminateBloom(s, d)),
    "domain_mix"      -> ((s, d) => CurationOps.domainMix(s, d)),
    // ingestion-gate column profile: one unpivot pass, staged distinct agg
    "data_profile"    -> ((s, d) => CurationOps.dataProfile(s, d)),
    // per-(source, lang) quality rollup sharing quality_filter's signals
    "source_quality_report" -> ((s, d) => CurationOps.sourceQualityReport(s, d)),
    // the apply side of domain_mix: the rebalanced corpus itself
    "mix_apply"       -> ((s, d) => CurationOps.mixApply(s, d)),
    // the upsample side: fractional-epoch repeat factors, deterministic
    "mix_upsample"    -> ((s, d) => CurationOps.mixUpsample(s, d)),
    // capstone: quality gate ∘ canonical dedup ∘ span removal as ONE plan
    "corpus_clean"    -> ((s, d) => CurationOps.corpusClean(s, d)),
    // PII scrub: redaction + category counts + deterministic pseudonym
    "pii_redact"      -> ((s, d) => CurationOps.piiRedact(s, d)),
    // eval-integrity audit: which train doc contaminates which test doc
    "contamination_report" -> ((s, d) => CurationOps.contaminationReport(s, d)),
    // quasi-identifier generalization: residual roll-up k-anonymity
    "k_anonymize"     -> ((s, d) => CurationOps.kAnonymize(s, d)),
    // banding-parameter evaluator: empirical LSH S-curve vs exact truth
    "lsh_recall"      -> ((s, d) => DedupOps.lshRecall(s, d)),
    // tokenizer apply side: frozen vocab, scan-speed symbol merging
    "bpe_encode"      -> ((s, d) => TextAnalysis.bpeEncode(s, d)),
    "embed_quantize"  -> ((s, d) => CurationOps.embedQuantize(s, d)),
    "pack_chunks"     -> ((s, d) => CurationOps.packChunks(s, d)),
    // deterministic training-export shuffle + sharding (write side)
    "export_shards"   -> ((s, d) => CurationOps.exportShards(s, d)),
    "simhash"         -> ((s, d) => DedupOps.simhash(s, d)),
    "simhash_pairs"   -> ((s, d) => DedupOps.simhashPairs(s, d)),
    "cosine_topk"     -> ((s, d) => SimilarityOps.cosineTopK(s, d)),
    "lsh_buckets"     -> ((s, d) => SimilarityOps.lshBuckets(s, d)),
    "lsh_topk"        -> ((s, d) => SimilarityOps.lshTopK(s, d)),
    "multimodal_meta" -> ((s, d) => MultimodalOps.multimodalMeta(s, d)),
    // typed one-to-many decode shape, gated differentially (mapPartitions
    // flatMap on the engine side vs a set-based unnest in the oracle)
    "frame_sample"    -> ((s, d) =>
      MultimodalOps.sampleFramesStub(s, MultimodalOps.mediaTable(s, d)).toDF),
    // codec-free media near-dup: byte-window MinHash-LSH over the blob
    // column (reuses the text banding engine on byte shingles), and
    // frame-hash overlap with stop-frame pruning — media curation's dedup
    // pass without ever decoding a container
    "media_dedup"     -> ((s, d) => MultimodalOps.mediaDedup(s, d)),
    "frame_dedup"     -> ((s, d) => MultimodalOps.frameDedup(s, d)),
    "asof_price_join" -> ((s, d) => AsofJoin.marketOrdersWithAsofPrice(s, d)),
    "label_centroids" -> ((s, d) => SimilarityOps.labelCentroids(s, d)),
    "ivf_topk"        -> ((s, d) => SimilarityOps.ivfTopK(s, d)),
    // all-vectors kNN graph over the same cell index
    "knn_graph"       -> ((s, d) => SimilarityOps.knnGraph(s, d)),
    // the nprobe dial, hash-gated: recall@5 vs exact truth per nprobe
    "ivf_recall"      -> ((s, d) => SimilarityOps.ivfRecall(s, d)),
    // IVF-PQ: cell-bounded candidates scored through quantized codes
    "pq_topk"         -> ((s, d) => SimilarityOps.pqTopK(s, d)),
    // the same probe served from the STORED layouts (memoized build per
    // dir) — bit-exact twin, same oracle; the form whose cost is
    // independent of the encode stage (tools/index_bench_*.json)
    "pq_topk_indexed" -> ((s, d) => {
      val (pq, cell) = SimilarityOps.memoizedPqIndex(s, d)
      SimilarityOps.pqTopKFromIndex(s, pq, cell)
    }),
    // deletion without a rebuild (takedown / right-to-be-forgotten):
    // tombstoned vectors anti-joined out of both probe roles, frozen
    // codebook — oracle is a from-scratch ranking of the survivors
    "pq_topk_deleted" -> ((s, d) => SimilarityOps.pqTopKDeleted(s, d)),
    "embedding_dedup" -> ((s, d) => SimilarityOps.embeddingDedup(s, d)),
    // retrieval consumers: majority-vote label prediction over the exact
    // neighbor list, and RRF fusion of the lexical + dense rankings
    "knn_classify"    -> ((s, d) => SimilarityOps.knnClassify(s, d)),
    "hybrid_topk"     -> ((s, d) => SimilarityOps.hybridTopK(s, d)),
    // SemDeDup (Abbas et al. 2023): cluster-then-prune semantic dedup —
    // within-cell near-dup pruning over the stored IVF cell assignment
    "semdedup"        -> ((s, d) => SimilarityOps.semDedup(s, d)),
    // connected components over the same τ-near graph (semantic clusters)
    "semantic_clusters" -> ((s, d) => SimilarityOps.semanticClusters(s, d)),
    // the un-memoized fixpoint (semantic_clusters times the view read)
    "semantic_clusters_fresh" -> ((s, d) =>
      SimilarityOps.semanticClustersFresh(s, d)),
    // incremental maintenance: new vectors' τ-near edges merged into the
    // converged assignment via the delta-sized label-graph fixpoint
    "semantic_clusters_delta" -> ((s, d) =>
      SimilarityOps.semanticClustersDelta(s, d)),
    // takedown maintenance, embedding side: component-local recompute
    // over the persisted τ-near edge set pruned to surviving members
    "semantic_clusters_deleted" -> ((s, d) =>
      SimilarityOps.semanticClustersDeleted(s, d)),
    // mixed add+takedown maintenance, embedding side
    "semantic_clusters_mixed" -> ((s, d) =>
      SimilarityOps.semanticClustersMixed(s, d)),
    // scaled-k quantizer family (the k ∝ N dial — bounded cells, linear
    // pair cost): the per-vector cell map, SemDeDup, and components over it
    "scaled_cells"    -> ((s, d) => SimilarityOps.scaledCells(s, d)),
    "semdedup_scaled" -> ((s, d) => SimilarityOps.semDedupScaled(s, d)),
    "semantic_clusters_scaled" -> ((s, d) =>
      SimilarityOps.semanticClustersScaled(s, d)),
    // the quality trade, pinned: fraction of fixed-k τ-near pairs the
    // bounded cells preserve (integer ppm — the ivf_recall discipline)
    "scaled_pair_recall" -> ((s, d) => SimilarityOps.scaledPairRecall(s, d)),
    // the log-depth probe over the scaled quantizer: ~2√T cosines per
    // assignment instead of T, pinned per-vector + its recall trade
    "tree_cells"       -> ((s, d) => SimilarityOps.treeCells(s, d)),
    "tree_pair_recall" -> ((s, d) => SimilarityOps.treePairRecall(s, d)),
    "token_counts"    -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    "quality_filter"  -> ((s, d) => TextAnalysis.qualityFilter(s, d)),
    // CCNet-style reference-frequency scoring (exact-arithmetic LM proxy)
    "freq_score"      -> ((s, d) => TextAnalysis.freqScore(s, d)),
    // the consumer of that score: per-language top-p% selection
    "score_select"    -> ((s, d) => TextAnalysis.scoreSelect(s, d)),
    // its 100 TB two-pass realization (quantile cutoff, claim-gated)
    "score_select_scaled" -> ((s, d) => TextAnalysis.scoreSelectScaled(s, d)),
    "chunk_docs"      -> ((s, d) => TextAnalysis.chunkDocs(s, d)),
    "tfidf_topk"      -> ((s, d) => TextAnalysis.tfidfTopK(s, d)),
    // lexical ranked retrieval — the keyword twin of the ANN path
    "bm25_topk"       -> ((s, d) => TextAnalysis.bm25TopK(s, d)),
    // probing the stored bucket-pruned postings (memoized build per dir);
    // row-identical to the one-pass form, same oracle
    "bm25_topk_indexed" -> ((s, d) =>
      TextAnalysis.bm25TopKFromIndex(s, TextAnalysis.memoizedPostingsIndex(s, d))),
    // deletion without a rebuild: broadcast anti-join on the postings +
    // EXACT stats correction from the doclens sidecar — scores equal a
    // from-scratch index of the surviving docs (the oracle computes one)
    "bm25_topk_deleted" -> ((s, d) => TextAnalysis.bm25TopKDeleted(s, d)),
    "stratified_sample" -> ((s, d) => TextAnalysis.stratifiedSample(s, d)),
    "rep_signals"     -> ((s, d) => TextAnalysis.repSignals(s, d)),
    // tokenizer-training: first BPE merge iteration (pair counts over vocab)
    "bpe_merges"      -> ((s, d) => TextAnalysis.bpeMerges(s, d)),
    // entity resolution: q-gram-filtered levenshtein pairing over part names
    "fuzzy_pairs"     -> ((s, d) => TextAnalysis.fuzzyPairs(s, d)),
    "gopher_filter"   -> ((s, d) => TextAnalysis.gopherFilter(s, d)),
    "approx_topk"     -> ((s, d) => FrequentItems.approxTopK(s, d)),
  )

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "orders_current"    -> OracleSql.ordersCurrentSql,
    "price_levels"      -> OracleSql.priceLevelsSql,
    "latest_price"      -> OracleSql.latestPriceSql,
    "orderbook"         -> OracleSql.orderbookSql,
    "orderbook_summary" -> OracleSql.orderbookSummarySql,
    "amount_out_buy"    -> OracleSql.amountOutBuySql,
    "amount_out_sell"   -> OracleSql.amountOutSellSql,
    "user_orders"       -> OracleSql.userOrdersSql,
    "order_lookup"      -> OracleSql.orderLookupSql,
    "user_market_orders" -> OracleSql.userMarketOrdersSql,
    "pool_info"         -> OracleSql.poolInfoSql,
    "wire_orders_current" -> OracleSql.wireOrdersCurrentSql,
    "wire_orders_fidelity" -> OracleSql.wireOrdersCurrentSql,
    "wire_pool_catalog" -> OracleSql.wirePoolCatalogSql,
    "wire_latest_price"  -> OracleSql.wireLatestPriceSql,
    "wire_market_orders" -> OracleSql.wireMarketOrdersSql,
    "wire_amount_out"    -> OracleSql.wireAmountOutBuySql,
    "wire_amount_out_sell" -> OracleSql.wireAmountOutSellSql,
    "q1_pricing_summary"  -> OlapSql.q1Sql,
    "q6_revenue"          -> OlapSql.q6Sql,
    "q3_shipping_priority" -> OlapSql.q3Sql,
    "q5_local_supplier"   -> OlapSql.q5Sql,
    "top_parts_per_brand" -> OlapSql.qTopPartsSql,
    "rollup_lineitem"     -> OlapSql.qRollupSql,
    "distinct_agg"        -> OlapSql.qDistinctAggSql,
    "semi_anti_join"      -> OlapSql.qSemiAntiSql,
    "cumulative_monthly"  -> OlapSql.qCumulativeMonthlySql,
    "sessionize"          -> OlapSql.qSessionizeSql,
    "funnel"              -> OlapSql.qFunnelSql,
    "retention_cohorts"   -> OlapSql.qRetentionCohortsSql,
    "event_pivot"         -> OlapSql.qEventPivotSql,
    "json_bucket"         -> OlapSql.qJsonBucketSql,
    "string_funcs"        -> OlapSql.qStringFuncsSql,
    "quantiles"           -> OlapSql.qQuantilesSql,
    "exists_having"       -> OlapSql.qExistsHavingSql,
    "grouping_sets"       -> OlapSql.qGroupingSetsSql,
    "value_stats"         -> OlapSql.qValueStatsSql,
    "cube_returns"        -> OlapSql.qCubeSql,
    "daily_revenue_delta" -> OlapSql.qDailyDeltaSql,
    "set_ops"             -> OlapSql.qSetOpsSql,
    "customer_deciles"    -> OlapSql.qCustomerDecilesSql,
    "range_band_join"     -> OlapSql.qRangeBandJoinSql,
    "correlated_subquery" -> OlapSql.qCorrelatedSubquerySql,
    "trailing_30d"        -> OlapSql.qTrailing30dSql,
    "approx_distinct"     -> OlapSql.qApproxDistinctSql,
    "approx_quantiles"    -> OlapSql.qApproxQuantilesSql,
    "text_stats"      -> TextSql.textStatsSql,
    "lang_id"         -> TextSql.langIdSql,
    "fingerprint"     -> TextSql.fingerprintSql,
    "dedup_exact"     -> TextSql.exactDedupSql,
    "ngram_jaccard"   -> TextSql.ngramJaccardSql,
    "ngram_jaccard_lsh" -> TextSql.ngramJaccardLshSql,
    "minhash_containment" -> TextSql.minhashContainmentSql,
    "dup_spans"       -> TextSql.dupSpansSql,
    "dedup_spans_apply" -> TextSql.dedupSpansApplySql,
    "minhash_lsh"     -> TextSql.minhashLshSql,
    "shard_dedup"     -> TextSql.shardDedupSql,
    "shard_dedup_indexed" -> TextSql.shardDedupSql,
    "shard_dedup_deleted" -> TextSql.shardDedupDeletedSql,
    "dedup_clusters"  -> TextSql.dedupClustersSql,
    "dedup_clusters_fresh" -> TextSql.dedupClustersSql,
    "dedup_clusters_delta" -> TextSql.dedupClustersSql,
    "dedup_clusters_deleted" -> TextSql.dedupClustersDeletedSql,
    // the mixed pass lands on the same survivor closure the takedown
    // oracle computes from scratch — proving the COMPOSED incremental
    // path (merge then delete) reaches it is the point of the gate
    "dedup_clusters_mixed" -> TextSql.dedupClustersDeletedSql,
    "dedup_select"    -> TextSql.dedupSelectSql,
    "cluster_cap_sample" -> TextSql.clusterCapSampleSql,
    "leakage_split"   -> TextSql.leakageSplitSql,
    "decontaminate"   -> TextSql.decontaminateSql,
    // bit-identical to the exact form by construction — same oracle
    "decontaminate_bloom" -> TextSql.decontaminateSql,
    "domain_mix"      -> TextSql.domainMixSql,
    "data_profile"    -> TextSql.dataProfileSql,
    "source_quality_report" -> TextSql.sourceQualityReportSql,
    "mix_apply"       -> TextSql.mixApplySql,
    "mix_upsample"    -> TextSql.mixUpsampleSql,
    "corpus_clean"    -> TextSql.corpusCleanSql,
    "embed_quantize"  -> TextSql.embedQuantizeSql,
    "pack_chunks"     -> TextSql.packChunksSql,
    "export_shards"   -> TextSql.exportShardsSql,
    "simhash"         -> TextSql.simhashSql,
    "simhash_pairs"   -> TextSql.simhashPairsSql,
    "cosine_topk"     -> TextSql.cosineTopKSql,
    "lsh_buckets"     -> TextSql.lshBucketsSql,
    "lsh_topk"        -> TextSql.lshTopKSql,
    "multimodal_meta" -> TextSql.multimodalMetaSql,
    "frame_sample"    -> TextSql.frameSampleSql,
    "media_dedup"     -> TextSql.mediaDedupSql,
    "frame_dedup"     -> TextSql.frameDedupSql,
    "asof_price_join" -> TextSql.asofPriceJoinSql,
    "label_centroids" -> TextSql.labelCentroidsSql,
    "ivf_topk"        -> TextSql.ivfTopKSql,
    "knn_graph"       -> TextSql.knnGraphSql,
    "ivf_recall"      -> TextSql.ivfRecallSql,
    "pq_topk"         -> TextSql.pqTopKSql,
    "pq_topk_indexed" -> TextSql.pqTopKSql,
    "pq_topk_deleted" -> TextSql.pqTopKDeletedSql,
    "embedding_dedup" -> TextSql.embeddingDedupSql,
    "knn_classify"    -> TextSql.knnClassifySql,
    "hybrid_topk"     -> TextSql.hybridTopKSql,
    "semdedup"        -> TextSql.semDedupSql,
    "semantic_clusters" -> TextSql.semanticClustersSql,
    "semantic_clusters_fresh" -> TextSql.semanticClustersSql,
    "semantic_clusters_delta" -> TextSql.semanticClustersSql,
    "semantic_clusters_deleted" -> TextSql.semanticClustersDeletedSql,
    "semantic_clusters_mixed" -> TextSql.semanticClustersDeletedSql,
    "scaled_cells"    -> TextSql.scaledCellsSql,
    "semdedup_scaled" -> TextSql.semDedupScaledSql,
    "semantic_clusters_scaled" -> TextSql.semanticClustersScaledSql,
    "scaled_pair_recall" -> TextSql.scaledPairRecallSql,
    "tree_cells"       -> TextSql.treeCellsSql,
    "tree_pair_recall" -> TextSql.treePairRecallSql,
    "token_counts"    -> TextSql.tokenCountsSql,
    "quality_filter"  -> TextSql.qualityFilterSql,
    "freq_score"      -> TextSql.freqScoreSql,
    "score_select"    -> TextSql.scoreSelectSql,
    "score_select_scaled" -> TextSql.scoreSelectScaledSql,
    "chunk_docs"      -> TextSql.chunkDocsSql,
    "tfidf_topk"      -> TextSql.tfidfTopKSql,
    "bm25_topk"       -> TextSql.bm25TopKSql,
    "bm25_topk_indexed" -> TextSql.bm25TopKSql,
    "bm25_topk_deleted" -> TextSql.bm25TopKDeletedSql,
    "stratified_sample" -> TextSql.stratifiedSampleSql,
    "rep_signals"     -> TextSql.repSignalsSql,
    "bpe_merges"      -> TextSql.bpeMergesSql,
    "fuzzy_pairs"     -> TextSql.fuzzyPairsSql,
    "gopher_filter"   -> TextSql.gopherFilterSql,
    "approx_topk"     -> TextSql.approxTopKSql,
    "pii_redact"      -> TextSql.piiRedactSql,
    "contamination_report" -> TextSql.contaminationReportSql,
    "k_anonymize"     -> TextSql.kAnonymizeSql,
    "lsh_recall"      -> TextSql.lshRecallSql,
    "bpe_encode"      -> TextSql.bpeEncodeSql,
  )
}
