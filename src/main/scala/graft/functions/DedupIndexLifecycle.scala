package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import TextAnalysis.{mdhash, tokens, P}

/** STORED-INDEX lifecycle of [[DedupOps]] — the at-scale MinHash layout:
  * full builds, delta generations, tombstoned probes, and compaction,
  * plus the corpus-fingerprint staleness machinery. Split out of the
  * monolithic DedupOps by lifecycle (verdict r11 item 7); behavior is
  * byte-identical — every member still lives on the [[DedupOps]] object
  * via mixin.
  */
private[graft] trait DedupIndexLifecycle { self: DedupShingleCore with DedupClusterMaintenance =>

  /** Materialize the corpus-side MinHash admission index in the at-scale
    * layout [[shardDedup]]'s Scaladoc promises — the same stored-index
    * discipline as the BM25 postings ([[TextAnalysis.writePostingsIndex]])
    * and PQ code ([[SimilarityOps.writePqIndex]]) layouts. Three tables,
    * all maintained by ingest at 100 TB (each admitted shard appends its
    * own rows — cost linear in the shard, the corpus is never re-scanned):
    *
    *  - `<table>_bands`: the 4×2 banding keys (doc_id, band, bkey),
    *    bucketed AND sorted by (band, bkey) — an oversized shard probe
    *    sort-merges against it with the exchange on the SHARD side only;
    *  - `<table>_shingles`: the distinct (doc_id, shingle HASH) exact-
    *    verify index, bucketed by doc_id. Hashes (the cross-engine 64-bit
    *    `mdhash`), NOT raw shingle strings: the r12 file-bytes ledger
    *    showed the string layout weighing ~3× the corpus text itself
    *    (~25 B/shingle vs 8 B), so a probe that scanned it read more file
    *    bytes than the live form — the wrong trade at any scale. The
    *    verify join on 8-byte longs also shuffles ~3× less and compares
    *    integers instead of strings. Jaccard over hashed shingles equals
    *    Jaccard over raw strings absent 64-bit collisions (~10⁻¹⁵ per doc
    *    at these shingle counts — the standard trade every production
    *    shingle index makes); the DuckDB oracle keeps verifying over RAW
    *    strings, so the hash-exact gate empirically proves the equality
    *    on every corpus it runs — a collision would fail loudly, never
    *    skew silently;
    *  - `<table>_counts`: per-doc distinct-shingle-hash counts (derived
    *    from the STORED table, so count and index cannot disagree).
    *
    * The corpus tokenizer pass happens HERE, once, at index-build time —
    * at probe time corpus text does not exist in the plan at all.
    */
  def writeMinhashIndex(spark: SparkSession, dir: String,
                        table: String = "minhash_index",
                        buckets: Int = 16): Unit =
    writeMinhashGeneration(spark, dir, col("doc_id") % 10 =!= 7, table,
      buckets)

  /** Session-memoized stored-index handle for [[shardDedupFromIndex]]:
    * returns the index table prefix, building it only when missing or
    * stale. Two hazards the naive `dir.hashCode` + `tableExists` memo had
    * (ADVICE r8), both closed here:
    *
    *  - ALIASING: the table name is derived from an MD5 of the CANONICAL
    *    dir path (hashCode collisions or `a/../b` spellings of the same dir
    *    must never alias two corpora onto one index), and the build is
    *    skipped only when ALL FOUR tables (bands/shingles/counts/meta)
    *    exist — a build interrupted mid-way fails the completeness check
    *    instead of failing at probe time;
    *  - STALENESS: a one-row `_meta` table records the corpus fingerprint
    *    (row count + max doc_id + per-file length/mtime signature, read
    *    FRESH from the files, bypassing the [[graft.sources.Tables]] plan
    *    memo) at build time; a mismatch at probe time means the documents
    *    were regenerated in place — including a regeneration that keeps
    *    count and max id but rewrites content (ADVICE r9) — so every
    *    derived cache for the dir is invalidated and the index rebuilt;
    *  - CONCURRENCY: the check-and-build is serialized per index key
    *    ([[indexLocks]]) so two in-process callers can't interleave
    *    DROP/CTAS on the same tables.
    */
  /** One lock per index key: two concurrent callers for the same dir (e.g.
    * two Serve requests) must not interleave clearIndexLayout/DROP/CTAS on
    * the same tables — the in-process twin of the cross-process race the
    * per-PID warehouse closes (ADVICE r9). `computeIfAbsent` hands both
    * callers the SAME monitor, so exactly one builder runs per key and the
    * loser re-checks freshness against the finished build.
    */
  private[graft] val indexLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def memoizedMinhashIndex(spark: SparkSession, dir: String): String = {
    val canon = new java.io.File(dir).getCanonicalPath
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val table = s"minhash_idx_$key"
    indexLocks.computeIfAbsent(table, _ => new Object).synchronized {
      val fp = corpusFingerprint(spark, dir)
      val complete = Seq("_bands", "_shingles", "_counts", "_meta")
        .forall(sfx => spark.catalog.tableExists(s"$table$sfx"))
      // layout 2 = hashed-shingle verify table (r12); a 3-column meta is a
      // pre-hash string layout and must rebuild, not be probed with h
      val fresh = complete && {
        val m = spark.table(s"${table}_meta").head()
        m.length == 4 && (m.getLong(0), m.getLong(1), m.getLong(2)) == fp &&
          m.getLong(3) == 2L
      }
      if (!fresh) {
        invalidateDerived(dir) // plan/count memos + cluster views are stale too
        writeMinhashIndex(spark, dir, table)
        import spark.implicits._
        Seq((fp._1, fp._2, fp._3, 2L)).toDF("n_rows", "max_doc_id", "file_sig", "layout")
          .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_meta")
      }
    }
    table
  }

  /** (row count, max doc_id, file signature) of the dir's documents table,
    * read fresh from the parquet files — deliberately NOT via
    * [[graft.sources.Tables]], whose memoized file listing is exactly what
    * goes stale when data is regenerated in place. The first two come from
    * footer metadata + one long-column scan; the third folds every data
    * file's (path, length, mtime) so an IN-PLACE regeneration that happens
    * to preserve both row count and max doc_id (same scale factor with a
    * new seed, edited text bodies — ADVICE r9) still flips the
    * fingerprint: rewriting a parquet file changes its mtime and almost
    * always its compressed length. Pure file-listing cost — no data read.
    * (Residual blind spot: a rewrite producing byte-identical length
    * within the same millisecond — indistinguishable without hashing the
    * bytes, which would make every probe corpus-sized.)
    */
  private def corpusFingerprint(spark: SparkSession, dir: String): (Long, Long, Long) =
    fileFingerprint(spark, s"$dir/documents.parquet", "doc_id")

  /** The generic form of [[corpusFingerprint]], shared with the postings
    * ([[TextAnalysis.memoizedPostingsIndex]]) and PQ/cell
    * ([[SimilarityOps.memoizedPqIndex]]) memos, which fingerprint their own
    * source tables with their own id columns.
    */
  private[graft] def fileFingerprint(spark: SparkSession, path: String,
                                     idCol: String): (Long, Long, Long) = {
    val r = spark.read.parquet(path)
      .agg(count(lit(1)).as("n"),
        coalesce(max(col(idCol)), lit(-1L)).as("mx")).head()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    // summed per-file terms: independent of listing order. Each term is ONE
    // mixed 64-bit hash over (full path, length, mtime) — separate linear
    // terms summed per field let offsetting changes across files cancel,
    // and a basename-only path term aliased identically-named part files
    // across partition subdirectories (ADVICE r10). FNV-1a over the joined
    // string is cancellation-resistant while staying listing-cost-only.
    var sig = 0L
    while (it.hasNext) {
      val st = it.next()
      if (!st.getPath.getName.startsWith("_")) {
        val s = st.getPath.toString + "|" + st.getLen + "|" + st.getModificationTime
        var h = 0xcbf29ce484222325L // FNV-1a 64-bit
        var i = 0
        while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
        sig += h
      }
    }
    (r.getLong(0), r.getLong(1), sig)
  }

  /** Invalidate every session cache derived from the dir's data files:
    * the [[graft.sources.Tables]] plan/count memos plus BOTH memoized
    * cluster views ([[invalidateClusterCache]] here and its semantic twin
    * in [[graft.functions.SimilarityOps]] — previously only the dedup one
    * had an invalidation hook, ADVICE r8). Call after regenerating data
    * under a live session.
    */
  def invalidateDerived(dir: String): Unit = {
    Tables.invalidate(dir)
    invalidateClusterCache()
    SimilarityOps.invalidateSemClusterCache()
    SimilarityOps.invalidateSemDeltaCache()
    // the PERSISTED rankedAssignment DataFrames would otherwise keep
    // serving pre-regeneration embedding data (cached blocks don't re-read
    // files) — the same stale-view hazard the sem-cluster clear closed in
    // r8, one layer down
    SimilarityOps.invalidateIvfCache()
  }

  /** Index ONE document subset (the `docFilter` predicate) into its own
    * generation of the three-table layout — the ingest-lifecycle move:
    * after a shard passes the admission gate, its ADMITTED docs are indexed
    * as a delta generation (cost linear in the shard; the corpus is never
    * re-scanned) and the next shard probes base ∪ deltas via
    * [[shardDedupFromGenerations]]. Docs are append-only (each doc_id lives
    * in exactly one generation) — the same discipline as the BM25
    * generations in [[TextAnalysis.writePostingsGeneration]]; a replayed
    * doc id is the self-rejection case the spec pins, not an update.
    */
  /** An index writer owns its layout: clear both the catalog entries AND
    * any stale managed locations (an interrupted build leaves the directory
    * behind without a catalog row, which CTAS then refuses to overwrite).
    */
  private def clearIndexLayout(spark: SparkSession, table: String): Unit =
    Seq(s"${table}_bands", s"${table}_shingles", s"${table}_counts",
        s"${table}_meta")
      .foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val p = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), t)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }

  def writeMinhashGeneration(spark: SparkSession, dir: String,
                             docFilter: Column,
                             table: String,
                             buckets: Int = 16): Unit = {
    clearIndexLayout(spark, table)
    val ex = explodedShingles(spark, dir, docFilter, distinctShingles = false)
      .withColumn("h", mdhash(col("s")))
    // repartition ONTO the bucket key before the bucketed write: without
    // it every shuffle partition writes a sliver into every bucket
    // (buckets × partitions files — 256 tiny files at 16×16), and the
    // per-file dictionary/footer overhead dominated the layout's size
    // (the r12 file-bytes ledger caught this too). One exchange at build
    // time buys one file per bucket and full-size row groups.
    bandKeys(signaturesFrom(ex))
      .repartition(buckets, col("band"), col("bkey"))
      .write.mode("overwrite")
      .bucketBy(buckets, "band", "bkey").sortBy("band", "bkey")
      .format("parquet").saveAsTable(s"${table}_bands")
    ex.select(col("doc_id"), col("h")).distinct()
      .repartition(buckets, col("doc_id"))
      .write.mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(s"${table}_shingles")
    spark.table(s"${table}_shingles")
      .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      .write.mode("overwrite")
      .format("parquet").saveAsTable(s"${table}_counts")
  }

  /** [[shardDedup]] probing the STORED corpus index
    * ([[writeMinhashIndex]]) instead of deriving it inline — the form that
    * actually runs at 100 TB, spec-asserted row-identical to the live gate.
    * The only `documents` scans left in the plan are the SHARD's (its
    * shingles + the final verdict join); every corpus-derived input comes
    * from the index tables:
    *
    *  - band probe: broadcast(shard bands) ⋈ stored bands — zero exchange
    *    on the index side (a shard too large to broadcast degrades to a
    *    sort-merge where the (band, bkey) bucketing keeps the exchange off
    *    the index side — the layout's second job);
    *  - exact verify: stored shingles broadcast-semi-pruned to candidate
    *    corpus ids ([[shardDedup]]'s candidate-bounded discipline), stored
    *    counts pruned the same way — no probe-time exchange is ever
    *    corpus-sized.
    */
  def shardDedupFromIndex(spark: SparkSession, dir: String,
                          table: String = "minhash_index",
                          minJaccard: Double = 0.5): DataFrame =
    shardDedupFromGenerations(spark, dir, Seq(table), minJaccard)

  /** Gated-query form of the admission probe under TOMBSTONES: corpus
    * docs doc_id % 37 = 3 are taken down (derived from the stored counts
    * table — the corpus is not scanned), so they can no longer block a
    * shard doc's admission. Oracle:
    * [[graft.oracle.TextSql.shardDedupDeletedSql]] — the same admission
    * arithmetic over a corpus that never contained the deleted docs.
    */
  def shardDedupDeleted(spark: SparkSession, dir: String): DataFrame = {
    val table = memoizedMinhashIndex(spark, dir)
    val tombs = spark.table(s"${table}_counts")
      .select(col("doc_id")).filter(col("doc_id") % 37 === 3)
    shardDedupFromGenerations(spark, dir, Seq(table), tombs = Some(tombs))
  }

  /** The admission probe over base ∪ delta generations
    * ([[writeMinhashGeneration]]): each generation's three tables union
    * BELOW the probe joins, so every generation scan keeps its own
    * bucketing/pruning and the probe cost stays candidates-bounded
    * regardless of generation count; [[compactMinhashIndex]] folds deltas
    * back into one base when fan-in grows. Counts are max-collapsed per
    * doc_id: a REPLAYED shard doc (present in a generation) contributes a
    * (doc_id, n_sh) row from both the live shard side and the stored side —
    * when they agree the max collapses them to one, so the self-pair scores
    * Jaccard 1.0 and the doc self-rejects (the idempotent-replay semantics
    * the spec pins); if tokenizer drift ever makes the two counts DISagree,
    * one row per doc_id still survives, shifting a score (loud in the
    * oracle) instead of duplicating scored pairs.
    */
  def shardDedupFromGenerations(spark: SparkSession, dir: String,
                                tables: Seq[String],
                                minJaccard: Double = 0.5,
                                tombs: Option[DataFrame] = None): DataFrame = {
    require(tables.nonEmpty, "at least one index generation required")
    def gen(suffix: String): DataFrame =
      tables.map(t => spark.table(s"$t$suffix")).reduce(_ unionByName _)
    val isShard = col("doc_id") % 10 === 7
    // pinned: the shard's exploded+hashed shingles feed the signature
    // build AND the exact verify, and unlike [[shardDedup]]'s corpus-wide
    // twin this frame is SHARD-sized by the admission premise — without
    // the pin every downstream reference re-ran the tokenizer over the
    // corpus file (the r13 scan ledger counted 7 corpus scans per probe:
    // 4 from bandKeys' band projections over an unpinned signature frame,
    // the rest from the verify/counts tail)
    val ex = TransientCache(
      explodedShingles(spark, dir, isShard, distinctShingles = false)
        .withColumn("h", mdhash(col("s"))))
    val shardBands = bandKeys(TransientCache(signaturesFrom(ex)))
    // shard-bounded by the admission premise (a shard is one ingest batch,
    // not a corpus); guarded like shardDedup's candIds broadcast — past the
    // bound the hint is dropped and the bucketed layout carries the join
    val shardSmall = Tables.rowCount(spark, dir, "documents") <= 8000000L
    val probe = if (shardSmall) broadcast(shardBands) else shardBands
    val candAll = probe.as("x")
      .join(gen("_bands").as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("shard_id"), col("y.doc_id").as("corpus_id"))
      .distinct()
    // DELETION without a rebuild (takedown): tombstoned corpus docs stop
    // producing admission candidates via one broadcast anti-join here —
    // everything downstream (shingle verify, counts, verdicts) is
    // candidate-bounded, so the deleted docs vanish from the whole probe
    // and the result equals an index never containing them. The shard
    // side is the INCOMING batch and is never tombstoned. Folding the
    // tombstones into the layout happens off the hot path via
    // [[compactMinhashIndex]]'s `tombs` parameter.
    val cand = TransientCache(tombs.fold(candAll)(t => candAll.join(
        broadcast(t.select(col("doc_id").as("corpus_id"))),
        Seq("corpus_id"), "left_anti")))
    val corpusIds = cand.select(col("corpus_id").as("doc_id")).distinct()
    // guarded by the INDEX, not the probe dir: the stored index is
    // decoupled from the dir's documents table, so shard size says nothing
    // about how many corpus ids a hot band key pulls in. The sound cheap
    // bound is |corpusIds| ≤ |indexed docs| = Σ row counts of the stored
    // _counts tables — a parquet-footer-metadata count, NO extra plan
    // work (the first guard draft ran corpusIds.count() unconditionally,
    // which forced the whole band-probe join as an extra job per probe
    // and made the indexed probe 2× SLOWER than the live gate). Only a
    // genuinely big index pays the exact candidate count before giving up
    // the broadcast.
    val indexedDocs = tables.map(t => spark.table(s"${t}_counts").count()).sum
    val prunedCorpusIds =
      if (indexedDocs <= 8000000L || corpusIds.count() <= 8000000L)
        broadcast(corpusIds)
      else corpusIds
    val exCorpus = gen("_shingles")
      .join(prunedCorpusIds, Seq("doc_id"), "left_semi")
    // pinned: referenced by the counts union and the intersection join —
    // unpinned, each reference re-paid the distinct shuffle over the pin
    val exShard = TransientCache(ex.select(col("doc_id"), col("h")).distinct())
    // aggregated, NOT distinct-unioned: a replayed shard doc contributes a
    // (doc_id, n_sh) row from both the live side and the stored side — when
    // they agree the max collapses them exactly like distinct did, and if
    // tokenizer drift ever makes them DISagree, one row per doc_id still
    // survives, so the inner count joins in admissionVerdicts can never
    // silently multiply scored rows (a drifted count shifts a score — loud
    // in the oracle — rather than duplicating pairs).
    val counts = exShard.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      .union(gen("_counts")
        .join(prunedCorpusIds, Seq("doc_id"), "left_semi"))
      .groupBy("doc_id").agg(max(col("n_sh")).as("n_sh"))
    val inter = cand
      .join(exShard.as("a"), col("shard_id") === col("a.doc_id"))
      .join(exCorpus.as("b"),
        col("corpus_id") === col("b.doc_id") && col("a.h") === col("b.h"))
      .groupBy("shard_id", "corpus_id")
      .agg(count(lit(1)).as("n_inter"))
    admissionVerdicts(
      Tables.documents(spark, dir).filter(isShard), cand, inter, counts,
      minJaccard)
  }

  /** Compaction: merge index generations back into one bucketed base
    * (same discipline as [[TextAnalysis.compactPostings]]) — one bucketed
    * rewrite of each table's union, after which probes pay
    * single-generation fan-in again. Spec-asserted: a probe over the
    * compacted base is row-identical to the multi-generation probe.
    */
  def compactMinhashIndex(spark: SparkSession, tables: Seq[String],
                          outTable: String, buckets: Int = 16,
                          tombs: Option[DataFrame] = None): Unit = {
    clearIndexLayout(spark, outTable)
    // tombstones are APPLIED at compaction (rows dropped from all three
    // tables), so the plain probe serves the deleted state afterwards
    def merge(suffix: String) = {
      val u = tables.map(t => spark.table(s"$t$suffix")).reduce(_ unionByName _)
      tombs.fold(u)(t => u.join(broadcast(t.select(col("doc_id"))),
        Seq("doc_id"), "left_anti"))
    }
    merge("_bands").repartition(buckets, col("band"), col("bkey"))
      .write.mode("overwrite")
      .bucketBy(buckets, "band", "bkey").sortBy("band", "bkey")
      .format("parquet").saveAsTable(s"${outTable}_bands")
    merge("_shingles").repartition(buckets, col("doc_id"))
      .write.mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(s"${outTable}_shingles")
    merge("_counts").write.mode("overwrite")
      .format("parquet").saveAsTable(s"${outTable}_counts")
  }
}
