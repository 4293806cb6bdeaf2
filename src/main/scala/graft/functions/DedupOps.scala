package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import TextAnalysis.{mdhash, tokens, P}

/** Deduplication operators for the LLM-data-pipeline surface (driver
  * contract): exact, n-gram Jaccard, MinHash+LSH banding, and SimHash.
  *
  * Scale design:
  *  - exact dedup is a hash-groupBy on a 16-byte digest, not the document
  *    body — the shuffle moves digests, never text;
  *  - MinHash compresses each document to an 8-value signature *before* any
  *    pairwise work; the LSH band self-join only materializes same-bucket
  *    candidate pairs, so cost is Σ bucket² rather than n² — the standard
  *    shingle→minhash→band→bucket-join pipeline, expressed as two hash aggs
  *    + one equi-join, all shuffling on band keys;
  *  - SimHash reduces each doc to a 32-bit fingerprint; near-dup candidates
  *    come from Hamming distance on the fingerprints, not the text.
  *
  * All hashing uses the cross-engine `mdhash` (see [[TextAnalysis]]) so each
  * pipeline is oracle-checkable in DuckDB. At 100 TB the only change is
  * swapping the final pairwise verify to run per-bucket (already the shape
  * here) and bucketing the output by doc_id.
  */
object DedupOps
  extends DedupShingleCore
  with DedupIndexLifecycle
  with DedupClusterMaintenance
