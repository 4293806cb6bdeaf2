package graft.oracle

import graft.functions.{CurationOps, DedupOps, TextAnalysis}

/** DuckDB mirrors of the LLM-pipeline operators ([[graft.functions]]).
  * Hash constants, permutation coefficients, language profiles, and
  * polynomial powers are interpolated from the SAME Scala constants the
  * Spark side uses — the two engines cannot drift.
  *
  * Cross-engine primitives:
  *  - `mdhash(s)` ≙ `('0x' || substring(md5(s),1,15))::BIGINT` (60-bit).
  *  - tokens ≙ `regexp_extract_all(text, '[a-z0-9]+')`.
  *  - DuckDB list indexing is 1-based (Spark's posexplode is 0-based) —
  *    mirrored with explicit `i - 1` arithmetic where positions matter.
  *
  * One domain per source file (the object itself is an aggregation):
  * [[TextSqlBase]] (shared CTEs) / [[DedupSql]] / [[VectorSql]] /
  * [[CurationSql]].
  */
object TextSql extends DedupSql with VectorSql with CurationSql
