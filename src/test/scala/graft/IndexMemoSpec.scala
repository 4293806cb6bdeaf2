package graft

import org.apache.spark.sql.functions._
import graft.functions.DedupOps
import graft.sources.Tables

/** Pins the three failure modes the `dir.hashCode`-keyed index memo had
  * (ADVICE r8) against [[DedupOps.memoizedMinhashIndex]]:
  * distinct dirs must never alias one index table; data regenerated in
  * place must trigger a rebuild (corpus fingerprint, not table existence);
  * and a partially-built index must fail the completeness check instead of
  * failing at probe time.
  */
class IndexMemoSpec extends SparkSpec {

  private def writeDocs(dst: String, filter: org.apache.spark.sql.Column): Unit =
    spark.read.parquet(s"$sfTiny/documents.parquet")
      .filter(filter)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

  private def probe(dir: String): Seq[Seq[Any]] =
    DedupOps.shardDedupFromIndex(spark, dir, DedupOps.memoizedMinhashIndex(spark, dir))
      .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])

  private def live(dir: String): Seq[Seq[Any]] =
    DedupOps.shardDedup(spark, dir)
      .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])

  test("memoized index: distinct dirs get distinct index tables, each probing its own corpus") {
    val dirA = "/tmp/graft-memo-a"
    val dirB = "/tmp/graft-memo-b"
    writeDocs(dirA, lit(true))
    writeDocs(dirB, col("doc_id") % 3 =!= 0) // a different corpus
    DedupOps.invalidateDerived(dirA)
    DedupOps.invalidateDerived(dirB)
    val tA = DedupOps.memoizedMinhashIndex(spark, dirA)
    val tB = DedupOps.memoizedMinhashIndex(spark, dirB)
    assert(tA != tB, s"two distinct dirs share index table $tA")
    // and each index answers for ITS corpus — identical to the live gate
    assert(probe(dirA) == live(dirA), "dirA indexed probe != live gate")
    assert(probe(dirB) == live(dirB), "dirB indexed probe != live gate")
  }

  test("memoized index: in-place data regeneration is detected by the corpus fingerprint and rebuilds") {
    val dir = "/tmp/graft-memo-mut"
    writeDocs(dir, lit(true))
    DedupOps.invalidateDerived(dir)
    val t1 = DedupOps.memoizedMinhashIndex(spark, dir)
    val metaBefore = spark.table(s"${t1}_meta").head().getLong(0)
    // regenerate the documents IN PLACE (fewer rows → fingerprint change);
    // deliberately NO manual invalidation: detecting this is the memo's job
    writeDocs(dir, col("doc_id") % 4 =!= 1)
    val t2 = DedupOps.memoizedMinhashIndex(spark, dir)
    assert(t1 == t2, "same dir should keep the same index name")
    val metaAfter = spark.table(s"${t2}_meta").head().getLong(0)
    assert(metaAfter != metaBefore,
      "fingerprint unchanged after in-place regeneration — stale index reused")
    // the rebuilt index answers for the NEW corpus
    assert(probe(dir) == live(dir), "post-mutation indexed probe != live gate")
    // and with no change, the third call reuses without rebuilding (the
    // meta table write timestamp would change on rebuild; cheap proxy:
    // fingerprint row is stable and probe stays correct)
    assert(DedupOps.memoizedMinhashIndex(spark, dir) == t1)
    assert(spark.table(s"${t1}_meta").head().getLong(0) == metaAfter)
  }

  test("memoized index: content regeneration preserving row count AND max doc_id still rebuilds (file signature)") {
    val dir = "/tmp/graft-memo-content"
    writeDocs(dir, lit(true))
    DedupOps.invalidateDerived(dir)
    val t = DedupOps.memoizedMinhashIndex(spark, dir)
    val sigBefore = spark.table(s"${t}_meta").head().getLong(2)
    // regenerate IN PLACE with the SAME doc_ids (count and max unchanged)
    // but different text bodies — the ADVICE-r9 blind spot of the
    // (count, max id) fingerprint; no manual invalidation
    spark.read.parquet(s"$sfTiny/documents.parquet")
      .withColumn("text", concat(col("text"), lit(" regenerated corpus body")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t2 = DedupOps.memoizedMinhashIndex(spark, dir)
    assert(t2 == t)
    val sigAfter = spark.table(s"${t}_meta").head().getLong(2)
    assert(sigAfter != sigBefore,
      "file signature unchanged after content-only regeneration — stale index reused")
    assert(probe(dir) == live(dir), "post-content-mutation indexed probe != live gate")
  }

  test("memoized index: a partial build (missing table) fails the completeness check and rebuilds") {
    val dir = "/tmp/graft-memo-partial"
    writeDocs(dir, lit(true))
    DedupOps.invalidateDerived(dir)
    val t = DedupOps.memoizedMinhashIndex(spark, dir)
    spark.sql(s"DROP TABLE ${t}_shingles") // simulate an interrupted build
    val t2 = DedupOps.memoizedMinhashIndex(spark, dir)
    assert(t2 == t)
    assert(spark.catalog.tableExists(s"${t}_shingles"),
      "missing index table not rebuilt")
    assert(probe(dir) == live(dir))
  }
}
