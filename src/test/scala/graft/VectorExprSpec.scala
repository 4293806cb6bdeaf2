package graft

import org.apache.spark.sql.functions._
import graft.functions.{SimilarityOps, VectorExpressions}
import graft.sources.Tables

/** The codegen CosineSim must be bit-identical to the HOF formulation it
  * replaced — same sequential accumulation order, lossless float→double
  * widening — or the DuckDB oracle gate would drift.
  */
class VectorExprSpec extends SparkSpec {

  test("cosine_native == HOF cosine, bit-exact, on real embeddings") {
    VectorExpressions.register(spark)
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("embedding").as("v"))
    val pairs = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(20000)
      .select(
        expr("cosine_native(a.v, b.v)").as("native"),
        SimilarityOps.cosine(
          transform(col("a.v"), x => x.cast("double")),
          transform(col("b.v"), x => x.cast("double"))).as("hof"))
    val rows = pairs.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"bit mismatch: native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("cosine_native handles nulls, length mismatch, zero vectors") {
    VectorExpressions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f, 2.0f))),   // identical → 1.0
      (Some(Seq(1.0f, 0.0f)), Some(Seq(0.0f, 1.0f))),   // orthogonal → 0.0
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f))),         // length mismatch → null
      (Some(Seq(0.0f, 0.0f)), Some(Seq(1.0f, 2.0f))),   // zero norm → null
      (None, Some(Seq(1.0f, 2.0f)))                     // null input → null
    ).toDF("a", "b").select(expr("cosine_native(a, b)").as("c"))
    val out = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(math.abs(out(0).get - 1.0) < 1e-12)
    assert(out(1).get == 0.0)
    assert(out(2).isEmpty && out(3).isEmpty && out(4).isEmpty)
  }

  test("cosine_native participates in whole-stage codegen") {
    VectorExpressions.register(spark)
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("embedding").as("v"))
    val df = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(expr("cosine_native(a.v, b.v)").as("c"))
      .agg(sum("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"native cosine fell out of codegen:\n$plan")
  }
}
