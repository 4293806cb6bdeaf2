package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.VectorExpressions

/** SparkSessionExtensions entry point: makes the engine's native functions
  * available in ANY session via configuration —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * — the idiomatic deployment for a library of Catalyst extensions (no code
  * change in the user's application). Currently injects `cosine_native`;
  * future custom expressions register here too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_native"),
      new ExpressionInfo(
        classOf[VectorExpressions.CosineSim].getName, "cosine_native"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorExpressions.CosineSim(exprs(0), exprs(1))))
  }
}
