package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path (SURVEY §4:
  * "custom Expression with codegen only on measured need" — measured: the
  * `zip_with` + `aggregate` higher-order-function formulation runs its
  * lambdas interpreted per element; this expression compiles to a tight Java
  * loop inside whole-stage codegen, with no intermediate arrays).
  *
  * Numeric contract (oracle-critical): elements widen to double exactly
  * (float→double is lossless), and all three accumulators (dot, ‖a‖², ‖b‖²)
  * run sequentially in index order — bit-identical to both the HOF
  * formulation it replaces and DuckDB's `list_sum(list_transform(...))`
  * pathway, so hash-exact comparisons keep holding.
  */
object VectorExpressions {

  /** cosine(a, b) over equal-length float[] or double[] arrays; null if
    * either side is null, lengths differ, or a norm is zero.
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {

    // TypeCollection/ExpectsInputTypes are private[sql]; validate directly
    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(dt: DataType): Boolean = dt match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cosine_native requires array<float|double>, got ${left.dataType} / ${right.dataType}")
    }

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "cosine_native"

    private def elemIsFloat(e: Expression): Boolean =
      e.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      val lf = elemIsFloat(left); val rf = elemIsFloat(right)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi: Double = if (lf) x.getFloat(i) else x.getDouble(i)
        val yi: Double = if (rf) y.getFloat(i) else y.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      if (na == 0.0 || nb == 0.0) null
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double x = (double) $a.$lGet($i);
           |    double y = (double) $b.$rGet($i);
           |    $dot += x * y; $na += x * x; $nb += y * y;
           |  }
           |  if ($na == 0.0 || $nb == 0.0) {
           |    ${ev.isNull} = true;
           |  } else {
           |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
           |  }
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Register `cosine_native(a, b)` in the session's function registry (also
    * makes it available from SQL). Idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_native", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
}
