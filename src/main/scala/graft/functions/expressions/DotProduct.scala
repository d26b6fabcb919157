package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for Σ aᵢ·bᵢ over two float-array columns —
  * the hot kernel of the similarity operators, where the built-in path
  * (`aggregate(zip_with(...))`) evaluates interpreted lambdas per element.
  * `doGenCode` emits a primitive loop inside whole-stage codegen; the
  * interpreted fallback mirrors it exactly (same accumulation order, so
  * identical IEEE results).
  *
  * Preference order per the build guidance: built-ins where expressive
  * enough → this native Expression for the hot scalar kernel → typed
  * mapPartitions only for whole-row quadratic scans.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // return type inferred: AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val FunctionName = "graft_dot"

  /** Register in the session's function registry (idempotent) so the
    * expressions are reachable from both the Column API (via
    * `call_function`) and SQL text. New sessions can instead load
    * [[graft.GraftExtensions]] via `spark.sql.extensions`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, graft.GraftExtensions.dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      graft.GraftExtensions.CosineName, graft.GraftExtensions.cosineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      graft.GraftExtensions.Hash60Name, graft.GraftExtensions.hash60Builder, "built-in")
  }

  /** Column-API entry point; requires [[register]] on the session first. */
  def dot(a: Column, b: Column): Column = call_function(FunctionName, a, b)
}
