package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional n-gram table function — the custom-`Generator` (UDTF) tier
  * of the Catalyst surface: one input row fans out to one output row per
  * n-gram, planned as a native `Generate` node exactly like
  * `explode`/`posexplode` (so it composes with whole-stage codegen
  * children and column pruning; the generator itself is CodegenFallback,
  * the same contract the built-in `Stack`/`JsonTuple` generators use).
  *
  * `graft_ngrams(tokens, n)` emits `(pos, gram)` with `pos` the 0-based
  * start and `gram` the space-joined window. The dedup pipeline builds
  * the same windows with `transform(sequence(...))` array expressions
  * (q29/q65/q125/q138); this is the operator form of that primitive — a
  * row-generator the engine plans instead of an array it materializes,
  * which at 100 TB means the 8-gram expansion streams through the
  * downstream aggregate without ever holding a document's full
  * n-gram array.
  *
  * Emission is lazy (an Iterator, not a materialized Seq): a w-token
  * document yields w−n+1 rows one at a time, so peak memory per row is
  * O(n tokens), not O(w·n).
  */
case class NGramGenerate(child: Expression, n: Int)
    extends Generator with CodegenFallback {

  require(n >= 1, s"n must be >= 1: $n")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_ngrams expects array<string>, got $other")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val w = arr.numElements()
      if (w < n) Iterator.empty
      else (0 to w - n).iterator.map { i =>
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          val t = arr.getUTF8String(i + j)
          parts(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
          j += 1
        }
        InternalRow(i, UTF8String.concatWs(UTF8String.fromString(" "), parts: _*))
      }
    }
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object NGramGenerate {
  val FunctionName = "graft_ngrams"

  val builder: Seq[Expression] => Expression = { exprs =>
    val n = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$FunctionName n must be an integer literal, got $other")
    }
    NGramGenerate(exprs.head, n)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "built-in")
}
