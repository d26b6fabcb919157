package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, EvalMode, Expression, ExpressionInfo, Multiply, Sqrt}
import graft.functions.expressions.DotProduct

/** Library entry point at the Spark-extensions altitude: makes the graft
  * native functions available to ANY session — including pure-SQL users —
  * via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * Injected functions:
  *  - `graft_dot(a, b)`    — codegen'd Σ aᵢ·bᵢ over float arrays
  *  - `graft_cosine(a, b)` — cosine similarity composed from the same
  *    native kernel (dot / (‖a‖·‖b‖)), one expression tree, no UDF
  *
  * Per-session registration for an already-running session stays available
  * through [[graft.functions.expressions.DotProduct.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier(DotProduct.FunctionName),
      new ExpressionInfo(classOf[DotProduct].getName, DotProduct.FunctionName),
      GraftExtensions.dotBuilder))
    ext.injectFunction((FunctionIdentifier(GraftExtensions.CosineName),
      new ExpressionInfo(classOf[DotProduct].getName, GraftExtensions.CosineName),
      GraftExtensions.cosineBuilder))
    ext.injectFunction((FunctionIdentifier(
      graft.functions.expressions.KmvSketch.FunctionName),
      new ExpressionInfo(classOf[graft.functions.expressions.KmvSketch].getName,
        graft.functions.expressions.KmvSketch.FunctionName),
      graft.functions.expressions.KmvSketch.builder))
    ext.injectFunction((FunctionIdentifier(GraftExtensions.Hash60Name),
      new ExpressionInfo(GraftExtensions.getClass.getName, GraftExtensions.Hash60Name),
      GraftExtensions.hash60Builder))
    ext.injectFunction((FunctionIdentifier(
      graft.functions.expressions.MisraGries.FunctionName),
      new ExpressionInfo(classOf[graft.functions.expressions.MisraGries].getName,
        graft.functions.expressions.MisraGries.FunctionName),
      graft.functions.expressions.MisraGries.builder))
    ext.injectFunction((FunctionIdentifier(
      graft.functions.expressions.CountMin.FunctionName),
      new ExpressionInfo(classOf[graft.functions.expressions.CountMin].getName,
        graft.functions.expressions.CountMin.FunctionName),
      graft.functions.expressions.CountMin.builder))
    ext.injectFunction((FunctionIdentifier(
      graft.functions.expressions.HyperLogLog.FunctionName),
      new ExpressionInfo(classOf[graft.functions.expressions.HyperLogLog].getName,
        graft.functions.expressions.HyperLogLog.FunctionName),
      graft.functions.expressions.HyperLogLog.builder))
    ext.injectFunction((FunctionIdentifier(
      graft.functions.expressions.HyperLogLog.MergeFunctionName),
      new ExpressionInfo(classOf[graft.functions.expressions.HllMerge].getName,
        graft.functions.expressions.HyperLogLog.MergeFunctionName),
      graft.functions.expressions.HyperLogLog.mergeBuilder))
    ext.injectFunction((FunctionIdentifier(
      graft.functions.expressions.NGramGenerate.FunctionName),
      new ExpressionInfo(classOf[graft.functions.expressions.NGramGenerate].getName,
        graft.functions.expressions.NGramGenerate.FunctionName),
      graft.functions.expressions.NGramGenerate.builder))
    ext.injectFunction((FunctionIdentifier(
      graft.functions.expressions.BloomFilterExprs.BuildName),
      new ExpressionInfo(classOf[graft.functions.expressions.BloomBuildAgg].getName,
        graft.functions.expressions.BloomFilterExprs.BuildName),
      graft.functions.expressions.BloomFilterExprs.buildBuilder))
    ext.injectFunction((FunctionIdentifier(
      graft.functions.expressions.BloomFilterExprs.ContainsName),
      new ExpressionInfo(classOf[graft.functions.expressions.BloomMightContain].getName,
        graft.functions.expressions.BloomFilterExprs.ContainsName),
      graft.functions.expressions.BloomFilterExprs.containsBuilder))
    // whole-operator tier: two-phase exact top-k-per-group planner strategy
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroup.TopKStrategy)
    // optimizer-rule tier: rewrite discarded row_number()<=k rank filters
    // into the TopK operator transparently
    ext.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
    // parser tier: MERGE INTO graft_store.`path` … — the SQL surface of
    // TableStore.upsert (everything else delegates to Spark's parser)
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
  }
}

object GraftExtensions {
  val CosineName = "graft_cosine"
  val Hash60Name = "graft_hash60"

  /** Arity guard: a wrong argument count must fail analysis with a named
    * error, not an IndexOutOfBoundsException (zero args) or silent
    * truncation (extra args ignored).
    */
  private def checkArity(name: String, expected: Int,
                         exprs: Seq[Expression]): Unit =
    if (exprs.length != expected)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> expected.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** `graft_hash60(s)` — the portable cross-engine 60-bit hash as a SQL
    * function: first 15 hex chars of md5 as a long, reproducible in DuckDB
    * as `('0x'||substr(md5(s),1,15))::BIGINT`. DERIVED from
    * [[graft.functions.TextFunctions.portableHash60]] (single source of
    * truth — the SQL surface cannot drift from the Column API the q31/q35
    * oracles are built on). Built-in expressions only — codegen'd.
    */
  private[graft] val hash60Builder: Seq[Expression] => Expression = { exprs =>
    checkArity(Hash60Name, 1, exprs)
    org.apache.spark.sql.graftshim.GraftShim.expression(
      graft.functions.TextFunctions.portableHash60(
        org.apache.spark.sql.graftshim.GraftShim.column(exprs(0))))
  }

  private[graft] val dotBuilder: Seq[Expression] => Expression = { exprs =>
    checkArity(DotProduct.FunctionName, 2, exprs)
    DotProduct(exprs(0), exprs(1))
  }

  private[graft] val cosineBuilder: Seq[Expression] => Expression = { exprs =>
    checkArity(CosineName, 2, exprs)
    val (a, b) = (exprs(0), exprs(1))
    // LEGACY division: a zero-norm vector yields null (undefined cosine)
    // instead of throwing DIVIDE_BY_ZERO under Spark 4's ANSI default
    Divide(DotProduct(a, b),
      Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))), EvalMode.LEGACY)
  }
}
