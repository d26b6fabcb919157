package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer-rule tier (injected `Rule[LogicalPlan]`): transparently
  * rewrite the idiomatic top-k-per-group encoding
  *
  *   df.withColumn("rk", row_number().over(Window.partitionBy(g).orderBy(o)))
  *     .filter($"rk" <= k).drop("rk")
  *
  * into the two-phase [[TopKPerGroup.TopKNode]] operator — users keep
  * writing the standard pattern; sessions that load GraftExtensions get
  * the partial-heap plan (survivors-only shuffle, no per-partition sort)
  * automatically.
  *
  * Deliberately conservative; the rewrite fires only when
  *  - the ONLY window expression is a bare `row_number()`,
  *  - the filter is `rk <= lit` / `rk < lit` / `rk = 1` on that attribute,
  *  - the projection above DISCARDS the rank attribute (so nobody can
  *    observe the missing rank numbers).
  * Tie behavior note: under a non-total orderSpec, row_number already
  * picks arbitrarily among ties (and is not stable across retries); the
  * rewrite has the same contract.
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) && k >= 1 => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) && k >= 2 => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rank) => Some(1)
    case _ => None
  }

  private object RowNumberWindow {
    /** Match a Window computing exactly one bare row_number. */
    def unapply(w: Window): Option[(Attribute, Seq[Expression], Seq[SortOrder], LogicalPlan)] =
      w match {
        case Window(Seq(a @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, order, _)), _)), _, _, child, _) =>
          // Spark's own InferWindowGroupLimit may already have slid a
          // WindowGroupLimit under the Window; the TopK node subsumes it
          val base = child match {
            case WindowGroupLimit(_, _, _, _, grandChild) => grandChild
            case other => other
          }
          Some((a.toAttribute, part, order, base))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, w @ RowNumberWindow(rank, part, order, child)))
        if !p.references.contains(rank) &&
          projList.forall(_.references.subsetOf(child.outputSet)) =>
      limitOf(cond, rank) match {
        case Some(k) if order.nonEmpty =>
          Project(projList, TopKPerGroup.TopKNode(part, order, k, child))
        case _ => p
      }
  }

  /** Install into a running session (idempotent); new sessions get this
    * via GraftExtensions. Registers the TopK strategy too — the rewrite
    * is useless without a planner for the node it produces.
    */
  def register(spark: SparkSession): Unit = {
    TopKPerGroup.register(spark)
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(RewriteRankFilterToTopK))
      spark.experimental.extraOptimizations = cur :+ RewriteRankFilterToTopK
  }
}
