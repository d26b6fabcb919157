package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}

/** The SQL READ surface of the store (round-12 verdict item 2): a
  * `graft_store.\`/path\`` relation anywhere inside a parsed statement
  * resolves to the STORE's read semantics —
  *
  *  - crash recovery runs first (a table parked at `__old` mid-swap
  *    reads, exactly like the library's `TableStore.read`);
  *  - a merge-on-read table reads through
  *    [[graft.operators.DeletionVectors.dvRead]], so DV-masked rows stay
  *    invisible — closing the silent-wrong-read hole where a plain
  *    ``parquet.`path` `` scan over a MoR table resurrects masked rows
  *    with no error (the write side got this guard in round 12; this is
  *    the read-side half).
  *
  * Altitude: substitution happens at the PARSER tier on the unresolved
  * tree — the same altitude Spark's analyzer resolves views at — so it
  * composes with any statement shape: SELECT, CTEs, JOINs, scalar/IN
  * subqueries (`transformUpWithSubqueries`), INSERT sources, and the
  * USING source of this library's own MERGE interceptor. A catalog table
  * that is genuinely named `graft_store.x` would be shadowed; the name
  * is reserved by the DML surface already, so the collision class is
  * documented, not new.
  *
  * The store read is built EAGERLY at parse time (sidecar probe + footer
  * schema), which is when `spark.sql` runs anyway; the vector snapshot a
  * SELECT sees is the one at its own parse — single-statement
  * consistency, the same contract `dvRead` gives a library caller.
  */
object GraftStoreRead {

  /** Replace every 2-part `graft_store`.`path` relation — top level,
    * inside expression subqueries (`transformUpWithSubqueries`), and
    * inside CTE definitions (which live in `UnresolvedWith.cteRelations`,
    * an innerChildren field the generic transforms do NOT descend into —
    * the analyzer inlines them verbatim, so an unsubstituted CTE body
    * would surface as an unresolved relation later) — with the
    * store-semantics read plan.
    */
  def substitute(plan: LogicalPlan): LogicalPlan = {
    lazy val spark = SparkSession.active
    def walk(p: LogicalPlan): LogicalPlan = p.transformUpWithSubqueries {
      case w: UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (name, s, maxDepth) =>
          (name, walk(s).asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias],
            maxDepth)
        })
      case r: UnresolvedRelation if isGraftStore(r) =>
        readPlan(spark, r.multipartIdentifier(1))
    }
    walk(plan)
  }

  private def isGraftStore(r: UnresolvedRelation): Boolean =
    r.multipartIdentifier.length == 2 &&
      r.multipartIdentifier.head.equalsIgnoreCase("graft_store")

  /** The store-semantics read as a logical plan: recover-on-read always;
    * deletion-vector masking when the sidecar exists.
    */
  private[plans] def readPlan(spark: SparkSession, path: String): LogicalPlan = {
    graft.store.TableStore.recover(spark, path)
    val df =
      if (GraftSqlDml.hasDeletionVector(spark, path))
        graft.operators.DeletionVectors.dvRead(spark, path)
      else spark.read.parquet(path)
    df.queryExecution.logical
  }
}
