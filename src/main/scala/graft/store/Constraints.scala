package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CHECK constraints over store tables — declared once
  * (`ALTER TABLE … ADD CONSTRAINT name CHECK (expr)`), enforced on EVERY
  * write path for free: the guard is a per-row `CASE WHEN check THEN true
  * ELSE raise_error(…)` filter folded into the write's own projection
  * (codegen'd, zero extra pass, zero extra job), applied at every point
  * the store materializes rows to disk — the flat swap, the partitioned
  * stage writers, the zero-rewrite append, the file-pruned rewrite stage,
  * the CDC appliers, and the deletion-vector tier's delta append and
  * compaction. A violating row aborts the STAGE write, so the statement
  * fails with the constraint name and the offending row (JSON) while the
  * pre-statement table stays intact under the usual crash protocol.
  *
  * Standard SQL CHECK semantics: NULL passes (only a FALSE check
  * violates). `ADD CONSTRAINT` validates the EXISTING data first (one
  * scan — the only non-free moment) and refuses if any row violates, so
  * every row on disk always satisfies every declared constraint —
  * which is why re-validating carried/rewritten rows inside the rewrite
  * engines can never fail spuriously.
  *
  * The declarations live in a `_constraints/checks.tsv` sidecar
  * (fence-then-swap like every store sidecar; expressions URL-encoded so
  * arbitrary SQL text round-trips). Corruption WEDGES loudly — like the
  * deletion vector and unlike the derived row-count cache, losing it
  * would silently change write semantics.
  */
object Constraints {

  val Rel = "_constraints/checks.tsv"

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  /** Declared constraints, (name, checkExprSql), declaration order. */
  def list(spark: SparkSession, path: String): Seq[(String, String)] =
    Sidecar.read(spark, path, Rel) match {
      case None => Nil
      case Some(body) => body.linesIterator.filter(_.nonEmpty).map { l =>
        val parts = Sidecar.fields(path, Rel, l, 2)
        (dec(parts(0)), dec(parts(1)))
      }.toSeq
    }

  private def write(spark: SparkSession, path: String,
                    cs: Seq[(String, String)]): Unit =
    Sidecar.swap(spark, path, Rel,
      cs.map { case (n, e) => s"${enc(n)}\t${enc(e)}" }
        .mkString("", "\n", if (cs.isEmpty) "" else "\n"))

  /** Declare a constraint. The CALLER validates existing data first
    * (see [[violations]]) — this only records it.
    */
  def add(spark: SparkSession, path: String, name: String, exprSql: String): Unit = {
    val cs = list(spark, path)
    require(!cs.exists(_._1.equalsIgnoreCase(name)),
      s"constraint `$name` already exists on $path")
    write(spark, path, cs :+ (name -> exprSql))
  }

  /** Remove a constraint by name; unknown names refuse. */
  def drop(spark: SparkSession, path: String, name: String): Unit = {
    val cs = list(spark, path)
    require(cs.exists(_._1.equalsIgnoreCase(name)),
      s"no constraint `$name` on $path (declared: " +
        s"${if (cs.isEmpty) "none" else cs.map(_._1).mkString(", ")})")
    write(spark, path, cs.filterNot(_._1.equalsIgnoreCase(name)))
  }

  /** Drop ALL declarations — `CREATE OR REPLACE TABLE` defines a new
    * table, so the old table's constraints do not apply to it.
    */
  def clear(spark: SparkSession, path: String): Unit =
    if (Sidecar.read(spark, path, Rel).isDefined) write(spark, path, Nil)

  /** Rows of `df` violating `exprSql` — a FALSE check; NULL passes. */
  def violations(df: DataFrame, exprSql: String): DataFrame =
    df.filter(!coalesce(expr(exprSql), lit(true)))

  /** The write-path guard: `df` with every declared check folded in as a
    * per-row raise-on-violation filter. The filter rides the write's own
    * codegen (no extra pass, no extra job); the raised error carries the
    * constraint name and the offending row as JSON. A no-op (same `df`)
    * when the table declares nothing.
    */
  def guard(spark: SparkSession, path: String, df: DataFrame): DataFrame = {
    val cs = list(spark, path)
    if (cs.isEmpty) df
    else cs.foldLeft(df) { case (d, (name, e)) =>
      d.filter(
        when(coalesce(expr(e), lit(true)), lit(true))
          .otherwise(raise_error(concat(
            lit(s"graft_store constraint `$name` violated: CHECK ($e) fails for "),
            to_json(struct(d.columns.map(col).toIndexedSeq: _*))))
            .cast("boolean")))
    }
  }

  /** Column names a constraint expression references (case preserved as
    * written) — the ALTER COLUMN statements refuse to rename or drop a
    * referenced column out from under a declared check.
    */
  def referencedColumns(spark: SparkSession, exprSql: String): Seq[String] =
    spark.sessionState.sqlParser.parseExpression(exprSql).collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.nameParts.last
    }.distinct
}
