package graft.plans

import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining SQL DML surface over the store — completes the parser
  * tier next to [[GraftSqlMerge]] (the reference's entire write surface
  * is SQL; a user porting from it expects the standard statements, not a
  * library call per mutation):
  *
  * {{{
  * DELETE FROM graft_store.`/path/to/table` [WHERE <expr>]
  * UPDATE graft_store.`/path/to/table` SET c1 = <expr> [, c2 = <expr> …] [WHERE <expr>]
  * }}}
  *
  * Standard SQL semantics, including the null case: DELETE removes rows
  * where the predicate is TRUE (null-predicate rows survive); UPDATE
  * assigns where the predicate is TRUE (null/false rows keep their
  * values); assignments take effect simultaneously (an assignment
  * reading a column another assignment writes sees the OLD value —
  * asserted by spec). Expressions are VALIDATED at parse time through
  * Spark's own expression parser (nothing home-grown accepts SQL text)
  * and applied with `expr(...)` against the table's columns at run time;
  * both statements execute as one read → project/filter → atomic
  * backup-rename swap ([[graft.store.TableStore.atomicWrite]]), so a
  * crash mid-statement leaves the pre-statement table.
  *
  * Statements not targeting `graft_store.` delegate verbatim to Spark's
  * parser, exactly like the MERGE front door.
  */
object GraftSqlDml {

  private val DeleteHead =
    """(?is)\s*DELETE\s+FROM\s+graft_store\s*\.\s*`([^`]+)`\s*(.*)""".r
  private val UpdateHead =
    """(?is)\s*UPDATE\s+graft_store\s*\.\s*`([^`]+)`\s+SET\s+(.*)""".r
  private val WhereTail = """(?is)\s*WHERE\s+(.*)""".r

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft_store DML: $msg")

  def tryParse(sql: String, delegate: ParserInterface): Option[LogicalPlan] = sql match {
    case DeleteHead(path, rest) =>
      val cond = rest.trim match {
        case "" => None
        case WhereTail(c) =>
          if (c.trim.isEmpty) bad("empty WHERE predicate")
          delegate.parseExpression(c) // validate; refuse garbage at parse time
          Some(c.trim)
        case other => bad(s"expected WHERE or end of statement, got: ${other.take(60)}")
      }
      Some(DeleteFromGraftStore(path, cond))
    case UpdateHead(path, rest) =>
      val (setPart, cond) = splitWhere(rest)
      val assignments = splitTopLevel(setPart).map { a =>
        val i = indexOfTopLevel(a, '=')
        if (i <= 0) bad(s"malformed assignment '${a.trim.take(60)}' (expected col = expr)")
        val colName = a.take(i).trim.stripPrefix("`").stripSuffix("`")
        val exprSql = a.drop(i + 1).trim
        if (colName.isEmpty || exprSql.isEmpty) bad(s"malformed assignment '${a.trim.take(60)}'")
        delegate.parseExpression(exprSql) // validate
        colName -> exprSql
      }
      if (assignments.isEmpty) bad("empty SET list")
      if (assignments.map(_._1).distinct.size != assignments.size)
        bad("a column is assigned twice in SET")
      cond.foreach(delegate.parseExpression) // validate
      Some(UpdateGraftStore(path, assignments, cond))
    case _ => None
  }

  /** The SQL statements rewrite through the plain [[graft.store
    * .TableStore]] protocol, which reads parquet directly — pointed at a
    * MERGE-ON-READ table they would resurrect DV-masked rows into the
    * rewrite and drop the exactly-once batch ledger living in the
    * sidecar. Refuse loudly and route to the DV tier instead.
    */
  private[plans] def requireNoDeletionVector(spark: SparkSession, path: String): Unit =
    if (graft.store.Sidecar.read(spark, path,
        graft.operators.DeletionVectors.DvDir + "/dv.tsv").isDefined)
      throw new IllegalArgumentException(
        s"graft_store DML: $path carries a deletion-vector sidecar (merge-on-read " +
          "table) — a plain rewrite would resurrect masked rows and drop the " +
          "exactly-once CDC ledger; mutate it through DeletionVectors" +
          ".dvDelete/morUpsert/morApplyCdc instead (to convert it to a plain " +
          "table: compact(), retire the CDC feed, then delete the sidecar dir " +
          "explicitly)")

  /** Positions that are TOP-LEVEL: depth 0, outside any string literal,
    * and outside any SQL comment. One scanner for all splitting, handling
    * everything Spark's lexer does: single- AND double-quoted literals,
    * backslash escapes inside them, SQL doubled-quote escapes (`'don''t'`
    * / `"say ""hi"""`), `--` line comments, and `/* */` bracketed
    * comments (NESTED, matching Spark's lexer) — a comma or WHERE inside
    * a comment must not split the statement (a line comment would
    * otherwise silently re-arm text after its newline as a second
    * assignment). Structural chars (quotes, parens, comment openers) are
    * never themselves marked top-level.
    */
  private def topLevelMask(s: String): Array[Boolean] = {
    val m = new Array[Boolean](s.length)
    var depth = 0
    var q: Char = 0    // 0 = outside any string literal
    var lc = false     // inside a -- line comment
    var bc = 0         // bracketed-comment nesting depth
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) {
        if (c == '\\') i += 1 // backslash-escaped char, incl. \' and \"
        else if (c == q) {
          if (i + 1 < s.length && s.charAt(i + 1) == q) i += 1 // doubled quote
          else q = 0
        }
      } else if (lc) {
        if (c == '\n') lc = false
      } else if (bc > 0) {
        if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') { bc += 1; i += 1 }
        else if (c == '*' && i + 1 < s.length && s.charAt(i + 1) == '/') { bc -= 1; i += 1 }
      } else c match {
        case '\'' | '"' => q = c
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' => lc = true; i += 1
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' => bc = 1; i += 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => if (depth == 0) m(i) = true
      }
      i += 1
    }
    m
  }

  /** Split `SET … [WHERE …]` at the first TOP-LEVEL `WHERE` keyword —
    * a WHERE inside a scalar subquery or a string literal must not split
    * the statement.
    */
  private def splitWhere(rest: String): (String, Option[String]) = {
    val m = topLevelMask(rest)
    val upper = rest.toUpperCase(java.util.Locale.ROOT)
    def wordChar(c: Char) = c.isLetterOrDigit || c == '_'
    var i = 0
    while (i < rest.length) {
      if (m(i) && upper.startsWith("WHERE", i) &&
          (i == 0 || !wordChar(rest.charAt(i - 1))) &&
          (i + 5 >= rest.length || !wordChar(rest.charAt(i + 5)))) {
        val c2 = rest.substring(i + 5).trim
        if (c2.isEmpty) bad("empty WHERE predicate")
        return (rest.substring(0, i), Some(c2))
      }
      i += 1
    }
    (rest, None)
  }

  /** Split on top-level commas. */
  private def splitTopLevel(s: String): Seq[String] = {
    val m = topLevelMask(s)
    val out = Seq.newBuilder[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (m(i) && s.charAt(i) == ',') { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** First top-level occurrence of `ch`, -1 if none. */
  private def indexOfTopLevel(s: String, ch: Char): Int = {
    val m = topLevelMask(s)
    var i = 0
    while (i < s.length) {
      if (m(i) && s.charAt(i) == ch) return i
      i += 1
    }
    -1
  }
}

/** `DELETE FROM graft_store` — survivors are rows where the predicate is
  * NOT TRUE (standard SQL: a null predicate does not delete). One atomic
  * swap; returns the post-delete row count.
  */
final case class DeleteFromGraftStore(path: String, whereSql: Option[String])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("n_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlDml.requireNoDeletionVector(spark, path)
    val table = graft.store.TableStore.read(spark, path)
    val survivors = whereSql match {
      case None => table.limit(0) // unconditional DELETE empties the table
      case Some(w) => table.filter(!coalesce(expr(w), lit(false)))
    }
    graft.store.TableStore.atomicWrite(spark, survivors, path)
    Seq(Row(graft.store.TableStore.read(spark, path).count()))
  }
}

/** `UPDATE graft_store` — assignments evaluate against the OLD row
  * (simultaneous-assignment semantics) and apply only where the
  * predicate is TRUE. One atomic swap; returns the table row count.
  */
final case class UpdateGraftStore(path: String,
                                  assignments: Seq[(String, String)],
                                  whereSql: Option[String])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("n_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlDml.requireNoDeletionVector(spark, path)
    val table = graft.store.TableStore.read(spark, path)
    // identifier resolution follows the session's analyzer semantics:
    // case-insensitive unless spark.sql.caseSensitive — SET V = 1 must
    // hit column `v` exactly like every other identifier in the statement
    val caseSensitive = spark.sessionState.conf.caseSensitiveAnalysis
    def resolve(c: String): String = {
      val hits =
        if (caseSensitive) table.columns.filter(_ == c)
        else table.columns.filter(_.equalsIgnoreCase(c))
      hits match {
        case Array(one) => one
        case Array() => throw new IllegalArgumentException(
          s"graft_store DML: UPDATE SET targets unknown column `$c` " +
            s"(table has ${table.columns.mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"graft_store DML: UPDATE SET column `$c` is ambiguous among " +
            s"${many.mkString(", ")} (set spark.sql.caseSensitive=true)")
      }
    }
    val byName = assignments.map { case (c, e) => resolve(c) -> e }
    if (byName.map(_._1).distinct.size != byName.size)
      throw new IllegalArgumentException(
        "graft_store DML: two SET assignments resolve to the same column")
    val targets = byName.toMap
    val cond = whereSql.map(w => coalesce(expr(w), lit(false))).getOrElse(lit(true))
    // one select over the old row = simultaneous assignments by construction
    val updated = table.select(table.columns.map { c =>
      targets.get(c) match {
        case Some(e) => when(cond, expr(e)).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }.toIndexedSeq: _*)
    graft.store.TableStore.atomicWrite(spark, updated, path)
    Seq(Row(graft.store.TableStore.read(spark, path).count()))
  }
}
