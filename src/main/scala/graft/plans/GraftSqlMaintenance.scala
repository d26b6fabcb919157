package graft.plans

import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The table-MAINTENANCE statements over the store — the operational
  * surface every long-lived lakehouse deployment runs nightly, reachable
  * from SQL text like the DML tier ([[GraftSqlDml]]/[[GraftSqlMerge]]):
  *
  * {{{
  * OPTIMIZE graft_store.`/path` [WHERE <pred>]
  *                              [ZORDER BY (c1, c2)] [TARGET <n> FILES]
  * VACUUM graft_store.`/path` KEEP <n> [VERSIONS]
  * CREATE [OR REPLACE] TABLE graft_store.`/path`
  *   [PARTITIONED BY (c1 [, c2 …])] AS <select>
  * DROP TABLE [IF EXISTS] graft_store.`/path`
  * SHOW PARTITIONS graft_store.`/path`
  * ALTER TABLE graft_store.`/path` ADD COLUMN c <type> [DEFAULT <expr>]
  *                                | RENAME COLUMN a TO b | DROP COLUMN c
  *                                | ADD CONSTRAINT n CHECK (<expr>)
  *                                | DROP CONSTRAINT n
  * }}}
  *
  * OPTIMIZE is LAYOUT-ROUTED like the DML statements, because the right
  * compaction move differs per layout:
  *
  *  - flat table → read-coalesce-swap into the target file count
  *    (default: ceil(bytes / `graft.optimize.targetFileBytes`, 128 MiB) —
  *    `coalesce`, not `repartition`: compaction must not pay a shuffle);
  *    with WHERE → the FILE-PRUNED rewrite: only part files holding a
  *    predicate-TRUE row are decoded and repacked, clean files hard-link
  *    through the stage byte-untouched — targeted small-file cleanup
  *    after a localized ingest;
  *  - flat + ZORDER BY (x, y) → rewrite range-clustered on the Morton
  *    interleave of the two columns (each bucketized to 2^16 rank
  *    buckets off one min/max aggregate — `width_bucket`, codegen'd), so
  *    file-level min/max statistics prune predicates on EITHER column;
  *  - partitioned table → per-LEAF compaction through the pruned
  *    partition rewrite; WHERE limits it to the leaves holding a
  *    predicate-TRUE row, untouched leaves' files are never opened;
  *  - merge-on-read table → HARDENING: materialize the deletion-vector
  *    masks and fold the appended `mor-*` debt through
  *    [[graft.operators.DeletionVectors.compact]] (read-consistent,
  *    ledger preserved — the table stays merge-on-read, just debt-free);
  *  - versioned root → refused (snapshots are immutable; VACUUM is the
  *    maintenance statement for history).
  *
  * OPTIMIZE never changes table CONTENT — only the file layout. VACUUM
  * routes to [[graft.store.VersionedTable.vacuum]] (pin- and
  * fence-aware: pinned snapshots survive any KEEP). CTAS writes through
  * the same crash-safe swap as every store write and refuses to replace
  * merge-on-read or versioned state wholesale (DROP first, explicitly).
  * Statements not targeting `graft_store.` delegate verbatim.
  */
object GraftSqlMaintenance {

  private val OptimizeHead =
    """(?is)\s*OPTIMIZE\s+graft_store\s*\.\s*`([^`]+)`\s*(.*)""".r
  private val VacuumHead =
    """(?is)\s*VACUUM\s+graft_store\s*\.\s*`([^`]+)`\s*(.*)""".r
  private val CreateHead =
    """(?is)\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?TABLE\s+graft_store\s*\.\s*`([^`]+)`\s*(.*)""".r
  private val DropHead =
    """(?is)\s*DROP\s+TABLE\s+(?:(IF\s+EXISTS)\s+)?graft_store\s*\.\s*`([^`]+)`\s*(.*)""".r

  private val ShowPartsHead =
    """(?is)\s*SHOW\s+PARTITIONS\s+graft_store\s*\.\s*`([^`]+)`\s*""".r
  private val DescribeHead =
    """(?is)\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?graft_store\s*\.\s*`([^`]+)`\s*""".r
  private val CopyHead =
    """(?is)\s*COPY\s+INTO\s+graft_store\s*\.\s*`([^`]+)`\s+FROM\s+'([^']+)'\s+FORMAT\s+([A-Za-z]+)\s*""".r
  private val AlterHead =
    """(?is)\s*ALTER\s+TABLE\s+graft_store\s*\.\s*`([^`]+)`\s+(.*)""".r
  private val AddColTail =
    """(?is)ADD\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s+(.+)""".r
  private val RenameColTail =
    """(?is)RENAME\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s+TO\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s*""".r
  private val DropColTail =
    """(?is)DROP\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s*""".r
  private val AddConstraintTail =
    """(?is)ADD\s+CONSTRAINT\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s+CHECK\s*\((.*)\)\s*""".r
  private val DropConstraintTail =
    """(?is)DROP\s+CONSTRAINT\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s*""".r
  private val ZorderTail = """(?is)ZORDER\s+BY\s*\(([^)]+)\)\s*(.*)""".r
  private val TargetTail = """(?is)TARGET\s+(\d+)\s+FILES\s*(.*)""".r
  private val KeepTail = """(?is)\s*KEEP\s+(\d+)\s*(?:VERSIONS\s*)?""".r
  private val PartByTail = """(?is)\s*PARTITIONED\s+BY\s*\(([^)]+)\)\s*(.*)""".r
  private val AsTail = """(?is)\s*AS\s+(.*)""".r

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft_store maintenance: $msg")

  def tryParse(sql: String, delegate: ParserInterface): Option[LogicalPlan] = sql match {
    case OptimizeHead(path, rest) =>
      val (whereSql, zorder, target) = parseOptimizeTail(rest.trim, delegate)
      Some(OptimizeGraftStore(path, whereSql, zorder, target))
    case VacuumHead(path, rest) => rest.trim match {
      case KeepTail(n, _*) =>
        val keep = n.toInt
        if (keep < 1) bad("VACUUM KEEP must retain at least 1 version")
        Some(VacuumGraftStore(path, keep))
      case "" => bad("VACUUM requires KEEP <n> [VERSIONS] — an unbounded " +
        "vacuum would delete every non-current snapshot")
      case other => bad(s"expected KEEP <n> [VERSIONS], got: ${other.take(60)}")
    }
    case CreateHead(orReplace, path, rest) =>
      val (pcols, afterPart) = rest match {
        case PartByTail(cols, r2) =>
          val cs = GraftSqlDml.splitTopLevel(cols)
            .map(_.stripPrefix("`").stripSuffix("`"))
          if (cs.isEmpty) bad("empty PARTITIONED BY list")
          if (cs.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.size != cs.size)
            bad("a column appears twice in PARTITIONED BY")
          (cs, r2)
        case _ => (Seq.empty[String], rest)
      }
      afterPart match {
        case AsTail(src) if src.trim.nonEmpty =>
          Some(CreateTableGraftStore(path,
            GraftStoreRead.substitute(delegate.parsePlan(src)),
            pcols, orReplace != null))
        case _ => bad("CREATE TABLE graft_store requires AS <select> — the " +
          "store is schema-on-write parquet; there is no column-DDL-only table")
      }
    case DropHead(ifExists, path, rest) =>
      if (rest.trim.nonEmpty) bad(s"unexpected text after DROP TABLE: ${rest.trim.take(60)}")
      Some(DropTableGraftStore(path, ifExists != null))
    case ShowPartsHead(path) => Some(ShowPartitionsGraftStore(path))
    case DescribeHead(path) => Some(DescribeGraftStore(path))
    case CopyHead(path, src, fmt) =>
      val format = fmt.toUpperCase(java.util.Locale.ROOT)
      if (!Seq("PARQUET", "CSV", "JSONL").contains(format))
        bad(s"COPY INTO FORMAT must be PARQUET, CSV, or JSONL, got $fmt")
      Some(CopyIntoGraftStore(path, src, format))
    case AlterHead(path, action) => Some(parseAlter(path, action.trim, delegate))
    case _ => None
  }

  /** `ADD COLUMN c <type> [DEFAULT <expr>]` | `RENAME COLUMN a TO b` |
    * `DROP COLUMN c` | `ADD CONSTRAINT n CHECK (expr)` |
    * `DROP CONSTRAINT n`. The ADD COLUMN type runs to the first top-level
    * DEFAULT keyword (types are multi-token: `DECIMAL(10, 2)`); every
    * type and expression validates through Spark's own parsers at parse
    * time, like the rest of the DML tier.
    */
  private def parseAlter(path: String, action: String,
                         delegate: ParserInterface): LogicalPlan = action match {
    case AddConstraintTail(name, exprSql) =>
      val e = exprSql.trim
      if (e.isEmpty) bad("empty CHECK expression")
      delegate.parseExpression(e) // validate
      AlterGraftStore(path, AlterAction.AddConstraint(name, e))
    case DropConstraintTail(name) =>
      AlterGraftStore(path, AlterAction.DropConstraint(name))
    case RenameColTail(from, to) =>
      AlterGraftStore(path, AlterAction.Rename(from, to))
    case DropColTail(c) =>
      AlterGraftStore(path, AlterAction.Drop(c))
    case AddColTail(c, rest) =>
      val sc = new GraftSqlDml.KeywordScanner(rest)
      val (typeSql, default) = sc.indexOf("DEFAULT") match {
        case -1 => (rest.trim, None)
        case i =>
          val d = rest.substring(i + 7).trim
          if (d.isEmpty) bad("empty DEFAULT expression")
          delegate.parseExpression(d) // validate
          (rest.substring(0, i).trim, Some(d))
      }
      if (typeSql.isEmpty) bad(s"ADD COLUMN `$c` is missing its type")
      val dt = delegate.parseDataType(typeSql) // validate + resolve
      AlterGraftStore(path, AlterAction.Add(c, dt, default))
    case other => bad(s"expected ADD COLUMN c <type> [DEFAULT e] / " +
      s"RENAME COLUMN a TO b / DROP COLUMN c, got: ${other.take(60)}")
  }

  /** `[WHERE <pred>] [ZORDER BY (x, y)] [TARGET <n> FILES]` — clauses in
    * order, each optional. The WHERE predicate runs to the first
    * TOP-LEVEL clause keyword that actually heads a well-formed clause
    * (so a column literally named `target` inside the predicate does not
    * truncate it).
    */
  private def parseOptimizeTail(rest: String, delegate: ParserInterface)
      : (Option[String], Option[(String, String)], Option[Int]) = {
    def parseClauses(s: String): (Option[(String, String)], Option[Int]) = s match {
      case "" => (None, None)
      case ZorderTail(cols, r2) =>
        val cs = GraftSqlDml.splitTopLevel(cols)
          .map(_.stripPrefix("`").stripSuffix("`"))
        if (cs.length != 2)
          bad(s"ZORDER BY takes exactly two columns (Morton interleave " +
            s"of two dimensions), got ${cs.length}")
        val (_, target) = parseClauses(r2.trim)
        (Some((cs.head, cs.last)), target)
      case TargetTail(n, r2) =>
        if (r2.trim.nonEmpty) bad(s"unexpected text after TARGET n FILES: ${r2.trim.take(60)}")
        val t = n.toInt
        if (t < 1) bad("TARGET must be at least 1 file")
        (None, Some(t))
      case other => bad(s"expected WHERE / ZORDER BY (…) / TARGET n FILES, " +
        s"got: ${other.take(60)}")
    }
    if (rest.isEmpty) (None, None, None)
    else if (rest.toUpperCase(java.util.Locale.ROOT).startsWith("WHERE")) {
      val body = rest.drop(5)
      // predicate ends at the first top-level WELL-FORMED trailing clause
      val sc = new GraftSqlDml.KeywordScanner(body)
      def clauseStart(kw: String): Int = {
        var i = sc.indexOf(kw)
        while (i >= 0 && !body.substring(i).matches("(?is)(ZORDER\\s+BY\\s*\\(|TARGET\\s+\\d+\\s+FILES).*"))
          i = sc.indexOf(kw, i + 1)
        i
      }
      val cut = Seq(clauseStart("ZORDER"), clauseStart("TARGET"))
        .filter(_ >= 0).sorted.headOption.getOrElse(body.length)
      val pred = body.substring(0, cut).trim
      if (pred.isEmpty) bad("empty WHERE predicate")
      delegate.parseExpression(pred) // validate at parse time, like the DML tier
      val (z, t) = parseClauses(body.substring(cut).trim)
      (Some(pred), z, t)
    } else {
      val (z, t) = parseClauses(rest)
      (None, z, t)
    }
  }
}

/** `OPTIMIZE graft_store` — layout-routed compaction/clustering; content
  * is NEVER changed, only the file layout. Returns (files_before,
  * files_after, n_rows) — counts from one driver listing, rows from
  * footer metadata (zero post-swap jobs, manifest-cached).
  */
final case class OptimizeGraftStore(path: String,
                                    whereSql: Option[String],
                                    zorder: Option[(String, String)],
                                    targetFiles: Option[Int])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)())

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft_store maintenance: $msg")

  /** Default target: one file per `graft.optimize.targetFileBytes`
    * (128 MiB — about one parquet row group at the scale the store
    * targets), never less than one file.
    */
  private def defaultTarget(spark: SparkSession, bytes: Long): Int = {
    val per = spark.conf.getOption("graft.optimize.targetFileBytes")
      .map(_.toLong).getOrElse(128L << 20)
    math.max(1L, (bytes + per - 1) / per).min(Int.MaxValue).toInt
  }

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.store.TableStore
    GraftSqlDml.requireNotVersioned(spark, path, "OPTIMIZE")
    if (!TableStore.exists(spark, path)) bad(s"no table at $path")
    val (filesBefore, bytesBefore) = TableStore.dataFileStats(spark, path)
    if (GraftSqlDml.hasDeletionVector(spark, path)) runMergeOnRead(spark, filesBefore)
    else {
      val pcols = TableStore.detectPartitionColumns(spark, path)
      if (pcols.nonEmpty) runPartitioned(spark, pcols)
      else zorder match {
        case Some((cx, cy)) => runZorder(spark, cx, cy, bytesBefore)
        case None => runFlat(spark, bytesBefore)
      }
      val (filesAfter, _) = TableStore.dataFileStats(spark, path)
      Seq(Row(filesBefore.toLong, filesAfter.toLong,
        TableStore.rowCountFromFooters(spark, path)))
    }
  }

  /** MoR hardening: materialize the DV masks and fold every appended
    * `mor-*` file into the same read-consistent rewrite (the
    * [[graft.operators.DeletionVectors.maybeCompact]] appended-debt
    * move, fired unconditionally) — the table stays merge-on-read with
    * its ledger, just debt-free. The layout knobs are meaningless here
    * and refuse rather than silently no-op.
    */
  private def runMergeOnRead(spark: SparkSession, filesBefore: Int): Seq[Row] = {
    import graft.operators.DeletionVectors
    if (whereSql.isDefined || zorder.isDefined || targetFiles.isDefined)
      bad(s"OPTIMIZE on merge-on-read $path takes no WHERE/ZORDER/TARGET — " +
        "it hardens the deletion-vector debt (masks materialize, mor-* " +
        "files fold in); compact to a plain table first for layout control")
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val morFiles = f.listStatus(p).map(_.getPath)
      .filter(q => q.getName.endsWith(".parquet") && q.getName.startsWith("mor-"))
      .map(q => f.makeQualified(q).toString).toSeq
    DeletionVectors.compact(spark, path, alsoRewrite = morFiles)
    val (filesAfter, _) = graft.store.TableStore.dataFileStats(spark, path)
    Seq(Row(filesBefore.toLong, filesAfter.toLong,
      DeletionVectors.liveRowCount(spark, path)))
  }

  /** Partitioned: compact each victim leaf to ONE file through the
    * pruned partition rewrite — untouched leaves' files never open. The
    * repartition on the partition tuple puts each leaf's rows in one
    * task, so the partitionBy writer emits exactly one file per leaf.
    */
  private def runPartitioned(spark: SparkSession, pcols: Seq[String]): Unit = {
    import graft.store.TableStore
    if (zorder.isDefined)
      bad(s"ZORDER BY on partitioned $path is not supported — the layout " +
        "already clusters on the partition columns; zorder a flat table")
    if (targetFiles.isDefined)
      bad(s"TARGET n FILES on partitioned $path is not supported — a " +
        "partitioned OPTIMIZE compacts each victim leaf to one file")
    val cond = whereSql.map(w => coalesce(expr(w), lit(false))).getOrElse(lit(true))
    TableStore.rewritePartitionsWhere(spark, path, pcols, cond,
      _.repartition(pcols.map(col): _*))
  }

  /** Flat, no zorder: coalesce into the target file count (no shuffle)
    * and swap; with WHERE, the file-pruned rewrite repacks only the part
    * files holding a predicate-TRUE row while clean files hard-link
    * through the stage.
    */
  private def runFlat(spark: SparkSession, bytes: Long): Unit = {
    import graft.store.TableStore
    whereSql match {
      case Some(w) =>
        TableStore.rewriteFilesWhere(spark, path,
          coalesce(expr(w), lit(false)), _.coalesce(targetFiles.getOrElse(1)))
      case None =>
        val n = targetFiles.getOrElse(defaultTarget(spark, bytes))
        TableStore.atomicWrite(spark,
          TableStore.read(spark, path).coalesce(n), path)
    }
  }

  /** Flat + ZORDER BY (x, y): bucketize each dimension to 2^16 uniform
    * buckets off ONE min/max aggregate (`width_bucket` — codegen'd, no
    * window, no extra shuffle beyond the range partition), Morton-
    * interleave ([[graft.operators.Layout.zorderKey]]), range-partition
    * + sort on the key, swap. Every output file then covers a tight key
    * band, so file-level min/max statistics prune predicates on EITHER
    * column.
    */
  private def runZorder(spark: SparkSession, cx: String, cy: String,
                        bytes: Long): Unit = {
    import graft.store.TableStore
    if (whereSql.isDefined)
      bad("WHERE with ZORDER BY is not supported — clustering is a " +
        "whole-table layout property on a flat table")
    val table = TableStore.read(spark, path)
    def resolve(c: String): String =
      table.columns.filter(_.equalsIgnoreCase(c)) match {
        case Array(one) => one
        case Array() => bad(s"ZORDER BY names unknown column `$c` " +
          s"(table has ${table.columns.mkString(", ")})")
        case many => bad(s"ZORDER BY column `$c` is ambiguous among ${many.mkString(", ")}")
      }
    val (x, y) = (resolve(cx), resolve(cy))
    Seq(x, y).foreach { c =>
      if (!table.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
        bad(s"ZORDER BY column `$c` is ${table.schema(c).dataType.simpleString} — " +
          "the Morton bucketization needs numeric dimensions")
    }
    val n = targetFiles.getOrElse(defaultTarget(spark, bytes))
    val bounds = table.agg(
      min(col(x)).cast("double"), max(col(x)).cast("double"),
      min(col(y)).cast("double"), max(col(y)).cast("double")).head()
    if (bounds.isNullAt(0)) { // empty table: layout is vacuous
      TableStore.atomicWrite(spark, table, path)
      return
    }
    val buckets = 1 << 16
    def bucketize(c: Column, lo: Double, hi: Double): Column =
      if (hi == lo) lit(0L)
      // width_bucket: 1..n in range, n+1 AT the max — clamp, then 0-base
      else least(width_bucket(c.cast("double"), lit(lo), lit(hi), lit(buckets)),
        lit(buckets.toLong)) - lit(1L)
    val zkey = graft.operators.Layout.zorderKey(
      bucketize(col(x), bounds.getDouble(0), bounds.getDouble(1)),
      bucketize(col(y), bounds.getDouble(2), bounds.getDouble(3)), bits = 16)
    TableStore.atomicWrite(spark,
      table.withColumn("__zkey", zkey)
        .repartitionByRange(n, col("__zkey"))
        .sortWithinPartitions(col("__zkey"))
        .drop("__zkey"),
      path)
  }
}

/** `VACUUM graft_store … KEEP n` — retention over a VERSIONED root:
  * [[graft.store.VersionedTable.vacuum]] (fences stale writers first;
  * the CURRENT version and live reader pins survive any KEEP). Returns
  * (versions_before, versions_after, current_version).
  */
final case class VacuumGraftStore(path: String, keep: Int)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("versions_before", LongType, nullable = false)(),
    AttributeReference("versions_after", LongType, nullable = false)(),
    AttributeReference("current_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.store.VersionedTable
    val cur = VersionedTable.currentVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"graft_store maintenance: VACUUM on $path, which is not a " +
          "versioned table (no CURRENT pointer) — plain tables keep no " +
          "history; OPTIMIZE is their maintenance statement"))
    val before = VersionedTable.versions(spark, path)
    VersionedTable.vacuum(spark, path, keepLast = keep)
    val after = VersionedTable.versions(spark, path)
    Seq(Row(before.size.toLong, after.size.toLong, cur.toLong))
  }
}

/** `CREATE [OR REPLACE] TABLE graft_store … [PARTITIONED BY (…)] AS
  * <select>` — CTAS through the crash-safe swap. Plain CREATE refuses an
  * existing table; OR REPLACE swaps atomically but refuses to clobber
  * merge-on-read or versioned state wholesale (masks/ledger/history
  * don't die as a side effect — DROP first, explicitly). The source may
  * read graft_store tables (including `VERSION AS OF` — CTAS is how a
  * snapshot materializes to a plain table).
  */
final case class CreateTableGraftStore(path: String, source: LogicalPlan,
                                       partitionCols: Seq[String],
                                       orReplace: Boolean)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("n_rows", LongType, nullable = false)())

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft_store maintenance: $msg")

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.store.TableStore
    if (TableStore.exists(spark, path)) {
      if (!orReplace) bad(s"table $path already exists — CREATE OR REPLACE " +
        "TABLE to overwrite it, or INSERT/MERGE to mutate it")
      GraftSqlDml.requireNotVersioned(spark, path, "CREATE OR REPLACE TABLE")
      if (GraftSqlDml.hasDeletionVector(spark, path))
        bad(s"CREATE OR REPLACE TABLE on $path, a merge-on-read table — " +
          "replacing it would silently drop the deletion-vector masks and " +
          "the exactly-once ledger; DROP TABLE first, explicitly")
      // OR REPLACE defines a NEW table: the old table's CHECK constraints
      // do not apply to the replacement, so disarm BEFORE the write (the
      // guard would otherwise validate — or fail to resolve — the new
      // data against the old declarations). A crash before the write
      // leaves the old data with its constraints dropped: metadata the
      // user had already asked to discard, never corruption.
      graft.store.Constraints.clear(spark, path)
    }
    val df = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, source)
    val resolved = partitionCols.map { c =>
      df.columns.filter(_.equalsIgnoreCase(c)) match {
        case Array(one) => one
        case Array() => bad(s"PARTITIONED BY names unknown column `$c` " +
          s"(select produces ${df.columns.mkString(", ")})")
        case many => bad(s"PARTITIONED BY column `$c` is ambiguous among " +
          many.mkString(", "))
      }
    }
    if (resolved.nonEmpty)
      TableStore.atomicWritePartitioned(spark, df, path, resolved)
    else TableStore.atomicWrite(spark, df, path)
    Seq(Row(TableStore.rowCountFromFooters(spark, path)))
  }
}

/** `DROP TABLE [IF EXISTS] graft_store` — removes the table directory
  * and its crash-protocol debris (`__old`/`__tmp`/`__dtmp` siblings), so
  * a later CREATE cannot resurrect a parked backup through recovery.
  * Fences stale writers first (a fenced-out writer's late commit must
  * not re-materialize the dropped table). Returns `dropped` = 1/0.
  */
final case class DropTableGraftStore(path: String, ifExists: Boolean)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("dropped", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.store.TableStore
    if (!TableStore.exists(spark, path)) { // exists() runs crash recovery
      if (ifExists) return Seq(Row(0L))
      throw new IllegalArgumentException(
        s"graft_store maintenance: no table at $path (DROP TABLE IF " +
          "EXISTS to make this a no-op)")
    }
    graft.store.WriterLease.fence(spark, path)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(path, path + "__old", path + "__tmp", path + "__dtmp").foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      if (f.exists(p)) f.delete(p, true)
    }
    Seq(Row(1L))
  }
}

/** `SHOW PARTITIONS graft_store` — the partition-value census from
  * DIRECTORY LISTINGS alone ([[graft.store.TableStore.partitionTuples]]):
  * zero files opened, zero Spark jobs (at 100 TB partition discovery
  * must never touch data). Output columns ARE the partition columns
  * (string-typed, Hive-unescaped), one row per leaf — directly joinable
  * against data, unlike a concatenated `partition` string.
  */
final case class ShowPartitionsGraftStore(path: String)
  extends LeafRunnableCommand {

  // the statement's schema depends on the table: surface the tuples in
  // stable generic columns plus the column NAME each level carries
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", org.apache.spark.sql.types.StringType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.store.TableStore
    if (!TableStore.exists(spark, path))
      throw new IllegalArgumentException(s"graft_store maintenance: no table at $path")
    val (pcols, tuples) = TableStore.partitionTuples(spark, path)
    if (pcols.isEmpty)
      throw new IllegalArgumentException(
        s"graft_store maintenance: SHOW PARTITIONS on $path, a flat table " +
          "(no partition dirs)")
    // Hive-style rendering `c1=v1/c2=v2`, sorted — one row per leaf
    tuples.map(t => pcols.zip(t).map { case (c, v) => s"$c=$v" }.mkString("/"))
      .sorted.map(Row(_))
  }
}

/** The ALTER COLUMN actions — resolved and validated at parse time. */
sealed trait AlterAction
object AlterAction {
  final case class Add(column: String, dataType: org.apache.spark.sql.types.DataType,
                       defaultSql: Option[String]) extends AlterAction
  final case class Rename(from: String, to: String) extends AlterAction
  final case class Drop(column: String) extends AlterAction
  final case class AddConstraint(name: String, checkSql: String) extends AlterAction
  final case class DropConstraint(name: String) extends AlterAction
}

/** `ALTER TABLE graft_store` — column evolution as an EAGER rewrite
  * through the crash-safe swap, layout preserved through the partitioned
  * writer. Eager on purpose: after the statement, every engine and every
  * raw parquet reader sees ONE schema on disk — no mixed-schema
  * directories, no mergeSchema hazards, no sidecar a foreign reader
  * could miss. (The pay-as-you-go alternative exists in the library —
  * `upsertPartitionedEvolve`/`readEvolved` widen per touched partition —
  * and is the right tool for 100 TB-wide ADDs; the SQL statement chooses
  * the semantics a SQL user expects from ALTER: done when it returns.)
  *
  * ADD backfills the new column with a typed NULL or the DEFAULT
  * expression — evaluated per ROW over the existing columns, so computed
  * backfills (`DEFAULT cents / 100`) work. Refused: partition columns
  * (dropping/renaming one re-layouts the table — rewrite through CTAS),
  * existing/unknown names, dropping the last data column, merge-on-read
  * and versioned tables (masks/history do not survive a rewrite).
  */
final case class AlterGraftStore(path: String, action: AlterAction)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("n_rows", LongType, nullable = false)())

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft_store maintenance: $msg")

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.store.{Constraints, TableStore}
    GraftSqlDml.requireNotVersioned(spark, path, "ALTER TABLE")
    val mor = GraftSqlDml.hasDeletionVector(spark, path)
    action match { // the constraint actions mutate METADATA, not files
      case AlterAction.AddConstraint(name, e) =>
        if (!TableStore.exists(spark, path)) bad(s"no table at $path")
        // name check BEFORE the validation scan (cheap refusals first)
        if (Constraints.list(spark, path).exists(_._1.equalsIgnoreCase(name)))
          bad(s"constraint `$name` already exists on $path")
        // the one non-free moment: validate the EXISTING data, so every
        // row on disk always satisfies every declared constraint (MoR
        // validates the LIVE view — masked rows are not data)
        val data =
          if (mor) graft.operators.DeletionVectors.dvRead(spark, path)
          else TableStore.read(spark, path)
        val nBad = Constraints.violations(data, e).count()
        if (nBad > 0)
          bad(s"ADD CONSTRAINT `$name` on $path: $nBad existing rows " +
            s"violate CHECK ($e) — fix the data first")
        try Constraints.add(spark, path, name, e)
        catch { case ex: IllegalArgumentException => bad(ex.getMessage) }
        return Seq(Row(
          if (mor) graft.operators.DeletionVectors.liveRowCount(spark, path)
          else TableStore.rowCountFromFooters(spark, path)))
      case AlterAction.DropConstraint(name) =>
        if (!TableStore.exists(spark, path)) bad(s"no table at $path")
        try Constraints.drop(spark, path, name)
        catch { case ex: IllegalArgumentException => bad(ex.getMessage) }
        return Seq(Row(
          if (mor) graft.operators.DeletionVectors.liveRowCount(spark, path)
          else TableStore.rowCountFromFooters(spark, path)))
      case _ => ()
    }
    if (mor)
      bad(s"ALTER TABLE on $path, a merge-on-read table — a rewrite drops " +
        "the deletion-vector masks and ledger; compact() first")
    if (!TableStore.exists(spark, path)) bad(s"no table at $path")
    val pcols = TableStore.detectPartitionColumns(spark, path)
    val table = TableStore.read(spark, path)
    // a declared CHECK may reference the column being renamed or dropped —
    // the guard would then fail on every later write; refuse up front
    def requireNotChecked(c: String): Unit =
      Constraints.list(spark, path).foreach { case (n, e) =>
        if (Constraints.referencedColumns(spark, e).exists(_.equalsIgnoreCase(c)))
          bad(s"column `$c` is referenced by constraint `$n` (CHECK ($e)) — " +
            "DROP CONSTRAINT first")
      }
    def existing(c: String): String =
      table.columns.filter(_.equalsIgnoreCase(c)) match {
        case Array(one) => one
        case Array() => bad(s"ALTER names unknown column `$c` " +
          s"(table has ${table.columns.mkString(", ")})")
        case many => bad(s"ALTER column `$c` is ambiguous among ${many.mkString(", ")}")
      }
    def requireNotPartition(c: String): Unit =
      if (pcols.exists(_.equalsIgnoreCase(c)))
        bad(s"column `$c` is a partition column — dropping or renaming it " +
          "re-layouts the table; rewrite through CREATE OR REPLACE TABLE … AS")
    val evolved = action match {
      case AlterAction.Add(c, dt, default) =>
        if (table.columns.exists(_.equalsIgnoreCase(c)))
          bad(s"ADD COLUMN `$c` already exists")
        val value = default.map(d => expr(d)).getOrElse(lit(null)).cast(dt).as(c)
        // keep the partition columns LAST (the partitioned writer's order)
        if (pcols.isEmpty) table.select(col("*"), value)
        else table.select(
          (table.columns.filterNot(pcols.contains).map(col) :+ value) ++
            pcols.map(col): _*)
      case AlterAction.Rename(from, to) =>
        val src = existing(from)
        requireNotPartition(src)
        requireNotChecked(src)
        if (table.columns.exists(_.equalsIgnoreCase(to)))
          bad(s"RENAME target `$to` already exists")
        table.withColumnRenamed(src, to)
      case AlterAction.Drop(c) =>
        val victim = existing(c)
        requireNotPartition(victim)
        requireNotChecked(victim)
        if (table.columns.length <= 1 + pcols.length)
          bad(s"DROP COLUMN `$victim` would leave no data columns")
        table.drop(victim)
      case _: AlterAction.AddConstraint | _: AlterAction.DropConstraint =>
        throw new IllegalStateException("handled above")
    }
    if (pcols.nonEmpty) TableStore.atomicWritePartitioned(spark, evolved, path, pcols)
    else TableStore.atomicWrite(spark, evolved, path)
    Seq(Row(TableStore.rowCountFromFooters(spark, path)))
  }
}

/** `COPY INTO graft_store … FROM '<dir-or-file>' FORMAT PARQUET|CSV|JSONL`
  * — idempotent bulk file ingest, the statement a landing-zone pipeline
  * reruns on a schedule: each source file loads EXACTLY ONCE. Already-
  * loaded files (identity = path + byte length + mtime, recorded in a
  * `_copy/loaded.tsv` sidecar) are skipped; the pending set loads as ONE
  * schema-pinned read (no inference — the TARGET's schema drives the
  * parse) appended through [[graft.store.TableStore.appendRowsNamed]]
  * with a name derived from the pending identities, so the single
  * visible rename is the commit point: a crash between the rename and
  * the ledger swap reconciles on rerun (the batch file's presence proves
  * the load) instead of duplicating. CHECK constraints and the exact-
  * schema contract apply like every append.
  *
  * Scope: FLAT tables (the zero-rewrite exactly-once append is
  * flat-scoped). Partitioned targets route through
  * `INSERT INTO … SELECT`; merge-on-read and versioned targets refuse.
  * The target must exist — `CREATE TABLE … AS` defines the schema that
  * pins the parse. Returns (files_loaded, rows_loaded, n_rows).
  */
final case class CopyIntoGraftStore(path: String, source: String, format: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_loaded", LongType, nullable = false)(),
    AttributeReference("rows_loaded", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)())

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(s"graft_store maintenance: $msg")

  private val LedgerRel = "_copy/loaded.tsv"

  private def sha(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
  }

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.store.{Sidecar, TableStore}
    GraftSqlDml.requireNotVersioned(spark, path, "COPY INTO")
    if (GraftSqlDml.hasDeletionVector(spark, path))
      bad(s"COPY INTO $path, a merge-on-read table — route the batch " +
        "through MERGE/morAppend; the copy ledger is flat-table scoped")
    if (!TableStore.exists(spark, path))
      bad(s"COPY INTO $path: no table — CREATE TABLE … AS first (the " +
        "target's schema pins the parse; COPY never infers)")
    if (TableStore.detectPartitionColumns(spark, path).nonEmpty)
      bad(s"COPY INTO $path, a partitioned table — route through " +
        "INSERT INTO … SELECT (the zero-rewrite exactly-once append is " +
        "flat-table scoped)")
    val table = TableStore.read(spark, path)
    // source census: a directory loads every file with the format's
    // extension; a single file loads itself
    val srcPath = new org.apache.hadoop.fs.Path(source)
    val sf = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sf.exists(srcPath)) bad(s"COPY source $source does not exist")
    val exts = format match {
      case "PARQUET" => Seq(".parquet")
      case "CSV" => Seq(".csv")
      case "JSONL" => Seq(".jsonl", ".json")
    }
    val files =
      if (sf.getFileStatus(srcPath).isFile) Seq(sf.getFileStatus(srcPath))
      else sf.listStatus(srcPath).toSeq
        .filter(st => st.isFile && exts.exists(st.getPath.getName.endsWith)
          && !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    if (files.isEmpty) bad(s"COPY source $source holds no $format files")
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val idents = files.map { st =>
      val p = sf.makeQualified(st.getPath).toString
      (sha(s"$p|${st.getLen}|${st.getModificationTime}"), p, st)
    }.sortBy(_._1)
    // the ledger is exactness-critical (losing it would reload = duplicate
    // rows), so corruption wedges loudly like the deletion vector's
    val loaded: Set[String] = Sidecar.read(spark, path, LedgerRel) match {
      case None => Set.empty
      case Some(body) => body.linesIterator.filter(_.nonEmpty)
        .map(l => Sidecar.fields(path, LedgerRel, l, 4)(0)).toSet
    }
    val pending = idents.filterNot(i => loaded.contains(i._1))
    val tableCount = () => TableStore.rowCountFromFooters(spark, path)
    if (pending.isEmpty) return Seq(Row(0L, 0L, tableCount()))
    val batchName = s"copy-${sha(pending.map(_._1).mkString("|"))}.parquet"
    val paths = pending.map(_._2)
    // schema-pinned parse: the TARGET defines names and types
    val batch = format match {
      case "PARQUET" =>
        val raw = spark.read.parquet(paths: _*)
        if (raw.columns.map(_.toLowerCase(java.util.Locale.ROOT)).sorted.toSeq !=
            table.columns.map(_.toLowerCase(java.util.Locale.ROOT)).sorted.toSeq)
          bad(s"COPY PARQUET columns ${raw.columns.sorted.mkString(", ")} do not " +
            s"match the table's ${table.columns.sorted.mkString(", ")}")
        raw.select(table.schema.fields.map(f =>
          col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      case "CSV" => // positional under the table's schema; header row skipped
        spark.read.option("header", "true").schema(table.schema).csv(paths: _*)
      case "JSONL" => // by NAME under the table's schema; absent fields null
        spark.read.schema(table.schema).json(paths: _*)
    }
    TableStore.appendRowsNamed(spark, path, batch, batchName)
    // ledger swap AFTER the data rename: a crash between them reconciles
    // here on rerun — appendRowsNamed sees the batch file and no-ops
    val prior = Sidecar.read(spark, path, LedgerRel).getOrElse("")
    val add = pending.map { case (h, p, st) =>
      s"$h\t${enc(p)}\t${st.getLen}\t${st.getModificationTime}" }
      .mkString("", "\n", "\n")
    Sidecar.swap(spark, path, LedgerRel, prior + add)
    // rows loaded = the batch file's footer count (zero jobs)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = f.getFileStatus(new org.apache.hadoop.fs.Path(path, batchName))
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st,
        spark.sparkContext.hadoopConfiguration))
    val rowsLoaded = try r.getRecordCount finally r.close()
    Seq(Row(pending.size.toLong, rowsLoaded, tableCount()))
  }
}

/** `DESCRIBE [TABLE] graft_store` — the operational one-stop: columns
  * with types (partition columns flagged), then `#`-prefixed metadata
  * rows — layout tier (flat / hive-partitioned / merge-on-read /
  * versioned), file and byte census, footer row count (manifest-cached,
  * zero jobs after the first call), declared CHECK constraints, and for
  * versioned roots the version census and CURRENT pointer. Everything
  * comes from driver metadata: directory listings, sidecars, and the
  * live schema — no data pages decoded.
  */
final case class DescribeGraftStore(path: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("data_type", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("info", org.apache.spark.sql.types.StringType,
      nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.store.{Constraints, TableStore, VersionedTable}
    if (!TableStore.exists(spark, path))
      throw new IllegalArgumentException(s"graft_store maintenance: no table at $path")
    val versioned = VersionedTable.currentVersion(spark, path).filter(_ =>
      new org.apache.hadoop.fs.Path(path, "CURRENT")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(path, "CURRENT")))
    val mor = GraftSqlDml.hasDeletionVector(spark, path)
    val pcols =
      if (versioned.isDefined) Nil else TableStore.detectPartitionColumns(spark, path)
    val schema = versioned match {
      case Some(_) => VersionedTable.read(spark, path).schema
      case None => TableStore.read(spark, path).schema
    }
    val colRows = schema.fields.map { f =>
      Row(f.name, f.dataType.simpleString,
        if (pcols.exists(_.equalsIgnoreCase(f.name))) "partition column" else "")
    }.toSeq
    val (files, bytes) = TableStore.dataFileStats(spark, path)
    val layout =
      if (versioned.isDefined) s"versioned (current v=${versioned.get})"
      else if (mor) "merge-on-read (deletion-vector sidecar)"
      else if (pcols.nonEmpty) s"hive-partitioned (${pcols.mkString(", ")})"
      else "flat"
    val rows =
      if (mor) graft.operators.DeletionVectors.liveRowCount(spark, path)
      else if (versioned.isDefined) -1L // per-version counts, not a table total
      else TableStore.rowCountFromFooters(spark, path)
    val meta = Seq(
      Row("# layout", layout, ""),
      Row("# files", files.toString, ""),
      Row("# bytes", bytes.toString, "")) ++
      (if (rows >= 0) Seq(Row("# rows", rows.toString,
        if (mor) "live (masks applied)" else "footer metadata")) else Nil) ++
      versioned.toSeq.map(_ => Row("# versions",
        VersionedTable.versions(spark, path).mkString(", "), "")) ++
      Constraints.list(spark, path).map { case (n, e) =>
        Row(s"# constraint $n", s"CHECK ($e)", "enforced on every write") }
    colRows ++ meta
  }
}
