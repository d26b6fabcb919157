package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.TableStore
import Tables._

/** S5 + §2.12 upsert semantics as an oracle-checkable query: merge a
  * derived incoming batch into `orders` with a PARTIAL update-column list
  * (`o_orderstatus` is insert-only, mirroring `orders.financial_status`
  * staying stale on conflict — `/root/reference/db.py:129-140`).
  */
object MergeOps {

  private val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Incoming batch: every orderkey ≡ 0 (mod 10) with doubled price and
    * status 'X' (conflict rows), plus clones shifted by +10,000,000 (new
    * rows). After merge: conflict rows show doubled price but ORIGINAL
    * status; new rows keep status 'X'.
    */
  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val existing = orders(spark, dir).select(cols.map(col): _*)
    val conflicts = existing.filter($"o_orderkey" % 10 === 0)
      .withColumn("o_totalprice", $"o_totalprice" * 2.0)
      .withColumn("o_orderstatus", lit("X"))
    val news = existing.filter($"o_orderkey" % 10 === 3)
      .withColumn("o_orderkey", $"o_orderkey" + 10000000L)
      .withColumn("o_orderstatus", lit("X"))
    val incoming = conflicts.unionByName(news).select(cols.map(col): _*)
    TableStore.mergePlan(existing, incoming, Seq("o_orderkey"),
        updateColumns = Some(Seq("o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority")))
      .orderBy($"o_orderkey")
  }

  val upsertMergeSql: String =
    """WITH inc AS (
      |  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
      |         o_totalprice * 2.0 AS o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, 'X', o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 10 = 3
      |)
      |SELECT COALESCE(e.o_orderkey, i.o_orderkey) AS o_orderkey,
      | CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_custkey ELSE e.o_custkey END AS o_custkey,
      | CASE WHEN e.o_orderkey IS NOT NULL THEN e.o_orderstatus ELSE i.o_orderstatus END AS o_orderstatus,
      | CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_totalprice ELSE e.o_totalprice END AS o_totalprice,
      | CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderdate ELSE e.o_orderdate END AS o_orderdate,
      | CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderpriority ELSE e.o_orderpriority END AS o_orderpriority
      |FROM orders e FULL JOIN inc i ON e.o_orderkey = i.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  // temp root for the filesystem-backed merge queries (q96/q97), deleted
  // on JVM exit
  private lazy val mergeRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_merge")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(f => try java.nio.file.Files.delete(f) catch { case _: Throwable => () })
    }))
    p
  }

  // existing `orders` staged as a parquet table once per (JVM, sfDir):
  // q96 upserts against a real on-disk table, not an in-plan frame
  private val ordersStaged =
    scala.collection.concurrent.TrieMap.empty[String, java.nio.file.Path]

  private def stagedOrders(spark: SparkSession, dir: String): java.nio.file.Path =
    ordersStaged.getOrElseUpdate(dir, {
      val p = mergeRoot.resolve("orders_" + java.lang.Integer.toHexString(dir.hashCode))
      orders(spark, dir).select(cols.map(col): _*)
        .write.mode("overwrite").parquet(p.toString)
      p
    })

  private def deleteRecursive(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
        .foreach(f => try java.nio.file.Files.delete(f) catch { case _: Throwable => () })
    }

  /** Per-trial fixture restore. Files are HARD-LINKED when the filesystem
    * allows (same-device temp dirs always do here), bytes copied otherwise.
    * Safe because the store mutates nothing in place — every write surface
    * is new-file-then-atomic-rename (the crash-safe swap contract), so a
    * DML run only ever unlinks the run dir's names; the fixture's links
    * keep the inodes. Restore cost drops from a full byte copy of the
    * staged tables to directory-entry creation.
    */
  private def copyRecursive(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(from).iterator().asScala.foreach { f =>
      val dst = to.resolve(from.relativize(f))
      if (java.nio.file.Files.isDirectory(f)) java.nio.file.Files.createDirectories(dst)
      else {
        java.nio.file.Files.deleteIfExists(dst)
        try java.nio.file.Files.createLink(dst, f)
        catch { case _: UnsupportedOperationException | _: java.io.IOException =>
          java.nio.file.Files.copy(f, dst,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
  }

  /** q96: the upsert's change-data feed — the q25 batch (conflicts on
    * orderkey ≡ 0 mod 10, new keys at +10M) applied to the on-disk orders
    * table through [[TableStore.upsertWithChangelog]], which emits one
    * (key, action) row per incoming key and materializes it BEFORE the
    * swap. The changelog is what lets an incremental pipeline propagate
    * deltas downstream without diffing snapshots; its oracle is the batch
    * derivation rule itself.
    */
  def upsertChangelog(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val fix = stagedOrders(spark, dir)
    val run = mergeRoot.resolve("runChangelog")
    deleteRecursive(run)
    val target = run.resolve("orders_tbl")
    java.nio.file.Files.createDirectories(target)
    copyRecursive(fix, target)
    val existing = orders(spark, dir).select(cols.map(col): _*)
    val conflicts = existing.filter($"o_orderkey" % 10 === 0)
      .withColumn("o_totalprice", $"o_totalprice" * 2.0)
      .withColumn("o_orderstatus", lit("X"))
    val news = existing.filter($"o_orderkey" % 10 === 3)
      .withColumn("o_orderkey", $"o_orderkey" + 10000000L)
      .withColumn("o_orderstatus", lit("X"))
    val incoming = conflicts.unionByName(news).select(cols.map(col): _*)
    TableStore.upsertWithChangelog(spark, target.toString, incoming, Seq("o_orderkey"))
      .orderBy($"o_orderkey")
  }

  val upsertChangelogSql: String =
    """SELECT o_orderkey, 'update' AS action FROM orders WHERE o_orderkey % 10 = 0
      |UNION ALL
      |SELECT o_orderkey + 10000000 AS o_orderkey, 'insert' AS action
      |FROM orders WHERE o_orderkey % 10 = 3
      |ORDER BY o_orderkey""".stripMargin

  /** q97: time travel over versioned snapshots —
    * [[graft.store.VersionedTable]]: v1 is a seeded table (the even
    * event_ids with value corrupted to -1), v2 the upsert of the full
    * events batch over it. BOTH versions are then read back and
    * aggregated AFTER v2 exists — exactly what the flat atomic-swap
    * store cannot do — so the output proves snapshot isolation: v1 must
    * still show the corrupted sum (-n_even), v2 the fully-merged real
    * sums. Rollback/vacuum are spec-tested (VersionedTableSpec).
    */
  def timeTravel(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runTimeTravel")
    deleteRecursive(run)
    val path = run.resolve("events_ver").toString
    val ev = events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val seed = ev.filter(pmod($"event_id", lit(2)) === 0)
      .select($"event_id", lit(-1L).as("user_id"),
        lit("seeded").as("event_type"), lit(-1.0).as("value"))
    graft.store.VersionedTable.writeSnapshot(spark, seed, path)          // v1
    graft.store.VersionedTable.upsert(spark, path, ev, Seq("event_id")) // v2
    def summarize(v: Int) =
      graft.store.VersionedTable.readVersion(spark, path, v)
        .agg(count(lit(1)).as("n_rows"),
          round(sum($"value".cast(MoneyDec)), 2).cast("double").as("total_value"))
        .select(lit(v).as("version"), $"n_rows", $"total_value")
    summarize(1).unionByName(summarize(2)).orderBy($"version")
  }

  val timeTravelSql: String =
    """SELECT * FROM (
      |  SELECT 1 AS version, COUNT(*) AS n_rows,
      |    CAST(ROUND(SUM(CAST(-1.0 AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_value
      |  FROM events WHERE event_id % 2 = 0
      |  UNION ALL
      |  SELECT 2 AS version, COUNT(*) AS n_rows,
      |    CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_value
      |  FROM events) t
      |ORDER BY version""".stripMargin

  /** q101: incremental aggregate maintenance — the materialized-view half
    * of the CDC story ([[graft.operators.IncrementalAgg]]). The per-user
    * (count, exact-decimal sum) view is built from the history partition
    * (event_id % 4 ≠ 3), then the delta batch (% 4 = 3) is folded in by
    * aggregating ONLY the delta and re-aggregating against the view's own
    * rows — raw history is never rescanned. The oracle recomputes the
    * aggregate over ALL events from scratch: maintenance must be
    * bit-identical to recomputation (decimal sums are associative, so the
    * fold order cannot drift).
    */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir).select($"event_id", $"user_id", $"value")
    val hist = ev.filter($"event_id" % 4 =!= 3)
    val delta = ev.filter($"event_id" % 4 === 3)
    val prev = graft.operators.IncrementalAgg.state(hist, Seq("user_id"), "value")
    graft.operators.IncrementalAgg.maintain(prev, delta, Seq("user_id"), "value")
      .select($"user_id", $"n".as("n_events"),
        round($"total", 2).cast("double").as("total_value"))
      .orderBy($"user_id")
  }

  val incrementalAggSql: String =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** q102: snapshot diff — recover the change feed BETWEEN two
    * [[graft.store.VersionedTable]] versions by comparison
    * ([[graft.operators.SnapshotDiff]]), for writers that recorded no
    * changelog. v1 holds event_ids ≢ 0 (mod 3); v2 is a full overwrite
    * holding ids ≢ 1 (mod 3) with `value` bumped by 1.0 where user_id is
    * even. The diff must classify ids ≡ 0 as inserts, ≡ 1 as deletes, and
    * of the ids ≡ 2 present in both, exactly the value-changed rows as
    * updates — unchanged keys (odd user_ids, and null values whose bump
    * stays null) produce NO row. The oracle derives all three classes
    * from the fixture rule itself.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSnapshotDiff")
    deleteRecursive(run)
    val path = run.resolve("events_diff").toString
    val ev = events(spark, dir).select($"event_id", $"user_id", $"value")
    val v1 = ev.filter($"event_id" % 3 =!= 0)
    val v2 = ev.filter($"event_id" % 3 =!= 1)
      .withColumn("value", when($"user_id" % 2 === 0, $"value" + 1.0).otherwise($"value"))
    graft.store.VersionedTable.writeSnapshot(spark, v1, path) // v1
    graft.store.VersionedTable.writeSnapshot(spark, v2, path) // v2
    graft.operators.SnapshotDiff.diff(
      graft.store.VersionedTable.readVersion(spark, path, 1),
      graft.store.VersionedTable.readVersion(spark, path, 2),
      Seq("event_id"))
      .orderBy($"event_id")
  }

  val snapshotDiffSql: String =
    """SELECT event_id, CASE WHEN event_id % 3 = 0 THEN 'insert'
      |                      WHEN event_id % 3 = 1 THEN 'delete'
      |                      ELSE 'update' END AS action
      |FROM events
      |WHERE event_id % 3 IN (0, 1)
      |   OR (event_id % 3 = 2 AND user_id % 2 = 0
      |       AND (value + 1.0) IS DISTINCT FROM value)
      |ORDER BY event_id""".stripMargin

  /** q103: CDC-driven aggregate maintenance — the capstone composing
    * q102's change feed with q101's materialized view. The per-user view
    * built over snapshot v1 (event_ids ≢ 0 mod 3) is folded forward to
    * v2 (ids ≢ 1 mod 3, value bumped for even user_ids) using ONLY the
    * [[graft.operators.SnapshotDiff]] change rows — inserts, updates,
    * AND deletes, via [[graft.operators.IncrementalAgg.maintainCdc]]'s
    * abelian-group fold (new image minus old image per change; neither
    * snapshot's raw rows are rescanned after their one diff pass). The
    * oracle recomputes the aggregate over v2 from scratch: maintenance
    * under full CDC must be bit-identical to recomputation.
    */
  def cdcAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir).select($"event_id", $"user_id", $"value")
    val v1 = ev.filter($"event_id" % 3 =!= 0)
    val v2 = ev.filter($"event_id" % 3 =!= 1)
      .withColumn("value", when($"user_id" % 2 === 0, $"value" + 1.0).otherwise($"value"))
    val prev = graft.operators.IncrementalAgg.state(v1, Seq("user_id"), "value")
    val changes = graft.operators.SnapshotDiff.diff(v1, v2, Seq("event_id"),
      carryValues = Seq("user_id", "value"))
    graft.operators.IncrementalAgg.maintainCdc(prev, changes, Seq("user_id"), "value")
      .select($"user_id", $"n".as("n_events"),
        round($"total", 2).cast("double").as("total_value"))
      .orderBy($"user_id")
  }

  val cdcAggSql: String =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(ROUND(SUM(CAST(CASE WHEN user_id % 2 = 0 THEN value + 1.0 ELSE value END
      |                      AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_value
      |FROM events WHERE event_id % 3 <> 1
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** q113: SCD Type-2 dimension build from an event stream — the
    * slowly-changing-dimension history every warehouse merge pipeline
    * ultimately feeds. Each user's `event_type` is treated as a tracked
    * dimension attribute: consecutive duplicates collapse (a repeated value
    * is NOT a new version — the load-bearing SCD2 subtlety), change points
    * become versions with `[valid_from, valid_to)` intervals via `lead`,
    * and the open interval marks the current row. Both window passes share
    * one (user_id)-hash exchange and one sort — the plan never
    * re-shuffles, which is what makes the op a single-pass history build
    * at 100 TB (Round8bPlanSpec pins it).
    */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val ev = events(spark, dir).select($"user_id", $"event_id", $"ts", $"event_type")
    val changes = ev
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .select($"user_id", $"version", $"event_type",
        $"ts".as("valid_from"), $"valid_to",
        $"valid_to".isNull.as("is_current"))
      .orderBy($"user_id", $"version")
  }

  val scd2Sql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_id, ts, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |chg AS (
      |  SELECT * FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id,
      |  row_number() OVER w AS version,
      |  event_type,
      |  ts AS valid_from,
      |  lead(ts) OVER w AS valid_to,
      |  (lead(ts) OVER w IS NULL) AS is_current
      |FROM chg
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** q118: golden-record survivorship — the MDM "merge duplicate records"
    * op: one consolidated row per entity where each attribute survives from
    * a DIFFERENT source row under its own rule. Recency attributes
    * (last_type) come from the newest event; the nullable attribute
    * (`k`, parsed from props, masked null when k ≡ 0 mod 7 — the fixture's
    * missing-data rule) survives as the newest NON-null observation, which
    * may be an older row than last_type's; first/last-seen and the event
    * count aggregate the whole history. Everything rides ONE user_id
    * window exchange: `first(..., ignoreNulls)` over the full descending
    * frame does the per-column survivorship without a join or a second
    * pass (plan-pinned in Round8bPlanSpec).
    */
  def goldenRecord(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val kRaw = get_json_object($"props", "$.k").cast("long")
    val ev = events(spark, dir).select($"user_id", $"event_id", $"ts", $"event_type",
      when(kRaw % 7 === 0, lit(null).cast("long")).otherwise(kRaw).as("k"))
    val wDesc = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val wFull = wDesc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ev.withColumn("rn", row_number().over(wDesc))
      .withColumn("last_k", first($"k", ignoreNulls = true).over(wFull))
      .withColumn("n_events", count(lit(1)).over(wFull).cast("long"))
      .withColumn("first_seen", min($"ts").over(wFull))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("last_type"), $"last_k",
        $"n_events", $"first_seen", $"ts".as("last_seen"))
      .orderBy($"user_id")
  }

  val goldenRecordSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN CAST(props->>'k' AS BIGINT) % 7 = 0 THEN NULL
      |         ELSE CAST(props->>'k' AS BIGINT) END AS k
      |  FROM events),
      |g AS (
      |  SELECT user_id, event_id, ts, event_type, k,
      |    row_number() OVER w AS rn,
      |    first_value(k IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_k,
      |    count(*) OVER (PARTITION BY user_id) AS n_events,
      |    min(ts) OVER (PARTITION BY user_id) AS first_seen
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC))
      |SELECT user_id, event_type AS last_type, last_k, n_events, first_seen,
      |  ts AS last_seen
      |FROM g WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** q156: ORC round-trip — the second columnar format the engine speaks
    * (everything else here is parquet): orders project → ORC write
    * PARTITIONED BY o_orderpriority → re-read with a partition predicate →
    * exact money aggregate. Grades three things at once: ORC write/read
    * value fidelity (timestamps, doubles, strings — any encoding drift
    * hash-mismatches against the parquet-derived oracle), partition
    * pruning on the re-read (only the selected priority directories are
    * listed — the same pruning contract as the parquet store), and
    * sink/source symmetry. The oracle never sees the ORC copy: it
    * recomputes from the original table, so the round-trip must be
    * lossless to pass.
    */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runOrc")
    deleteRecursive(run)
    val path = run.resolve("orders_orc").toString
    orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
        $"o_orderdate", $"o_orderpriority")
      .write.partitionBy("o_orderpriority").orc(path)
    spark.read.orc(path)
      .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast(MoneyDec)), 2).cast("double").as("total"),
        max($"o_orderdate").as("last_order"))
      .orderBy($"o_orderpriority", $"o_orderstatus")
  }

  val orcRoundtripSql: String =
    """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total,
      |  MAX(o_orderdate) AS last_order
      |FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |GROUP BY o_orderpriority, o_orderstatus
      |ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  /** q160: cascading copy-on-write DELETE — the right-to-be-forgotten
    * path ([[TableStore.deleteRows]], the S5 complement): forget every
    * customer with custkey ≡ 0 (mod 97), cascade to their orders, then
    * to those orders' lineitems, each a key-frame anti-join rewrite with
    * an atomic swap. The output audits the operation per table:
    * before/deleted/after counts plus a surviving-key checksum
    * (Σ keys — any wrongly kept or dropped row shifts it), all read BACK
    * from the store after the swaps, so the grade covers the on-disk
    * result, not the plan. Cascade frames carry keys only; the
    * partition-pruned variant (only victim-bearing partitions rewritten)
    * is spec-tested in TableStoreSpec.
    */
  // q160 pristine fixture: the three tables atomic-written ONCE per
  // (JVM, sfDir) with their counts; each run restores them by filesystem
  // copy (the delete mutates the tables, so per-trial restoration is
  // required — but re-encoding three tables through Spark write jobs per
  // trial measured fixture staging, not delete machinery)
  private val cascadeStaged = scala.collection.concurrent.TrieMap
    .empty[String, (java.nio.file.Path, Long, Long, Long)]

  private def cascadeFixture(spark: SparkSession, dir: String): (java.nio.file.Path, Long, Long, Long) =
    cascadeStaged.getOrElseUpdate(dir, {
      val p = mergeRoot.resolve("cascade_" + java.lang.Integer.toHexString(dir.hashCode))
      TableStore.atomicWrite(spark, customer(spark, dir), p.resolve("customer").toString)
      TableStore.atomicWrite(spark, orders(spark, dir), p.resolve("orders").toString)
      TableStore.atomicWrite(spark, lineitem(spark, dir), p.resolve("lineitem").toString)
      (p, customer(spark, dir).count(), orders(spark, dir).count(), lineitem(spark, dir).count())
    })

  def cascadeDelete(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val (fix, nC, nO, nL) = cascadeFixture(spark, dir)
    val run = mergeRoot.resolve("runCascade")
    deleteRecursive(run)
    copyRecursive(fix, run)
    val cPath = run.resolve("customer").toString
    val oPath = run.resolve("orders").toString
    val lPath = run.resolve("lineitem").toString
    val victims = TableStore.read(spark, cPath)
      .filter(pmod($"c_custkey", lit(97)) === 0).select($"c_custkey")
      .localCheckpoint(true)
    val deadOrders = TableStore.read(spark, oPath)
      .join(victims.withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"), "left_semi")
      .select($"o_orderkey").localCheckpoint(true)
    val dC = TableStore.deleteRows(spark, cPath, victims, Seq("c_custkey"))
    val dO = TableStore.deleteRows(spark, oPath,
      victims.withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"))
    val dL = TableStore.deleteRows(spark, lPath,
      deadOrders.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"))
    def audit(table: String, path: String, keyCol: String, before: Long, deleted: Long) =
      TableStore.read(spark, path)
        .agg(count(lit(1)).as("rows_after"), sum(col(keyCol)).as("key_checksum"))
        .select(lit(table).as("table"), lit(before).as("rows_before"),
          lit(deleted).as("rows_deleted"), $"rows_after", $"key_checksum")
    audit("customer", cPath, "c_custkey", nC, dC)
      .unionByName(audit("orders", oPath, "o_orderkey", nO, dO))
      .unionByName(audit("lineitem", lPath, "l_orderkey", nL, dL))
      .orderBy($"table")
  }

  val cascadeDeleteSql: String =
    """WITH vic AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      |dord AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM vic)),
      |c AS (
      |  SELECT 'customer' AS "table",
      |    (SELECT COUNT(*) FROM customer) AS rows_before,
      |    (SELECT COUNT(*) FROM vic) AS rows_deleted,
      |    CAST(COUNT(*) AS BIGINT) AS rows_after,
      |    CAST(SUM(c_custkey) AS BIGINT) AS key_checksum
      |  FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM vic)),
      |o AS (
      |  SELECT 'orders' AS "table",
      |    (SELECT COUNT(*) FROM orders) AS rows_before,
      |    (SELECT COUNT(*) FROM dord) AS rows_deleted,
      |    CAST(COUNT(*) AS BIGINT) AS rows_after,
      |    CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
      |  FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM dord)),
      |l AS (
      |  SELECT 'lineitem' AS "table",
      |    (SELECT COUNT(*) FROM lineitem) AS rows_before,
      |    (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM dord)) AS rows_deleted,
      |    CAST(COUNT(*) AS BIGINT) AS rows_after,
      |    CAST(SUM(l_orderkey) AS BIGINT) AS key_checksum
      |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM dord))
      |SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l
      |ORDER BY "table"""".stripMargin

  /** q171: JSON-lines round-trip — completes the format matrix
    * (parquet store / ORC q156 / `;`-CSV S6-S7 / JSONL here): orders
    * project → timestamp-explicit JSONL write → schema-pinned re-read →
    * exact money aggregate, with the oracle recomputing from the
    * ORIGINAL table so the text encode/decode must be lossless to pass.
    * Timestamps round-trip through an explicit micros format
    * (JSON has no timestamp type — the format option IS the contract;
    * the default would silently truncate sub-second precision on a
    * fixture with micros), doubles through JacksonGenerator's shortest
    * round-trip rendering.
    */
  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runJsonl")
    deleteRecursive(run)
    val path = run.resolve("orders_jsonl").toString
    val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    val src = orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
        $"o_orderdate", $"o_orderpriority")
    src.write.option("timestampFormat", fmt).json(path)
    spark.read.schema(src.schema).option("timestampFormat", fmt).json(path)
      .filter($"o_orderstatus" =!= "P")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast(MoneyDec)), 2).cast("double").as("total"),
        min($"o_orderdate").as("first_order"),
        max($"o_orderkey").as("max_key"))
      .orderBy($"o_orderstatus")
  }

  /** q205: incremental VIEW maintenance — the delta-join algebra that
    * keeps a materialized join view current without recomputing it:
    * V = A ⋈ B maintained under a batch of updates/inserts ΔA as
    * upsert(V, ΔA ⋈ B) — the JOIN runs only over the delta (B broadcast),
    * the stored view is touched by key-merge, and A0 is never rescanned.
    * This is the join-shaped sibling of q101/q103's incremental
    * aggregates; at 100 TB the delta join is minutes of work where the
    * full recompute is hours. The delta reuses the q25 derivation rule
    * (keys ≡ 0 mod 10 updated with doubled price + status X, clones at
    * +10M inserted), so the oracle is simply the full join of the MERGED
    * fact state with the dimension — a view row missed (stale A0 value
    * surviving), double-applied delta, or lost insert hash-mismatches.
    */
  def incrementalViewMaintenance(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runIvm")
    deleteRecursive(run)
    val target = run.resolve("order_view").toString
    val c = customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment", $"c_nationkey")
    def joined(a: DataFrame): DataFrame =
      a.join(broadcast(c), a("o_custkey") === c("c_custkey"), "left")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
          $"c_mktsegment", $"c_nationkey")
    // V0: the view materialized from the base fact state
    val base = orders(spark, dir).select(cols.map(col): _*)
    TableStore.atomicWrite(spark, joined(base), target)
    // ΔA: updates + inserts; maintenance = upsert(V, ΔA ⋈ B)
    val conflicts = base.filter($"o_orderkey" % 10 === 0)
      .withColumn("o_totalprice", $"o_totalprice" * 2.0)
      .withColumn("o_orderstatus", lit("X"))
    val news = base.filter($"o_orderkey" % 10 === 3)
      .withColumn("o_orderkey", $"o_orderkey" + 10000000L)
      .withColumn("o_orderstatus", lit("X"))
    TableStore.upsert(spark, target,
      joined(conflicts.unionByName(news)), Seq("o_orderkey"))
    TableStore.read(spark, target)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        round($"o_totalprice".cast(MoneyDec), 2).cast("double").as("price"),
        $"c_mktsegment", $"c_nationkey")
      .orderBy($"o_orderkey")
  }

  val incrementalViewMaintenanceSql: String =
    """WITH merged AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2.0 ELSE o_totalprice END AS o_totalprice
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, 'X', o_totalprice
      |  FROM orders WHERE o_orderkey % 10 = 3)
      |SELECT m.o_orderkey, m.o_custkey, m.o_orderstatus,
      |  CAST(ROUND(CAST(m.o_totalprice AS DECIMAL(38,6)), 2) AS DOUBLE) AS price,
      |  c.c_mktsegment, c.c_nationkey
      |FROM merged m LEFT JOIN customer c ON m.o_custkey = c.c_custkey
      |ORDER BY m.o_orderkey""".stripMargin

  /** q207: DYNAMIC partition overwrite — the third table-mutation protocol
    * beside key-merge (q25/q183) and copy-on-write delete (q160/q180): a
    * recomputed batch REPLACES exactly the partitions it carries rows for
    * (`spark.sql.sources.partitionOverwriteMode=dynamic` on a plain
    * `mode(Overwrite).partitionBy(...)` parquet write) and every other
    * partition's files are untouched — the nightly-recompute shape for a
    * 100 TB date-partitioned table where a backfill rewrites 3 days out of
    * 3 years without the read-merge-swap cost of an upsert. STATIC mode
    * (the default) would truncate the whole table first; the oracle —
    * replaced partitions from the batch, every other partition from the
    * base state — hash-catches exactly that failure, and
    * DynamicOverwriteSpec pins the file-level contract (untouched
    * partition dirs keep their physical files byte-for-byte).
    */
  def dynamicOverwrite(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runDynOverwrite")
    deleteRecursive(run)
    val path = run.resolve("orders_by_priority").toString
    val base = orders(spark, dir).select(cols.map(col): _*)
    base.write.partitionBy("o_orderpriority").parquet(path)
    // the backfill batch: two priorities fully recomputed (every third
    // order survives review with a doubled price) — rows exist ONLY for
    // the partitions being replaced, which is what scopes the overwrite
    val repl = base
      .filter($"o_orderpriority".isin("1-URGENT", "3-MEDIUM") &&
        $"o_orderkey" % 3 === 0)
      .withColumn("o_totalprice", $"o_totalprice" * 2.0)
    withConf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic") {
      repl.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    }
    spark.read.parquet(path)
      .groupBy($"o_orderpriority".cast("string").as("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast(MoneyDec)), 2).cast("double").as("total"))
      .orderBy($"o_orderpriority")
  }

  val dynamicOverwriteSql: String =
    """WITH merged AS (
      |  SELECT o_orderpriority, o_totalprice * 2.0 AS o_totalprice FROM orders
      |   WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM') AND o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderpriority, o_totalprice FROM orders
      |   WHERE o_orderpriority NOT IN ('1-URGENT', '3-MEDIUM'))
      |SELECT o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total
      |FROM merged GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q221: atomic MULTI-table publish
    * ([[graft.store.MultiTablePublish]]) — a fact table and its derived
    * aggregate land together under one group version pointer, so a
    * reader can never join a v2 fact against a v1 aggregate (the torn
    * cross-table state independent single-table swaps allow). Two
    * publishes run (base, then a revision that deletes and reprices
    * rows); the graded result reads BOTH tables back at the live version
    * and lays the aggregate beside a recompute from the published fact —
    * a torn publish, stale pointer, or wrong-version resolution breaks
    * the pairwise equality the oracle asserts. MultiPublishSpec drives
    * the crash-window cases through the hook seam.
    */
  def multiPublish(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runMultiPub")
    deleteRecursive(run)
    val root = run.resolve("warehouse").toString
    def aggOf(of: DataFrame): DataFrame = of
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_pub"),
        round(sum($"o_totalprice".cast(MoneyDec)), 2).cast("double").as("total_pub"))
    val base = orders(spark, dir).select(cols.map(col): _*)
    graft.store.MultiTablePublish.publish(spark, root,
      Map("orders" -> base, "by_priority" -> aggOf(base)))
    val revised = base.filter($"o_orderkey" % 7 =!= 0)
      .withColumn("o_totalprice",
        when($"o_orderkey" % 5 === 0, $"o_totalprice" * 2.0).otherwise($"o_totalprice"))
    graft.store.MultiTablePublish.publish(spark, root,
      Map("orders" -> revised, "by_priority" -> aggOf(revised)))
    // readAll pins ONE resolved version for both tables — per-call read()
    // could observe different versions under a concurrent publisher
    val (_, pinned) = graft.store.MultiTablePublish.readAll(
      spark, root, Seq("orders", "by_priority"))
    val fact = pinned("orders")
    val pub = pinned("by_priority")
    fact.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_fact"),
        round(sum($"o_totalprice".cast(MoneyDec)), 2).cast("double").as("total_fact"))
      .join(pub, "o_orderpriority")
      .select($"o_orderpriority", $"n_fact", $"total_fact", $"n_pub", $"total_pub")
      .orderBy($"o_orderpriority")
  }

  val multiPublishSql: String =
    """WITH revised AS (
      |  SELECT o_orderpriority,
      |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2.0 ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |a AS (
      |  SELECT o_orderpriority, COUNT(*) AS n,
      |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total
      |  FROM revised GROUP BY 1)
      |SELECT o_orderpriority, n AS n_fact, total AS total_fact,
      |       n AS n_pub, total AS total_pub
      |FROM a ORDER BY o_orderpriority""".stripMargin

  /** q228: writer-lease FENCING end-to-end ([[graft.store.WriterLease]])
    * — the multi-writer race a 100 TB scheduler makes a when-not-if,
    * scripted and graded: writer A acquires the table lease and stalls
    * (its lease goes stale); a live writer B must first be REFUSED
    * (lock held), then break the stale lease with a strictly higher
    * fencing token and commit the real table; stalled A wakes and its
    * commit MUST die at the fence inside [[graft.store.TableStore
    * .atomicWrite]] without touching the table. The graded row carries
    * the two tokens, the refused/fenced outcomes, and the surviving
    * table's aggregate — which must equal writer B's content (the
    * orders-derived oracle); a fence that lets stalled A through floods
    * the aggregate with poison and hash-mismatches.
    */
  def writerFence(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    import graft.store.{TableStore, WriterLease}
    val run = mergeRoot.resolve("runFence")
    deleteRecursive(run)
    val tbl = run.resolve("orders_tbl").toString
    val base = orders(spark, dir).select($"o_orderkey", $"o_totalprice")
    val a = WriterLease.acquire(spark, tbl, "writerA", ttlMs = 60000)
    // A stalls: age its lease past the ttl (the spec-grade stale window)
    val leaseP = new org.apache.hadoop.fs.Path(tbl + "__lease", "LEASE")
    val lfs = leaseP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a LIVE lease must refuse a second writer before any staleness
    val refused =
      try { WriterLease.acquire(spark, tbl, "writerB", ttlMs = 60000); 0L }
      catch { case _: WriterLease.LockHeldException => 1L }
    lfs.setTimes(leaseP, System.currentTimeMillis() - 120000, -1)
    val b = WriterLease.acquire(spark, tbl, "writerB", ttlMs = 60000)
    TableStore.atomicWrite(spark, base.filter($"o_orderkey" % 3 === 0), tbl)
    // stalled A wakes (separate-process simulation: re-adopt its handle)
    // and tries to clobber the table with poison — the fence must kill it
    WriterLease.adopt(a)
    val fenced =
      try {
        TableStore.atomicWrite(spark,
          base.limit(1).withColumn("o_totalprice", lit(-1.0)), tbl)
        0L
      } catch { case _: WriterLease.FencedException => 1L }
    WriterLease.adopt(b)
    val survived = TableStore.read(spark, tbl)
    WriterLease.release(spark, b)
    survived
      .agg(count(lit(1)).as("n_rows"),
        round(sum($"o_totalprice".cast(MoneyDec)), 2).cast("double").as("total"))
      .select(lit(a.token).as("token_a"), lit(b.token).as("token_b"),
        lit(refused).as("live_refused"), lit(fenced).as("stale_fenced"),
        $"n_rows", $"total")
  }

  /** q231: the SQL MERGE surface ([[graft.plans.GraftSqlMerge]]) — the
    * reference's flagship write is SQL (`ON CONFLICT DO UPDATE`,
    * `/root/reference/db.py:115-144`); this grades the same §2.12 merge
    * semantics as q25 (partial update-column list: `o_orderstatus` stays
    * stale on conflict) executed ENTIRELY through SQL text against a real
    * on-disk table: the USING source is a subquery, the statement goes
    * through [[graft.plans.GraftSqlParser]] (the identical code path a
    * session with `spark.sql.extensions=graft.GraftExtensions` gets from
    * `spark.sql`), and the command's run IS `TableStore.upsert` — plan
    * identical to the library path by construction. The oracle is q25's,
    * verbatim: a drift between the SQL and library surfaces
    * hash-mismatches.
    */
  def sqlMerge(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlMerge")
    deleteRecursive(run)
    val tbl = run.resolve("orders_tbl").toString
    orders(spark, dir).select(cols.map(col): _*)
      .createOrReplaceTempView("v_sqlmerge_orders")
    TableStore.atomicWrite(spark,
      spark.table("v_sqlmerge_orders"), tbl)
    val mergeSql =
      s"""MERGE INTO graft_store.`$tbl`
         |USING (
         |  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         |         o_totalprice * 2.0 AS o_totalprice, o_orderdate, o_orderpriority
         |  FROM v_sqlmerge_orders WHERE o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, o_custkey, 'X', o_totalprice,
         |         o_orderdate, o_orderpriority
         |  FROM v_sqlmerge_orders WHERE o_orderkey % 10 = 3
         |)
         |ON KEYS (o_orderkey)
         |WHEN MATCHED THEN UPDATE SET (o_custkey, o_totalprice, o_orderdate, o_orderpriority)
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val merged = org.apache.spark.sql.graftshim.GraftShim
      .ofRows(spark, parser.parsePlan(mergeSql))
    require(merged.head().getLong(0) > 0, "merge reported an empty table")
    TableStore.read(spark, tbl).orderBy($"o_orderkey")
  }

  val sqlMergeDeleteSql: String =
    """WITH upd AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders)
      |SELECT o_orderkey, o_custkey, o_totalprice
      |FROM upd WHERE o_orderkey % 5 <> 0
      |UNION ALL
      |SELECT o_orderkey + 20000000 AS o_orderkey, o_custkey, o_totalprice
      |FROM orders WHERE o_orderkey % 11 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** q250: the MERGE DELETE action through SQL text (round-11 verdict
    * item 2) — a mixed sequence against one store table: an UPDATE merge
    * (partial column list) bumps the mod-7 keys' price, then a DELETE
    * merge removes the mod-5 keys AND inserts unmatched clone rows in the
    * SAME statement — `TableStore.mergeDelete`'s one-swap
    * delete-matched ∪ insert-new contract, reached through the injected
    * parser exactly like q231. Graded output is the post-swap table;
    * the oracle recomputes both statements relationally.
    */
  def sqlMergeDelete(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlMergeDel")
    deleteRecursive(run)
    val tbl = run.resolve("orders_tbl").toString
    orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .createOrReplaceTempView("v_sqlmd_orders")
    TableStore.atomicWrite(spark, spark.table("v_sqlmd_orders"), tbl)
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    def exec(sql: String): Long = org.apache.spark.sql.graftshim.GraftShim
      .ofRows(spark, parser.parsePlan(sql)).head().getLong(0)
    exec(
      s"""MERGE INTO graft_store.`$tbl`
         |USING (SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice
         |       FROM v_sqlmd_orders WHERE o_orderkey % 7 = 0)
         |ON KEYS (o_orderkey)
         |WHEN MATCHED THEN UPDATE SET (o_totalprice)""".stripMargin)
    val n = exec(
      s"""MERGE INTO graft_store.`$tbl`
         |USING (
         |  SELECT o_orderkey, o_custkey, o_totalprice
         |  FROM v_sqlmd_orders WHERE o_orderkey % 5 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 20000000 AS o_orderkey, o_custkey, o_totalprice
         |  FROM v_sqlmd_orders WHERE o_orderkey % 11 = 0
         |)
         |ON KEYS (o_orderkey)
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    require(n > 0, "delete-merge reported an empty table")
    TableStore.read(spark, tbl).orderBy($"o_orderkey")
  }

  /** q253: SQL `DELETE FROM graft_store … WHERE` end-to-end
    * ([[graft.plans.GraftSqlDml]]) — the statement a reference user
    * writes for row removal, reaching `TableStore.atomicWrite` through
    * the injected parser with standard null semantics (only
    * predicate-TRUE rows die). Post-swap table vs the oracle's negated
    * predicate.
    */
  def sqlDelete(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlDelete")
    deleteRecursive(run)
    val tbl = run.resolve("orders_tbl").toString
    TableStore.atomicWrite(spark,
      orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice"), tbl)
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"DELETE FROM graft_store.`$tbl` " +
        "WHERE o_orderkey % 7 = 0 OR o_custkey % 10 = 3")).head().getLong(0)
    require(n > 0, "delete reported an empty table")
    TableStore.read(spark, tbl).orderBy($"o_orderkey")
  }

  val sqlDeleteSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE NOT (o_orderkey % 7 = 0 OR o_custkey % 10 = 3)
      |ORDER BY o_orderkey""".stripMargin

  /** q254: SQL `UPDATE graft_store … SET … WHERE` end-to-end — standard
    * simultaneous-assignment semantics (the price expression reads the
    * OLD o_custkey while o_custkey itself is reassigned in the same SET
    * list), applied where the predicate is TRUE, one atomic swap. Oracle
    * recomputes both assignments with CASE over the original table.
    */
  def sqlUpdate(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlUpdate")
    deleteRecursive(run)
    val tbl = run.resolve("orders_tbl").toString
    TableStore.atomicWrite(spark,
      orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice"), tbl)
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"UPDATE graft_store.`$tbl` " +
        "SET o_totalprice = o_totalprice + o_custkey % 50, " +
        "    o_custkey = o_custkey + 1000000 " +
        "WHERE o_orderkey % 5 = 0")).head().getLong(0)
    require(n > 0, "update reported an empty table")
    TableStore.read(spark, tbl).orderBy($"o_orderkey")
  }

  val sqlUpdateSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 5 = 0 THEN o_custkey + 1000000
      |       ELSE o_custkey END AS o_custkey,
      |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + o_custkey % 50
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** q233: reader pins end-to-end ([[graft.store.ReaderPins]]) — the q228
    * treatment for the round-11 pin registry, scripted and graded: three
    * versioned snapshots land; a reader PINS v1; an aggressive vacuum
    * (retention 1, no age guard) must reclaim the unpinned v2 while v1
    * survives solely because of the pin; the pinned read's aggregate must
    * equal the orders-derived oracle (a vacuum that clips pinned files
    * poisons the aggregate and hash-mismatches); after release the same
    * vacuum must reclaim v1. The three protocol outcomes ride the graded
    * row beside the data aggregate, exactly like q228's fence flags.
    */
  def readerPin(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    import graft.store.{ReaderPins, VersionedTable}
    val run = mergeRoot.resolve("runReaderPin")
    deleteRecursive(run)
    val tbl = run.resolve("orders_versions").toString
    val base = orders(spark, dir).select($"o_orderkey", $"o_totalprice")
    VersionedTable.writeSnapshot(spark, base.filter($"o_orderkey" % 3 === 0), tbl) // v1
    VersionedTable.writeSnapshot(spark, base.filter($"o_orderkey" % 3 === 1), tbl) // v2
    VersionedTable.writeSnapshot(spark, base.filter($"o_orderkey" % 3 === 2), tbl) // v3
    val pin = ReaderPins.pin(spark, tbl, version = 1, ttlMs = 600000)
    VersionedTable.vacuum(spark, tbl, keepLast = 1) // retention 1, age 0
    val pinnedSurvived =
      try { VersionedTable.readVersion(spark, tbl, 1).count(); 1L }
      catch { case _: Throwable => 0L }
    val unpinnedVacuumed =
      try { VersionedTable.readVersion(spark, tbl, 2).count(); 0L }
      catch { case _: Throwable => 1L }
    // the pinned snapshot's CONTENT feeds the graded aggregate: clipped or
    // missing files poison it
    val v1 = VersionedTable.readVersion(spark, tbl, 1)
      .agg(count(lit(1)).as("n_rows"),
        round(sum($"o_totalprice".cast(MoneyDec)), 2).cast("double").as("total"))
      .head()
    ReaderPins.release(spark, pin)
    VersionedTable.vacuum(spark, tbl, keepLast = 1)
    val releasedVacuumed =
      try { VersionedTable.readVersion(spark, tbl, 1).count(); 0L }
      catch { case _: Throwable => 1L }
    Seq((pinnedSurvived, unpinnedVacuumed, releasedVacuumed,
      v1.getLong(0), v1.getDouble(1)))
      .toDF("pinned_survived", "unpinned_vacuumed", "released_vacuumed",
        "n_rows", "total")
  }

  val readerPinSql: String =
    """SELECT CAST(1 AS BIGINT) AS pinned_survived,
      |       CAST(1 AS BIGINT) AS unpinned_vacuumed,
      |       CAST(1 AS BIGINT) AS released_vacuumed,
      |       COUNT(*) AS n_rows,
      |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total
      |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin

  val writerFenceSql: String =
    """SELECT CAST(1 AS BIGINT) AS token_a, CAST(2 AS BIGINT) AS token_b,
      |       CAST(1 AS BIGINT) AS live_refused, CAST(1 AS BIGINT) AS stale_fenced,
      |       COUNT(*) AS n_rows,
      |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total
      |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin

  /** q194: XML round-trip — Spark 4's NATIVE XML source (the spark-xml
    * donation) completing the format matrix (parquet/ORC/CSV/JSONL/XML):
    * explicit `rowTag` element per order, micros `timestampFormat` on both
    * sides, schema-pinned re-read (no inference on the hot path — the
    * same contract as q171). The aggregate runs over the RE-PARSED rows,
    * so a field dropped, mis-nested, or re-typed by either direction of
    * the XML codec hash-mismatches against the original-table oracle.
    */
  def xmlRoundtrip(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runXml")
    deleteRecursive(run)
    val path = run.resolve("orders_xml").toString
    val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    val src = orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
        $"o_orderdate", $"o_orderpriority")
    src.write.format("xml").option("rowTag", "order")
      .option("timestampFormat", fmt).save(path)
    spark.read.format("xml").schema(src.schema).option("rowTag", "order")
      .option("timestampFormat", fmt).load(path)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast(MoneyDec)), 2).cast("double").as("total"),
        min($"o_orderdate").as("first_order"),
        max($"o_orderkey").as("max_key"))
      .orderBy($"o_orderpriority")
  }

  val xmlRoundtripSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total,
      |  MIN(o_orderdate) AS first_order,
      |  MAX(o_orderkey) AS max_key
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val jsonlRoundtripSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total,
      |  MIN(o_orderdate) AS first_order,
      |  MAX(o_orderkey) AS max_key
      |FROM orders
      |WHERE o_orderstatus <> 'P'
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** q173: error-tolerant ingestion — PERMISSIVE JSON parsing with a
    * corrupt-record column, the contract that keeps a 100 TB ingest
    * running when 0.1% of upstream lines are garbage (FAILFAST kills the
    * job; DROPMALFORMED silently loses data — this path QUARANTINES).
    * The fixture derives deterministically from orders: every line whose
    * orderkey ≡ 0 (mod 10) is written truncated (unparseable), the rest
    * as valid JSON. The query re-reads PERMISSIVE with
    * `_corrupt_record`, audits good/bad counts, and aggregates ONLY the
    * clean rows — the oracle recomputes both populations relationally
    * from the original table, so a parser that drops, double-counts, or
    * mis-quarantines any line hash-mismatches.
    */
  def corruptRecords(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runCorrupt")
    deleteRecursive(run)
    val path = run.resolve("orders_dirty").toString
    // zone-less micros format: the 'XXX' offset pattern round-trips on
    // WRITE but fails JSON-read timestamp parsing against the rendered
    // 'Z' (observed: every good line partially parsed with a null
    // timestamp AND quarantined) — session-TZ-local text is the stable
    // JSON contract here
    val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    val src = orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderdate")
    val lines = src
      .select(when(pmod($"o_orderkey", lit(10)) === 0,
          concat(lit("{\"o_orderkey\":"), $"o_orderkey".cast("string"), lit(",GARBAGE")))
        .otherwise(to_json(struct($"o_orderkey", $"o_orderstatus", $"o_totalprice",
          date_format($"o_orderdate", fmt).as("o_orderdate")))).as("value"))
    lines.write.text(path)
    val schema = org.apache.spark.sql.types.StructType(
      src.schema.fields :+ org.apache.spark.sql.types.StructField(
        "_corrupt_record", org.apache.spark.sql.types.StringType, nullable = true))
    val read = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", fmt)
      .json(path)
      .localCheckpoint(true) // corrupt-record parsing caches poorly across actions
    val audit = read.agg(
      count(lit(1)).as("n_lines"),
      count($"_corrupt_record").as("n_quarantined"))
    val clean = read.filter($"_corrupt_record".isNull)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast(MoneyDec)), 2).cast("double").as("total"))
    clean.crossJoin(broadcast(audit))
      .select($"o_orderstatus", $"n", $"total", $"n_lines", $"n_quarantined")
      .orderBy($"o_orderstatus")
  }

  val corruptRecordsSql: String =
    """WITH audit AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
      |    CAST(SUM(CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined
      |  FROM orders),
      |clean AS (
      |  SELECT o_orderstatus, COUNT(*) AS n,
      |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total
      |  FROM orders WHERE o_orderkey % 10 <> 0
      |  GROUP BY o_orderstatus)
      |SELECT clean.o_orderstatus, clean.n, clean.total,
      |  audit.n_lines, audit.n_quarantined
      |FROM clean, audit
      |ORDER BY clean.o_orderstatus""".stripMargin

  /** q174: CDC APPLY — the replication sink closing the change-data loop
    * (q96 PRODUCES a changelog, q101/q103 fold one into aggregates; this
    * applies one to a TABLE): a mixed batch of deletes (event_id ≡ 0
    * mod 7), updates (≡ 1 or 2: value doubled via exact cents), and
    * inserts (cloned rows at +10⁸ ids) lands through
    * [[TableStore.applyCdc]] — one read → anti-join → merge plan, ONE
    * atomic swap, so no reader can observe deletes-without-upserts. The
    * audit re-reads the post-swap table: per event_type counts, exact
    * summed cents, min/max ids — any misapplied op class shifts one of
    * them. Oracle applies the same feed relationally to the original
    * table.
    */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runCdcApply")
    deleteRecursive(run)
    val path = run.resolve("events_cdc").toString
    val ev = events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
    TableStore.atomicWrite(spark, ev, path)
    val feed = ev.filter(pmod($"event_id", lit(7)) <= 2)
      .select(
        when(pmod($"event_id", lit(7)) === 0, lit("D")).otherwise(lit("U")).as("op"),
        when(pmod($"event_id", lit(7)) === 0, $"event_id")
          .otherwise($"event_id").as("event_id"),
        $"user_id", $"event_type", ($"cents" * 2).as("cents"))
      .unionByName(ev.filter(pmod($"event_id", lit(7)) === 3)
        .select(lit("I").as("op"), ($"event_id" + 100000000L).as("event_id"),
          $"user_id", $"event_type", $"cents"))
    TableStore.applyCdc(spark, path, feed, Seq("event_id"))
    TableStore.read(spark, path)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"),
        min($"event_id").as("min_id"), max($"event_id").as("max_id"))
      .orderBy($"event_type")
  }

  val cdcApplySql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |applied AS (
      |  SELECT event_id, event_type,
      |    CASE WHEN event_id % 7 IN (1, 2) THEN cents * 2 ELSE cents END AS cents
      |  FROM ev WHERE event_id % 7 <> 0
      |  UNION ALL
      |  SELECT event_id + 100000000, event_type, cents
      |  FROM ev WHERE event_id % 7 = 3)
      |SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(MIN(event_id) AS BIGINT) AS min_id,
      |  CAST(MAX(event_id) AS BIGINT) AS max_id
      |FROM applied
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q180: partition-pruned DELETE — q160's 100 TB shape on a
    * day-partitioned events table: victims (every user_id ≡ 0 mod 11)
    * live in SOME partitions; [[TableStore.deleteRowsPartitioned]]
    * discovers the victim-bearing days with a key-only semi-join and
    * rewrites ONLY those partition directories (untouched days' files
    * never open — asserted by mtime in TableStoreSpec; here the graded
    * artifact is the post-delete on-disk state: per-day survivors, the
    * deleted count, and a user checksum). The delete predicate is on
    * user_id, NOT the partition column — pruning comes from where the
    * victims live, which is what makes a selective delete affordable
    * over thousands of date partitions.
    */
  def partitionedDelete(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runPartDelete")
    deleteRecursive(run)
    val path = run.resolve("events_part").toString
    val ev = events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        to_date($"ts").cast("string").as("day"))
    ev.write.partitionBy("day").parquet(path)
    val victims = ev.filter(pmod($"user_id", lit(11)) === 0)
      .select($"user_id").distinct()
    val nDeleted = TableStore.deleteRowsPartitioned(
      spark, path, victims, Seq("user_id"), "day")
    TableStore.read(spark, path)
      // partition-type inference reads day= dirs back as DATE; the flat
      // oracle keeps VARCHAR — re-pin the string type (skill-notes gotcha)
      .groupBy($"day".cast("string").as("day"))
      .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("n_users"),
        sum($"user_id").as("user_checksum"))
      .withColumn("n_deleted_total", lit(nDeleted))
      .orderBy($"day")
  }

  val partitionedDeleteSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
      |  FROM events),
      |kept AS (SELECT * FROM ev WHERE user_id % 11 <> 0),
      |del AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_deleted_total
      |        FROM ev WHERE user_id % 11 = 0)
      |SELECT day, COUNT(*) AS n,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(user_id) AS BIGINT) AS user_checksum,
      |  del.n_deleted_total
      |FROM kept, del
      |GROUP BY day, del.n_deleted_total
      |ORDER BY day""".stripMargin

  /** q181: partition-pruned CDC APPLY — q174's 100 TB shape, closing the
    * round-8 gap where the replication sink (the op most likely to run
    * CONTINUOUSLY at scale) rewrote the whole table per feed. The events
    * table is day-partitioned; the feed carries deletes (event_id ≡ 0
    * mod 7, keys only), updates (≡ 1, 2: cents doubled — `day` immutable,
    * as derived from ts), and inserts (≡ 3 cloned at +10⁸, same day).
    * [[TableStore.applyCdcPartitioned]] discovers touched days from
    * victim residency ∪ upsert landing partitions and rewrites ONLY those
    * dirs (untouched-day files proven untouched in CrashSafeStoreSpec).
    * The graded artifact is the post-swap ON-DISK state per day — any op
    * class applied to a wrong partition, a missed escaped dir, or a
    * whole-table rewrite that drops a day shifts a row. Oracle applies
    * the same feed relationally.
    */
  def cdcApplyPartitioned(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runCdcApplyPart")
    deleteRecursive(run)
    val path = run.resolve("events_cdcp").toString
    val ev = events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"),
        to_date($"ts").cast("string").as("day"))
    ev.write.partitionBy("day").parquet(path)
    val feed = ev.filter(pmod($"event_id", lit(7)) <= 2)
      .select(
        when(pmod($"event_id", lit(7)) === 0, lit("D")).otherwise(lit("U")).as("op"),
        $"event_id", $"user_id", $"event_type",
        ($"cents" * 2).as("cents"), $"day")
      .unionByName(ev.filter(pmod($"event_id", lit(7)) === 3)
        .select(lit("I").as("op"), ($"event_id" + 100000000L).as("event_id"),
          $"user_id", $"event_type", $"cents", $"day"))
    TableStore.applyCdcPartitioned(spark, path, feed, Seq("event_id"), "day")
    TableStore.read(spark, path)
      // partition-dir read-back infers day= as DATE; oracle keeps VARCHAR
      .groupBy($"day".cast("string").as("day"))
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"),
        min($"event_id").as("min_id"), max($"event_id").as("max_id"))
      .orderBy($"day")
  }

  val cdcApplyPartitionedSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS cents,
      |    CAST(CAST(ts AS DATE) AS VARCHAR) AS day
      |  FROM events),
      |applied AS (
      |  SELECT event_id, day,
      |    CASE WHEN event_id % 7 IN (1, 2) THEN cents * 2 ELSE cents END AS cents
      |  FROM ev WHERE event_id % 7 <> 0
      |  UNION ALL
      |  SELECT event_id + 100000000, day, cents
      |  FROM ev WHERE event_id % 7 = 3)
      |SELECT day, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(MIN(event_id) AS BIGINT) AS min_id,
      |  CAST(MAX(event_id) AS BIGINT) AS max_id
      |FROM applied
      |GROUP BY day
      |ORDER BY day""".stripMargin

  /** q183: schema-evolving upsert on the PARTITIONED path, graded on the
    * post-swap on-disk state — the steady-state reality of a long-lived
    * partitioned ingest whose upstream adds fields
    * ([[TableStore.upsertPartitionedEvolve]], round-8 verdict item 8;
    * the flat evolve path shipped round 8, the partitioned one here).
    * A day-partitioned events table receives a drifted batch (event_id ≡
    * 2 mod 5): it DROPS event_type (stored values must survive on
    * conflict, NOT null out) and ADDS a score column (backfilled null on
    * every untouched row; only the touched day partitions gain the
    * column — mixed schemas merge on read). The audit groups the evolved
    * table per day: row count, surviving event_type count, exact summed
    * score of the new column — any clobbered column, lost row, or
    * mis-backfilled partition shifts a value.
    */
  def evolveUpsertPartitioned(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runEvolvePart")
    deleteRecursive(run)
    val path = run.resolve("events_evolve").toString
    // 'd'-prefixed day strings: bare ISO dates read back from day= dirs as
    // DATE (partition type inference), which mergePlanEvolve's type-drift
    // check rightly rejects against the batch's strings
    val ev = events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        concat(lit("d"), to_date($"ts").cast("string")).as("day"))
    ev.write.partitionBy("day").parquet(path)
    val batch = ev.filter(pmod($"event_id", lit(5)) === 2)
      .select($"event_id", ($"user_id" + 1000000L).as("user_id"),
        ($"event_id" % 97).cast("long").as("score"), $"day")
      // insert rows (new keys): event_type absent from the batch → typed
      // null, landing in their original day partitions
      .unionByName(ev.filter(pmod($"event_id", lit(5)) === 3)
        .select(($"event_id" + 100000000L).as("event_id"), $"user_id",
          ($"event_id" % 53).cast("long").as("score"), $"day"))
    TableStore.upsertPartitionedEvolve(spark, path, batch, Seq("event_id"), "day")
    TableStore.readEvolved(spark, path)
      .groupBy($"day".cast("string").as("day"))
      .agg(count(lit(1)).as("n"),
        count($"event_type").as("n_type_kept"),
        sum($"score").as("sum_score"),
        sum($"user_id").as("sum_users"))
      .orderBy($"day")
  }

  val evolveUpsertPartitionedSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    'd' || CAST(CAST(ts AS DATE) AS VARCHAR) AS day
      |  FROM events),
      |merged AS (
      |  SELECT event_id, day,
      |    CASE WHEN event_id % 5 = 2 THEN user_id + 1000000 ELSE user_id END AS user_id,
      |    event_type,
      |    CASE WHEN event_id % 5 = 2 THEN event_id % 97 ELSE NULL END AS score
      |  FROM ev
      |  UNION ALL
      |  SELECT event_id + 100000000, day, user_id, NULL, event_id % 53
      |  FROM ev WHERE event_id % 5 = 3)
      |SELECT day, COUNT(*) AS n,
      |  CAST(COUNT(event_type) AS BIGINT) AS n_type_kept,
      |  CAST(SUM(score) AS BIGINT) AS sum_score,
      |  CAST(SUM(user_id) AS BIGINT) AS sum_users
      |FROM merged
      |GROUP BY day
      |ORDER BY day""".stripMargin

  // q240/q241 pristine fixture: orders hash-scattered into 8 files, staged
  // once per (JVM, sfDir); each run restores by filesystem copy (DV
  // mutations write sidecars/appends next to the data)
  private val dvStaged =
    scala.collection.concurrent.TrieMap.empty[String, java.nio.file.Path]

  private def dvFixture(spark: SparkSession, dir: String): java.nio.file.Path =
    dvStaged.getOrElseUpdate(dir, {
      val p = mergeRoot.resolve("dvfix_" + java.lang.Integer.toHexString(dir.hashCode))
      orders(spark, dir).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(8, col("o_custkey"))
        .write.mode("overwrite").parquet(p.toString)
      p
    })

  /** q240: deletion-vector delete ([[graft.operators.DeletionVectors]]) —
    * the ZERO-rewrite mutation tier: deleting the modulo-499 keys touches
    * no data file (spec-asserted via mtimes); one distributed pass locates
    * (file, row position) pairs via parquet's stable `_metadata.row_index`
    * and the read applies the delta-sized vector as a broadcast anti-join,
    * so the base scan never shuffles. Graded output is the post-delete
    * table; compaction equivalence (rewrite ONLY dirty files, reset the
    * vector) is DeletionVectorsSpec's.
    */
  def dvDelete(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val fix = dvFixture(spark, dir)
    val run = mergeRoot.resolve("runDv")
    deleteRecursive(run)
    copyRecursive(fix, run)
    val keys = orders(spark, dir).filter($"o_orderkey" % 499 === 0)
      .select($"o_orderkey")
    graft.operators.DeletionVectors.dvDelete(spark, run.toString, keys, "o_orderkey")
    graft.operators.DeletionVectors.dvRead(spark, run.toString)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val dvDeleteSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders WHERE o_orderkey % 499 <> 0
      |ORDER BY o_orderkey""".stripMargin

  /** q241: merge-on-read upsert — updates DV-mask the old rows, the delta
    * appends as new part files, NO existing file is modified; the read
    * stitches base-minus-vector ∪ delta. Same delta shape as q239's
    * Bloom-pruned COW merge, so the two tiers' post-merge states are
    * directly comparable: q239 pays rewrite at mutation time, q241 pays a
    * broadcast anti-join at read time — the classic write- vs
    * read-amplification trade a 100 TB store must offer both sides of.
    */
  def morUpsert(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val fix = dvFixture(spark, dir)
    val run = mergeRoot.resolve("runMor")
    deleteRecursive(run)
    copyRecursive(fix, run)
    val base = orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val delta = base.filter($"o_orderkey" % 499 === 0)
      .withColumn("o_totalprice", $"o_totalprice" + lit(1000.0))
      .unionByName(base.filter($"o_orderkey" % 997 === 0)
        .select(($"o_orderkey" + lit(10000000L)).as("o_orderkey"),
          $"o_custkey", lit(42.0).as("o_totalprice")))
    graft.operators.DeletionVectors.morUpsert(spark, run.toString, delta, "o_orderkey")
    graft.operators.DeletionVectors.dvRead(spark, run.toString)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val morUpsertSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM (
      |  SELECT o_orderkey, o_custkey, o_totalprice
      |  FROM orders WHERE o_orderkey % 499 <> 0
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0
      |  FROM orders WHERE o_orderkey % 499 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, 42.0
      |  FROM orders WHERE o_orderkey % 997 = 0)
      |ORDER BY o_orderkey""".stripMargin

  /** q252: the deletion-vector tier's CLUSTERED path end-to-end — the
    * complement of q240's scattered masks: on a key-SORTED single-file
    * table, deleting the bottom key quartile masks one contiguous
    * row-index block, so the sidecar is ONE `start+len` run (require-
    * asserted at a 4 KiB ceiling — a regression to per-row encoding
    * fails the query loudly) and the read takes [[graft.operators
    * .DeletionVectors.maskRuns]]'s RANGE branch: a single broadcast
    * (file, lo, hi) triple, O(1) residual walk, regardless of how many
    * rows the delete covered. Graded output is the post-delete table vs
    * the oracle's integer-exact quartile predicate.
    */
  def dvRangeDelete(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runDvRange")
    deleteRecursive(run)
    val base = orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    base.orderBy($"o_orderkey").coalesce(1)
      .write.mode("overwrite").parquet(run.toString)
    val maxKey = base.agg(max($"o_orderkey")).head().getLong(0)
    val keys = base.filter($"o_orderkey" * 4 <= maxKey).select($"o_orderkey")
    graft.operators.DeletionVectors.dvDelete(spark, run.toString, keys, "o_orderkey")
    val bytes = graft.operators.DeletionVectors.vectorBytes(spark, run.toString)
    require(bytes < 4096,
      s"contiguous delete must stay run-compressed, sidecar is $bytes bytes")
    graft.operators.DeletionVectors.dvRead(spark, run.toString)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val dvRangeDeleteSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_orderkey * 4 > (SELECT MAX(o_orderkey) FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** q256: SQL DELETE against a PARTITIONED store routes through the
    * partition-pruned rewrite (round-12 verdict item 1, the round's one
    * `weak`): the statement tier detects the Hive layout from the
    * directory shape, discovers victim partitions in one pruned scan,
    * and swaps ONLY those dirs — require-asserted in the graded query
    * itself: the layout survives (partition dirs still present) and the
    * untouched partitions' files keep their exact mtime listing (they
    * were never rewritten; a silent flatten or full rewrite fails the
    * query loudly). Output is the post-delete table vs the oracle's
    * negated predicate.
    */
  def sqlDeletePartitioned(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlDelPart")
    deleteRecursive(run)
    val tbl = run.resolve("orders_part").toString
    TableStore.atomicWritePartitioned(spark,
      orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice",
        $"o_orderpriority"), tbl, "o_orderpriority")
    def listing(victim: Boolean) = new java.io.File(tbl).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("o_orderpriority="))
      .filter(d => (d.getName.contains("1-URGENT") || d.getName.contains("3-MEDIUM")) == victim)
      .flatMap(_.listFiles().map(f => (f.getPath, f.lastModified(), f.length())))
      .sortBy(_._1).toSeq
    val untouchedBefore = listing(victim = false)
    require(untouchedBefore.nonEmpty, "fixture must have untouched partitions")
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"DELETE FROM graft_store.`$tbl` WHERE o_custkey % 10 = 3 AND " +
        "o_orderpriority IN ('1-URGENT', '3-MEDIUM')")).head().getLong(0)
    require(n > 0, "delete reported an empty table")
    require(TableStore.detectPartitionColumn(spark, tbl).contains("o_orderpriority"),
      "SQL DELETE must not flatten the partitioned layout")
    require(listing(victim = false) == untouchedBefore,
      "untouched partitions' files were rewritten — the pruned route did not engage")
    TableStore.read(spark, tbl)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderpriority")
      .orderBy($"o_orderkey")
  }

  val sqlDeletePartitionedSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE NOT (o_custkey % 10 = 3 AND o_orderpriority IN ('1-URGENT', '3-MEDIUM'))
      |ORDER BY o_orderkey""".stripMargin

  /** q257: SQL UPDATE against a PARTITIONED store — the same routing as
    * q256 for the other rewrite statement: one predicate-bearing
    * partition is rewritten with the simultaneous-assignment projection,
    * every other partition's files stay byte-untouched (require-asserted
    * via the mtime listing), and the layout survives. Oracle recomputes
    * both assignments with CASE over the original table.
    */
  def sqlUpdatePartitioned(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlUpdPart")
    deleteRecursive(run)
    val tbl = run.resolve("orders_part").toString
    TableStore.atomicWritePartitioned(spark,
      orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice",
        $"o_orderpriority"), tbl, "o_orderpriority")
    def untouched() = new java.io.File(tbl).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("o_orderpriority="))
      .filterNot(_.getName.contains("2-HIGH"))
      .flatMap(_.listFiles().map(f => (f.getPath, f.lastModified(), f.length())))
      .sortBy(_._1).toSeq
    val before = untouched()
    require(before.nonEmpty, "fixture must have untouched partitions")
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"UPDATE graft_store.`$tbl` " +
        "SET o_totalprice = o_totalprice + o_custkey % 100, " +
        "    o_custkey = o_custkey + 5000000 " +
        "WHERE o_orderpriority = '2-HIGH'")).head().getLong(0)
    require(n > 0, "update reported an empty table")
    require(TableStore.detectPartitionColumn(spark, tbl).contains("o_orderpriority"),
      "SQL UPDATE must not flatten the partitioned layout")
    require(untouched() == before,
      "untouched partitions' files were rewritten — the pruned route did not engage")
    TableStore.read(spark, tbl)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderpriority")
      .orderBy($"o_orderkey")
  }

  val sqlUpdatePartitionedSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderpriority = '2-HIGH' THEN o_custkey + 5000000
      |       ELSE o_custkey END AS o_custkey,
      |  CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice + o_custkey % 100
      |       ELSE o_totalprice END AS o_totalprice,
      |  o_orderpriority
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** q258: CONDITIONAL MERGE clauses end-to-end (round-12 verdict item 3)
    * — ordered `WHEN MATCHED AND … THEN DELETE / UPDATE` plus a
    * conditional `WHEN NOT MATCHED … INSERT`, all in ONE statement and
    * one [[TableStore.mergeClauses]] plan/swap, with conditions reaching
    * BOTH sides of the join through the t/s aliases (the DELETE fires on
    * a SOURCE column, the UPDATE gate reads the stored TARGET price).
    * First-TRUE-clause-wins ordering is load-bearing: a matched row with
    * an even source custkey is deleted even when the update condition
    * would also hold. Oracle recomputes the clause semantics
    * relationally.
    */
  def sqlMergeConditional(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlMergeCond")
    deleteRecursive(run)
    val tbl = run.resolve("orders_tbl").toString
    orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .createOrReplaceTempView("v_sqlmc_orders")
    TableStore.atomicWrite(spark, spark.table("v_sqlmc_orders"), tbl)
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"""MERGE INTO graft_store.`$tbl`
         |USING (
         |  SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice
         |  FROM v_sqlmc_orders WHERE o_orderkey % 3 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 30000000, o_custkey, o_totalprice + 100.0
         |  FROM v_sqlmc_orders WHERE o_orderkey % 11 = 5
         |)
         |ON KEYS (o_orderkey)
         |WHEN MATCHED AND s.o_custkey % 2 = 0 THEN DELETE
         |WHEN MATCHED AND t.o_totalprice > 150000 THEN UPDATE SET (o_totalprice)
         |WHEN NOT MATCHED AND s.o_custkey % 3 = 0 THEN INSERT *""".stripMargin))
      .head().getLong(0)
    require(n > 0, "conditional merge reported an empty table")
    TableStore.read(spark, tbl).orderBy($"o_orderkey")
  }

  val sqlMergeConditionalSql: String =
    """WITH src AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 30000000, o_custkey, o_totalprice + 100.0
      |  FROM orders WHERE o_orderkey % 11 = 5),
      |kept AS (
      |  SELECT t.o_orderkey, t.o_custkey,
      |    CASE WHEN s.o_orderkey IS NOT NULL AND NOT (s.o_custkey % 2 = 0)
      |              AND t.o_totalprice > 150000
      |         THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice
      |  FROM orders t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
      |  WHERE s.o_orderkey IS NULL OR NOT (s.o_custkey % 2 = 0)),
      |ins AS (
      |  SELECT s.o_orderkey, s.o_custkey, s.o_totalprice
      |  FROM src s LEFT JOIN orders t ON t.o_orderkey = s.o_orderkey
      |  WHERE t.o_orderkey IS NULL AND s.o_custkey % 3 = 0)
      |SELECT o_orderkey, o_custkey, o_totalprice FROM kept
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_totalprice FROM ins
      |ORDER BY o_orderkey""".stripMargin

  /** q259: SQL DELETE routed to the DELETION-VECTOR tier (round-12
    * verdict item 4) — a key-membership predicate (`IN` literal list) on
    * a merge-on-read table IS a key-set mask, so the statement drives
    * [[graft.operators.DeletionVectors.dvDelete]] instead of being
    * refused: require-asserted in the graded query, NO data file is
    * touched (mtime listing identical), the exactly-once ledger survives
    * the statement, and the returned `n_rows` is the footer-derived live
    * count. Output is the post-delete visible table (DV read) vs the
    * oracle's recomputation.
    */
  def sqlDeleteMor(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    import graft.operators.DeletionVectors
    val run = mergeRoot.resolve("runSqlDelMor")
    deleteRecursive(run)
    val tbl = run.resolve("orders_mor").toString
    val base = orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    base.orderBy($"o_orderkey").coalesce(1).write.mode("overwrite").parquet(tbl)
    // a CDC batch establishes the exactly-once ledger (B record) and one
    // appended mor-* row the delete must not disturb
    val applied = DeletionVectors.morApplyCdc(spark, tbl,
      Seq(("I", 99999999L, 1L, 0.0)).toDF("op", "o_orderkey", "o_custkey", "o_totalprice"),
      "o_orderkey", batchId = 3L)
    require(applied, "fixture CDC batch must apply")
    val victims = base.filter($"o_orderkey" % 499 === 0)
      .select($"o_orderkey").as[Long].collect().sorted
    require(victims.nonEmpty, "fixture needs victims")
    def files() = new java.io.File(tbl).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).sortBy(_._1).toSeq
    val before = files()
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"DELETE FROM graft_store.`$tbl` WHERE o_orderkey IN (${victims.mkString(", ")})"))
      .head().getLong(0)
    require(files() == before, "dv routing must not touch any data file")
    require(DeletionVectors.appliedBatches(spark, tbl) == Set(3L),
      "the exactly-once ledger must survive the SQL DELETE")
    val live = DeletionVectors.dvRead(spark, tbl)
    require(n == live.count(), "n_rows must equal the visible live count")
    live.select($"o_orderkey", $"o_custkey", $"o_totalprice").orderBy($"o_orderkey")
  }

  val sqlDeleteMorSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE NOT (o_orderkey % 499 = 0)
      |UNION ALL
      |SELECT 99999999 AS o_orderkey, 1 AS o_custkey, 0.0 AS o_totalprice
      |ORDER BY o_orderkey""".stripMargin

  /** q260: the SQL READ surface ([[graft.plans.GraftStoreRead]], round-12
    * verdict item 2) — pure SQL text (`SELECT … FROM graft_store.\`path\``,
    * with a WHERE, GROUP BY, and ORDER BY around it) against a
    * merge-on-read table whose bottom key quartile is DV-masked. The
    * graded aggregate hash-matches the oracle's post-delete state ONLY if
    * the relation resolves through `dvRead`; the raw-parquet divergence
    * (masked rows resurrected) is require-asserted in the query itself —
    * this was the one silently-wrong read left in the SQL tier.
    */
  def sqlSelectMor(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    import graft.operators.DeletionVectors
    val run = mergeRoot.resolve("runSqlSelMor")
    deleteRecursive(run)
    val tbl = run.resolve("orders_mor").toString
    val base = orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    base.orderBy($"o_orderkey").coalesce(1).write.mode("overwrite").parquet(tbl)
    val maxKey = base.agg(max($"o_orderkey")).head().getLong(0)
    DeletionVectors.dvDelete(spark, tbl,
      base.filter($"o_orderkey" * 4 <= maxKey).select($"o_orderkey"), "o_orderkey")
    val raw = spark.read.parquet(tbl).count()
    val live = DeletionVectors.liveRowCount(spark, tbl)
    require(raw > live,
      "fixture must diverge: the raw parquet path resurrects masked rows")
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val out = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"""SELECT o_custkey, COUNT(*) AS n, MIN(o_orderkey) AS min_k
         |FROM graft_store.`$tbl`
         |WHERE o_orderkey % 2 = 0
         |GROUP BY o_custkey
         |ORDER BY o_custkey""".stripMargin))
    require(out.count() > 0, "SQL read returned nothing")
    out
  }

  val sqlSelectMorSql: String =
    """SELECT o_custkey, COUNT(*) AS n, MIN(o_orderkey) AS min_k
      |FROM orders
      |WHERE o_orderkey % 2 = 0
      |  AND o_orderkey * 4 > (SELECT MAX(o_orderkey) FROM orders)
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** q262: SQL MERGE routed to the MERGE-ON-READ tier — the full-upsert
    * shape (`ON KEYS` with no clauses, the reference's `ON CONFLICT DO
    * UPDATE SET *`) on a DV-masked table IS exactly
    * [[graft.operators.DeletionVectors.morUpsert]]: the delta appends as
    * new `mor-*` files and the replaced rows mask — ZERO pre-existing
    * data files touched, require-asserted via the mtime listing. Source
    * keys that were previously DV-masked re-insert (key absent ⇒ insert,
    * standard upsert semantics over the LIVE table), which the oracle's
    * full-outer recomputation over the post-delete state pins. Output is
    * the visible table.
    */
  def sqlMergeMor(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    import graft.operators.DeletionVectors
    val run = mergeRoot.resolve("runSqlMergeMor")
    deleteRecursive(run)
    val tbl = run.resolve("orders_mor").toString
    orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .createOrReplaceTempView("v_sqlmm_orders")
    spark.table("v_sqlmm_orders").repartition(8, $"o_custkey")
      .write.mode("overwrite").parquet(tbl)
    DeletionVectors.dvDelete(spark, tbl,
      spark.table("v_sqlmm_orders").filter($"o_orderkey" % 7 === 0)
        .select($"o_orderkey"), "o_orderkey")
    def files() = new java.io.File(tbl).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).sortBy(_._1).toSeq
    val before = files()
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"""MERGE INTO graft_store.`$tbl`
         |USING (
         |  SELECT o_orderkey, o_custkey, o_totalprice * 2.0 AS o_totalprice
         |  FROM v_sqlmm_orders WHERE o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice
         |  FROM v_sqlmm_orders WHERE o_orderkey % 10 = 3
         |)
         |ON KEYS (o_orderkey)""".stripMargin)).head().getLong(0)
    val after = files()
    require(after.filter(f => before.exists(_._1 == f._1)) == before,
      "a MoR-routed MERGE must not touch any pre-existing data file")
    require(after.exists(_._1.startsWith("mor-")),
      "the delta must land as appended mor-* files")
    require(n == DeletionVectors.liveRowCount(spark, tbl),
      "n_rows must equal the visible live count")
    DeletionVectors.dvRead(spark, tbl)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val sqlMergeMorSql: String =
    """WITH live AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |  WHERE NOT (o_orderkey % 7 = 0)),
      |src AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice * 2.0 AS o_totalprice
      |  FROM orders WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice
      |  FROM orders WHERE o_orderkey % 10 = 3)
      |SELECT COALESCE(l.o_orderkey, s.o_orderkey) AS o_orderkey,
      |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
      |       ELSE l.o_custkey END AS o_custkey,
      |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
      |       ELSE l.o_totalprice END AS o_totalprice
      |FROM live l FULL JOIN src s ON l.o_orderkey = s.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** q263: SQL `INSERT INTO graft_store` — the plain-append statement
    * completing the DML set, with standard POSITIONAL column mapping
    * (the source's expressions are unaliased on purpose) and the
    * zero-rewrite commit: on a flat table the statement batch coalesces
    * to ONE part file whose single rename is the atomic visible commit —
    * require-asserted: every pre-existing file untouched (mtime+length),
    * exactly one new `ins-*` file. Oracle is the UNION ALL
    * recomputation.
    */
  def sqlInsert(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlInsert")
    deleteRecursive(run)
    val tbl = run.resolve("orders_tbl").toString
    orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .createOrReplaceTempView("v_sqlins_orders")
    TableStore.atomicWrite(spark, spark.table("v_sqlins_orders"), tbl)
    def files() = new java.io.File(tbl).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).sortBy(_._1).toSeq
    val before = files()
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"INSERT INTO graft_store.`$tbl` " +
        "SELECT o_orderkey + 40000000, o_custkey, o_totalprice " +
        "FROM v_sqlins_orders WHERE o_orderkey % 13 = 0")).head().getLong(0)
    val after = files()
    require(after.filter(f => before.exists(_._1 == f._1)) == before,
      "INSERT must not touch any pre-existing data file")
    require(after.count(_._1.startsWith("ins-")) == 1,
      "a statement batch commits as ONE appended file (atomic rename)")
    require(n == TableStore.rowCountFromFooters(spark, tbl),
      "n_rows is the footer-derived post-insert count")
    TableStore.read(spark, tbl).orderBy($"o_orderkey")
  }

  val sqlInsertSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |UNION ALL
      |SELECT o_orderkey + 40000000, o_custkey, o_totalprice
      |FROM orders WHERE o_orderkey % 13 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** (path, mtime, length) of every data file in the two-level layout's
    * leaf dirs selected by `keep(priority, status)` — the untouched-subtree
    * instrument of q264/q265: a leaf whose files change (or whose listing
    * gains/loses files) was rewritten.
    */
  private def twoLevelListing(tbl: String)(keep: (String, String) => Boolean)
      : Seq[(String, Long, Long)] =
    new java.io.File(tbl).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("o_orderpriority="))
      .flatMap(p => p.listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("o_orderstatus="))
        .filter(s => keep(p.getName, s.getName))
        .flatMap(_.listFiles().map(f => (f.getPath, f.lastModified(), f.length()))))
      .sortBy(_._1).toSeq

  /** q264: SQL DELETE against a TWO-LEVEL (priority, status) partitioned
    * store — the canonical (source, day) lakehouse layout the store
    * refused until this round. The statement tier detects BOTH levels
    * from the directory shape ([[TableStore.detectPartitionColumns]]),
    * discovers victim LEAF dirs in one pruned scan, and swaps only those:
    * require-asserted at LEAF precision — the sibling status leaves UNDER
    * the victim priority keep their exact (path, mtime, length) listing,
    * so pruning provably happens per (priority, status) leaf, not per
    * top-level subtree. Layout survives at both levels. Output is the
    * post-delete table vs the oracle's negated predicate.
    */
  def sqlDeleteTwoLevel(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlDel2L")
    deleteRecursive(run)
    val tbl = run.resolve("orders_2l").toString
    TableStore.atomicWritePartitioned(spark,
      orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice",
        $"o_orderpriority", $"o_orderstatus"),
      tbl, Seq("o_orderpriority", "o_orderstatus"))
    require(TableStore.detectPartitionColumns(spark, tbl)
      == Seq("o_orderpriority", "o_orderstatus"),
      "fixture must detect the two-level layout")
    // the ONLY victim leaf is (1-URGENT, O); every other leaf — including
    // (1-URGENT, F/P), the same priority's sibling statuses — stays put
    def untouched() = twoLevelListing(tbl)((p, s) =>
      !(p.contains("1-URGENT") && s.contains("=O")))
    val before = untouched()
    require(before.nonEmpty, "fixture must have untouched leaves")
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"DELETE FROM graft_store.`$tbl` WHERE o_custkey % 10 = 3 AND " +
        "o_orderpriority = '1-URGENT' AND o_orderstatus = 'O'")).head().getLong(0)
    require(n > 0, "delete reported an empty table")
    require(TableStore.detectPartitionColumns(spark, tbl)
      == Seq("o_orderpriority", "o_orderstatus"),
      "SQL DELETE must not flatten the two-level layout")
    require(untouched() == before,
      "a leaf outside (1-URGENT, O) was rewritten — pruning is not leaf-precise")
    TableStore.read(spark, tbl)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        $"o_orderpriority", $"o_orderstatus")
      .orderBy($"o_orderkey")
  }

  val sqlDeleteTwoLevelSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, o_orderstatus
      |FROM orders
      |WHERE NOT (o_custkey % 10 = 3 AND o_orderpriority = '1-URGENT'
      |           AND o_orderstatus = 'O')
      |ORDER BY o_orderkey""".stripMargin

  /** q265: conditional SQL MERGE against the TWO-LEVEL layout — the
    * clause engine's pruned arm generalized to leaf tuples: updates land
    * only in '2-HIGH' leaves, inserts only in '4-NOT SPECIFIED' leaves,
    * and every leaf under the three OTHER priorities is require-asserted
    * byte-untouched (mtime+length listing). Clause semantics (first-TRUE
    * wins, conditional insert gate) recomputed relationally by the
    * oracle.
    */
  def sqlMergeTwoLevel(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlMerge2L")
    deleteRecursive(run)
    val tbl = run.resolve("orders_2l").toString
    orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice",
      $"o_orderpriority", $"o_orderstatus")
      .createOrReplaceTempView("v_sqlm2l_orders")
    TableStore.atomicWritePartitioned(spark, spark.table("v_sqlm2l_orders"),
      tbl, Seq("o_orderpriority", "o_orderstatus"))
    def untouched() = twoLevelListing(tbl)((p, _) =>
      !p.contains("2-HIGH") && !p.contains("4-NOT"))
    val before = untouched()
    require(before.nonEmpty, "fixture must have untouched leaves")
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"""MERGE INTO graft_store.`$tbl`
         |USING (
         |  SELECT o_orderkey, o_custkey, o_totalprice * 2.0 AS o_totalprice,
         |         o_orderpriority, o_orderstatus
         |  FROM v_sqlm2l_orders
         |  WHERE o_orderkey % 10 = 0 AND o_orderpriority = '2-HIGH'
         |  UNION ALL
         |  SELECT o_orderkey + 50000000, o_custkey, o_totalprice,
         |         o_orderpriority, o_orderstatus
         |  FROM v_sqlm2l_orders
         |  WHERE o_orderkey % 17 = 2 AND o_orderpriority = '4-NOT SPECIFIED'
         |)
         |ON KEYS (o_orderkey)
         |WHEN MATCHED AND s.o_custkey % 2 = 0 THEN UPDATE SET (o_totalprice)
         |WHEN NOT MATCHED AND s.o_custkey % 3 = 1 THEN INSERT *""".stripMargin))
      .head().getLong(0)
    require(n > 0, "merge reported an empty table")
    require(TableStore.detectPartitionColumns(spark, tbl)
      == Seq("o_orderpriority", "o_orderstatus"),
      "SQL MERGE must not flatten the two-level layout")
    require(untouched() == before,
      "a leaf outside the source's priorities was rewritten — pruning did not engage")
    TableStore.read(spark, tbl)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        $"o_orderpriority", $"o_orderstatus")
      .orderBy($"o_orderkey")
  }

  val sqlMergeTwoLevelSql: String =
    """WITH src AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice * 2.0 AS o_totalprice,
      |         o_orderpriority, o_orderstatus
      |  FROM orders WHERE o_orderkey % 10 = 0 AND o_orderpriority = '2-HIGH'
      |  UNION ALL
      |  SELECT o_orderkey + 50000000, o_custkey, o_totalprice,
      |         o_orderpriority, o_orderstatus
      |  FROM orders WHERE o_orderkey % 17 = 2
      |    AND o_orderpriority = '4-NOT SPECIFIED'),
      |upd AS (
      |  SELECT t.o_orderkey, t.o_custkey,
      |    CASE WHEN s.o_orderkey IS NOT NULL AND s.o_custkey % 2 = 0
      |         THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
      |    t.o_orderpriority, t.o_orderstatus
      |  FROM orders t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey),
      |ins AS (
      |  SELECT s.o_orderkey, s.o_custkey, s.o_totalprice,
      |         s.o_orderpriority, s.o_orderstatus
      |  FROM src s LEFT JOIN orders t ON t.o_orderkey = s.o_orderkey
      |  WHERE t.o_orderkey IS NULL AND s.o_custkey % 3 = 1)
      |SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, o_orderstatus
      |FROM upd
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, o_orderstatus
      |FROM ins
      |ORDER BY o_orderkey""".stripMargin

  /** q266: SQL TIME TRAVEL (round-13 verdict item 2) — two snapshots of
    * one versioned table laid side by side from PURE SQL text: the bare
    * `graft_store` relation resolves to the LIVE version (the CURRENT
    * pointer — a raw parquet read of the root would union every `v=N`
    * snapshot, require-asserted divergent in the fixture), and
    * `VERSION AS OF 1` pins the original through
    * [[graft.store.VersionedTable.readVersion]]. The join exposes both
    * prices per key; the oracle recomputes v2 relationally from the base
    * table. (A raw parquet read of the root is not even a fallback: the
    * CURRENT pointer file chokes the footer reader — the SQL surface is
    * the only non-library way in.)
    */
  def sqlTimeTravel(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    import graft.store.VersionedTable
    val run = mergeRoot.resolve("runSqlTT")
    deleteRecursive(run)
    val tbl = run.resolve("orders_v").toString
    val base = orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    require(VersionedTable.writeSnapshot(spark, base, tbl) == 1)
    val delta = base.filter($"o_orderkey" % 10 === 0)
      .withColumn("o_totalprice", $"o_totalprice" * 2.0)
    require(VersionedTable.upsert(spark, tbl, delta, Seq("o_orderkey")) == 2)
    // both snapshots exist on disk and differ — the fixture's divergence
    require(spark.read.parquet(s"$tbl/v=2").count() == base.count() &&
      graft.store.VersionedTable.currentVersion(spark, tbl).contains(2),
      "fixture must hold two snapshots with v2 live")
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val out = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"""SELECT cur.o_orderkey, cur.o_totalprice AS price_now,
         |       old.o_totalprice AS price_v1
         |FROM graft_store.`$tbl` cur
         |JOIN graft_store.`$tbl` VERSION AS OF 1 old
         |  ON cur.o_orderkey = old.o_orderkey
         |WHERE cur.o_orderkey % 5 = 0
         |ORDER BY cur.o_orderkey""".stripMargin))
    require(out.filter($"price_now" =!= $"price_v1").count() > 0,
      "the two versions must observably differ through SQL")
    out
  }

  val sqlTimeTravelSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2.0
      |       ELSE o_totalprice END AS price_now,
      |  o_totalprice AS price_v1
      |FROM orders WHERE o_orderkey % 5 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** q267: SQL UPDATE routed to the DELETION-VECTOR tier (round-13
    * verdict item 3) — the q259 DELETE routing mirrored for UPDATE: a
    * key-membership predicate (`IN` literal list) on a merge-on-read
    * table locates victims through the masked read, applies the
    * simultaneous-assignment projection, and lands the images via
    * `morUpsert` — require-asserted in the graded query: every
    * PRE-EXISTING data file keeps its exact (name, mtime, length), the
    * images appear as appended `mor-*` files, the exactly-once ledger
    * survives, and `n_rows` equals the visible live count. Output is the
    * post-update visible table vs the oracle's CASE recomputation.
    */
  def sqlUpdateMor(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    import graft.operators.DeletionVectors
    val run = mergeRoot.resolve("runSqlUpdMor")
    deleteRecursive(run)
    val tbl = run.resolve("orders_mor").toString
    val base = orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    base.orderBy($"o_orderkey").coalesce(1).write.mode("overwrite").parquet(tbl)
    val applied = DeletionVectors.morApplyCdc(spark, tbl,
      Seq(("I", 99999999L, 1L, 0.0)).toDF("op", "o_orderkey", "o_custkey", "o_totalprice"),
      "o_orderkey", batchId = 3L)
    require(applied, "fixture CDC batch must apply")
    val victims = base.filter($"o_orderkey" % 499 === 0)
      .select($"o_orderkey").as[Long].collect().sorted
    require(victims.nonEmpty, "fixture needs victims")
    def files() = new java.io.File(tbl).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).sortBy(_._1).toSeq
    val before = files()
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"UPDATE graft_store.`$tbl` " +
        "SET o_totalprice = o_totalprice * 2 + o_custkey % 7 " +
        s"WHERE o_orderkey IN (${victims.mkString(", ")})")).head().getLong(0)
    val after = files()
    require(after.filter(f => before.exists(_._1 == f._1)) == before,
      "dv-routed UPDATE must not touch any pre-existing data file")
    require(after.exists(f => f._1.startsWith("mor-") && !before.exists(_._1 == f._1)),
      "the updated images must land as appended mor-* files")
    require(DeletionVectors.appliedBatches(spark, tbl) == Set(3L),
      "the exactly-once ledger must survive the SQL UPDATE")
    val live = DeletionVectors.dvRead(spark, tbl)
    require(n == live.count(), "n_rows must equal the visible live count")
    live.select($"o_orderkey", $"o_custkey", $"o_totalprice").orderBy($"o_orderkey")
  }

  val sqlUpdateMorSql: String =
    """WITH live AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |  UNION ALL
      |  SELECT 99999999 AS o_orderkey, 1 AS o_custkey, 0.0 AS o_totalprice)
      |SELECT o_orderkey, o_custkey,
      |  CASE WHEN o_orderkey % 499 = 0 AND o_orderkey <> 99999999
      |       THEN o_totalprice * 2 + o_custkey % 7
      |       ELSE o_totalprice END AS o_totalprice
      |FROM live
      |ORDER BY o_orderkey""".stripMargin

  /** q268: FILE-PRUNED conditional MERGE on a FLAT table (round-13
    * verdict item 5) — q258's clause semantics with q253's write
    * amplification: the source's matched keys cluster in the bottom
    * range of a range-partitioned table, so victim-file discovery (one
    * key+metadata semi-join) decodes only those files; every clean file
    * is require-asserted byte-untouched ((name, mtime, length) listing
    * preserved — hard-linked, never re-encoded) while inserts land as
    * new `rw-*` files. Oracle recomputes the clause semantics
    * relationally.
    */
  def sqlMergePrunedFlat(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlMergePf")
    deleteRecursive(run)
    val tbl = run.resolve("orders_flat").toString
    orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .createOrReplaceTempView("v_sqlmpf_orders")
    spark.table("v_sqlmpf_orders").repartitionByRange(8, $"o_orderkey")
      .write.mode("overwrite").parquet(tbl)
    def files() = new java.io.File(tbl).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).sortBy(_._1).toSeq
    val before = files()
    require(before.size >= 4, "fixture needs enough files to prune")
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"""MERGE INTO graft_store.`$tbl`
         |USING (
         |  SELECT o_orderkey, o_custkey, o_totalprice * 2.0 AS o_totalprice
         |  FROM v_sqlmpf_orders
         |  WHERE o_orderkey * 8 <= (SELECT MAX(o_orderkey) FROM v_sqlmpf_orders)
         |  UNION ALL
         |  SELECT o_orderkey + 60000000, o_custkey, o_totalprice
         |  FROM v_sqlmpf_orders WHERE o_orderkey % 23 = 1
         |)
         |ON KEYS (o_orderkey)
         |WHEN MATCHED AND s.o_custkey % 2 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET (o_totalprice)
         |WHEN NOT MATCHED AND s.o_custkey % 3 = 0 THEN INSERT *""".stripMargin))
      .head().getLong(0)
    require(n > 0, "merge reported an empty table")
    val after = files()
    val survivors = after.filter(f => before.exists(_._1 == f._1))
    require(survivors.size >= before.size / 2,
      s"matched keys cluster in the bottom range — most files must survive " +
        s"by hard link (${survivors.size} of ${before.size})")
    require(survivors == before.filter(f => survivors.exists(_._1 == f._1)),
      "surviving files must keep their exact mtime and byte length")
    require(after.exists(f => f._1.startsWith("rw-")),
      "rewritten victims and inserts land as rw-* files")
    TableStore.read(spark, tbl).orderBy($"o_orderkey")
  }

  val sqlMergePrunedFlatSql: String =
    """WITH src AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice * 2.0 AS o_totalprice
      |  FROM orders
      |  WHERE o_orderkey * 8 <= (SELECT MAX(o_orderkey) FROM orders)
      |  UNION ALL
      |  SELECT o_orderkey + 60000000, o_custkey, o_totalprice
      |  FROM orders WHERE o_orderkey % 23 = 1),
      |kept AS (
      |  SELECT t.o_orderkey, t.o_custkey,
      |    CASE WHEN s.o_orderkey IS NOT NULL AND NOT (s.o_custkey % 2 = 0)
      |         THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice
      |  FROM orders t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
      |  WHERE s.o_orderkey IS NULL OR NOT (s.o_custkey % 2 = 0)),
      |ins AS (
      |  SELECT s.o_orderkey, s.o_custkey, s.o_totalprice
      |  FROM src s LEFT JOIN orders t ON t.o_orderkey = s.o_orderkey
      |  WHERE t.o_orderkey IS NULL AND s.o_custkey % 3 = 0)
      |SELECT o_orderkey, o_custkey, o_totalprice FROM kept
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_totalprice FROM ins
      |ORDER BY o_orderkey""".stripMargin

  /** q269: `WHEN NOT MATCHED BY SOURCE` clauses (round-13 verdict
    * item 6) — the merge surface's third row class: TARGET-ONLY rows
    * (key absent from the source) take the first TRUE BY SOURCE clause
    * in order — here a conditional DELETE then an unconditional UPDATE
    * whose assignment is an expression over the stored row (`t` alias) —
    * while matched rows update from the source, all in ONE full-outer
    * clause plan and one swap. Oracle recomputes all three classes
    * relationally.
    */
  def sqlMergeBySource(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlMergeBs")
    deleteRecursive(run)
    val tbl = run.resolve("orders_tbl").toString
    orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .createOrReplaceTempView("v_sqlmbs_orders")
    TableStore.atomicWrite(spark, spark.table("v_sqlmbs_orders"), tbl)
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"""MERGE INTO graft_store.`$tbl`
         |USING (
         |  SELECT o_orderkey, o_custkey, o_totalprice * 3.0 AS o_totalprice
         |  FROM v_sqlmbs_orders WHERE o_orderkey % 4 = 0
         |)
         |ON KEYS (o_orderkey)
         |WHEN MATCHED THEN UPDATE SET (o_totalprice)
         |WHEN NOT MATCHED BY SOURCE AND t.o_custkey % 5 = 0 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET o_totalprice = t.o_totalprice + 1""".stripMargin))
      .head().getLong(0)
    require(n > 0, "by-source merge reported an empty table")
    TableStore.read(spark, tbl).orderBy($"o_orderkey")
  }

  val sqlMergeBySourceSql: String =
    """SELECT o_orderkey, o_custkey,
      |  CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice * 3.0
      |       ELSE o_totalprice + 1 END AS o_totalprice
      |FROM orders
      |WHERE o_orderkey % 4 = 0 OR NOT (o_custkey % 5 = 0)
      |ORDER BY o_orderkey""".stripMargin

  /** q270: INSERT column lists (round-13 verdict item 6b) — named →
    * positional mapping with typed-NULL fill for unmentioned columns: the
    * list's i-th name receives the source's i-th expression (here
    * deliberately out of table order), `o_custkey` is never named and
    * backfills as a typed null. The zero-rewrite commit contract of q263
    * still holds (one appended `ins-*` file, pre-existing files
    * byte-untouched — require-asserted). Oracle is the UNION ALL
    * recomputation with an explicit NULL.
    */
  def sqlInsertColumnList(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlInsCols")
    deleteRecursive(run)
    val tbl = run.resolve("orders_tbl").toString
    orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .createOrReplaceTempView("v_sqlinc_orders")
    TableStore.atomicWrite(spark, spark.table("v_sqlinc_orders"), tbl)
    def files() = new java.io.File(tbl).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).sortBy(_._1).toSeq
    val before = files()
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val n = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"INSERT INTO graft_store.`$tbl` (o_totalprice, o_orderkey) " +
        "SELECT o_totalprice + 5, o_orderkey + 70000000 " +
        "FROM v_sqlinc_orders WHERE o_orderkey % 31 = 2")).head().getLong(0)
    val after = files()
    require(after.filter(f => before.exists(_._1 == f._1)) == before,
      "INSERT must not touch any pre-existing data file")
    require(after.count(_._1.startsWith("ins-")) == 1,
      "a statement batch commits as ONE appended file (atomic rename)")
    val t = TableStore.read(spark, tbl)
    require(t.filter($"o_custkey".isNull).count() > 0,
      "the unmentioned column must backfill as NULL")
    require(n == TableStore.rowCountFromFooters(spark, tbl),
      "n_rows is the footer-derived post-insert count")
    t.orderBy($"o_orderkey")
  }

  val sqlInsertColumnListSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |UNION ALL
      |SELECT o_orderkey + 70000000 AS o_orderkey,
      |       CAST(NULL AS BIGINT) AS o_custkey,
      |       o_totalprice + 5 AS o_totalprice
      |FROM orders WHERE o_orderkey % 31 = 2
      |ORDER BY o_orderkey""".stripMargin

  /** q271: SQL OPTIMIZE on a flat table — the small-file maintenance
    * statement every long-lived ingest needs (incremental appends accrete
    * files whose listing/open overhead eventually dominates scan cost).
    * A 24-file table compacts to TARGET 2 FILES through the crash-safe
    * swap with `coalesce` (NO shuffle — compaction moves bytes, not
    * rows-across-keys); content is require-asserted unchanged (the
    * statement's n_rows equals the pre-statement footer count) and the
    * oracle is the identity recomputation.
    */
  def sqlOptimizeCompact(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlOpt")
    deleteRecursive(run)
    val tbl = run.resolve("orders_flat").toString
    orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .repartition(24).write.mode("overwrite").parquet(tbl)
    val nBefore = TableStore.rowCountFromFooters(spark, tbl)
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val out = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"OPTIMIZE graft_store.`$tbl` TARGET 2 FILES")).head()
    require(out.getLong(0) == 24L, s"fixture wrote 24 files, saw ${out.getLong(0)}")
    require(out.getLong(1) <= 2L && out.getLong(1) >= 1L,
      s"OPTIMIZE must land at most the TARGET file count, got ${out.getLong(1)}")
    require(out.getLong(2) == nBefore,
      "OPTIMIZE changes layout, never content (footer count must not move)")
    TableStore.read(spark, tbl)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val sqlOptimizeCompactSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** q272: SQL OPTIMIZE with WHERE on a partitioned table — per-LEAF
    * compaction under partition pruning: only the leaves holding a
    * predicate-TRUE row are read and rewritten (to ONE file each); every
    * other leaf keeps its exact (path, mtime, length) listing,
    * require-asserted inside the graded query. At 100 TB this is the
    * nightly "compact yesterday's partition" pass: cost is the victim
    * leaves, not the table.
    */
  def sqlOptimizePartitioned(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlOptPart")
    deleteRecursive(run)
    val tbl = run.resolve("orders_part").toString
    TableStore.atomicWritePartitioned(spark,
      orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice",
        $"o_orderpriority").repartition(8),
      tbl, Seq("o_orderpriority"))
    def leaves(keep: String => Boolean): Seq[(String, Long, Long)] =
      new java.io.File(tbl).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("o_orderpriority="))
        .filter(d => keep(d.getName))
        .flatMap(_.listFiles().map(f => (f.getPath, f.lastModified(), f.length())))
        .sortBy(_._1).toSeq
    require(leaves(_.contains("1-URGENT")).size > 1, "victim leaf must be fragmented")
    val untouchedBefore = leaves(n => !n.contains("1-URGENT"))
    require(untouchedBefore.nonEmpty, "fixture needs untouched leaves")
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"OPTIMIZE graft_store.`$tbl` WHERE o_orderpriority = '1-URGENT'")).head()
    require(leaves(n => !n.contains("1-URGENT")) == untouchedBefore,
      "a leaf outside 1-URGENT was touched — partition pruning did not engage")
    require(leaves(_.contains("1-URGENT")).count(_._1.endsWith(".parquet")) == 1,
      "the victim leaf must compact to ONE file")
    require(TableStore.detectPartitionColumns(spark, tbl) == Seq("o_orderpriority"),
      "OPTIMIZE must not flatten the layout")
    TableStore.read(spark, tbl)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderpriority")
      .orderBy($"o_orderkey")
  }

  val sqlOptimizePartitionedSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** q273: SQL OPTIMIZE ZORDER BY — data-layout clustering for scan
    * pruning on TWO dimensions at once. The fixture scatters orders so
    * every file spans the whole (o_custkey, o_totalprice) range (no
    * file-level min/max can prune anything); the statement bucketizes
    * each dimension to 2^16 rank buckets off one min/max aggregate,
    * Morton-interleaves, and range-partitions on the key — after which a
    * band predicate on EITHER column overlaps a require-asserted
    * fraction of the files (measured from real per-file min/max, the
    * same statistics parquet pruning uses). Output is the band query
    * itself vs the oracle.
    */
  def sqlOptimizeZorder(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlOptZ")
    deleteRecursive(run)
    val tbl = run.resolve("orders_z").toString
    orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .repartition(16).write.mode("overwrite").parquet(tbl)
    def overlapping(c: String, lo: Double, hi: Double): Long =
      spark.read.parquet(tbl)
        .groupBy(col("_metadata.file_path"))
        .agg(min(col(c).cast("double")).as("lo"), max(col(c).cast("double")).as("hi"))
        .where($"lo" <= hi && $"hi" >= lo).count()
    // a 10%-quantile band per dimension: SF-independent, and far enough
    // from the z-octant boundaries that range-sampling jitter (the
    // repartitionByRange reservoir is randomized) cannot flip the assert
    val Array(xLo, xHi) = spark.read.parquet(tbl)
      .stat.approxQuantile("o_custkey", Array(0.05, 0.15), 0.001)
    val Array(yLo, yHi) = spark.read.parquet(tbl)
      .stat.approxQuantile("o_totalprice", Array(0.05, 0.15), 0.001)
    require(overlapping("o_custkey", xLo, xHi) >= 12,
      "scattered fixture: nearly all 16 files must overlap the x band")
    require(overlapping("o_totalprice", yLo, yHi) >= 12,
      "scattered fixture: nearly all 16 files must overlap the y band")
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val out = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"OPTIMIZE graft_store.`$tbl` ZORDER BY (o_custkey, o_totalprice) " +
        "TARGET 64 FILES")).head()
    require(out.getLong(1) >= 32L, "clustering must keep many files to mean anything")
    val files = out.getLong(1)
    require(overlapping("o_custkey", xLo, xHi) <= (files * 2) / 5,
      s"a 10% x band must overlap well under half the files after zorder " +
        s"(${overlapping("o_custkey", xLo, xHi)} of $files)")
    require(overlapping("o_totalprice", yLo, yHi) <= (files * 2) / 5,
      s"the SECOND dimension must prune too — that is the point of zorder " +
        s"(${overlapping("o_totalprice", yLo, yHi)} of $files)")
    TableStore.read(spark, tbl)
      .filter($"o_custkey".between(100, 400))
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val sqlOptimizeZorderSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_custkey BETWEEN 100 AND 400
      |ORDER BY o_orderkey""".stripMargin

  /** q274: SQL VACUUM over the versioned store — retention from pure SQL
    * text: three snapshots, `KEEP 1` deletes the two non-current ones
    * (require-asserted on disk), the survivor stays readable both live
    * and via `VERSION AS OF`, and a read of a vacuumed version fails
    * loudly. Output is the live (v3) table; the oracle recomputes both
    * upserts relationally.
    */
  def sqlVacuum(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    import graft.store.VersionedTable
    val run = mergeRoot.resolve("runSqlVac")
    deleteRecursive(run)
    val tbl = run.resolve("orders_v").toString
    val base = orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    require(VersionedTable.writeSnapshot(spark, base, tbl) == 1)
    require(VersionedTable.upsert(spark, tbl,
      base.filter($"o_orderkey" % 10 === 0)
        .withColumn("o_totalprice", $"o_totalprice" * 2.0), Seq("o_orderkey")) == 2)
    require(VersionedTable.upsert(spark, tbl,
      VersionedTable.read(spark, tbl).filter($"o_orderkey" % 7 === 0)
        .withColumn("o_totalprice", $"o_totalprice" + 1.0), Seq("o_orderkey")) == 3)
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    val out = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"VACUUM graft_store.`$tbl` KEEP 1")).head()
    require(out.getLong(0) == 3L && out.getLong(1) == 1L && out.getLong(2) == 3L,
      s"(versions_before, versions_after, current) = $out")
    require(VersionedTable.versions(spark, tbl) == Seq(3),
      "v1 and v2 must be deleted on disk")
    require(!new java.io.File(s"$tbl/v=1").exists(), "v1 dir must be gone")
    val pinned = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"SELECT count(*) AS n FROM graft_store.`$tbl` VERSION AS OF 3")).head().getLong(0)
    require(pinned == base.count(), "the survivor stays SQL-readable by version")
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"SELECT o_orderkey, o_custkey, o_totalprice FROM graft_store.`$tbl` " +
        "ORDER BY o_orderkey"))
  }

  val sqlVacuumSql: String =
    """WITH v2 AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2.0
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders)
      |SELECT o_orderkey, o_custkey,
      |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
      |       ELSE o_totalprice END AS o_totalprice
      |FROM v2
      |ORDER BY o_orderkey""".stripMargin

  /** q275: SQL CTAS + DROP — the table-lifecycle statements: CREATE
    * TABLE … PARTITIONED BY … AS SELECT lays the Hive layout down from
    * pure SQL (detectPartitionColumns require-asserted), a second plain
    * CREATE refuses the existing table, DROP TABLE removes it (and its
    * crash debris), and CREATE OR REPLACE swaps content atomically. The
    * final table is the OR REPLACE result vs the oracle's recomputation.
    */
  def sqlCtas(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlCtas")
    deleteRecursive(run)
    val tbl = run.resolve("orders_ctas").toString
    orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice",
      $"o_orderstatus").createOrReplaceTempView("v_sqlctas_orders")
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    def run1(sql: String) =
      org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql)).head()
    val n1 = run1(s"CREATE TABLE graft_store.`$tbl` PARTITIONED BY (o_orderstatus) AS " +
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus " +
      "FROM v_sqlctas_orders WHERE o_orderkey % 3 = 1").getLong(0)
    require(n1 > 0, "CTAS reported an empty table")
    require(TableStore.detectPartitionColumns(spark, tbl) == Seq("o_orderstatus"),
      "PARTITIONED BY must lay the Hive layout down")
    val refused = try { run1(s"CREATE TABLE graft_store.`$tbl` AS SELECT 1 AS x"); false }
    catch { case e: IllegalArgumentException => e.getMessage.contains("already exists") }
    require(refused, "plain CREATE must refuse an existing table")
    require(run1(s"DROP TABLE graft_store.`$tbl`").getLong(0) == 1L)
    require(!new java.io.File(tbl).exists(), "DROP must remove the directory")
    require(run1(s"DROP TABLE IF EXISTS graft_store.`$tbl`").getLong(0) == 0L,
      "IF EXISTS on a missing table is a counted no-op")
    val n2 = run1(s"CREATE TABLE graft_store.`$tbl` AS " +
      "SELECT o_orderkey, o_custkey, o_totalprice " +
      "FROM v_sqlctas_orders WHERE o_orderkey % 3 = 2").getLong(0)
    val n3 = run1(s"CREATE OR REPLACE TABLE graft_store.`$tbl` AS " +
      "SELECT o_orderkey, o_custkey, o_totalprice " +
      "FROM v_sqlctas_orders WHERE o_orderkey % 3 <> 1").getLong(0)
    require(n3 > n2, "OR REPLACE must swap in the new (larger) content")
    TableStore.read(spark, tbl)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val sqlCtasSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_orderkey % 3 <> 1
      |ORDER BY o_orderkey""".stripMargin

  /** q277: SQL SHOW PARTITIONS — the partition census of a TWO-LEVEL
    * layout from DIRECTORY LISTINGS alone: zero parquet files opened,
    * ZERO Spark jobs (require-asserted with a sentinel-drained job
    * listener inside the graded query — at 100 TB partition discovery
    * must never touch data). Output is one Hive-rendered
    * `col=val/col=val` row per leaf, hash-matched against the oracle's
    * DISTINCT recomputation from the data itself.
    */
  def sqlShowPartitions(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlShowP")
    deleteRecursive(run)
    val tbl = run.resolve("orders_2l").toString
    TableStore.atomicWritePartitioned(spark,
      orders(spark, dir).select($"o_orderkey", $"o_totalprice",
        $"o_orderpriority", $"o_orderstatus"),
      tbl, Seq("o_orderpriority", "o_orderstatus"))
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    @volatile var sentinelSeen = false
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .map(_.getProperty("spark.job.description")).orNull
        if (desc == "graft-q277-sentinel") sentinelSeen = true
        else jobs.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(l)
    val rows =
      try {
        val r = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
          s"SHOW PARTITIONS graft_store.`$tbl`")).collect().map(_.getString(0)).toSeq
        spark.sparkContext.setJobDescription("graft-q277-sentinel")
        try spark.range(1).count() finally spark.sparkContext.setJobDescription(null)
        val deadline = System.currentTimeMillis() + 20000
        while (!sentinelSeen && System.currentTimeMillis() < deadline) Thread.sleep(10)
        require(sentinelSeen, "listener bus did not drain")
        require(jobs.get() == 0,
          s"SHOW PARTITIONS must launch ZERO Spark jobs, saw ${jobs.get()}")
        r
      } finally spark.sparkContext.removeSparkListener(l)
    require(rows.nonEmpty && rows == rows.sorted, "sorted leaf census")
    spark.createDataset(rows).toDF("partition").orderBy($"partition")
  }

  val sqlShowPartitionsSql: String =
    """SELECT DISTINCT 'o_orderpriority=' || o_orderpriority ||
      |  '/o_orderstatus=' || o_orderstatus AS partition
      |FROM orders
      |ORDER BY partition""".stripMargin

  /** q278: SQL ALTER TABLE — column evolution over a partitioned table
    * from pure SQL text, completing the DDL statement family: ADD COLUMN
    * with a COMPUTED default (evaluated per row over the existing
    * columns), RENAME COLUMN, DROP COLUMN — each an eager rewrite through
    * the crash-safe swap with the Hive layout require-asserted intact
    * after every step, and the partition column protected (dropping it
    * refuses, require-asserted). Oracle recomputes the final shape
    * relationally.
    */
  def sqlAlterTable(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlAlter")
    deleteRecursive(run)
    val tbl = run.resolve("orders_tbl").toString
    TableStore.atomicWritePartitioned(spark,
      orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice",
        $"o_orderstatus"),
      tbl, Seq("o_orderstatus"))
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    def run1(sql: String) =
      org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql)).head()
    val n = run1(s"ALTER TABLE graft_store.`$tbl` ADD COLUMN price_bucket BIGINT " +
      "DEFAULT CAST(FLOOR(o_totalprice / 1000) AS BIGINT)").getLong(0)
    require(n > 0, "ALTER reported an empty table")
    require(TableStore.detectPartitionColumns(spark, tbl) == Seq("o_orderstatus"),
      "ADD COLUMN must preserve the layout")
    run1(s"ALTER TABLE graft_store.`$tbl` RENAME COLUMN o_custkey TO cust_id")
    run1(s"ALTER TABLE graft_store.`$tbl` DROP COLUMN o_totalprice")
    require(TableStore.detectPartitionColumns(spark, tbl) == Seq("o_orderstatus"),
      "the layout must survive the whole ALTER chain")
    val refused = try {
      run1(s"ALTER TABLE graft_store.`$tbl` DROP COLUMN o_orderstatus"); false
    } catch { case e: IllegalArgumentException => e.getMessage.contains("partition column") }
    require(refused, "dropping the partition column must refuse")
    TableStore.read(spark, tbl)
      .select($"o_orderkey", $"cust_id", $"price_bucket", $"o_orderstatus")
      .orderBy($"o_orderkey")
  }

  val sqlAlterTableSql: String =
    """SELECT o_orderkey, o_custkey AS cust_id,
      |  CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_bucket,
      |  o_orderstatus
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** q279: CHECK constraints — declared from SQL, enforced per-row on
    * every write funnel for FREE (the guard folds into the write's own
    * codegen: no extra pass, no extra job; `ADD CONSTRAINT`'s one
    * validation scan is the only non-free moment). The graded chain:
    * declare → violating INSERT and UPDATE both abort with the
    * constraint's name and the offending row, table require-asserted
    * byte-intact after each refusal → valid statements flow → DROP
    * CONSTRAINT disarms and the previously-refused row lands. Oracle
    * recomputes the surviving mutations relationally.
    */
  def sqlCheckConstraints(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlCheck")
    deleteRecursive(run)
    val tbl = run.resolve("orders_tbl").toString
    orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .coalesce(2).write.mode("overwrite").parquet(tbl)
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    def run1(sql: String) =
      org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql)).head()
    def files() = new java.io.File(tbl).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).sortBy(_._1).toSeq
    def refused(sql: String): Boolean = try { run1(sql); false } catch {
      case t: Throwable =>
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .exists(e => Option(e.getMessage).exists(_.contains("price_pos")))
    }
    run1(s"ALTER TABLE graft_store.`$tbl` ADD CONSTRAINT price_pos " +
      "CHECK (o_totalprice > 0)")
    val before = files()
    require(refused(s"INSERT INTO graft_store.`$tbl` VALUES (90000001, 1, -5.0)"),
      "a violating INSERT must abort naming the constraint")
    require(files() == before, "the refused INSERT must leave the table byte-intact")
    run1(s"UPDATE graft_store.`$tbl` SET o_totalprice = o_totalprice + 10 " +
      "WHERE o_orderkey % 17 = 3")
    require(refused(s"UPDATE graft_store.`$tbl` SET o_totalprice = -1 " +
      "WHERE o_orderkey % 13 = 0"), "a violating UPDATE must abort")
    val after = files()
    run1(s"INSERT INTO graft_store.`$tbl` " +
      "SELECT o_orderkey + 80000000, o_custkey, o_totalprice + 1 " +
      s"FROM graft_store.`$tbl` WHERE o_orderkey % 41 = 7 AND o_orderkey < 80000000")
    require(files().filter(f => after.exists(_._1 == f._1)) == after,
      "the refused UPDATE must leave every file byte-intact")
    run1(s"ALTER TABLE graft_store.`$tbl` DROP CONSTRAINT price_pos")
    run1(s"INSERT INTO graft_store.`$tbl` VALUES (99999999, 1, -42.0)") // disarmed
    TableStore.read(spark, tbl)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val sqlCheckConstraintsSql: String =
    """WITH upd AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 17 = 3 THEN o_totalprice + 10
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders)
      |SELECT o_orderkey, o_custkey, o_totalprice FROM upd
      |UNION ALL
      |SELECT o_orderkey + 80000000 AS o_orderkey, o_custkey,
      |       o_totalprice + 1 AS o_totalprice
      |FROM upd WHERE o_orderkey % 41 = 7
      |UNION ALL
      |SELECT 99999999 AS o_orderkey, 1 AS o_custkey,
      |       CAST(-42.0 AS DOUBLE) AS o_totalprice
      |ORDER BY o_orderkey""".stripMargin

  /** q280: SQL COPY INTO — exactly-once bulk file ingest, the statement
    * a landing-zone pipeline reruns on a schedule. Each source file
    * loads EXACTLY ONCE (identity = path+length+mtime in a ledger
    * sidecar; the batch's deterministic file name makes the single
    * visible rename the commit point, so a crash between rename and
    * ledger reconciles instead of duplicating). The graded chain:
    * 3-file CSV landing zone → COPY loads all (files_loaded
    * require-asserted) → a RERUN loads NOTHING → one late-arriving file
    * → COPY loads only it, pre-existing table files byte-untouched. The
    * parse is SCHEMA-PINNED by the target (no inference). Oracle
    * recomputes the landed set relationally.
    */
  def sqlCopyInto(spark: SparkSession, dir: String): DataFrame = mergeRoot.synchronized {
    import spark.implicits._
    val run = mergeRoot.resolve("runSqlCopy")
    deleteRecursive(run)
    val src = run.resolve("landing").toString
    val base = orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    base.repartition(3).write.option("header", "true").csv(src)
    val tbl = run.resolve("orders_tbl").toString
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    def run1(sql: String) =
      org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql)).head()
    base.limit(0).createOrReplaceTempView("v_sqlcopy_schema")
    run1(s"CREATE TABLE graft_store.`$tbl` AS SELECT * FROM v_sqlcopy_schema")
    val n = base.count()
    val r1 = run1(s"COPY INTO graft_store.`$tbl` FROM '$src' FORMAT CSV")
    require(r1.getLong(0) == 3L && r1.getLong(1) == n && r1.getLong(2) == n,
      s"first COPY must load all 3 files, $n rows: $r1")
    val r2 = run1(s"COPY INTO graft_store.`$tbl` FROM '$src' FORMAT CSV")
    require(r2.getLong(0) == 0L && r2.getLong(1) == 0L && r2.getLong(2) == n,
      s"a RERUN must load nothing: $r2")
    def files() = new java.io.File(tbl).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).sortBy(_._1).toSeq
    val before = files()
    // one late-arriving file lands in the zone
    val late = run.resolve("late").toString
    base.filter($"o_orderkey" % 29 === 5)
      .select(($"o_orderkey" + 90000000).as("o_orderkey"), $"o_custkey",
        ($"o_totalprice" + 7).as("o_totalprice"))
      .coalesce(1).write.option("header", "true").csv(late)
    val part = new java.io.File(late).listFiles().filter(_.getName.endsWith(".csv"))
    require(part.length == 1)
    java.nio.file.Files.move(part.head.toPath,
      java.nio.file.Paths.get(src, "late-arrival.csv"))
    val r3 = run1(s"COPY INTO graft_store.`$tbl` FROM '$src' FORMAT CSV")
    require(r3.getLong(0) == 1L, s"only the late file may load: $r3")
    require(files().filter(f => before.exists(_._1 == f._1)) == before,
      "COPY must never touch a pre-existing table file")
    TableStore.read(spark, tbl)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  val sqlCopyIntoSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |UNION ALL
      |SELECT o_orderkey + 90000000 AS o_orderkey, o_custkey,
      |       o_totalprice + 7 AS o_totalprice
      |FROM orders WHERE o_orderkey % 29 = 5
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q280_sql_copy_into" -> sqlCopyInto,
    "q279_sql_check_constraints" -> sqlCheckConstraints,
    "q277_sql_show_partitions" -> sqlShowPartitions,
    "q278_sql_alter_table" -> sqlAlterTable,
    "q269_sql_merge_by_source" -> sqlMergeBySource,
    "q270_sql_insert_column_list" -> sqlInsertColumnList,
    "q271_sql_optimize" -> sqlOptimizeCompact,
    "q272_sql_optimize_partitioned" -> sqlOptimizePartitioned,
    "q273_sql_optimize_zorder" -> sqlOptimizeZorder,
    "q274_sql_vacuum" -> sqlVacuum,
    "q275_sql_ctas" -> sqlCtas,
    "q268_sql_merge_pruned_flat" -> sqlMergePrunedFlat,
    "q267_sql_update_mor" -> sqlUpdateMor,
    "q266_sql_time_travel" -> sqlTimeTravel,
    "q264_sql_delete_two_level" -> sqlDeleteTwoLevel,
    "q265_sql_merge_two_level" -> sqlMergeTwoLevel,
    "q262_sql_merge_mor" -> sqlMergeMor,
    "q263_sql_insert" -> sqlInsert,
    "q260_sql_select_mor" -> sqlSelectMor,
    "q256_sql_delete_partitioned" -> sqlDeletePartitioned,
    "q257_sql_update_partitioned" -> sqlUpdatePartitioned,
    "q258_sql_merge_conditional" -> sqlMergeConditional,
    "q259_sql_delete_mor" -> sqlDeleteMor,
    "q240_dv_delete" -> dvDelete,
    "q241_mor_upsert" -> morUpsert,
    "q252_dv_range_delete" -> dvRangeDelete,
    "q183_evolve_upsert_partitioned" -> evolveUpsertPartitioned,
    "q181_cdc_apply_partitioned" -> cdcApplyPartitioned,
    "q180_partitioned_delete" -> partitionedDelete,
    "q174_cdc_apply"     -> cdcApply,
    "q173_corrupt_records" -> corruptRecords,
    "q171_jsonl_roundtrip" -> jsonlRoundtrip,
    "q194_xml_roundtrip"   -> xmlRoundtrip,
    "q205_incremental_view" -> incrementalViewMaintenance,
    "q207_dynamic_overwrite" -> dynamicOverwrite,
    "q221_multi_publish" -> multiPublish,
    "q228_writer_fence" -> writerFence,
    "q233_reader_pin" -> readerPin,
    "q160_cascade_delete" -> cascadeDelete,
    "q156_orc_roundtrip" -> orcRoundtrip,
    "q25_upsert_merge" -> upsertMerge,
    "q231_sql_merge" -> sqlMerge,
    "q250_sql_merge_delete" -> sqlMergeDelete,
    "q253_sql_delete" -> sqlDelete,
    "q254_sql_update" -> sqlUpdate,
    "q113_scd2" -> scd2,
    "q118_golden_record" -> goldenRecord,
    "q96_upsert_changelog" -> upsertChangelog,
    "q97_time_travel"  -> timeTravel,
    "q101_incremental_agg" -> incrementalAgg,
    "q102_snapshot_diff" -> snapshotDiff,
    "q103_cdc_agg" -> cdcAgg,
  )

  val oracles: Map[String, String] = Map(
    "q269_sql_merge_by_source" -> sqlMergeBySourceSql,
    "q270_sql_insert_column_list" -> sqlInsertColumnListSql,
    "q280_sql_copy_into" -> sqlCopyIntoSql,
    "q279_sql_check_constraints" -> sqlCheckConstraintsSql,
    "q277_sql_show_partitions" -> sqlShowPartitionsSql,
    "q278_sql_alter_table" -> sqlAlterTableSql,
    "q271_sql_optimize" -> sqlOptimizeCompactSql,
    "q272_sql_optimize_partitioned" -> sqlOptimizePartitionedSql,
    "q273_sql_optimize_zorder" -> sqlOptimizeZorderSql,
    "q274_sql_vacuum" -> sqlVacuumSql,
    "q275_sql_ctas" -> sqlCtasSql,
    "q268_sql_merge_pruned_flat" -> sqlMergePrunedFlatSql,
    "q267_sql_update_mor" -> sqlUpdateMorSql,
    "q266_sql_time_travel" -> sqlTimeTravelSql,
    "q264_sql_delete_two_level" -> sqlDeleteTwoLevelSql,
    "q265_sql_merge_two_level" -> sqlMergeTwoLevelSql,
    "q262_sql_merge_mor" -> sqlMergeMorSql,
    "q263_sql_insert" -> sqlInsertSql,
    "q260_sql_select_mor" -> sqlSelectMorSql,
    "q256_sql_delete_partitioned" -> sqlDeletePartitionedSql,
    "q257_sql_update_partitioned" -> sqlUpdatePartitionedSql,
    "q258_sql_merge_conditional" -> sqlMergeConditionalSql,
    "q259_sql_delete_mor" -> sqlDeleteMorSql,
    "q240_dv_delete" -> dvDeleteSql,
    "q241_mor_upsert" -> morUpsertSql,
    "q252_dv_range_delete" -> dvRangeDeleteSql,
    "q183_evolve_upsert_partitioned" -> evolveUpsertPartitionedSql,
    "q181_cdc_apply_partitioned" -> cdcApplyPartitionedSql,
    "q180_partitioned_delete" -> partitionedDeleteSql,
    "q174_cdc_apply"     -> cdcApplySql,
    "q173_corrupt_records" -> corruptRecordsSql,
    "q171_jsonl_roundtrip" -> jsonlRoundtripSql,
    "q194_xml_roundtrip"   -> xmlRoundtripSql,
    "q205_incremental_view" -> incrementalViewMaintenanceSql,
    "q207_dynamic_overwrite" -> dynamicOverwriteSql,
    "q221_multi_publish" -> multiPublishSql,
    "q228_writer_fence" -> writerFenceSql,
    "q233_reader_pin" -> readerPinSql,
    "q160_cascade_delete" -> cascadeDeleteSql,
    "q156_orc_roundtrip" -> orcRoundtripSql,
    "q25_upsert_merge" -> upsertMergeSql,
    "q231_sql_merge" -> upsertMergeSql, // same oracle on purpose: the SQL
    // surface must produce byte-identical post-merge state to the library
    "q250_sql_merge_delete" -> sqlMergeDeleteSql,
    "q253_sql_delete" -> sqlDeleteSql,
    "q254_sql_update" -> sqlUpdateSql,
    "q113_scd2" -> scd2Sql,
    "q118_golden_record" -> goldenRecordSql,
    "q96_upsert_changelog" -> upsertChangelogSql,
    "q97_time_travel"  -> timeTravelSql,
    "q101_incremental_agg" -> incrementalAggSql,
    "q102_snapshot_diff" -> snapshotDiffSql,
    "q103_cdc_agg" -> cdcAggSql,
  )
}
