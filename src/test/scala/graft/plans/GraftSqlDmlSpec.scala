package graft.plans

import graft.SparkSuite
import graft.store.TableStore
import java.nio.file.Files

/** The SQL DELETE/UPDATE surface ([[GraftSqlDml]] / [[GraftSqlParser]]):
  * standard DML semantics over the store — null predicates don't delete,
  * assignments are simultaneous against the old row, everything commits
  * in one atomic swap — with Spark's own parser validating every
  * embedded expression; non-graft_store statements delegate untouched.
  */
class GraftSqlDmlSpec extends SparkSuite {
  import spark.implicits._

  private def parser = new GraftSqlParser(spark.sessionState.sqlParser)

  private def runSql(sql: String) =
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql))

  private def mkTable(name: String): String = {
    val tbl = Files.createTempDirectory("sqldml").resolve(name).toString
    TableStore.atomicWrite(spark,
      Seq((1L, "a", Some(10L)), (2L, "b", None), (3L, "c", Some(30L)))
        .toDF("k", "s", "v"), tbl)
    tbl
  }

  test("DELETE WHERE removes exactly the TRUE rows; null predicate rows survive") {
    val tbl = mkTable("del")
    // v > 15 is TRUE for k=3, FALSE for k=1, NULL for k=2 — only k=3 dies
    val n = runSql(s"DELETE FROM graft_store.`$tbl` WHERE v > 15").head().getLong(0)
    assert(n == 2L)
    assert(TableStore.read(spark, tbl).orderBy("k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("unconditional DELETE empties the table but keeps the schema") {
    val tbl = mkTable("delall")
    assert(runSql(s"DELETE FROM graft_store.`$tbl`").head().getLong(0) == 0L)
    val t = TableStore.read(spark, tbl)
    assert(t.count() == 0 && t.columns.toSeq == Seq("k", "s", "v"))
  }

  test("UPDATE SET applies where TRUE only, simultaneous against the old row") {
    val tbl = mkTable("upd")
    // swap-ish: v reads old k, k reads old v — simultaneity is observable
    val n = runSql(
      s"UPDATE graft_store.`$tbl` SET v = k * 100, s = concat(s, '!') WHERE v >= 10")
      .head().getLong(0)
    assert(n == 3L, "UPDATE never changes the row count")
    val rows = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    // k=2's predicate is NULL -> untouched (v stays null)
    assert(rows == Seq((1L, "a!", 100L), (2L, "b", -1L), (3L, "c!", 300L)))
  }

  test("UPDATE assignments see OLD values even when assigning each other") {
    val tbl = mkTable("simul")
    runSql(s"UPDATE graft_store.`$tbl` SET k = v, v = k WHERE v IS NOT NULL").collect()
    val rows = TableStore.read(spark, tbl).orderBy("s")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(rows == Seq((10L, "a", 1L), (2L, "b", -1L), (30L, "c", 3L)))
  }

  test("malformed statements are refused at parse time with the graft prefix") {
    val e1 = intercept[IllegalArgumentException](
      parser.parsePlan("UPDATE graft_store.`/t` SET WHERE x > 1"))
    assert(e1.getMessage.contains("graft_store DML"))
    intercept[IllegalArgumentException](
      parser.parsePlan("UPDATE graft_store.`/t` SET k = 1, k = 2"))
    intercept[IllegalArgumentException](
      parser.parsePlan("DELETE FROM graft_store.`/t` WHERE "))
    // expression garbage is refused by SPARK's parser, at parse time
    intercept[Exception](
      parser.parsePlan("DELETE FROM graft_store.`/t` WHERE ) broken ("))
    // unknown SET column dies loudly at run time naming the column
    val tbl = mkTable("unknowncol")
    val e2 = intercept[IllegalArgumentException](
      runSql(s"UPDATE graft_store.`$tbl` SET nope = 1").collect())
    assert(e2.getMessage.contains("unknown column `nope`"))
  }

  test("WHERE keywords inside strings and subqueries do not split the statement") {
    val tbl = mkTable("quoted")
    runSql(s"UPDATE graft_store.`$tbl` SET s = 'WHERE , (' WHERE k = 1").collect()
    assert(TableStore.read(spark, tbl).where("k = 1").head().getString(1) == "WHERE , (")
    // double-quoted literals (Spark default lexing) and escaped quotes
    runSql(s"""UPDATE graft_store.`$tbl` SET s = "x WHERE y" WHERE k = 2""").collect()
    assert(TableStore.read(spark, tbl).where("k = 2").head().getString(1) == "x WHERE y")
    runSql(s"UPDATE graft_store.`$tbl` SET s = 'don\\'t , WHERE' WHERE k = 3").collect()
    assert(TableStore.read(spark, tbl).where("k = 3").head().getString(1) == "don't , WHERE")
    // SQL doubled-quote escape
    runSql(s"UPDATE graft_store.`$tbl` SET s = 'it''s, ok' WHERE k = 1").collect()
    assert(TableStore.read(spark, tbl).where("k = 1").head().getString(1) == "it's, ok")
  }

  test("SQL comments never re-arm top-level splitting") {
    val tbl = mkTable("cmt")
    // the comma inside the line comment must NOT start a second assignment
    // (it used to: 's = ...' after it was silently applied)
    runSql(s"UPDATE graft_store.`$tbl` SET v = 1 -- note, s = 'CLOBBERED'\nWHERE k = 1")
      .collect()
    val r1 = TableStore.read(spark, tbl).where("k = 1").head()
    assert(r1.getString(1) == "a" && r1.getLong(2) == 1L,
      "comment content must not become an assignment")
    // block comment carrying a comma and a WHERE keyword
    runSql(s"UPDATE graft_store.`$tbl` SET v = /* , WHERE */ 2 WHERE k = 2").collect()
    assert(TableStore.read(spark, tbl).where("k = 2").head().getLong(2) == 2L)
    // nested block comment (Spark's lexer nests bracketed comments)
    runSql(s"UPDATE graft_store.`$tbl` SET v = /* x /* y, */ z WHERE */ 3 WHERE k = 3")
      .collect()
    assert(TableStore.read(spark, tbl).where("k = 3").head().getLong(2) == 3L)
    // '--' inside a string literal is NOT a comment
    runSql(s"UPDATE graft_store.`$tbl` SET s = 'a--b', v = 9 WHERE k = 1").collect()
    val r2 = TableStore.read(spark, tbl).where("k = 1").head()
    assert(r2.getString(1) == "a--b" && r2.getLong(2) == 9L)
  }

  test("SET identifiers resolve case-insensitively like the rest of the statement") {
    val tbl = mkTable("casei")
    runSql(s"UPDATE graft_store.`$tbl` SET V = 777 WHERE K = 1").collect()
    assert(TableStore.read(spark, tbl).where("k = 1").head().getLong(2) == 777L)
  }

  test("a merge-on-read table refuses plain DML rewrites that would resurrect masked rows") {
    val tbl = mkTable("mor")
    // mask a row through the DV tier: the table is now merge-on-read
    graft.operators.DeletionVectors.dvDelete(spark, tbl,
      Seq(2L).toDF("k"), "k")
    assert(graft.operators.DeletionVectors.dvRead(spark, tbl).count() == 2)
    for (sql <- Seq(
      s"DELETE FROM graft_store.`$tbl` WHERE v > 0", // not key-membership-shaped
      s"DELETE FROM graft_store.`$tbl`",             // unconditional = table-scale
      s"UPDATE graft_store.`$tbl` SET v = 0",
      // a PARTIAL-column merge is not expressible as append+mask (the
      // default full-upsert shape routes to morUpsert instead — see
      // GraftSqlMergeSpec's routing tests)
      s"MERGE INTO graft_store.`$tbl` USING (SELECT CAST(1 AS BIGINT) AS k, 'z' AS s, CAST(0 AS BIGINT) AS v) ON KEYS (k) WHEN MATCHED THEN UPDATE SET (v) WHEN NOT MATCHED THEN INSERT *")) {
      val e = intercept[IllegalArgumentException](runSql(sql).collect())
      assert(e.getMessage.contains("merge-on-read") ||
        e.getMessage.contains("deletion-vector"), s"for: $sql")
    }
    // the masked row stayed masked, nothing was rewritten
    assert(graft.operators.DeletionVectors.dvRead(spark, tbl).count() == 2)
  }

  test("a key-membership DELETE on a merge-on-read table routes to dvDelete") {
    val tbl = mkTable("morroute")
    graft.operators.DeletionVectors.dvDelete(spark, tbl, Seq(2L).toDF("k"), "k")
    val mt = dataFileMtimes(tbl)
    // `k = 1 OR k IN (3)` is exactly a key-set mask: no data file touched
    val n = runSql(s"DELETE FROM graft_store.`$tbl` WHERE k = 1 OR k IN (3)")
      .head().getLong(0)
    assert(n == 0L, "all three rows are now masked; live count is footer-derived")
    assert(dataFileMtimes(tbl) == mt, "dv routing must not rewrite any data file")
    assert(graft.operators.DeletionVectors.dvRead(spark, tbl).count() == 0)
    // `col = NULL` is never TRUE: routes, masks nothing
    val tbl2 = mkTable("mornull")
    graft.operators.DeletionVectors.dvDelete(spark, tbl2, Seq(3L).toDF("k"), "k")
    assert(runSql(s"DELETE FROM graft_store.`$tbl2` WHERE k = NULL")
      .head().getLong(0) == 2L)
  }

  private def dataFileMtimes(path: String): Map[String, Long] = {
    val d = new java.io.File(path)
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("partitioned tables route DELETE/UPDATE through the pruned engines, layout intact") {
    val tbl = Files.createTempDirectory("sqldml").resolve("part").toString
    TableStore.atomicWritePartitioned(spark,
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 40L))
        .toDF("k", "g", "v"), tbl, "g")
    val untouched = new java.io.File(tbl, "g=c")
    val mtime = untouched.listFiles().map(_.lastModified()).max
    Thread.sleep(1100)
    // DELETE prunes to the victim partitions
    val n1 = runSql(s"DELETE FROM graft_store.`$tbl` WHERE v = 20").head().getLong(0)
    assert(n1 == 3L)
    assert(new java.io.File(tbl, "g=a").exists(), "partition layout must survive DML")
    assert(untouched.listFiles().map(_.lastModified()).max == mtime,
      "untouched partition files must not be rewritten by SQL DELETE")
    // UPDATE (not touching the partition column) prunes too
    runSql(s"UPDATE graft_store.`$tbl` SET v = v + 1 WHERE g = 'a'").collect()
    assert(untouched.listFiles().map(_.lastModified()).max == mtime,
      "untouched partition files must not be rewritten by SQL UPDATE")
    // NOTE: a partitioned read surfaces the partition column LAST — select
    assert(TableStore.read(spark, tbl).select("k", "g", "v").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 11L), (3L, "b", 30L), (4L, "c", 40L)))
    // UPDATE assigning the partition column: full rewrite, layout PRESERVED
    runSql(s"UPDATE graft_store.`$tbl` SET g = 'z' WHERE k = 3").collect()
    assert(new java.io.File(tbl, "g=z").exists(), "moved row lands in its new partition dir")
    assert(!new java.io.File(tbl, "g=b").exists(), "emptied partition dir is dropped")
    assert(TableStore.detectPartitionColumn(spark, tbl).contains("g"))
    assert(TableStore.read(spark, tbl).select("k", "g").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (3L, "z"), (4L, "c")))
  }

  test("partitioned MERGE routes through the partitioned engines, layout intact") {
    val tbl = Files.createTempDirectory("sqldml").resolve("pmerge").toString
    TableStore.atomicWritePartitioned(spark,
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 40L))
        .toDF("k", "g", "v"), tbl, "g")
    val untouched = new java.io.File(tbl, "g=c")
    val mtime = untouched.listFiles().map(_.lastModified()).max
    Thread.sleep(1100)
    import spark.implicits._
    Seq((2L, "a", 200L), (9L, "b", 90L)).toDF("k", "g", "v")
      .createOrReplaceTempView("pm_src")
    val n = runSql(
      s"""MERGE INTO graft_store.`$tbl` USING pm_src ON KEYS (k)
         |WHEN MATCHED THEN UPDATE SET (v)
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head().getLong(0)
    assert(n == 5L)
    assert(untouched.listFiles().map(_.lastModified()).max == mtime,
      "untouched partition files must not be rewritten by SQL MERGE")
    assert(TableStore.detectPartitionColumn(spark, tbl).contains("g"))
    assert(TableStore.read(spark, tbl).select("k", "v").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 200L), (3L, 30L), (4L, 40L), (9L, 90L)))
    // conditional clause engine, partitioned: prunes by matched-key residency
    Thread.sleep(1100)
    val mtime2 = untouched.listFiles().map(_.lastModified()).max
    Seq((2L, "a", 0L)).toDF("k", "g", "v").createOrReplaceTempView("pm_src2")
    runSql(
      s"""MERGE INTO graft_store.`$tbl` USING pm_src2 ON KEYS (k)
         |WHEN MATCHED AND t.v >= 100 THEN DELETE""".stripMargin).collect()
    assert(untouched.listFiles().map(_.lastModified()).max == mtime2,
      "clause engine must prune untouched partitions")
    assert(TableStore.read(spark, tbl).where("k = 2").count() == 0)
  }

  test("INSERT INTO: positional mapping + cast, single-file atomic append on flat tables") {
    val tbl = mkTable("ins")
    val before = dataFileMtimes(tbl)
    // VALUES with int literals: positional mapping renames, casts to the
    // table's BIGINT/String/BIGINT types
    val n = runSql(s"INSERT INTO graft_store.`$tbl` VALUES (9, 'z', 90)").head().getLong(0)
    assert(n == 4L)
    val after = dataFileMtimes(tbl)
    assert(before.toSet.subsetOf(after.toSet), "pre-existing files untouched")
    assert(after.keySet.count(_.startsWith("ins-")) == 1, "one atomic appended file")
    val r = TableStore.read(spark, tbl).where("k = 9").head()
    assert(r.getString(1) == "z" && r.getLong(2) == 90L)
    // arity mismatch is loud
    val e = intercept[IllegalArgumentException](
      runSql(s"INSERT INTO graft_store.`$tbl` VALUES (1, 'x')").collect())
    assert(e.getMessage.contains("arity"))
    // column lists (round-13 verdict item 6): named→positional mapping,
    // the unmentioned column backfills as a typed NULL
    runSql(s"INSERT INTO graft_store.`$tbl` (k, s) VALUES (11, 'cl')").collect()
    val cl = TableStore.read(spark, tbl).where("k = 11").head()
    assert(cl.getString(1) == "cl" && cl.isNullAt(2))
    // missing table: created
    val fresh = Files.createTempDirectory("sqldml").resolve("insnew").toString
    runSql(s"INSERT INTO graft_store.`$fresh` SELECT k, s, v FROM graft_store.`$tbl`")
      .collect()
    assert(TableStore.read(spark, fresh).count() == 5L)
  }

  test("INSERT INTO a partitioned table rewrites only the receiving partitions") {
    val tbl = Files.createTempDirectory("sqldml").resolve("inspart").toString
    TableStore.atomicWritePartitioned(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "g", "v"), tbl, "g")
    val untouched = new java.io.File(tbl, "g=b")
    val mtime = untouched.listFiles().map(_.lastModified()).max
    Thread.sleep(1100)
    // positional mapping follows the table's READ order — a partitioned
    // layout surfaces the partition column LAST: (k, v, g)
    runSql(s"INSERT INTO graft_store.`$tbl` " +
      "SELECT CAST(3 AS BIGINT), CAST(30 AS BIGINT), 'a' " +
      "UNION ALL SELECT CAST(4 AS BIGINT), CAST(40 AS BIGINT), 'c'").collect()
    assert(untouched.listFiles().map(_.lastModified()).max == mtime,
      "partitions not receiving rows must stay untouched")
    assert(new java.io.File(tbl, "g=c").exists(), "new partition dir created")
    assert(TableStore.read(spark, tbl).select("k").orderBy("k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("INSERT INTO a merge-on-read table appends mor-* files; masks stay") {
    val tbl = mkTable("insmor")
    graft.operators.DeletionVectors.dvDelete(spark, tbl, Seq(2L).toDF("k"), "k")
    val before = dataFileMtimes(tbl)
    val n = runSql(s"INSERT INTO graft_store.`$tbl` VALUES (9, 'z', 90)").head().getLong(0)
    assert(n == 3L, "2 live + 1 inserted (k=2 stays masked)")
    val after = dataFileMtimes(tbl)
    assert(before.toSet.subsetOf(after.toSet))
    assert(after.keySet.exists(_.startsWith("mor-")),
      "MoR inserts land as mor-* files so compaction debt accounting sees them")
    assert(graft.operators.DeletionVectors.dvRead(spark, tbl)
      .orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L, 9L))
  }

  test("non-graft_store DML delegates to Spark's parser verbatim") {
    val plan = parser.parsePlan("DELETE FROM t WHERE x > 1")
    assert(plan.getClass.getSimpleName.contains("DeleteFromTable"))
    val plan2 = parser.parsePlan("UPDATE t SET x = 1")
    assert(plan2.getClass.getSimpleName.contains("UpdateTable"))
  }
}
