package graft.plans

import graft.SparkSuite
import graft.store.TableStore
import java.nio.file.Files

/** The SQL read surface ([[GraftStoreRead]]): `graft_store.\`path\``
  * relations anywhere in a statement resolve to store read semantics —
  * recover-on-read, deletion-vector masking on merge-on-read tables —
  * closing the hole where a raw ``parquet.`path` `` SELECT silently
  * includes masked rows.
  */
class GraftStoreReadSpec extends SparkSuite {
  import spark.implicits._

  private def parser = new GraftSqlParser(spark.sessionState.sqlParser)

  private def runSql(sql: String) =
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql))

  private def mkTable(name: String): String = {
    val tbl = Files.createTempDirectory("sqlread").resolve(name).toString
    TableStore.atomicWrite(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v"), tbl)
    tbl
  }

  test("SELECT from a flat store table reads through TableStore semantics") {
    val tbl = mkTable("flat")
    val rows = runSql(s"SELECT k, v FROM graft_store.`$tbl` WHERE v > 10 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((2L, 20L), (3L, 30L)))
  }

  test("a masked merge-on-read table: graft_store SELECT hides masks; raw parquet does not") {
    val tbl = mkTable("mor")
    graft.operators.DeletionVectors.dvDelete(spark, tbl, Seq(2L).toDF("k"), "k")
    // the hole this surface closes: the raw path resurrects the masked row
    assert(spark.read.parquet(tbl).count() == 3)
    val rows = runSql(s"SELECT k FROM graft_store.`$tbl` ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L, 3L), "masked row must be invisible to SQL reads")
  }

  test("composes through CTEs, JOINs of two store tables, and IN subqueries") {
    val t1 = mkTable("j1")
    val t2 = mkTable("j2")
    graft.operators.DeletionVectors.dvDelete(spark, t2, Seq(3L).toDF("k"), "k")
    val joined = runSql(
      s"""WITH a AS (SELECT k, v FROM graft_store.`$t1`)
         |SELECT a.k, a.v + b.v AS vv
         |FROM a JOIN graft_store.`$t2` b ON a.k = b.k
         |ORDER BY a.k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(joined == Seq((1L, 20L), (2L, 40L)), "t2's masked k=3 must not join")
    Seq(1L, 3L).toDF("k").createOrReplaceTempView("sr_probe")
    val sub = runSql(
      s"SELECT k FROM sr_probe WHERE k IN (SELECT k FROM graft_store.`$t2`) ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(sub == Seq(1L), "subquery relations substitute too")
  }

  test("SELECT heals a table parked mid-swap (recover-on-read)") {
    val tbl = mkTable("heal")
    val f = new java.io.File(tbl)
    assert(f.renameTo(new java.io.File(tbl + "__old")), "simulate a crash mid-swap")
    val n = runSql(s"SELECT COUNT(*) AS n FROM graft_store.`$tbl`").head().getLong(0)
    assert(n == 3L, "recover-on-read must restore the parked version")
    assert(f.exists(), "the table directory is healed on disk")
  }

  test("the MERGE USING source reads graft_store tables with store semantics") {
    val src = mkTable("musrc")
    graft.operators.DeletionVectors.dvDelete(spark, src, Seq(1L).toDF("k"), "k")
    val dst = mkTable("mudst")
    runSql(
      s"""MERGE INTO graft_store.`$dst`
         |USING (SELECT k, s, v + 1000 AS v FROM graft_store.`$src`)
         |ON KEYS (k)""".stripMargin).collect()
    val rows = TableStore.read(spark, dst).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 10L), (2L, 1020L), (3L, 1030L)),
      "src's masked k=1 must not reach the merge")
  }

  test("statements without a graft_store relation pass through untouched") {
    val plan = parser.parsePlan("SELECT 1 AS one")
    assert(runSql("SELECT 1 AS one").head().getInt(0) == 1)
    assert(plan.getClass.getSimpleName.nonEmpty) // delegate path, no rewrite
  }
}
