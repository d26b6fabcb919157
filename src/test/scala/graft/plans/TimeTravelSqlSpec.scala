package graft.plans

import graft.SparkSuite
import graft.store.{ReaderPins, VersionedTable}
import java.nio.file.Files

/** SQL time travel over the versioned store ([[GraftStoreRead]], round-13
  * verdict item 2): `VERSION AS OF n` resolves snapshots, the bare
  * relation reads the LIVE version (not the union of every `v=N` dir a
  * raw scan would see), the rewrite statements refuse a versioned root,
  * and a pinned version stays readable through a vacuum.
  */
class TimeTravelSqlSpec extends SparkSuite {
  import spark.implicits._

  private def parser = new GraftSqlParser(spark.sessionState.sqlParser)

  private def runSql(sql: String) =
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql))

  /** v1 = {1,2,3}, v2 = v1 with k=2 updated + k=9 inserted. */
  private def mkVersioned(name: String): String = {
    val tbl = Files.createTempDirectory("sqltt").resolve(name).toString
    VersionedTable.writeSnapshot(spark,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"), tbl)
    VersionedTable.upsert(spark, tbl,
      Seq((2L, 222L), (9L, 90L)).toDF("k", "v"), Seq("k"))
    tbl
  }

  test("bare relation reads the LIVE version; VERSION AS OF pins a snapshot") {
    val tbl = mkVersioned("live")
    assert(runSql(s"SELECT k, v FROM graft_store.`$tbl` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 10L), (2L, 222L), (3L, 30L), (9L, 90L)))
    assert(runSql(s"SELECT k, v FROM graft_store.`$tbl` VERSION AS OF 1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // the live read follows a rollback (pointer semantics, not max-version)
    VersionedTable.rollback(spark, tbl, 1)
    assert(runSql(s"SELECT COUNT(*) AS n FROM graft_store.`$tbl`")
      .head().getLong(0) == 3L)
  }

  test("refusals: TIMESTAMP AS OF, non-versioned target, bad version, absent version") {
    val tbl = mkVersioned("refuse")
    val e1 = intercept[IllegalArgumentException](
      runSql(s"SELECT * FROM graft_store.`$tbl` TIMESTAMP AS OF '2026-01-01'"))
    assert(e1.getMessage.contains("VERSION AS OF"))
    val flat = Files.createTempDirectory("sqltt").resolve("flat").toString
    graft.store.TableStore.atomicWrite(spark, Seq((1L, 1L)).toDF("k", "v"), flat)
    val e2 = intercept[IllegalArgumentException](
      runSql(s"SELECT * FROM graft_store.`$flat` VERSION AS OF 1"))
    assert(e2.getMessage.contains("not a versioned table"))
    val e3 = intercept[IllegalArgumentException](
      runSql(s"SELECT * FROM graft_store.`$tbl` VERSION AS OF 'abc'"))
    assert(e3.getMessage.contains("integer snapshot number"))
    intercept[Exception](
      runSql(s"SELECT * FROM graft_store.`$tbl` VERSION AS OF 99").collect())
  }

  test("rewrite statements refuse a versioned root with the routing message") {
    val tbl = mkVersioned("dml")
    Seq((1L, 1L)).toDF("k", "v").createOrReplaceTempView("tt_src")
    val statements = Seq(
      s"DELETE FROM graft_store.`$tbl` WHERE k = 1",
      s"UPDATE graft_store.`$tbl` SET v = 0 WHERE k = 1",
      s"INSERT INTO graft_store.`$tbl` VALUES (4, 40)",
      s"MERGE INTO graft_store.`$tbl` USING tt_src ON KEYS (k)")
    statements.foreach { sql =>
      val e = intercept[IllegalArgumentException](runSql(sql).collect())
      assert(e.getMessage.contains("VERSIONED table"), s"$sql: ${e.getMessage}")
    }
    // nothing moved: v2 is intact, history intact
    assert(VersionedTable.currentVersion(spark, tbl).contains(2))
    assert(VersionedTable.readVersion(spark, tbl, 1).count() == 3)
  }

  test("a pinned version survives a vacuum and stays SQL-readable") {
    val tbl = mkVersioned("pin")
    VersionedTable.upsert(spark, tbl, Seq((5L, 50L)).toDF("k", "v"), Seq("k")) // v3
    ReaderPins.withPin(spark, tbl, 1, ttlMs = 60000L) {
      VersionedTable.vacuum(spark, tbl, keepLast = 1)
      // v2 (unpinned, not current) is gone; v1 (pinned) must still read
      assert(runSql(s"SELECT COUNT(*) AS n FROM graft_store.`$tbl` VERSION AS OF 1")
        .head().getLong(0) == 3L)
      intercept[Exception](
        runSql(s"SELECT * FROM graft_store.`$tbl` VERSION AS OF 2").collect())
    }
  }
}
