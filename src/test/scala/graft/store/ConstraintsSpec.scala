package graft.store

import graft.SparkSuite
import graft.operators.DeletionVectors
import java.nio.file.Files

/** CHECK constraints: declared via ALTER TABLE, enforced per-row on
  * EVERY write funnel (flat swap, partitioned stages, zero-rewrite
  * append, file-pruned rewrite, CDC appliers, deletion-vector delta and
  * compaction) with the pre-statement table intact after a violation.
  */
class ConstraintsSpec extends SparkSuite {
  import spark.implicits._

  private def parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)

  private def runSql(sql: String) =
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql))

  private def tmpDir(name: String): String =
    Files.createTempDirectory("constr").resolve(name).toString

  /** The raise_error surfaces from an executor wrapped arbitrarily deep —
    * walk the cause chain for the constraint name.
    */
  private def violates(frag: String)(body: => Unit): Unit = {
    val e = intercept[Throwable](body)
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains(frag), s"expected `$frag` in: $msgs")
  }

  private def mkTable(name: String): String = {
    val tbl = tmpDir(name)
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .coalesce(1).write.parquet(tbl)
    runSql(s"ALTER TABLE graft_store.`$tbl` ADD CONSTRAINT v_pos CHECK (v > 0)")
      .collect()
    tbl
  }

  test("ADD CONSTRAINT validates existing data; NULL passes; dup names refuse") {
    val tbl = tmpDir("addval")
    Seq((1L, Some(10L)), (2L, None), (3L, Some(-5L))).toDF("k", "v").write.parquet(tbl)
    val e = intercept[IllegalArgumentException] {
      runSql(s"ALTER TABLE graft_store.`$tbl` ADD CONSTRAINT v_pos CHECK (v > 0)").collect()
    }
    assert(e.getMessage.contains("1 existing rows violate"), e.getMessage)
    // NULL passes (standard CHECK): only the -5 row violates
    runSql(s"ALTER TABLE graft_store.`$tbl` ADD CONSTRAINT v_big CHECK (v > -100)").collect()
    val e2 = intercept[IllegalArgumentException] {
      runSql(s"ALTER TABLE graft_store.`$tbl` ADD CONSTRAINT v_big CHECK (v > 0)").collect()
    }
    assert(e2.getMessage.contains("already exists"))
  }

  test("every flat write funnel enforces: upsert, append, SQL INSERT/UPDATE/MERGE") {
    val tbl = mkTable("flatpaths")
    def content() = TableStore.read(spark, tbl).as[(Long, Long)].collect().sorted.toSeq
    val before = content()
    violates("v_pos") {
      TableStore.upsert(spark, tbl, Seq((2L, -1L)).toDF("k", "v"), Seq("k"))
    }
    assert(content() == before, "failed upsert must leave the table intact")
    violates("v_pos") {
      TableStore.appendRows(spark, tbl, Seq((9L, -9L)).toDF("k", "v"))
    }
    violates("v_pos") {
      runSql(s"INSERT INTO graft_store.`$tbl` VALUES (9, -9)").collect()
    }
    violates("v_pos") {
      runSql(s"UPDATE graft_store.`$tbl` SET v = v - 100 WHERE k = 1").collect()
    }
    violates("v_pos") {
      runSql(s"MERGE INTO graft_store.`$tbl` USING (SELECT 5 AS k, -5 AS v) " +
        "ON KEYS (k)").collect()
    }
    assert(content() == before, "no violating write may land")
    // valid writes still flow
    TableStore.upsert(spark, tbl, Seq((5L, 50L)).toDF("k", "v"), Seq("k"))
    runSql(s"INSERT INTO graft_store.`$tbl` VALUES (6, 60)").collect()
    assert(content().size == 5)
  }

  test("partitioned funnels enforce; constraint survives swaps, pruned rewrites, OPTIMIZE") {
    val tbl = tmpDir("partpaths")
    Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "v", "g")
      .write.partitionBy("g").parquet(tbl)
    runSql(s"ALTER TABLE graft_store.`$tbl` ADD CONSTRAINT v_pos CHECK (v > 0)").collect()
    violates("v_pos") {
      TableStore.upsertPartitioned(spark, tbl,
        Seq((3L, -3L, "a")).toDF("k", "v", "g"), Seq("k"), "g", None)
    }
    violates("v_pos") {
      TableStore.insertIntoPartitioned(spark, tbl,
        Seq((3L, -3L, "a")).toDF("k", "v", "g"), Seq("g"))
    }
    violates("v_pos") {
      TableStore.applyCdcPartitioned(spark, tbl,
        Seq(("U", 1L, -1L, "a")).toDF("op", "k", "v", "g"), Seq("k"), "g")
    }
    // a full-swap DELETE carries the declaration; the guard stays armed
    runSql(s"DELETE FROM graft_store.`$tbl` WHERE k = 2").collect()
    violates("v_pos") {
      runSql(s"INSERT INTO graft_store.`$tbl` VALUES (7, -7, 'a')").collect()
    }
    runSql(s"OPTIMIZE graft_store.`$tbl`").collect() // revalidates, passes
    violates("v_pos") {
      runSql(s"UPDATE graft_store.`$tbl` SET v = -9 WHERE k = 1").collect()
    }
    assert(Constraints.list(spark, tbl).map(_._1) == Seq("v_pos"),
      "declaration survives every rewrite protocol")
  }

  test("the deletion-vector tier enforces on delta appends and survives compaction") {
    val tbl = mkTable("morpaths")
    DeletionVectors.dvDelete(spark, tbl, Seq(3L).toDF("k"), "k") // deletes always fine
    violates("v_pos") {
      DeletionVectors.morUpsert(spark, tbl, Seq((1L, -1L)).toDF("k", "v"), "k")
    }
    violates("v_pos") {
      runSql(s"UPDATE graft_store.`$tbl` SET v = v - 100 WHERE k IN (1, 2)").collect()
    }
    DeletionVectors.morUpsert(spark, tbl, Seq((1L, 100L)).toDF("k", "v"), "k")
    runSql(s"OPTIMIZE graft_store.`$tbl`").collect() // hardening revalidates
    assert(DeletionVectors.dvRead(spark, tbl).as[(Long, Long)].collect().sorted
      === Array((1L, 100L), (2L, 20L)))
    assert(Constraints.list(spark, tbl).map(_._1) == Seq("v_pos"))
    // ADD CONSTRAINT on MoR validates the LIVE view only (k=3 is masked)
    runSql(s"ALTER TABLE graft_store.`$tbl` ADD CONSTRAINT v_cap CHECK (v <= 100)").collect()
  }

  test("DROP CONSTRAINT disarms; unknown names and checked-column ALTERs refuse") {
    val tbl = mkTable("dropc")
    val e = intercept[IllegalArgumentException] {
      runSql(s"ALTER TABLE graft_store.`$tbl` DROP CONSTRAINT nope").collect()
    }
    assert(e.getMessage.contains("no constraint"))
    val e2 = intercept[IllegalArgumentException] {
      runSql(s"ALTER TABLE graft_store.`$tbl` RENAME COLUMN v TO w").collect()
    }
    assert(e2.getMessage.contains("referenced by constraint"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      runSql(s"ALTER TABLE graft_store.`$tbl` DROP COLUMN v").collect()
    }
    assert(e3.getMessage.contains("referenced by constraint"))
    runSql(s"ALTER TABLE graft_store.`$tbl` DROP CONSTRAINT v_pos").collect()
    runSql(s"INSERT INTO graft_store.`$tbl` VALUES (9, -9)").collect() // disarmed
    runSql(s"ALTER TABLE graft_store.`$tbl` RENAME COLUMN v TO w").collect()
    assert(TableStore.read(spark, tbl).columns.toSeq == Seq("k", "w"))
  }

  test("CREATE OR REPLACE defines a new table: old constraints do not carry") {
    val tbl = mkTable("ctasclear")
    runSql(s"CREATE OR REPLACE TABLE graft_store.`$tbl` AS SELECT -1 AS neg").collect()
    assert(Constraints.list(spark, tbl).isEmpty)
    runSql(s"INSERT INTO graft_store.`$tbl` VALUES (-2)").collect()
    assert(TableStore.read(spark, tbl).count() == 2L)
  }

  test("multiple constraints enforce independently with their own names") {
    val tbl = mkTable("multi")
    runSql(s"ALTER TABLE graft_store.`$tbl` ADD CONSTRAINT v_cap CHECK (v < 1000)").collect()
    violates("v_pos") {
      runSql(s"INSERT INTO graft_store.`$tbl` VALUES (8, -1)").collect()
    }
    violates("v_cap") {
      runSql(s"INSERT INTO graft_store.`$tbl` VALUES (8, 5000)").collect()
    }
    runSql(s"INSERT INTO graft_store.`$tbl` VALUES (8, 500)").collect()
    assert(TableStore.read(spark, tbl).count() == 4L)
  }
}
