package graft.plans

import graft.SparkSuite
import graft.store.TableStore
import java.nio.file.Files

/** `WHEN NOT MATCHED BY SOURCE` clauses and INSERT column lists
  * (round-13 verdict item 6): the statement surface's remaining standard
  * shapes, plus the refusals that keep the grammar honest.
  */
class MergeBySourceSpec extends SparkSuite {
  import spark.implicits._

  private def parser = new GraftSqlParser(spark.sessionState.sqlParser)

  private def runSql(sql: String) =
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql))

  private def mkTable(name: String): String = {
    val tbl = Files.createTempDirectory("bysrc").resolve(name).toString
    TableStore.atomicWrite(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
        .toDF("k", "s", "v"), tbl)
    tbl
  }

  test("BY SOURCE clauses apply in order to target-only rows; matched rows unaffected") {
    val tbl = mkTable("order")
    Seq((1L, "A", 100L)).toDF("k", "s", "v").createOrReplaceTempView("bs_src1")
    runSql(
      s"""MERGE INTO graft_store.`$tbl` USING bs_src1 ON KEYS (k)
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED BY SOURCE AND t.k = 2 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = t.v * 10, s = upper(t.s)""".stripMargin)
      .collect()
    val rows = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // k=1 matched -> source values; k=2 target-only first clause -> deleted;
    // k=3,4 target-only second clause -> v*10 and uppercased (both
    // assignments read the OLD row)
    assert(rows == Seq((1L, "A", 100L), (3L, "C", 300L), (4L, "D", 400L)))
  }

  test("BY SOURCE on a partitioned table preserves the layout (full rewrite)") {
    val tbl = Files.createTempDirectory("bysrc").resolve("part").toString
    TableStore.atomicWritePartitioned(spark,
      Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "x", 30L)).toDF("k", "p", "v"),
      tbl, "p")
    Seq((1L, "x", 11L)).toDF("k", "p", "v").createOrReplaceTempView("bs_src2")
    runSql(
      s"""MERGE INTO graft_store.`$tbl` USING bs_src2 ON KEYS (k)
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin).collect()
    assert(TableStore.detectPartitionColumns(spark, tbl) == Seq("p"),
      "the layout must survive the BY SOURCE full rewrite")
    val rows = TableStore.read(spark, tbl).select($"k", $"v").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 11L)))
  }

  test("BY SOURCE refusals: clause order, key assignment, unknown column, MoR") {
    val tbl = mkTable("refuse")
    Seq((1L, "a", 1L)).toDF("k", "s", "v").createOrReplaceTempView("bs_src3")
    // unconditional BY SOURCE must be last among BY SOURCE clauses
    val e1 = intercept[IllegalArgumentException](parser.parsePlan(
      s"""MERGE INTO graft_store.`$tbl` USING bs_src3 ON KEYS (k)
         |WHEN NOT MATCHED BY SOURCE THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND t.k = 1 THEN DELETE""".stripMargin))
    assert(e1.getMessage.contains("unreachable"))
    // assigning a key refuses at run time
    val e2 = intercept[IllegalArgumentException](runSql(
      s"""MERGE INTO graft_store.`$tbl` USING bs_src3 ON KEYS (k)
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET k = t.k + 1""".stripMargin)
      .collect())
    assert(e2.getMessage.contains("key column"))
    // unknown assignment target refuses
    val e3 = intercept[IllegalArgumentException](runSql(
      s"""MERGE INTO graft_store.`$tbl` USING bs_src3 ON KEYS (k)
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET zz = 1""".stripMargin)
      .collect())
    assert(e3.getMessage.contains("unknown"))
    // a MoR target refuses BY SOURCE outright (not expressible as a delta)
    val mor = mkTable("mor")
    graft.operators.DeletionVectors.dvDelete(spark, mor, Seq(4L).toDF("k"), "k")
    val e4 = intercept[IllegalArgumentException](runSql(
      s"""MERGE INTO graft_store.`$mor` USING bs_src3 ON KEYS (k)
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin).collect())
    assert(e4.getMessage.contains("deletion-vector"))
  }

  test("INSERT column list: named-positional mapping with typed NULL fill") {
    val tbl = mkTable("inscols")
    // deliberately out of table order; s never named
    val n = runSql(s"INSERT INTO graft_store.`$tbl` (v, k) VALUES (500, 9)")
      .head().getLong(0)
    assert(n == 5L)
    val r = TableStore.read(spark, tbl).filter($"k" === 9L).head()
    assert(r.isNullAt(1) && r.getLong(2) == 500L)
  }

  test("INSERT column list refusals and the parenthesized-source shape") {
    val tbl = mkTable("insref")
    val e1 = intercept[IllegalArgumentException](
      runSql(s"INSERT INTO graft_store.`$tbl` (v, zz) VALUES (1, 2)").collect())
    assert(e1.getMessage.contains("unknown column"))
    val e2 = intercept[IllegalArgumentException](
      parser.parsePlan(s"INSERT INTO graft_store.`$tbl` (v, v) VALUES (1, 2)"))
    assert(e2.getMessage.contains("twice"))
    val e3 = intercept[IllegalArgumentException](
      runSql(s"INSERT INTO graft_store.`$tbl` (v, k) VALUES (1, 2, 3)").collect())
    assert(e3.getMessage.contains("names 2 columns"))
    // a parenthesized SELECT is a SOURCE, not a column list
    val n = runSql(s"INSERT INTO graft_store.`$tbl` (SELECT 9, 'z', 90)")
      .head().getLong(0)
    assert(n == 5L)
    assert(TableStore.read(spark, tbl).filter($"k" === 9L).head().getString(1) == "z")
  }
}
