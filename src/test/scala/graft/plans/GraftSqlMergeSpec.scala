package graft.plans

import graft.SparkSuite
import graft.store.TableStore
import java.nio.file.Files

/** The SQL MERGE surface ([[GraftSqlMerge]] / [[GraftSqlParser]]): the
  * restricted grammar executes TableStore.upsert semantics exactly —
  * full update, partial update-column lists, bare-view and subquery
  * sources — and refuses what the upsert cannot honor; every other SQL
  * string delegates to Spark's parser untouched.
  */
class GraftSqlMergeSpec extends SparkSuite {
  import spark.implicits._

  private def parser = new GraftSqlParser(spark.sessionState.sqlParser)

  private def runSql(sql: String) =
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql))

  private def mkTable(name: String): String = {
    val tbl = Files.createTempDirectory("sqlmerge").resolve(name).toString
    TableStore.atomicWrite(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v"), tbl)
    tbl
  }

  test("full upsert (no WHEN clauses): matched rows fully updated, new rows inserted") {
    val tbl = mkTable("full")
    Seq((2L, "B", 200L), (9L, "z", 90L)).toDF("k", "s", "v")
      .createOrReplaceTempView("m_inc_full")
    val n = runSql(s"MERGE INTO graft_store.`$tbl` USING m_inc_full ON KEYS (k)")
      .head().getLong(0)
    assert(n == 4L)
    val rows = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "a", 10L), (2L, "B", 200L), (3L, "c", 30L), (9L, "z", 90L)))
  }

  test("partial update columns + subquery source: unlisted column stays stale on conflict") {
    val tbl = mkTable("partial")
    Seq((2L, "B", 200L), (9L, "z", 90L)).toDF("k", "s", "v")
      .createOrReplaceTempView("m_inc_part")
    runSql(
      s"""MERGE INTO graft_store.`$tbl`
         |USING (SELECT k, s, v FROM m_inc_part WHERE v > 0)
         |ON KEYS (k)
         |WHEN MATCHED THEN UPDATE SET (v)
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    val rows = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // k=2: v updated to 200, s stays 'b' (not in the update list); k=9 inserted whole
    assert(rows == Seq((1L, "a", 10L), (2L, "b", 200L), (3L, "c", 30L), (9L, "z", 90L)))
  }

  test("UPDATE SET * is the explicit full-update spelling") {
    val tbl = mkTable("star")
    Seq((3L, "C", 300L)).toDF("k", "s", "v").createOrReplaceTempView("m_inc_star")
    runSql(
      s"""MERGE INTO graft_store.`$tbl` USING m_inc_star ON KEYS (k)
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    val r3 = TableStore.read(spark, tbl).where("k = 3").head()
    assert(r3.getString(1) == "C" && r3.getLong(2) == 300L)
  }

  test("WHEN MATCHED THEN DELETE removes matched keys, leaves the rest") {
    val tbl = mkTable("del")
    Seq((1L, "ignored", 0L), (3L, "ignored", 0L), (7L, "no-match", 70L))
      .toDF("k", "s", "v").createOrReplaceTempView("m_inc_del")
    val n = runSql(
      s"""MERGE INTO graft_store.`$tbl` USING m_inc_del ON KEYS (k)
         |WHEN MATCHED THEN DELETE""".stripMargin).head().getLong(0)
    assert(n == 1L, "k=1 and k=3 deleted; k=7 matched nothing and is NOT inserted")
    val rows = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((2L, "b", 20L)))
  }

  test("DELETE + INSERT *: matched keys deleted, unmatched source rows inserted") {
    val tbl = mkTable("delins")
    Seq((2L, "ignored", 0L), (9L, "z", 90L)).toDF("k", "s", "v")
      .createOrReplaceTempView("m_inc_delins")
    val n = runSql(
      s"""MERGE INTO graft_store.`$tbl` USING m_inc_delins ON KEYS (k)
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head().getLong(0)
    assert(n == 3L)
    val rows = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "a", 10L), (3L, "c", 30L), (9L, "z", 90L)))
  }

  test("what the store cannot honor is refused at parse time") {
    // arbitrary ON condition (non-equi / expression matching)
    val e1 = intercept[IllegalArgumentException] {
      parser.parsePlan("MERGE INTO graft_store.`/t` USING v ON t.k > s.k")
    }
    assert(e1.getMessage.contains("ON KEYS"))
    // an unconditional matched clause followed by another matched clause:
    // the second is unreachable (first-TRUE-condition-wins order)
    val e2 = intercept[IllegalArgumentException] {
      parser.parsePlan(
        "MERGE INTO graft_store.`/t` USING v ON KEYS (k) " +
          "WHEN MATCHED THEN UPDATE SET * WHEN MATCHED THEN DELETE")
    }
    assert(e2.getMessage.contains("unreachable"))
    // INSERT with a column list is not the store's INSERT *
    val e3 = intercept[IllegalArgumentException] {
      parser.parsePlan(
        "MERGE INTO graft_store.`/t` USING v ON KEYS (k) " +
          "WHEN NOT MATCHED THEN INSERT (k, v)")
    }
    assert(e3.getMessage.contains("INSERT *"))
    // two NOT MATCHED clauses
    val e4 = intercept[IllegalArgumentException] {
      parser.parsePlan(
        "MERGE INTO graft_store.`/t` USING v ON KEYS (k) " +
          "WHEN NOT MATCHED AND s.v > 0 THEN INSERT * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e4.getMessage.contains("at most one"))
    // a garbage condition fails Spark's expression parser at parse time
    intercept[Exception] {
      parser.parsePlan(
        "MERGE INTO graft_store.`/t` USING v ON KEYS (k) " +
          "WHEN MATCHED AND ((( THEN DELETE")
    }
    // unbalanced subquery
    intercept[IllegalArgumentException] {
      parser.parsePlan("MERGE INTO graft_store.`/t` USING (SELECT 1 ON KEYS (k)")
    }
    // empty key list
    intercept[IllegalArgumentException] {
      parser.parsePlan("MERGE INTO graft_store.`/t` USING v ON KEYS ( )")
    }
  }

  test("conditional clauses: ordered first-match-wins, UPDATE and DELETE mixed") {
    val tbl = mkTable("cond")
    Seq((1L, "upd", 100L), (2L, "del", 0L), (3L, "skip", -1L), (9L, "new", 90L))
      .toDF("k", "s", "v").createOrReplaceTempView("m_inc_cond")
    // order matters: DELETE fires first where s.v = 0; UPDATE where s.v > 50;
    // k=3 (s.v = -1) matches neither clause and keeps its stored values
    val n = runSql(
      s"""MERGE INTO graft_store.`$tbl` USING m_inc_cond ON KEYS (k)
         |WHEN MATCHED AND s.v = 0 THEN DELETE
         |WHEN MATCHED AND s.v > 50 THEN UPDATE SET (v)
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head().getLong(0)
    assert(n == 3L)
    val rows = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // k=1 updated (v only, s stays 'a'); k=2 deleted; k=3 untouched; k=9 inserted
    assert(rows == Seq((1L, "a", 100L), (3L, "c", 30L), (9L, "new", 90L)))
  }

  test("conditions may reference the TARGET through the t alias") {
    val tbl = mkTable("talias")
    Seq((1L, "x", 999L), (2L, "x", 999L), (3L, "x", 999L)).toDF("k", "s", "v")
      .createOrReplaceTempView("m_inc_t")
    // delete matched rows whose STORED v is at least 20 — needs t.v
    runSql(
      s"""MERGE INTO graft_store.`$tbl` USING m_inc_t ON KEYS (k)
         |WHEN MATCHED AND t.v >= 20 THEN DELETE""".stripMargin).collect()
    assert(TableStore.read(spark, tbl).orderBy("k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("update-only merge does NOT insert unmatched source rows (ADVICE fix)") {
    val tbl = mkTable("updonly")
    Seq((2L, "B", 200L), (9L, "z", 90L)).toDF("k", "s", "v")
      .createOrReplaceTempView("m_inc_uo")
    val n = runSql(
      s"""MERGE INTO graft_store.`$tbl` USING m_inc_uo ON KEYS (k)
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin).head().getLong(0)
    assert(n == 3L, "k=9 matched nothing and must NOT be inserted")
    val rows = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "a", 10L), (2L, "B", 200L), (3L, "c", 30L)))
  }

  test("insert-only merge does NOT touch matched rows (ADVICE fix)") {
    val tbl = mkTable("insonly")
    Seq((2L, "CLOBBER", 0L), (9L, "z", 90L)).toDF("k", "s", "v")
      .createOrReplaceTempView("m_inc_io")
    val n = runSql(
      s"""MERGE INTO graft_store.`$tbl` USING m_inc_io ON KEYS (k)
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head().getLong(0)
    assert(n == 4L)
    val rows = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (9L, "z", 90L)),
      "k=2 must keep its stored values")
  }

  test("conditional NOT MATCHED inserts only the passing source rows") {
    val tbl = mkTable("condins")
    Seq((8L, "lo", 5L), (9L, "hi", 90L)).toDF("k", "s", "v")
      .createOrReplaceTempView("m_inc_ci")
    runSql(
      s"""MERGE INTO graft_store.`$tbl` USING m_inc_ci ON KEYS (k)
         |WHEN NOT MATCHED AND s.v > 50 THEN INSERT *""".stripMargin).collect()
    assert(TableStore.read(spark, tbl).orderBy("k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 9L))
  }

  test("a key-duplicated source is refused by the clause engine") {
    val tbl = mkTable("dupsrc")
    Seq((2L, "x", 1L), (2L, "y", 2L)).toDF("k", "s", "v")
      .createOrReplaceTempView("m_inc_dup")
    val e = intercept[IllegalArgumentException] {
      runSql(
        s"""MERGE INTO graft_store.`$tbl` USING m_inc_dup ON KEYS (k)
           |WHEN MATCHED AND s.v > 0 THEN UPDATE SET *""".stripMargin).collect()
    }
    assert(e.getMessage.contains("key-unique"))
  }

  test("a full-upsert MERGE on a merge-on-read table routes to morUpsert") {
    val tbl = mkTable("morroute")
    graft.operators.DeletionVectors.dvDelete(spark, tbl, Seq(3L).toDF("k"), "k")
    def mtimes() = new java.io.File(tbl).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    val before = mtimes()
    Seq((2L, "B", 200L), (9L, "z", 90L)).toDF("k", "s", "v")
      .createOrReplaceTempView("m_mor_src")
    val n = runSql(s"MERGE INTO graft_store.`$tbl` USING m_mor_src ON KEYS (k)")
      .head().getLong(0)
    assert(n == 3L, "k=1 kept, k=2 replaced, k=3 stays masked, k=9 inserted")
    assert(before.toSet.subsetOf(mtimes().toSet),
      "MoR routing must not rewrite any pre-existing data file")
    assert(mtimes().keySet.exists(_.startsWith("mor-")), "delta appended as mor-*")
    val rows = graft.operators.DeletionVectors.dvRead(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 10L), (2L, 200L), (9L, 90L)))
  }

  test("MERGE shapes morUpsert cannot express keep the MoR refusal") {
    val tbl = mkTable("morrefuse")
    graft.operators.DeletionVectors.dvDelete(spark, tbl, Seq(3L).toDF("k"), "k")
    Seq((2L, "B", 200L)).toDF("k", "s", "v").createOrReplaceTempView("m_mor_ref")
    for (clauses <- Seq(
      "WHEN MATCHED THEN UPDATE SET (v) WHEN NOT MATCHED THEN INSERT *", // partial cols
      "WHEN MATCHED THEN DELETE",                                        // delete action
      "WHEN MATCHED AND s.v > 0 THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *", // cond
      "WHEN MATCHED THEN UPDATE SET *")) {                               // update-only
      val e = intercept[IllegalArgumentException](runSql(
        s"MERGE INTO graft_store.`$tbl` USING m_mor_ref ON KEYS (k) $clauses").collect())
      assert(e.getMessage.contains("deletion-vector"), s"for: $clauses")
    }
  }

  test("subquery sources containing parens and string literals split correctly") {
    val tbl = mkTable("parens")
    runSql(
      s"""MERGE INTO graft_store.`$tbl`
         |USING (SELECT CAST(9 AS BIGINT) AS k, CONCAT('x', ')', '(') AS s,
         |              CAST(ROUND(1.4) AS BIGINT) AS v)
         |ON KEYS (k)""".stripMargin).collect()
    assert(TableStore.read(spark, tbl).where("k = 9").head().getString(1) == "x)(")
  }

  test("non-MERGE SQL delegates to Spark's parser verbatim") {
    val df = runSql("SELECT 1 AS one")
    assert(df.head().getInt(0) == 1)
    // ordinary standard-MERGE text (no graft_store target) also delegates —
    // Spark parses it as its own MergeIntoTable plan, untouched by us
    val plan = parser.parsePlan(
      "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *")
    assert(plan.getClass.getSimpleName.contains("MergeIntoTable"))
  }
}
