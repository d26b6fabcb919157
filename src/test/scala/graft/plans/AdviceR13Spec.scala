package graft.plans

import graft.SparkSuite
import graft.store.TableStore
import graft.operators.DeletionVectors
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-13 ADVICE regressions, each pinned by the failure it described:
  *
  *  1. path-rendering drift: `_metadata.file_path` renders the URI form
  *     (URL-encoded) while `Path.toString` decodes — on a table path with
  *     a space the file-pruned rewrite matched NO victims (DELETE
  *     resurrected, UPDATE duplicated) and deletion-vector masks silently
  *     stopped applying in liveRowCount/compact;
  *  2. a graft_store relation in WRITE position that the DML regexes do
  *     not intercept (INSERT OVERWRITE, Spark-syntax MERGE) must refuse,
  *     not substitute into a directly-writable parquet relation;
  *  3. KeywordScanner offsets shifted after length-changing uppercase
  *     mappings ('ß' -> "SS") inside string literals;
  *  4. a type-drifted MERGE source coerced silently through the clause
  *     plan and rewrote the table with a changed schema;
  *  5. parseQuery bypassed the graft_store read substitution.
  */
class AdviceR13Spec extends SparkSuite {
  import spark.implicits._

  private def parser = new GraftSqlParser(spark.sessionState.sqlParser)

  private def runSql(sql: String) =
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql))

  // ---- 1. URI rendering: file-pruned rewrite on a spaced path ------------

  test("rewriteFilesWhere prunes correctly on a table path with a space") {
    val tbl = Files.createTempDirectory("advice one").resolve("t with space").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "s")
      .repartition(2, col("k"))
      .write.mode("overwrite").parquet(tbl)
    val (hit, kept, rewritten) =
      TableStore.rewriteFilesWhere(spark, tbl, col("k") === 2L, _.filter(col("k") =!= 2L))
    assert(hit == 1L, "exactly one predicate-TRUE row")
    assert(kept >= 1 && rewritten >= 1,
      s"the pruned route must engage (kept=$kept rewritten=$rewritten) — " +
        "matching no victims means the victim file is both kept and rewritten")
    val rows = TableStore.read(spark, tbl).select($"k").as[Long].collect().sorted.toSeq
    assert(rows == Seq(1L, 3L, 4L), s"no resurrection, no duplication: $rows")
  }

  test("SQL UPDATE file-pruned route is exact on a spaced path") {
    val tbl = Files.createTempDirectory("advice upd").resolve("u with space").toString
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("k", "v")
      .repartition(2, col("k"))
      .write.mode("overwrite").parquet(tbl)
    runSql(s"UPDATE graft_store.`$tbl` SET v = v + 1 WHERE k = 3").collect()
    val got = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (2L, 20L), (3L, 31L), (4L, 40L)),
      s"updated row must appear exactly once with the new value: $got")
  }

  test("deletion vectors mask, count, and compact on a spaced path") {
    val tbl = Files.createTempDirectory("advice dv").resolve("dv with space").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "s")
      .coalesce(1).write.mode("overwrite").parquet(tbl)
    DeletionVectors.dvDelete(spark, tbl, Seq(2L, 3L).toDF("k"), "k")
    assert(DeletionVectors.dvRead(spark, tbl).select($"k").as[Long].collect().toSet
      == Set(1L, 4L))
    assert(DeletionVectors.liveRowCount(spark, tbl) == 2L,
      "footer live count must subtract masks keyed by the URI rendering")
    val (rw, _) = DeletionVectors.compact(spark, tbl)
    assert(rw == 1, "the masked file must be discovered as dirty")
    assert(spark.read.parquet(tbl).select($"k").as[Long].collect().toSet == Set(1L, 4L),
      "post-compact raw read: survivors exactly once, masked rows gone")
    assert(DeletionVectors.liveRowCount(spark, tbl) == 2L)
  }

  // ---- 2. write-position guard -------------------------------------------

  test("INSERT OVERWRITE targeting graft_store refuses instead of substituting") {
    val e = intercept[IllegalArgumentException](
      parser.parsePlan("INSERT OVERWRITE graft_store.`/t` SELECT 1"))
    assert(e.getMessage.contains("crash-safe commit"))
    val e2 = intercept[IllegalArgumentException](
      parser.parsePlan("INSERT OVERWRITE TABLE graft_store.`/t` SELECT 1"))
    assert(e2.getMessage.contains("graft_store"))
  }

  test("Spark-syntax MERGE INTO graft_store (ON cond) refuses with routing message") {
    val e = intercept[IllegalArgumentException](
      parser.parsePlan(
        "MERGE INTO graft_store.`/t` AS t USING x AS s ON t.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET *"))
    assert(e.getMessage.contains("ON KEYS"),
      s"must route to the supported MERGE form: ${e.getMessage}")
  }

  test("INSERT INTO TABLE graft_store routes to the store append") {
    val tbl = Files.createTempDirectory("advice ins").resolve("t").toString
    TableStore.atomicWrite(spark, Seq((1L, "a")).toDF("k", "s"), tbl)
    val n = runSql(s"INSERT INTO TABLE graft_store.`$tbl` VALUES (2, 'b')")
      .head().getLong(0)
    assert(n == 2L)
    assert(TableStore.read(spark, tbl).count() == 2L)
  }

  // ---- 3. scanner offsets under length-changing case folding --------------

  test("keyword scan survives 'ß' (uppercases to 'SS') inside a literal") {
    assert(GraftSqlDml.indexOfTopLevelKeyword("x = 'ß' THEN", "THEN") == 8)
    assert(GraftSqlDml.indexOfTopLevelKeyword("x = 'ßß' and y = 'z' WHEN 1", "WHEN") == 21)
    // end-to-end: a MERGE whose condition carries the literal still splits
    // its THEN at the right offset
    val tbl = Files.createTempDirectory("advice ss").resolve("t").toString
    TableStore.atomicWrite(spark,
      Seq((1L, "straße"), (2L, "b")).toDF("k", "s"), tbl)
    Seq((1L, "straße"), (2L, "b")).toDF("k", "s").createOrReplaceTempView("adv_ss_src")
    runSql(
      s"""MERGE INTO graft_store.`$tbl` USING adv_ss_src ON KEYS (k)
         |WHEN MATCHED AND s.s = 'straße' THEN DELETE""".stripMargin).collect()
    assert(TableStore.read(spark, tbl).select($"k").as[Long].collect().toSeq == Seq(2L))
  }

  // ---- 4. MERGE source type discipline ------------------------------------

  test("library mergeClauses refuses a type-drifted source") {
    val tbl = Files.createTempDirectory("advice ty").resolve("t").toString
    TableStore.atomicWrite(spark, Seq((1L, 10L)).toDF("k", "v"), tbl)
    val drifted = Seq((1, 99)).toDF("k", "v") // int vs the table's bigint
    val e = intercept[IllegalArgumentException](
      TableStore.mergeClauses(spark, tbl, drifted, Seq("k"),
        Seq(graft.store.MergeWhenMatched(None,
          graft.store.MergeMatchedAction.Update(None))), None))
    assert(e.getMessage.contains("schema"))
    // the swap never ran: table intact with its original schema
    assert(TableStore.read(spark, tbl).schema.fields.map(_.dataType.simpleString).toSeq
      == Seq("bigint", "bigint"))
  }

  test("SQL MERGE casts int-literal sources to the table's types") {
    val tbl = Files.createTempDirectory("advice cast").resolve("t").toString
    TableStore.atomicWrite(spark, Seq((1L, 10L)).toDF("k", "v"), tbl)
    // VALUES literals are ints; the statement tier casts them to bigint
    runSql(s"MERGE INTO graft_store.`$tbl` " +
      "USING (SELECT 2 AS k, 20 AS v) ON KEYS (k)").collect()
    val t = TableStore.read(spark, tbl)
    assert(t.schema.fields.map(_.dataType.simpleString).toSeq == Seq("bigint", "bigint"),
      "the merge must not rewrite the table with a narrowed schema")
    assert(t.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 10L), (2L, 20L)))
  }

  // ---- 5. parseQuery substitution ------------------------------------------

  test("parseQuery substitutes graft_store relations like parsePlan") {
    val tbl = Files.createTempDirectory("advice pq").resolve("t").toString
    TableStore.atomicWrite(spark, Seq((1L, "a")).toDF("k", "s"), tbl)
    val plan = parser.parseQuery(s"SELECT k FROM graft_store.`$tbl`")
    val unresolved = plan.collect {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation => r
    }
    assert(unresolved.isEmpty,
      "a graft_store relation must be substituted on the parseQuery path too")
    assert(org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, plan)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
