package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Multi-level (hierarchical) Hive partition layouts — the (source, day)
  * shape every 100 TB corpus actually uses (round-13 verdict item 1).
  * The store detects nested `col=value` levels from the directory shape,
  * every pruned engine routes per LEAF tuple, the crash-safe swap rolls
  * forward at the leaf level (the staged depth rides the stage), and the
  * DML front door inherits all of it.
  */
class MultiLevelPartitionSpec extends SparkSuite {
  import spark.implicits._

  private def mk(name: String): String =
    Files.createTempDirectory("mlpart").resolve(name).toString

  /** 3 sources × 2 days, key-unique rows. */
  private def seed = Seq(
    (1L, "a", "d1", 10L), (2L, "a", "d1", 20L), (3L, "a", "d2", 30L),
    (4L, "b", "d1", 40L), (5L, "b", "d2", 50L), (6L, "c", "d2", 60L)
  ).toDF("k", "src", "day", "v")

  private def leafFiles(tbl: String): Map[String, Seq[(String, Long, Long)]] =
    new java.io.File(tbl).listFiles().filter(d => d.isDirectory && d.getName.startsWith("src="))
      .flatMap(s => s.listFiles().filter(d => d.isDirectory && d.getName.startsWith("day="))
        .map(d => s"${s.getName}/${d.getName}" ->
          d.listFiles().map(f => (f.getName, f.lastModified(), f.length())).sortBy(_._1).toSeq))
      .toMap

  test("detectPartitionColumns reads nested levels; detectPartitionColumn refuses multi") {
    val tbl = mk("detect")
    TableStore.atomicWritePartitioned(spark, seed, tbl, Seq("src", "day"))
    assert(TableStore.detectPartitionColumns(spark, tbl) == Seq("src", "day"))
    val e = intercept[IllegalArgumentException](TableStore.detectPartitionColumn(spark, tbl))
    assert(e.getMessage.contains("2 levels"))
    // flat and single-level keep their contracts
    val flat = mk("flat")
    TableStore.atomicWrite(spark, seed, flat)
    assert(TableStore.detectPartitionColumns(spark, flat).isEmpty)
    val one = mk("one")
    TableStore.atomicWritePartitioned(spark, seed, one, "day")
    assert(TableStore.detectPartitionColumns(spark, one) == Seq("day"))
    assert(TableStore.detectPartitionColumn(spark, one).contains("day"))
  }

  test("ambiguous layouts refuse: two column names at one level; uneven depth") {
    val tbl = mk("ambig")
    TableStore.atomicWritePartitioned(spark, seed, tbl, Seq("src", "day"))
    // a stray second column name at level 1
    val stray = new java.io.File(tbl, "other=1")
    stray.mkdirs()
    val e1 = intercept[IllegalArgumentException](
      TableStore.detectPartitionColumns(spark, tbl))
    assert(e1.getMessage.contains("multiple partition-dir column names"))
    stray.delete()
    // uneven depth: data files directly under one src= dir
    val shallow = new java.io.File(tbl, "src=zz")
    shallow.mkdirs()
    val f = new java.io.File(shallow, "orphan.parquet")
    seed.limit(1).coalesce(1).write.mode("overwrite")
      .parquet(shallow.toString + "__w")
    new java.io.File(shallow.toString + "__w").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.renameTo(f)
    val e2 = intercept[IllegalArgumentException](
      TableStore.detectPartitionColumns(spark, tbl))
    assert(e2.getMessage.contains("uneven partition depth"))
  }

  test("two-level upsert rewrites only the batch's leaf dirs") {
    val tbl = mk("upsert")
    TableStore.atomicWritePartitioned(spark, seed, tbl, Seq("src", "day"))
    val before = leafFiles(tbl)
    // conflict in (a, d1), brand-new leaf (c, d1)
    val batch = Seq((2L, "a", "d1", 99L), (7L, "c", "d1", 70L)).toDF("k", "src", "day", "v")
    TableStore.upsertPartitioned(spark, tbl, batch, Seq("k"), Seq("src", "day"), None)
    val after = leafFiles(tbl)
    assert(after("src=c/day=d1").nonEmpty, "new leaf must be created")
    val untouchedKeys = before.keySet - "src=a/day=d1"
    untouchedKeys.foreach(kk => assert(after(kk) == before(kk),
      s"leaf $kk was rewritten but holds no batch row"))
    val rows = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 10L), (2L, 99L), (3L, 30L), (4L, 40L),
      (5L, 50L), (6L, 60L), (7L, 70L)))
  }

  test("two-level delete drops an all-victim leaf AND prunes its emptied parent") {
    val tbl = mk("dropleaf")
    TableStore.atomicWritePartitioned(spark, seed, tbl, Seq("src", "day"))
    // kill ALL of source c (its only leaf is day=d2): the leaf dir must
    // drop and the emptied src=c husk must not linger
    val n = TableStore.deleteRowsPartitioned(spark, tbl,
      Seq(6L).toDF("k"), Seq("k"), Seq("src", "day"))
    assert(n == 1L)
    assert(!new java.io.File(tbl, "src=c").exists(),
      "emptied parent partition dir must be pruned")
    assert(TableStore.detectPartitionColumns(spark, tbl) == Seq("src", "day"))
    assert(TableStore.read(spark, tbl).count() == 5)
  }

  test("two-level mergeDelete: victims found per leaf, inserts land in new leaves") {
    val tbl = mk("mdel")
    TableStore.atomicWritePartitioned(spark, seed, tbl, Seq("src", "day"))
    val before = leafFiles(tbl)
    val src = Seq((1L, "a", "d1", 0L), (8L, "c", "d1", 80L)).toDF("k", "src", "day", "v")
    val (del, ins) = TableStore.mergeDeletePartitioned(spark, tbl, src,
      Seq("k"), Seq("src", "day"), insertNotMatched = true)
    assert((del, ins) == (1L, 1L))
    val after = leafFiles(tbl)
    assert(after("src=c/day=d1").nonEmpty)
    (before.keySet -- Set("src=a/day=d1", "src=c/day=d1")).foreach(kk =>
      assert(after(kk) == before(kk), s"leaf $kk must stay untouched"))
    val ks = TableStore.read(spark, tbl).select($"k").as[Long].collect().sorted.toSeq
    assert(ks == Seq(2L, 3L, 4L, 5L, 6L, 8L))
  }

  test("two-level exactly-once CDC applies per leaf and keeps the ledger") {
    val tbl = mk("cdc")
    TableStore.atomicWritePartitioned(spark, seed, tbl, Seq("src", "day"))
    val feed = Seq(("D", 4L, "b", "d1", 0L), ("U", 5L, "b", "d2", 555L),
      ("I", 9L, "c", "d1", 90L)).toDF("op", "k", "src", "day", "v")
    assert(TableStore.applyCdcPartitionedExactlyOnce(spark, tbl, feed, Seq("k"),
      Seq("src", "day"), batchId = 1L, "op", true))
    assert(!TableStore.applyCdcPartitionedExactlyOnce(spark, tbl, feed, Seq("k"),
      Seq("src", "day"), batchId = 1L, "op", true), "replay must be skipped")
    val rows = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 10L), (2L, 20L), (3L, 30L), (5L, 555L),
      (6L, 60L), (9L, 90L)))
    assert(TableStore.lastAppliedBatch(spark, tbl) == 1L)
  }

  test("crash mid-swap rolls forward at the LEAF level (staged depth rides the stage)") {
    val tbl = mk("crash")
    TableStore.atomicWritePartitioned(spark, seed, tbl, Seq("src", "day"))
    val before = leafFiles(tbl)
    val batch = Seq((3L, "a", "d2", 333L)).toDF("k", "src", "day", "v")
    TableStore.crashHook = step => if (step == "partStaged") throw new RuntimeException("boom")
    try intercept[RuntimeException](
      TableStore.upsertPartitioned(spark, tbl, batch, Seq("k"), Seq("src", "day"), None))
    finally TableStore.crashHook = _ => ()
    // recovery (run by any read) completes the swap: ONLY (a, d2) replaced —
    // (a, d1), the victim source's sibling day, keeps its exact files; a
    // depth-1 roll-forward would have renamed src=a wholesale and lost d1
    val rows = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 10L), (2L, 20L), (3L, 333L), (4L, 40L), (5L, 50L), (6L, 60L)))
    val after = leafFiles(tbl)
    (before.keySet - "src=a/day=d2").foreach(kk =>
      assert(after(kk) == before(kk), s"leaf $kk must survive the roll-forward"))
  }

  test("deleting every row falls back to an empty schema-bearing flat table") {
    val tbl = mk("empty")
    TableStore.atomicWritePartitioned(spark, seed, tbl, Seq("src", "day"))
    val n = TableStore.rewritePartitionsWhere(spark, tbl, Seq("src", "day"),
      lit(true), _.filter(lit(false)))
    assert(n == 6L)
    val t = TableStore.read(spark, tbl)
    assert(t.count() == 0 && t.columns.toSet == Set("k", "src", "day", "v"))
  }

  test("SQL DELETE/UPDATE/INSERT/MERGE route the two-level layout end-to-end") {
    val tbl = mk("sql2l")
    TableStore.atomicWritePartitioned(spark, seed, tbl, Seq("src", "day"))
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    def run(sql: String) =
      org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql))
    val before = leafFiles(tbl)
    // DELETE hits only (a, d1)
    run(s"DELETE FROM graft_store.`$tbl` WHERE k = 2").collect()
    val afterDel = leafFiles(tbl)
    (before.keySet - "src=a/day=d1").foreach(kk =>
      assert(afterDel(kk) == before(kk), s"DELETE rewrote untouched leaf $kk"))
    // UPDATE hits only (b, d2)
    run(s"UPDATE graft_store.`$tbl` SET v = v + 1 WHERE k = 5").collect()
    val afterUpd = leafFiles(tbl)
    (afterDel.keySet - "src=b/day=d2").foreach(kk =>
      assert(afterUpd(kk) == afterDel(kk), s"UPDATE rewrote untouched leaf $kk"))
    // INSERT lands in a new leaf — positional order is the table's READ
    // order, which surfaces BOTH partition columns last: (k, v, src, day)
    run(s"INSERT INTO graft_store.`$tbl` VALUES (10, 100, 'd', 'd1')").collect()
    assert(new java.io.File(tbl, "src=d/day=d1").exists())
    // MERGE full-upsert
    Seq((1L, "a", "d1", 111L)).toDF("k", "src", "day", "v")
      .createOrReplaceTempView("ml_sql_src")
    run(s"MERGE INTO graft_store.`$tbl` USING ml_sql_src ON KEYS (k)").collect()
    val rows = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 111L), (3L, 30L), (4L, 40L), (5L, 51L),
      (6L, 60L), (10L, 100L)))
    assert(TableStore.detectPartitionColumns(spark, tbl) == Seq("src", "day"),
      "the statement tier must preserve the two-level layout throughout")
  }

  test("UPDATE assigning an INNER partition column keeps the layout (full rewrite)") {
    val tbl = mk("pmove")
    TableStore.atomicWritePartitioned(spark, seed, tbl, Seq("src", "day"))
    val parser = new graft.plans.GraftSqlParser(spark.sessionState.sqlParser)
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(
      s"UPDATE graft_store.`$tbl` SET day = 'd9' WHERE k = 1")).collect()
    assert(TableStore.detectPartitionColumns(spark, tbl) == Seq("src", "day"))
    assert(new java.io.File(tbl, "src=a/day=d9").exists(),
      "the moved row must land in its new leaf")
    assert(TableStore.read(spark, tbl).filter($"k" === 1L)
      .select($"day").head().getString(0) == "d9")
  }
}
