package graft.plans

import graft.SparkSuite
import graft.operators.DeletionVectors
import graft.store.{TableStore, VersionedTable}
import java.nio.file.Files

/** The SQL maintenance statements: OPTIMIZE (layout-routed compaction /
  * Z-order clustering / MoR hardening), VACUUM (versioned retention),
  * CREATE TABLE AS SELECT, DROP TABLE.
  */
class GraftSqlMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private def parser = new GraftSqlParser(spark.sessionState.sqlParser)

  private def runSql(sql: String) =
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql))

  private def tmpDir(name: String): String =
    Files.createTempDirectory("maint").resolve(name).toString

  private def listing(tbl: String): Seq[(String, Long, Long)] = {
    def walk(d: java.io.File, prefix: String): Seq[(String, Long, Long)] =
      d.listFiles().toSeq.flatMap { f =>
        val rel = if (prefix.isEmpty) f.getName else prefix + "/" + f.getName
        if (f.isFile && f.getName.endsWith(".parquet"))
          Seq((rel, f.lastModified(), f.length()))
        else if (f.isDirectory && f.getName.contains("=")) walk(f, rel)
        else Nil
      }
    walk(new java.io.File(tbl), "").sortBy(_._1)
  }

  test("flat OPTIMIZE compacts to TARGET files, content identical") {
    val tbl = tmpDir("flatopt")
    val df = (1L to 4000L).map(k => (k, k % 97, s"r$k")).toDF("k", "g", "s")
    df.repartition(24).write.mode("overwrite").parquet(tbl)
    assert(listing(tbl).size == 24)
    val out = runSql(s"OPTIMIZE graft_store.`$tbl` TARGET 3 FILES").head()
    assert(out.getLong(0) == 24L && out.getLong(1) <= 3L && out.getLong(2) == 4000L,
      s"(files_before, files_after, n_rows) = $out")
    assert(listing(tbl).size == out.getLong(1).toInt)
    assert(TableStore.read(spark, tbl).as[(Long, Long, String)].collect().sorted
      === df.as[(Long, Long, String)].collect().sorted)
  }

  test("flat OPTIMIZE default target sizes from graft.optimize.targetFileBytes") {
    val tbl = tmpDir("flatdef")
    (1L to 2000L).toDF("k").repartition(16).write.mode("overwrite").parquet(tbl)
    spark.conf.set("graft.optimize.targetFileBytes", (64L << 20).toString)
    try {
      val out = runSql(s"OPTIMIZE graft_store.`$tbl`").head()
      // 16 tiny files are far under one 64 MiB target: everything coalesces
      assert(out.getLong(1) == 1L, s"files_after = ${out.getLong(1)}")
    } finally spark.conf.unset("graft.optimize.targetFileBytes")
  }

  test("flat OPTIMIZE WHERE repacks only victim files; clean files hard-link through") {
    val tbl = tmpDir("flatwhere")
    // range-clustered: the predicate's rows live in a known file subset
    (1L to 4000L).toDF("k").repartitionByRange(8, $"k")
      .sortWithinPartitions($"k").write.mode("overwrite").parquet(tbl)
    val before = listing(tbl)
    assert(before.size == 8)
    val out = runSql(s"OPTIMIZE graft_store.`$tbl` WHERE k <= 1000").head()
    val after = listing(tbl)
    val survivors = after.filter(f => before.exists(_._1 == f._1))
    assert(survivors.size >= 4,
      s"clean files must survive by link: ${survivors.size} of ${before.size}")
    assert(survivors == before.filter(f => survivors.exists(_._1 == f._1)),
      "surviving files keep exact mtime and byte length")
    assert(after.exists(_._1.startsWith("rw-")), "victims repack as rw-* files")
    assert(out.getLong(2) == 4000L, "content row count unchanged")
    assert(TableStore.read(spark, tbl).as[Long].collect().sorted === (1L to 4000L).toArray)
  }

  test("flat OPTIMIZE ZORDER BY clusters both dimensions for file pruning") {
    val tbl = tmpDir("zorder")
    // scatter: every file spans the whole range of both columns
    val rnd = new scala.util.Random(7)
    val rows = (1L to 8000L).map(k => (k, rnd.nextInt(10000).toLong, rnd.nextInt(10000).toLong))
    rows.toDF("id", "x", "y").repartition(16).write.mode("overwrite").parquet(tbl)
    def overlapping(colName: String, lo: Long, hi: Long): Int =
      spark.read.parquet(tbl)
        .groupBy(org.apache.spark.sql.functions.col("_metadata.file_path"))
        .agg(org.apache.spark.sql.functions.min(colName).as("lo"),
          org.apache.spark.sql.functions.max(colName).as("hi"))
        .where($"lo" <= hi && $"hi" >= lo).count().toInt
    assert(overlapping("x", 100, 400) >= 14, "scattered: nearly all files overlap")
    val out = runSql(
      s"OPTIMIZE graft_store.`$tbl` ZORDER BY (x, y) TARGET 16 FILES").head()
    assert(out.getLong(1) >= 8L, "clustering must keep multiple files to mean anything")
    // a tight rectangle in either dimension now touches a small band
    assert(overlapping("x", 100, 400) <= 8, s"x-range overlap after zorder: ${overlapping("x", 100, 400)}")
    assert(overlapping("y", 100, 400) <= 8, s"y-range overlap after zorder: ${overlapping("y", 100, 400)}")
    assert(TableStore.read(spark, tbl).count() == 8000L)
  }

  test("partitioned OPTIMIZE WHERE compacts victim leaves only; others byte-untouched") {
    val tbl = tmpDir("partopt")
    val df = (1L to 3000L).map(k => (k, s"s${k % 3}", s"d${k % 4}")).toDF("k", "src", "day")
    // fragment each leaf into several files
    TableStore.atomicWritePartitioned(spark, df.repartition(6), tbl, Seq("src", "day"))
    val before = listing(tbl)
    assert(before.count(_._1.startsWith("src=s1/")) > 4, "fixture leaves are fragmented")
    val untouchedBefore = before.filterNot(_._1.startsWith("src=s1/"))
    runSql(s"OPTIMIZE graft_store.`$tbl` WHERE src = 's1'")
    val after = listing(tbl)
    assert(after.filterNot(_._1.startsWith("src=s1/")) == untouchedBefore,
      "leaves outside src=s1 keep their exact (path, mtime, length)")
    val s1Leaves = after.filter(_._1.startsWith("src=s1/")).groupBy(_._1.split("/").take(2).mkString("/"))
    assert(s1Leaves.nonEmpty && s1Leaves.forall(_._2.size == 1),
      s"each victim leaf compacts to ONE file: ${s1Leaves.view.mapValues(_.size).toMap}")
    assert(TableStore.detectPartitionColumns(spark, tbl) == Seq("src", "day"),
      "layout survives")
    assert(TableStore.read(spark, tbl).count() == 3000L)
  }

  test("MoR OPTIMIZE hardens: masks materialize, mor debt folds, ledger survives") {
    val tbl = tmpDir("moropt")
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(tbl)
    assert(DeletionVectors.morApplyCdc(spark, tbl,
      Seq(("U", 2L, 200L), ("I", 5L, 50L)).toDF("op", "k", "v"), "k", batchId = 9L))
    assert(new java.io.File(tbl).listFiles().exists(_.getName.startsWith("mor-")))
    val out = runSql(s"OPTIMIZE graft_store.`$tbl`").head()
    assert(out.getLong(2) == 5L, "live rows")
    assert(!new java.io.File(tbl).listFiles().exists(_.getName.startsWith("mor-")),
      "appended mor-* debt folded into the compacted files")
    assert(DeletionVectors.readDv(spark, tbl).isEmpty, "masks materialized")
    assert(DeletionVectors.appliedBatches(spark, tbl) == Set(9L),
      "exactly-once ledger survives hardening")
    assert(DeletionVectors.morApplyCdc(spark, tbl,
      Seq(("U", 2L, 201L)).toDF("op", "k", "v"), "k", batchId = 9L) == false,
      "replayed batch still skips after OPTIMIZE")
    assert(DeletionVectors.dvRead(spark, tbl).as[(Long, Long)].collect().sorted
      === Array((1L, 10L), (2L, 200L), (3L, 30L), (4L, 40L), (5L, 50L)))
    intercept[IllegalArgumentException] {
      runSql(s"OPTIMIZE graft_store.`$tbl` ZORDER BY (k, v)").head()
    }
  }

  test("VACUUM trims history; current + pinned survive; flat table refuses") {
    val tbl = tmpDir("vac")
    val base = (1L to 100L).toDF("k")
    assert(VersionedTable.writeSnapshot(spark, base, tbl) == 1)
    assert(VersionedTable.upsert(spark, tbl, (101L to 110L).toDF("k"), Seq("k")) == 2)
    assert(VersionedTable.upsert(spark, tbl, (111L to 120L).toDF("k"), Seq("k")) == 3)
    val out = runSql(s"VACUUM graft_store.`$tbl` KEEP 1").head()
    assert(out.getLong(0) == 3L && out.getLong(1) == 1L && out.getLong(2) == 3L,
      s"(before, after, current) = $out")
    assert(VersionedTable.versions(spark, tbl) == Seq(3))
    assert(runSql(s"SELECT count(*) AS n FROM graft_store.`$tbl` VERSION AS OF 3")
      .head().getLong(0) == 120L, "the survivor stays SQL-readable")
    intercept[Exception] {
      runSql(s"SELECT * FROM graft_store.`$tbl` VERSION AS OF 1").collect()
    }
    val flat = tmpDir("vacflat")
    base.write.parquet(flat)
    val e = intercept[IllegalArgumentException] {
      runSql(s"VACUUM graft_store.`$flat` KEEP 1").head()
    }
    assert(e.getMessage.contains("not a versioned table"))
  }

  test("CTAS creates, refuses existing, OR REPLACE swaps, partitioned layout lands") {
    val tbl = tmpDir("ctas")
    (1L to 500L).map(k => (k, s"g${k % 5}")).toDF("k", "g")
      .createOrReplaceTempView("v_maint_src")
    val n = runSql(s"CREATE TABLE graft_store.`$tbl` PARTITIONED BY (g) AS " +
      "SELECT k, g FROM v_maint_src WHERE k <= 300").head().getLong(0)
    assert(n == 300L)
    assert(TableStore.detectPartitionColumns(spark, tbl) == Seq("g"))
    val e = intercept[IllegalArgumentException] {
      runSql(s"CREATE TABLE graft_store.`$tbl` AS SELECT 1 AS x").head()
    }
    assert(e.getMessage.contains("already exists"))
    val n2 = runSql(s"CREATE OR REPLACE TABLE graft_store.`$tbl` AS " +
      "SELECT k FROM v_maint_src WHERE k > 450").head().getLong(0)
    assert(n2 == 50L)
    assert(TableStore.read(spark, tbl).as[Long].collect().sorted === (451L to 500L).toArray)
  }

  test("CTAS OR REPLACE refuses merge-on-read and versioned state") {
    val mor = tmpDir("ctasmor")
    Seq((1L, 10L)).toDF("k", "v").write.parquet(mor)
    DeletionVectors.dvDelete(spark, mor, Seq(1L).toDF("k"), "k")
    val e1 = intercept[IllegalArgumentException] {
      runSql(s"CREATE OR REPLACE TABLE graft_store.`$mor` AS SELECT 1 AS x").head()
    }
    assert(e1.getMessage.contains("merge-on-read"))
    val ver = tmpDir("ctasver")
    VersionedTable.writeSnapshot(spark, Seq(1L).toDF("k"), ver)
    val e2 = intercept[IllegalArgumentException] {
      runSql(s"CREATE OR REPLACE TABLE graft_store.`$ver` AS SELECT 1 AS x").head()
    }
    assert(e2.getMessage.toLowerCase.contains("versioned"))
  }

  test("CTAS can materialize a pinned version (VERSION AS OF source)") {
    val ver = tmpDir("ctassrc")
    VersionedTable.writeSnapshot(spark, (1L to 50L).toDF("k"), ver)
    VersionedTable.upsert(spark, ver, (51L to 60L).toDF("k"), Seq("k"))
    val out = tmpDir("ctasout")
    val n = runSql(s"CREATE TABLE graft_store.`$out` AS " +
      s"SELECT k FROM graft_store.`$ver` VERSION AS OF 1").head().getLong(0)
    assert(n == 50L)
    assert(TableStore.read(spark, out).as[Long].collect().sorted === (1L to 50L).toArray)
  }

  test("DROP TABLE removes the table and crash debris; IF EXISTS is a no-op") {
    val tbl = tmpDir("drop")
    (1L to 10L).toDF("k").write.parquet(tbl)
    // parked crash debris must not resurrect through a later recover()
    new java.io.File(tbl + "__old").mkdirs()
    assert(runSql(s"DROP TABLE graft_store.`$tbl`").head().getLong(0) == 1L)
    assert(!new java.io.File(tbl).exists() && !new java.io.File(tbl + "__old").exists())
    intercept[IllegalArgumentException] {
      runSql(s"DROP TABLE graft_store.`$tbl`").head()
    }
    assert(runSql(s"DROP TABLE IF EXISTS graft_store.`$tbl`").head().getLong(0) == 0L)
  }

  test("parse refusals: malformed clauses stay loud") {
    val msgs = Seq(
      s"VACUUM graft_store.`/tmp/x`" -> "KEEP",
      s"VACUUM graft_store.`/tmp/x` KEEP 0" -> "at least 1",
      s"OPTIMIZE graft_store.`/tmp/x` ZORDER BY (a, b, c)" -> "exactly two",
      s"OPTIMIZE graft_store.`/tmp/x` TARGET 0 FILES" -> "at least 1",
      s"OPTIMIZE graft_store.`/tmp/x` COMPACT HARDER" -> "expected",
      s"DROP TABLE graft_store.`/tmp/x` CASCADE" -> "unexpected text",
      s"CREATE TABLE graft_store.`/tmp/x` (k BIGINT)" -> "AS <select>")
    msgs.foreach { case (sql, frag) =>
      val e = intercept[IllegalArgumentException] { parser.parsePlan(sql) }
      assert(e.getMessage.contains(frag), s"$sql → ${e.getMessage}")
    }
    // a WHERE predicate with a column literally named `target` is not truncated
    val tbl = tmpDir("targetcol")
    Seq((1L, 2L)).toDF("k", "target").write.parquet(tbl)
    runSql(s"OPTIMIZE graft_store.`$tbl` WHERE target > 0").head()
    assert(TableStore.read(spark, tbl).count() == 1L)
  }

  test("SHOW PARTITIONS lists leaf tuples from directory metadata with zero jobs") {
    val tbl = tmpDir("showparts")
    val df = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "x"), (4L, "b 4", "z"))
      .toDF("k", "s", "d")
    TableStore.atomicWritePartitioned(spark, df, tbl, Seq("s", "d"))
    // sentinel-drained job counting, the TableStoreSpec pattern: the bus
    // is FIFO per listener, so once the tagged sentinel's event arrives,
    // everything before it was delivered
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val n = new java.util.concurrent.atomic.AtomicInteger
    @volatile var sentinelSeen = false
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .map(_.getProperty("spark.job.description")).orNull
        if (desc == "graft-maint-sentinel") sentinelSeen = true
        else n.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val rows = runSql(s"SHOW PARTITIONS graft_store.`$tbl`")
        .collect().map(_.getString(0)).toSeq
      spark.sparkContext.setJobDescription("graft-maint-sentinel")
      try spark.range(1).count() finally spark.sparkContext.setJobDescription(null)
      val deadline = System.currentTimeMillis() + 20000
      while (!sentinelSeen && System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(sentinelSeen, "listener bus did not drain")
      assert(rows == Seq("s=a/d=x", "s=a/d=y", "s=b 4/d=z", "s=b/d=x"),
        s"sorted decoded leaves (incl. the Hive-escaped space): $rows")
      assert(n.get() == 0, s"partition discovery must launch zero Spark jobs, saw ${n.get()}")
    } finally spark.sparkContext.removeSparkListener(l)
    val flat = tmpDir("showflat")
    Seq((1L, "a")).toDF("k", "s").write.parquet(flat)
    val e = intercept[IllegalArgumentException] {
      runSql(s"SHOW PARTITIONS graft_store.`$flat`").collect()
    }
    assert(e.getMessage.contains("flat table"))
  }

  test("ALTER TABLE: add with computed default, rename, drop — layout preserved") {
    val tbl = tmpDir("alter")
    TableStore.atomicWritePartitioned(spark,
      Seq((1L, 10L, "a"), (2L, 25L, "b")).toDF("k", "v", "g"), tbl, Seq("g"))
    val n = runSql(s"ALTER TABLE graft_store.`$tbl` ADD COLUMN v2 BIGINT DEFAULT v * 2")
      .head().getLong(0)
    assert(n == 2L)
    assert(TableStore.detectPartitionColumns(spark, tbl) == Seq("g"))
    assert(TableStore.read(spark, tbl).select("k", "v2").as[(Long, Long)]
      .collect().sorted === Array((1L, 20L), (2L, 50L)))
    runSql(s"ALTER TABLE graft_store.`$tbl` RENAME COLUMN v TO v_old").collect()
    runSql(s"ALTER TABLE graft_store.`$tbl` DROP COLUMN v_old").collect()
    val t = TableStore.read(spark, tbl)
    assert(t.columns.sorted.toSeq == Seq("g", "k", "v2"))
    assert(TableStore.detectPartitionColumns(spark, tbl) == Seq("g"))
    // a NULL-backfilled add (no DEFAULT) with a multi-token type
    runSql(s"ALTER TABLE graft_store.`$tbl` ADD COLUMN score DECIMAL(10, 2)").collect()
    assert(TableStore.read(spark, tbl).filter($"score".isNull).count() == 2L)
  }

  test("ALTER TABLE refusals: partition columns, dup/unknown names, MoR, versioned") {
    val tbl = tmpDir("alterref")
    TableStore.atomicWritePartitioned(spark,
      Seq((1L, 10L, "a")).toDF("k", "v", "g"), tbl, Seq("g"))
    def refuse(sql: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] { runSql(sql).collect() }
      assert(e.getMessage.contains(frag), s"$sql → ${e.getMessage}")
    }
    refuse(s"ALTER TABLE graft_store.`$tbl` DROP COLUMN g", "partition column")
    refuse(s"ALTER TABLE graft_store.`$tbl` RENAME COLUMN g TO h", "partition column")
    refuse(s"ALTER TABLE graft_store.`$tbl` ADD COLUMN v BIGINT", "already exists")
    refuse(s"ALTER TABLE graft_store.`$tbl` RENAME COLUMN v TO k", "already exists")
    refuse(s"ALTER TABLE graft_store.`$tbl` DROP COLUMN nope", "unknown column")
    runSql(s"ALTER TABLE graft_store.`$tbl` DROP COLUMN v").collect() // k remains
    refuse(s"ALTER TABLE graft_store.`$tbl` DROP COLUMN k",
      "would leave no data columns")
    val mor = tmpDir("altermor")
    Seq((1L, 10L)).toDF("k", "v").write.parquet(mor)
    DeletionVectors.dvDelete(spark, mor, Seq(1L).toDF("k"), "k")
    refuse(s"ALTER TABLE graft_store.`$mor` ADD COLUMN x BIGINT", "merge-on-read")
    val ver = tmpDir("alterver")
    VersionedTable.writeSnapshot(spark, Seq(1L).toDF("k"), ver)
    refuse(s"ALTER TABLE graft_store.`$ver` ADD COLUMN x BIGINT", "VERSIONED")
  }

  test("COPY INTO: exactly-once file ingest — rerun loads nothing, new files load alone") {
    val src = tmpDir("copysrc")
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").repartition(2)
      .write.option("header", "true").csv(src)
    val tbl = tmpDir("copytbl")
    runSql(s"CREATE TABLE graft_store.`$tbl` AS " +
      "SELECT CAST(0 AS BIGINT) AS k, CAST('' AS STRING) AS s WHERE 1 = 0").collect()
    val r1 = runSql(s"COPY INTO graft_store.`$tbl` FROM '$src' FORMAT CSV").head()
    assert(r1.getLong(0) == 2L && r1.getLong(1) == 2L && r1.getLong(2) == 2L,
      s"(files, rows, total) = $r1")
    val r2 = runSql(s"COPY INTO graft_store.`$tbl` FROM '$src' FORMAT CSV").head()
    assert(r2.getLong(0) == 0L && r2.getLong(1) == 0L && r2.getLong(2) == 2L,
      "a rerun must load NOTHING")
    // a new landing file loads alone
    val extra = tmpDir("copyextra")
    Seq((3L, "c")).toDF("k", "s").coalesce(1)
      .write.option("header", "true").csv(extra)
    val part = new java.io.File(extra).listFiles()
      .find(_.getName.endsWith(".csv")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(src, "late-arrival.csv"))
    val r3 = runSql(s"COPY INTO graft_store.`$tbl` FROM '$src' FORMAT CSV").head()
    assert(r3.getLong(0) == 1L && r3.getLong(1) == 1L && r3.getLong(2) == 3L)
    assert(TableStore.read(spark, tbl).as[(Long, String)].collect().sorted
      === Array((1L, "a"), (2L, "b"), (3L, "c")))
    assert(new java.io.File(tbl).listFiles()
      .count(_.getName.startsWith("copy-")) == 2, "one batch file per COPY that loaded")
  }

  test("COPY INTO: JSONL by name with null backfill; refusals stay loud") {
    val src = tmpDir("copyjson")
    new java.io.File(src).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "a.jsonl"),
      "{\"k\": 1, \"s\": \"x\"}\n{\"k\": 2}\n".getBytes("UTF-8"))
    val tbl = tmpDir("copyjtbl")
    runSql(s"CREATE TABLE graft_store.`$tbl` AS " +
      "SELECT CAST(0 AS BIGINT) AS k, CAST('' AS STRING) AS s WHERE 1 = 0").collect()
    runSql(s"COPY INTO graft_store.`$tbl` FROM '$src' FORMAT JSONL").collect()
    val rows = TableStore.read(spark, tbl).orderBy("k").collect()
    assert(rows.length == 2 && rows(1).isNullAt(1), "absent JSON field -> null")
    def refuse(sql: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException] { runSql(sql).collect() }
      assert(e.getMessage.contains(frag), s"$sql → ${e.getMessage}")
    }
    refuse(s"COPY INTO graft_store.`/tmp/copy-none` FROM '$src' FORMAT JSONL", "no table")
    refuse(s"COPY INTO graft_store.`$tbl` FROM '/tmp/copy-missing-src' FORMAT JSONL",
      "does not exist")
    intercept[IllegalArgumentException] {
      parser.parsePlan(s"COPY INTO graft_store.`$tbl` FROM '$src' FORMAT AVRO")
    }
    val part = tmpDir("copypart")
    TableStore.atomicWritePartitioned(spark,
      Seq((1L, "a")).toDF("k", "g"), part, Seq("g"))
    refuse(s"COPY INTO graft_store.`$part` FROM '$src' FORMAT JSONL", "partitioned")
  }

  test("COPY INTO: a violating source aborts, ledger untouched, retry-after-fix loads") {
    val src = tmpDir("copybad")
    new java.io.File(src).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "bad.jsonl"),
      "{\"k\": 1, \"v\": -5}\n".getBytes("UTF-8"))
    val tbl = tmpDir("copyctbl")
    runSql(s"CREATE TABLE graft_store.`$tbl` AS " +
      "SELECT CAST(9 AS BIGINT) AS k, CAST(9 AS BIGINT) AS v").collect()
    runSql(s"ALTER TABLE graft_store.`$tbl` ADD CONSTRAINT v_pos CHECK (v > 0)").collect()
    intercept[Throwable] {
      runSql(s"COPY INTO graft_store.`$tbl` FROM '$src' FORMAT JSONL").collect()
    }
    assert(TableStore.read(spark, tbl).count() == 1L, "no violating row may land")
    // fix the source: the file's identity changes, so it loads cleanly
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "bad.jsonl"),
      "{\"k\": 1, \"v\": 5}\n".getBytes("UTF-8"))
    val r = runSql(s"COPY INTO graft_store.`$tbl` FROM '$src' FORMAT JSONL").head()
    assert(r.getLong(0) == 1L && r.getLong(2) == 2L,
      "the failed attempt must not have burned the file's ledger entry")
  }

  test("DESCRIBE reports columns, layout tier, census, and constraints per layout") {
    def desc(tbl: String): Map[String, (String, String)] =
      runSql(s"DESCRIBE graft_store.`$tbl`").collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    // flat + constraint
    val flat = tmpDir("descflat")
    Seq((1L, 10L)).toDF("k", "v").write.parquet(flat)
    runSql(s"ALTER TABLE graft_store.`$flat` ADD CONSTRAINT v_pos CHECK (v > 0)").collect()
    val df = desc(flat)
    assert(df("k")._1 == "bigint" && df("# layout")._1 == "flat")
    assert(df("# rows")._1 == "1" && df("# constraint v_pos")._1 == "CHECK (v > 0)")
    // two-level partitioned: partition columns flagged
    val part = tmpDir("descpart")
    TableStore.atomicWritePartitioned(spark,
      Seq((1L, "a", "x"), (2L, "b", "y")).toDF("k", "s", "d"), part, Seq("s", "d"))
    val dp = desc(part)
    assert(dp("# layout")._1 == "hive-partitioned (s, d)")
    assert(dp("s")._2 == "partition column" && dp("d")._2 == "partition column"
      && dp("k")._2 == "")
    assert(dp("# rows")._1 == "2")
    // merge-on-read: live count, not raw
    val mor = tmpDir("descmor")
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").write.parquet(mor)
    DeletionVectors.dvDelete(spark, mor, Seq(2L).toDF("k"), "k")
    val dm = desc(mor)
    assert(dm("# layout")._1.startsWith("merge-on-read") && dm("# rows")._1 == "1")
    // versioned: version census + CURRENT
    val ver = tmpDir("descver")
    VersionedTable.writeSnapshot(spark, Seq(1L).toDF("k"), ver)
    VersionedTable.upsert(spark, ver, Seq(2L).toDF("k"), Seq("k"))
    val dv = desc(ver)
    assert(dv("# layout")._1 == "versioned (current v=2)" && dv("# versions")._1 == "1, 2")
    intercept[IllegalArgumentException] {
      runSql(s"DESCRIBE graft_store.`/tmp/desc-none`").collect()
    }
  }

  test("appendRowsNamed is the commit point: a second call with the same name no-ops") {
    val tbl = tmpDir("apnamed")
    Seq((1L, 10L)).toDF("k", "v").write.parquet(tbl)
    assert(TableStore.appendRowsNamed(spark, tbl,
      Seq((2L, 20L)).toDF("k", "v"), "copy-abc.parquet"))
    assert(!TableStore.appendRowsNamed(spark, tbl,
      Seq((3L, 30L)).toDF("k", "v"), "copy-abc.parquet"),
      "the name already committed — the retry must not duplicate")
    assert(TableStore.read(spark, tbl).count() == 2L)
  }

  test("OPTIMIZE refuses versioned roots and layout knobs on the wrong layout") {
    val ver = tmpDir("optver")
    VersionedTable.writeSnapshot(spark, Seq(1L).toDF("k"), ver)
    intercept[IllegalArgumentException] { runSql(s"OPTIMIZE graft_store.`$ver`").head() }
    val part = tmpDir("optpart")
    TableStore.atomicWritePartitioned(spark,
      Seq((1L, "a")).toDF("k", "p"), part, Seq("p"))
    intercept[IllegalArgumentException] {
      runSql(s"OPTIMIZE graft_store.`$part` ZORDER BY (k, k)").head()
    }
    intercept[IllegalArgumentException] {
      runSql(s"OPTIMIZE graft_store.`$part` TARGET 2 FILES").head()
    }
    val flat = tmpDir("optflat")
    Seq((1L, "a")).toDF("k", "s").write.parquet(flat)
    intercept[IllegalArgumentException] { // non-numeric zorder dimension
      runSql(s"OPTIMIZE graft_store.`$flat` ZORDER BY (k, s)").head()
    }
  }
}
