package graft.tools

import org.apache.spark.sql.SparkSession

/** End-to-end proof that `spark.sql.extensions=graft.GraftExtensions`
  * wires every tier into a FRESH session (this main runs in its own JVM,
  * so the builder genuinely applies the extensions — unlike a shared test
  * session):
  *
  *   sbt "runMain graft.tools.ExtensionsCheck"
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // function tier: graft_cosine from pure SQL
    val c = spark.sql(
      "SELECT graft_cosine(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(2 AS FLOAT))) AS c").head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-9, s"graft_cosine: $c")

    // function tier: the portable 60-bit hash (DuckDB twin of
    // ('0x'||substr(md5('abc'),1,15))::BIGINT)
    val h = spark.sql("SELECT graft_hash60('abc') AS h").head().getLong(0)
    assert(h == 648541476951500027L, s"graft_hash60: $h")

    // aggregate tier: KMV sketch, exact regime
    spark.sql("SELECT explode(sequence(1, 100)) AS v").createOrReplaceTempView("ec_t")
    val d = spark.sql("SELECT graft_kmv_distinct(v, 256) FROM ec_t").head().getLong(0)
    assert(d == 100, s"graft_kmv_distinct: $d")

    // optimizer-rule + planner-strategy tiers: the discarded rank filter
    // plans as the custom TopK pair
    spark.sql(
      "SELECT CAST(id % 7 AS INT) AS g, CAST(id AS INT) AS v FROM range(1000)")
      .createOrReplaceTempView("ec_src")
    val topk = spark.sql(
      """SELECT g, v FROM (
        |  SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC) AS rk
        |  FROM ec_src) t
        |WHERE rk <= 2""".stripMargin)
    assert(topk.count() == 14)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKFinal"), s"rewrite did not fire:\n${plan.take(600)}")

    // parser tier: MERGE INTO graft_store.`path` reaches TableStore.upsert
    // from genuine spark.sql text
    val tbl = java.nio.file.Files.createTempDirectory("ec_merge").resolve("t").toString
    spark.sql("SELECT CAST(id AS BIGINT) AS k, CAST(id AS BIGINT) AS v FROM range(10)")
      .createOrReplaceTempView("ec_base")
    graft.store.TableStore.atomicWrite(spark, spark.table("ec_base"), tbl)
    val n = spark.sql(
      s"""MERGE INTO graft_store.`$tbl`
         |USING (SELECT k, v + 100 AS v FROM ec_base WHERE k < 3
         |       UNION ALL SELECT CAST(99 AS BIGINT) AS k, CAST(0 AS BIGINT) AS v)
         |ON KEYS (k)""".stripMargin).head().getLong(0)
    assert(n == 11, s"post-merge n_rows: $n")
    val merged = graft.store.TableStore.read(spark, tbl)
    assert(merged.where("k = 1").head().getLong(1) == 101L, "matched row not updated")
    assert(merged.where("k = 99").count() == 1L, "unmatched row not inserted")

    // parser tier round 12: DELETE / UPDATE / MERGE-DELETE from spark.sql text
    val nd = spark.sql(s"DELETE FROM graft_store.`$tbl` WHERE k = 99").head().getLong(0)
    assert(nd == 10, s"post-delete n_rows: $nd")
    spark.sql(s"UPDATE graft_store.`$tbl` SET v = v + 1000 WHERE k < 2").collect()
    assert(graft.store.TableStore.read(spark, tbl).where("k = 1").head().getLong(1) == 1101L,
      "UPDATE did not apply")
    val nm = spark.sql(
      s"""MERGE INTO graft_store.`$tbl`
         |USING (SELECT CAST(5 AS BIGINT) AS k, CAST(0 AS BIGINT) AS v)
         |ON KEYS (k)
         |WHEN MATCHED THEN DELETE""".stripMargin).head().getLong(0)
    assert(nm == 9, s"post-merge-delete n_rows: $nm")

    // parser tier round 13: the SQL READ surface — SELECT FROM graft_store
    // applies deletion-vector masks that a raw parquet SELECT misses
    graft.operators.DeletionVectors.dvDelete(spark, tbl,
      spark.sql("SELECT CAST(0 AS BIGINT) AS k"), "k")
    val nRaw = spark.sql(s"SELECT COUNT(*) AS n FROM parquet.`$tbl`").head().getLong(0)
    val nStore = spark.sql(s"SELECT COUNT(*) AS n FROM graft_store.`$tbl`").head().getLong(0)
    assert(nStore == nRaw - 1,
      s"graft_store SELECT must hide the masked row: raw=$nRaw store=$nStore")

    // parser tier round 14: the MAINTENANCE statements from spark.sql text
    val mt = java.nio.file.Files.createTempDirectory("ec_maint").resolve("m").toString
    val nCtas = spark.sql(s"CREATE TABLE graft_store.`$mt` AS " +
      "SELECT CAST(id AS BIGINT) AS k, CAST(id * 10 AS BIGINT) AS v FROM range(50)")
      .head().getLong(0)
    assert(nCtas == 50, s"CTAS n_rows: $nCtas")
    val opt = spark.sql(s"OPTIMIZE graft_store.`$mt` TARGET 1 FILES").head()
    assert(opt.getLong(1) == 1L && opt.getLong(2) == 50L,
      s"OPTIMIZE (files_after, n_rows): $opt")
    spark.sql(s"ALTER TABLE graft_store.`$mt` ADD CONSTRAINT v_pos CHECK (v >= 0)")
      .collect()
    val refusedByCheck = try {
      spark.sql(s"INSERT INTO graft_store.`$mt` VALUES (99, -1)").collect(); false
    } catch { case t: Throwable =>
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .exists(e => Option(e.getMessage).exists(_.contains("v_pos")))
    }
    assert(refusedByCheck, "a declared CHECK must refuse a violating INSERT from spark.sql")
    assert(spark.sql(s"DROP TABLE graft_store.`$mt`").head().getLong(0) == 1L)

    println("extensions OK: function + aggregate + rule + strategy + parser tiers (MERGE/DELETE/UPDATE/SELECT + CTAS/OPTIMIZE/CONSTRAINT/DROP) live via spark.sql.extensions")
    spark.stop()
  }
}
