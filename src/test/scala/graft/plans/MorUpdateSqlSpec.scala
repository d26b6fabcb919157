package graft.plans

import graft.SparkSuite
import graft.operators.DeletionVectors
import java.nio.file.Files

/** SQL UPDATE routed to the deletion-vector tier (round-13 verdict
  * item 3): key-membership predicates mask-and-append with zero data
  * files rewritten; everything else refuses with the routing message.
  */
class MorUpdateSqlSpec extends SparkSuite {
  import spark.implicits._

  private def parser = new GraftSqlParser(spark.sessionState.sqlParser)

  private def runSql(sql: String) =
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, parser.parsePlan(sql))

  private def mkMor(name: String): String = {
    val tbl = Files.createTempDirectory("morupd").resolve(name).toString
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "s", "v").coalesce(1).write.mode("overwrite").parquet(tbl)
    // the sidecar exists from here on (k=2 masked)
    DeletionVectors.dvDelete(spark, tbl, Seq(2L).toDF("k"), "k")
    tbl
  }

  test("key-membership UPDATE masks originals and appends images; deleted keys stay dead") {
    val tbl = mkMor("route")
    def files() = new java.io.File(tbl).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).sortBy(_._1).toSeq
    val before = files()
    // k=2 is DV-deleted: the update's dvRead locate must NOT resurrect it
    val n = runSql(s"UPDATE graft_store.`$tbl` SET v = v * 10 WHERE k IN (2, 3)")
      .head().getLong(0)
    assert(n == 3L, "live count: 4 rows minus the masked k=2")
    val after = files()
    assert(after.filter(f => before.exists(_._1 == f._1)) == before,
      "no pre-existing data file may be touched")
    assert(after.exists(_._1.startsWith("mor-")), "images append as mor-* files")
    val rows = DeletionVectors.dvRead(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 10L), (3L, 300L), (4L, 40L)),
      s"k=3 updated, k=2 still deleted, others untouched: $rows")
  }

  test("assignments see the OLD row simultaneously on the MoR route too") {
    val tbl = mkMor("simul")
    runSql(s"UPDATE graft_store.`$tbl` SET v = v + k, s = concat(s, v) WHERE k = 3")
      .collect()
    val r = DeletionVectors.dvRead(spark, tbl).filter($"k" === 3L).head()
    assert(r.getString(1) == "c30" && r.getLong(2) == 33L)
  }

  test("refusals: non-membership predicate, unconditional, assigning the key") {
    val tbl = mkMor("refuse")
    val e1 = intercept[IllegalArgumentException](
      runSql(s"UPDATE graft_store.`$tbl` SET v = 0 WHERE v > 15").collect())
    assert(e1.getMessage.contains("key-membership"))
    val e2 = intercept[IllegalArgumentException](
      runSql(s"UPDATE graft_store.`$tbl` SET v = 0").collect())
    assert(e2.getMessage.contains("unconditional UPDATE"))
    val e3 = intercept[IllegalArgumentException](
      runSql(s"UPDATE graft_store.`$tbl` SET k = k + 1 WHERE k = 3").collect())
    assert(e3.getMessage.contains("assigns the"))
    // nothing moved
    assert(DeletionVectors.dvRead(spark, tbl).count() == 3)
  }
}
