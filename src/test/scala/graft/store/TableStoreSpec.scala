package graft.store

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TableStoreSpec extends SparkSuite {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "status", "price")

  private def batch = Seq(
    (2L, "X", 99.0),   // conflict
    (4L, "d", 40.0)    // new
  ).toDF("id", "status", "price")

  test("mergePlan: full update on conflict + insert of new rows") {
    val out = TableStore.mergePlan(base, batch, Seq("id")).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val r2 = out(1)
    assert(r2.getString(1) == "X" && r2.getDouble(2) == 99.0)
    assert(out(3).getString(1) == "d")
  }

  test("mergePlan: partial updateColumns keeps insert-only columns stale (§2.12)") {
    val out = TableStore.mergePlan(base, batch, Seq("id"), Some(Seq("price")))
      .orderBy("id").collect()
    val r2 = out(1)
    assert(r2.getString(1) == "b", "status is insert-only → keeps existing")
    assert(r2.getDouble(2) == 99.0, "price is updated")
    assert(out(3).getString(1) == "d", "new rows take all incoming columns")
  }

  test("mergePlan: ON CONFLICT takes incoming value even when null (not coalesce)") {
    val b = Seq((2L, null.asInstanceOf[String], 99.0)).toDF("id", "status", "price")
    val out = TableStore.mergePlan(base, b, Seq("id")).orderBy("id").collect()
    assert(out(1).isNullAt(1), "incoming null must overwrite on conflict")
  }

  test("upsert is idempotent and atomic on disk") {
    val dir = java.nio.file.Files.createTempDirectory("tablestore").toString
    val path = s"$dir/orders_tbl"
    TableStore.upsert(spark, path, base, Seq("id"))
    TableStore.upsert(spark, path, batch, Seq("id"))
    val once = TableStore.read(spark, path).orderBy("id").collect().toSeq
    TableStore.upsert(spark, path, batch, Seq("id"))
    val twice = TableStore.read(spark, path).orderBy("id").collect().toSeq
    assert(once == twice, "upsert(upsert(T,b),b) == upsert(T,b)")
    assert(once.map(_.getLong(0)) == Seq(1L, 2L, 3L, 4L))
    assert(!new java.io.File(path + "__tmp").exists, "tmp staging dir cleaned up")
  }

  test("dedupeByKey keeps last-wins deterministically") {
    val dup = Seq((1L, "old", 1.0, 1L), (1L, "new", 2.0, 2L))
      .toDF("id", "status", "price", "seq")
    val out = TableStore.dedupeByKey(dup, Seq("id"), "seq").collect()
    assert(out.length == 1 && out(0).getString(1) == "new")
  }

  test("mergePlan rejects schema mismatch") {
    val bad = Seq((1L, "x")).toDF("id", "status")
    intercept[IllegalArgumentException] {
      TableStore.mergePlan(base, bad, Seq("id"))
    }
  }
}
