package graft.store

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.functions._

class VersionedTableSpec extends SparkSuite {
  import spark.implicits._

  private def freshPath() =
    Files.createTempDirectory("vtab").toString + "/t"

  test("snapshot isolation: v1 readable and unchanged after v2 lands") {
    val path = freshPath()
    val v1 = VersionedTable.writeSnapshot(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    val v2 = VersionedTable.upsert(spark, path,
      Seq((2L, "B"), (3L, "c")).toDF("k", "v"), Seq("k"))
    assert(v1 == 1 && v2 == 2)
    val old = VersionedTable.readVersion(spark, path, 1)
      .orderBy($"k").as[(Long, String)].collect().toSeq
    assert(old == Seq((1L, "a"), (2L, "b")), "v1 must be untouched by the upsert")
    val cur = VersionedTable.read(spark, path)
      .orderBy($"k").as[(Long, String)].collect().toSeq
    assert(cur == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("upsert merge honors partial update-column lists, like TableStore") {
    val path = freshPath()
    VersionedTable.writeSnapshot(spark,
      Seq((1L, "keep", 10.0)).toDF("k", "status", "price"), path)
    VersionedTable.upsert(spark, path,
      Seq((1L, "clobber", 99.0)).toDF("k", "status", "price"),
      Seq("k"), updateColumns = Some(Seq("price")))
    val r = VersionedTable.read(spark, path).head()
    assert(r.getString(1) == "keep" && r.getDouble(2) == 99.0)
  }

  test("rollback is a pointer flip; roll-forward still possible; vacuum keeps current") {
    val path = freshPath()
    VersionedTable.writeSnapshot(spark, Seq((1L, 1)).toDF("k", "n"), path)
    VersionedTable.writeSnapshot(spark, Seq((1L, 2)).toDF("k", "n"), path)
    VersionedTable.writeSnapshot(spark, Seq((1L, 3)).toDF("k", "n"), path)
    VersionedTable.rollback(spark, path, 2)
    assert(VersionedTable.currentVersion(spark, path).contains(2))
    assert(VersionedTable.read(spark, path).head().getInt(1) == 2)
    // a new write after rollback becomes v4 (history is never rewritten)
    val v4 = VersionedTable.writeSnapshot(spark, Seq((1L, 4)).toDF("k", "n"), path)
    assert(v4 == 4)
    // vacuum(keepLast=1) keeps v4; pinned-version reads of dropped
    // versions then fail, current survives
    VersionedTable.vacuum(spark, path, keepLast = 1)
    assert(VersionedTable.read(spark, path).head().getInt(1) == 4)
    intercept[Exception](VersionedTable.readVersion(spark, path, 1).collect())
  }

  test("rollback to a missing version is rejected") {
    val path = freshPath()
    VersionedTable.writeSnapshot(spark, Seq((1L, 1)).toDF("k", "n"), path)
    intercept[IllegalArgumentException](VersionedTable.rollback(spark, path, 7))
  }

  test("changelog classifies inserts vs updates; upsertWithChangelog survives the swap") {
    val dir = Files.createTempDirectory("cdc").toString + "/t"
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val log1 = TableStore.upsertWithChangelog(spark, dir, b1, Seq("k"))
      .orderBy($"k").as[(Long, String)].collect().toSeq
    assert(log1 == Seq((1L, "insert"), (2L, "insert")))
    val b2 = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
    val log2 = TableStore.upsertWithChangelog(spark, dir, b2, Seq("k"))
      .orderBy($"k").as[(Long, String)].collect().toSeq
    assert(log2 == Seq((2L, "update"), (3L, "insert")))
    // the log remains collectable after the target was overwritten, and
    // the table itself merged correctly
    val t = TableStore.read(spark, dir).orderBy($"k").as[(Long, String)].collect().toSeq
    assert(t == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }
}
