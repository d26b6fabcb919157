package graft.store

import graft.SparkSuite
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Exactly-once CDC contract: a replayed batch id is applied ONCE even
  * when the replay carries different (non-idempotent) content, on both
  * the flat and the partitioned apply; the ledger rides the atomic swap
  * (flat) / the roll-forward partition-stage protocol (partitioned), so
  * a crash can never separate data from ledger.
  */
class ExactlyOnceCdcSpec extends SparkSuite {
  import spark.implicits._

  private def mkPath(n: String) =
    Files.createTempDirectory("x1cdc").resolve(n).toString

  private def feedOf(rows: Seq[(String, Long, Double)]) =
    rows.toDF("op", "id", "v")

  test("flat: same batch id with altered content applies exactly once") {
    val path = mkPath("flat")
    // batch 0 bootstraps
    assert(TableStore.applyCdcExactlyOnce(spark, path,
      feedOf(Seq(("I", 1L, 1.0), ("I", 2L, 2.0))), Seq("id"), batchId = 0))
    assert(TableStore.lastAppliedBatch(spark, path) == 0L)
    // batch 1 updates id=1 to 10.0
    assert(TableStore.applyCdcExactlyOnce(spark, path,
      feedOf(Seq(("U", 1L, 10.0))), Seq("id"), batchId = 1))
    // REPLAY of batch 1 with poison content (a non-idempotent feed):
    // skipped, value unchanged — the single-application proof
    assert(!TableStore.applyCdcExactlyOnce(spark, path,
      feedOf(Seq(("U", 1L, -777.0))), Seq("id"), batchId = 1))
    // stale id 0 replay likewise skipped
    assert(!TableStore.applyCdcExactlyOnce(spark, path,
      feedOf(Seq(("U", 2L, -777.0))), Seq("id"), batchId = 0))
    val got = TableStore.read(spark, path).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 10.0), (2L, 2.0)))
    // progress is not blocked: the next real id applies
    assert(TableStore.applyCdcExactlyOnce(spark, path,
      feedOf(Seq(("D", 2L, 0.0))), Seq("id"), batchId = 2))
    assert(TableStore.read(spark, path).count() == 1L)
    assert(TableStore.lastAppliedBatch(spark, path) == 2L)
  }

  test("partitioned: ledger rides the partition-stage roll-forward") {
    val path = mkPath("part")
    def pfeed(rows: Seq[(String, Long, Double, String)]) =
      rows.toDF("op", "id", "v", "day")
    assert(TableStore.applyCdcPartitionedExactlyOnce(spark, path,
      pfeed(Seq(("I", 1L, 1.0, "d1"), ("I", 2L, 2.0, "d2"))),
      Seq("id"), "day", batchId = 0))
    assert(TableStore.applyCdcPartitionedExactlyOnce(spark, path,
      pfeed(Seq(("U", 1L, 10.0, "d1"))), Seq("id"), "day", batchId = 1))
    assert(TableStore.lastAppliedBatch(spark, path) == 1L)
    // poison replay of batch 1: skipped
    assert(!TableStore.applyCdcPartitionedExactlyOnce(spark, path,
      pfeed(Seq(("U", 1L, -777.0, "d1"))), Seq("id"), "day", batchId = 1))
    val got = TableStore.read(spark, path).select("id", "v").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 10.0), (2L, 2.0)))
  }

  test("partitioned: a crash between stage-commit steps cannot separate data from ledger") {
    val path = mkPath("crash")
    def pfeed(rows: Seq[(String, Long, Double, String)]) =
      rows.toDF("op", "id", "v", "day")
    assert(TableStore.applyCdcPartitionedExactlyOnce(spark, path,
      pfeed(Seq(("I", 1L, 1.0, "d1"), ("I", 2L, 2.0, "d2"))),
      Seq("id"), "day", batchId = 0))
    // batch 1 dies right after its stage is fully marked (partStaged):
    // neither partitions nor ledger have moved yet
    TableStore.crashHook = step =>
      if (step == "partStaged") throw new RuntimeException("injected crash")
    try intercept[RuntimeException] {
      TableStore.applyCdcPartitionedExactlyOnce(spark, path,
        pfeed(Seq(("U", 1L, 10.0, "d1"))), Seq("id"), "day", batchId = 1)
    } finally TableStore.crashHook = _ => ()
    // recovery (any read) rolls the marked stage forward — data AND
    // ledger land together, so the replayed batch id is then skipped
    assert(TableStore.read(spark, path).filter($"id" === 1L)
      .select("v").head().getDouble(0) == 10.0)
    assert(TableStore.lastAppliedBatch(spark, path) == 1L)
    assert(!TableStore.applyCdcPartitionedExactlyOnce(spark, path,
      pfeed(Seq(("U", 1L, -777.0, "d1"))), Seq("id"), "day", batchId = 1))
  }

  test("streaming sink end-to-end: replayed poison after the run changes nothing") {
    val root = Files.createTempDirectory("x1sink")
    val src = root.resolve("src")
    Files.createDirectories(src)
    val replica = root.resolve("replica").toString
    // two single-file micro-batches
    feedOf(Seq(("I", 1L, 1.0), ("I", 2L, 2.0))).coalesce(1)
      .write.mode("append").parquet(src.toString)
    feedOf(Seq(("U", 2L, 20.0), ("I", 3L, 3.0))).coalesce(1)
      .write.mode("append").parquet(src.toString)
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    val q = graft.streaming.EventStream.cdcSinkExactlyOnce(
      stream, replica, Seq("id"), root.resolve("ckpt").toString)
    q.awaitTermination()
    assert(TableStore.lastAppliedBatch(spark, replica) == 1L)
    assert(!TableStore.applyCdcExactlyOnce(spark, replica,
      feedOf(Seq(("U", 1L, -777.0))), Seq("id"), batchId = 1))
    val got = TableStore.read(spark, replica).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.0), (2L, 20.0), (3L, 3.0)))
  }
}
