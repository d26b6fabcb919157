package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** State-level contracts behind q212/q213 that the row oracle cannot see:
  * q90's exactness dedup (watermark spanning the replay) must RETAIN every
  * distinct key, while q213's dropDuplicatesWithinWatermark must EVICT —
  * its terminal state strictly smaller than the distinct-key count even
  * though both queries emit identical (exact) output. Reads the
  * checkpoints the graded runs leave behind via the Spark 4 state data
  * source, the same surface q212 grades.
  */
class StateStoreSpec extends SparkSuite {

  private def stateKeyCount(run: String): Long = {
    val ckpt = EventOps.streamUpsertRoot.resolve(run).resolve("ckpt")
    assert(java.nio.file.Files.exists(ckpt), s"checkpoint missing: $ckpt")
    spark.read.format("statestore").load(ckpt.toString).count()
  }

  test("q213 bounded dedup evicts state; q90 exactness dedup retains it") {
    import spark.implicits._
    val nDistinct = Tables.events(spark, sf).select($"event_id").distinct().count()

    val unbounded = EventOps.streamDedup(spark, sf).count()
    val retained = stateKeyCount("runDedup")
    assert(unbounded == nDistinct, "q90 output must be exactly the distinct keys")
    assert(retained == nDistinct,
      s"q90's whole-span watermark must retain every key: $retained vs $nDistinct")

    val bounded = EventOps.streamDedupBounded(spark, sf).count()
    val evicted = stateKeyCount("runDedupWm")
    assert(bounded == nDistinct, "q213 output must still be exactly the distinct keys")
    assert(evicted < nDistinct,
      s"q213's horizon must have evicted keys: state $evicted vs distinct $nDistinct")
    assert(evicted > 0, "terminal state should still hold the newest horizon")
  }

  test("q212 state readout exposes the dedup key schema") {
    import spark.implicits._
    EventOps.streamDedup(spark, sf).count()
    val st = spark.read.format("statestore")
      .load(EventOps.streamUpsertRoot.resolve("runDedup").resolve("ckpt").toString)
    assert(st.columns.contains("key") && st.columns.contains("value"))
    val ids = st.select(col("key.event_id").as[Long]).collect()
    assert(ids.distinct.length == ids.length, "state keys must be unique")
  }
}
