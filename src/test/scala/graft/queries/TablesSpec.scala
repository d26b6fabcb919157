package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.Timestamp

/** Regression pin for the `events.ts` encoding drift that zeroed 9 queries
  * in round 7: the driver-regenerated events.parquet switched from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) not-adjusted-to-UTC, which Spark
  * reads as TIMESTAMP_NTZ — and every `unix_micros`/`window()` consumer
  * failed analysis. `Tables.events` must normalize EVERY encoding it has
  * ever seen to session-TZ TimestampType with identical instant values.
  */
class TablesSpec extends SparkSuite {

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    Seq((1L, 1700000000000000L, 10L, "click", 1.5, "{}"),
        (2L, 1700000000500000L, 11L, "view", 2.5, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("events normalizes NTZ micros, nanos-long, and plain timestamp to one type and value") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("tables-spec").toFile
    base.deleteOnExit()
    val ntzDir = s"$base/ntz"; val ltzDir = s"$base/ltz"; val longDir = s"$base/long"
    writeEvents(ntzDir, timestamp_micros(col("us")).cast(TimestampNTZType))
    writeEvents(ltzDir, timestamp_micros(col("us")))
    // nanos-as-long generation: under nanosAsLong=true a NANOS column reads
    // back as LongType; emulate by writing the raw long directly
    writeEvents(longDir, (col("us") * 1000L))

    val results = Seq(ntzDir, ltzDir, longDir).map { d =>
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType === TimestampType, s"dir=$d")
      ev.orderBy("event_id").select("ts").collect().map(_.getTimestamp(0)).toSeq
    }
    assert(results(0) === results(1), "NTZ vs LTZ instants differ")
    assert(results(0) === results(2), "NTZ vs nanos-long instants differ")
    assert(results(0).head === Timestamp.valueOf("2023-11-14 22:13:20"))
  }

  test("live sf0.001 events is timestamp-typed and event-time functions analyze") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType)
    // the exact call shape that failed in round 7
    assert(ev.select(unix_micros(col("ts"))).limit(1).count() === 1L)
  }
}
