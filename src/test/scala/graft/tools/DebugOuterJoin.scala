package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Instrumented replica of the q145 stream-outer-join harness: per-batch
  * input rows and event-time watermark from recentProgress, to see
  * whether the sentinels advance the watermark and when state flushes.
  * Dev tool (test tree only).
  */
object DebugOuterJoin {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("dbg_outer")
    val src = root.resolve("src")
    val base = graft.queries.Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"ts", $"event_type")
    base.repartitionByRange(4, $"ts").write.mode("overwrite").parquet(src.toString)
    val maxTs = base.agg(max($"ts")).head().getTimestamp(0)
    Seq(1, 2, 3).foreach { i =>
      val before = java.nio.file.Files.list(src).toArray.toSet
      val ts = new java.sql.Timestamp(maxTs.getTime + i * 1000L * 24 * 3600 * 1000)
      Seq((-2L * i, -2L, ts, "view"), (-2L * i - 1, -3L, ts, "purchase"))
        .toDF("event_id", "user_id", "ts", "event_type")
        .coalesce(1).write.mode("append").parquet(src.toString)
      val later = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + i * 60000L)
      java.nio.file.Files.list(src).toArray.toSet.diff(before).foreach { p =>
        java.nio.file.Files.setLastModifiedTime(p.asInstanceOf[java.nio.file.Path], later)
      }
    }
    println("[debug] files:")
    java.nio.file.Files.list(src).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.toString.endsWith(".parquet"))
      .sortBy(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
      .foreach(p => println(s"  ${java.nio.file.Files.getLastModifiedTime(p)} ${p.getFileName}"))

    val schema = base.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
      .withWatermark("ts", "35 days")
    val views = stream.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id", $"ts")
    val purchases = stream.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    val joined = graft.streaming.EventStream.intervalJoinOuter(
        views, purchases, Seq("user_id"), windowMs = 30L * 60L * 1000L)
      .filter(col("l.view_id") >= 0)
      .select(col("l.view_id"), col("r.purchase_id"))
    val out = root.resolve("out")
    val q = joined.writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"[debug] batch=${p.batchId} rows=${p.numInputRows} " +
        s"eventTime=${p.eventTime} sink=${p.sink.numOutputRows} " +
        s"sources=${p.sources.map(s => s.numInputRows).mkString("/")}")
      p.stateOperators.foreach(so => println(
        s"[debug]   state rows=${so.numRowsTotal} removed=${so.numRowsRemoved}"))
    }
    val res = spark.read.parquet(out.toString)
    println(s"[debug] total=${res.count()} nulls=${res.filter($"purchase_id".isNull).count()}")
    spark.stop()
  }
}
