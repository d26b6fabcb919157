package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase timer for the q249 MoR replication path: replicates the
  * graded query's exact phases (streamed foreachBatch applies, poison
  * replays, compact, graded read) with wall-clock per phase, to attribute
  * a bench regression to the apply loop, the compact, or the read.
  * Run: sbt "Test/runMain graft.tools.TimeMor /root/testdata/sf0.1"
  */
object TimeMor {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[timemor] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val root = java.nio.file.Files.createTempDirectory("timemor")
    // fixture: the exact q249 shapes
    val ev = graft.queries.Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val m5 = pmod($"event_id", lit(5))
    val seedP = root.resolve("replica_seed").toString
    val feedP = root.resolve("feed").toString
    ev.filter(m5 =!= 4)
      .withColumn("value", when(m5 === 0, lit(-1.0)).otherwise($"value"))
      .write.mode("overwrite").parquet(seedP)
    ev.filter(m5 === 1)
      .select(lit("D").as("op"), $"event_id", $"user_id", $"event_type", $"value")
      .unionByName(ev.filter(m5 === 0)
        .select(lit("U").as("op"), $"event_id", $"user_id", $"event_type", $"value"))
      .unionByName(ev.filter(m5 === 4)
        .select(lit("I").as("op"), $"event_id", $"user_id", $"event_type", $"value"))
      .repartitionByRange(4, $"event_id").write.mode("overwrite").parquet(feedP)
    val replica = root.resolve("replica_tbl").toString
    spark.read.parquet(seedP).write.mode("overwrite").parquet(replica)
    val feedSchema = spark.read.parquet(feedP).schema
    spark.conf.set("spark.sql.shuffle.partitions", 8)
    t("streaming replay (4 micro-batches)") {
      val feed = spark.readStream.schema(feedSchema)
        .option("maxFilesPerTrigger", 1).parquet(feedP)
      val q = graft.streaming.EventStream.cdcSinkMorExactlyOnce(
        feed, replica, "event_id", root.resolve("ckpt").toString)
      q.awaitTermination()
    }
    val poison = spark.read.parquet(feedP).withColumn("value", lit(-777.0))
    t("poison replay (ledger skip)") {
      graft.operators.DeletionVectors.morApplyCdc(spark, replica, poison, "event_id", 0)
    }
    // granular compact attribution: rebuild the survivors plan by hand
    val dv = t("readDv (expand pairs)") {
      graft.operators.DeletionVectors.readDv(spark, replica)
    }
    System.err.println(s"[timemor] masked pairs: ${dv.size}; dirty files: ${dv.map(_._1).distinct.size}")
    val dirty = dv.map(_._1).distinct
    t("survivors count (pair anti-join)") {
      spark.read.parquet(dirty: _*)
        .withColumn("__file", col("_metadata.file_path"))
        .withColumn("__row", col("_metadata.row_index"))
        .join(broadcast(dv.toDF("__file", "__row")), Seq("__file", "__row"), "left_anti")
        .count()
    }
    // manual compact replication with per-step timers
    locally {
      val f = new org.apache.hadoop.fs.Path(replica)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val survivors = t("step: survivors plan+write to tmp") {
        val s = spark.read.parquet(dirty: _*)
          .withColumn("__file", col("_metadata.file_path"))
          .withColumn("__row", col("_metadata.row_index"))
          .join(broadcast(dv.toDF("__file", "__row")), Seq("__file", "__row"), "left_anti")
          .drop("__file", "__row")
        s.repartition(math.max(1, dirty.size))
          .write.mode("overwrite").parquet(root.resolve("cmp_tmp").toString)
      }
      val v0pairs = dv
      t("step: swap#1 (writeDv same masks again)") {
        graft.operators.DeletionVectors.writeDv(spark, replica, v0pairs)
      }
      t("step: swap reset (writeDv Nil)") {
        graft.operators.DeletionVectors.writeDv(spark, replica, Nil)
      }
      // restore the masks the reset just cleared so compact below still
      // exercises the real pre-compact state
      graft.operators.DeletionVectors.writeDv(spark, replica, v0pairs)
    }
    t("compact") { graft.operators.DeletionVectors.compact(spark, replica) }
    t("replay after compact") {
      graft.operators.DeletionVectors.morApplyCdc(spark, replica, poison, "event_id", 0)
    }
    t("graded read count") {
      graft.operators.DeletionVectors.dvRead(spark, replica)
        .select($"event_id", $"user_id", $"event_type", $"value")
        .orderBy($"event_id").count()
    }
    spark.stop()
  }
}
