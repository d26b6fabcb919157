package graft.operators

import graft.SparkSuite
import graft.queries.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class ShardWriterSpec extends SparkSuite {
  import spark.implicits._

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_shardwriter_spec")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(f => try java.nio.file.Files.delete(f) catch { case _: Throwable => () })
    }))
    p
  }

  private def docs = Tables.documents(spark, sf)
    .select($"doc_id", TextFunctions.tokenCount($"text").as("n_tokens"))

  private def freshShards(name: String, budget: Long): (String, Seq[ShardWriter.ShardStat]) = {
    val p = root.resolve(name).toString
    val stats = ShardWriter.writeShards(spark, docs, p, budget)
    (p, stats)
  }

  test("write + readVerified roundtrips every document exactly once") {
    val (p, stats) = freshShards("rt", 500L)
    assert(stats.size > 1, "fixture should span multiple shards")
    val back = ShardWriter.readVerified(spark, p)
    assert(back.count() == docs.count())
    assert(back.select($"doc_id").distinct().count() == docs.count())
  }

  test("budget bound: every non-final shard within maxDoc of the budget") {
    // offset-bucketed packing (shard = start offset div budget): a shard's
    // tokens are its window's span minus the head overhang plus the tail
    // crossing — both bounded by the largest document
    val budget = 500L
    val (p, stats) = freshShards("budget", budget)
    val maxDoc = docs.agg(max($"n_tokens")).head().getLong(0)
    stats.dropRight(1).foreach { s => // the last shard may be arbitrarily small
      assert(s.nTokens < budget + maxDoc, s"shard ${s.shardId}: ${s.nTokens}")
      assert(s.nTokens > budget - maxDoc,
        s"non-final shard ${s.shardId} under-filled: ${s.nTokens}")
    }
  }

  test("resume reads only the requested suffix with partition pruning") {
    val (p, stats) = freshShards("resume", 500L)
    val from = stats(stats.size / 2).shardId
    val resumed = ShardWriter.readVerified(spark, p, fromShard = from)
    assert(resumed.select($"shard_id").distinct().count() == stats.count(_.shardId >= from))
    // pruning visible in the plan: partition filters on shard_id
    val plan = resumed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard_id"), plan.take(500))
  }

  test("a tampered shard fails the read loudly, naming the shard") {
    val (p, stats) = freshShards("tamper", 500L)
    // inject a duplicate row into shard 0 via a rogue extra part file
    val victim = s"$p/shard_id=0"
    docs.limit(1).write.mode("append").parquet(victim)
    val e = intercept[ShardWriter.IntegrityError](ShardWriter.readVerified(spark, p))
    assert(e.getMessage.contains("shard 0"))
    // resume past the bad shard still works
    assert(ShardWriter.readVerified(spark, p, fromShard = 1L).count() > 0)
  }

  test("a shard missing from disk is detected") {
    val (p, stats) = freshShards("missing", 500L)
    val victim = new java.io.File(s"$p/shard_id=${stats.last.shardId}")
    victim.listFiles().foreach(_.delete()); victim.delete()
    val e = intercept[ShardWriter.IntegrityError](ShardWriter.readVerified(spark, p))
    assert(e.getMessage.contains(s"shard ${stats.last.shardId}"))
  }
}
