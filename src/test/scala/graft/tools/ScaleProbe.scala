package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale probe (round-6 verdict task 7): build a one-off sf1-equivalent
  * fixture from the sf0.1 tables and run the three heaviest queries once,
  * recording wall time and the executed plan's operator histogram at both
  * SFs — the cheapest way to catch a super-linear cliff or a plan-shape
  * flip before a real 100× scale-up.
  *
  * Fixture derivation (probe-only, never graded):
  *  - orders/lineitem/customer: 10 key-offset replicas. The offset is a
  *    multiple of lcm(3,20,11,97,5,2)=64020 so every `o_orderkey % k`
  *    branch rule in InvoicePipeline.buildTables keeps its distribution,
  *    and referential integrity (orderkey/custkey) is preserved per
  *    replica.
  *  - documents: 10 replicas with offset doc_ids; each replica's text gets
  *    a replica-specific token woven between words so cross-replica pairs
  *    are NOT near-dups (Jaccard ~0) — the dup rate stays ~constant and
  *    the workload scales linearly instead of degenerating into a
  *    10-way-duplicate stress test.
  *
  *   sbt "Test/runMain graft.tools.ScaleProbe /root/testdata/sf0.1 /tmp/graft_sf1"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val replicas = 10
    val keyOff = 640200L // 10 * lcm(3,20,11,97) — preserves every % rule

    def replicate(df: DataFrame, mutate: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until replicas).map(i => mutate(df, i)).reduce(_ unionByName _)

    def stage(name: String)(df: => DataFrame): Unit = {
      val p = s"$outDir/$name.parquet"
      if (!new java.io.File(p).exists) {
        df.write.mode("overwrite").parquet(p)
        println(s"[probe] staged $name")
      }
    }

    stage("orders")(replicate(spark.read.parquet(s"$srcDir/orders.parquet"),
      (d, i) => d.withColumn("o_orderkey", $"o_orderkey" + lit(i * keyOff))
        .withColumn("o_custkey", $"o_custkey" + lit(i * 64020L))))
    stage("lineitem")(replicate(spark.read.parquet(s"$srcDir/lineitem.parquet"),
      (d, i) => d.withColumn("l_orderkey", $"l_orderkey" + lit(i * keyOff))))
    stage("customer")(replicate(spark.read.parquet(s"$srcDir/customer.parquet"),
      (d, i) => d.withColumn("c_custkey", $"c_custkey" + lit(i * 64020L))))
    val docMax = 1000000L
    stage("documents")(replicate(spark.read.parquet(s"$srcDir/documents.parquet"),
      (d, i) => d.withColumn("doc_id", $"doc_id" + lit(i * docMax))
        // weave a replica token between words: within-replica similarity
        // is preserved, cross-replica Jaccard collapses to ~0
        .withColumn("text",
          when(lit(i) === 0, $"text")
            .otherwise(regexp_replace($"text", " ", s" z$i ")))))

    // part: NOT replicated — lineitem keeps its l_partkey space across
    // replicas (replicas replicate orders, not the catalog), so the part
    // dimension stays a single copy, exactly how a dimension scales
    stage("part")(spark.read.parquet(s"$srcDir/part.parquet"))
    // nation: dimension, single copy (same rationale as part)
    stage("nation")(spark.read.parquet(s"$srcDir/nation.parquet"))

    // embeddings: 10 replicas with offset vec_ids; each replica's vectors
    // get a replica-specific bump on one coordinate so cross-replica
    // copies are near but NOT identical (pure scaling would leave cosine
    // exactly 1 and turn top-k into a 10-way tie stress test)
    stage("embeddings")(replicate(spark.read.parquet(s"$srcDir/embeddings.parquet"),
      (d, i) => d.withColumn("vec_id", $"vec_id" + lit(i * 1000000L))
        .withColumn("embedding",
          expr(s"transform(embedding, (x, j) -> CAST(x + IF(j = $i % 64, ${i * 0.03}, 0.0) AS FLOAT))"))))

    // events: 10 replicas over DISJOINT user populations (user offset) so
    // per-user event density — session lengths, state sizes — stays
    // constant and only the population scales, which is how event data
    // actually grows
    stage("events")(replicate(spark.read.parquet(s"$srcDir/events.parquet"),
      (d, i) => d.withColumn("event_id", $"event_id" + lit(i * 10000000L))
        .withColumn("user_id", $"user_id" + lit(i * 1000000L))))

    val defaultProbes = Seq("q30_minhash_pairs", "q47_dedup_groups", "q36_invoice_pipeline",
      // round-7 additions: sketch-based heavy hitters (19x shingle-ish
      // bigram volume), co-bucketed join (10x rows through a fixed
      // layout), posting-list retrieval (index build dominates),
      // compaction (pure shuffle+write), and the heaviest streaming
      // replay (10x state volume through the same 8-partition stores)
      "q85_heavy_hitters", "q89_bucketed_join", "q95_sparse_retrieval",
      "q94_compaction", "q88_stream_state_agg",
      // late-round-7 additions: CDC upsert (10x merge volume), histogram
      // quantile sketch (10x rows into fixed bin state), and the
      // corpus-build composite (19x token volume through the per-source/
      // per-lang window chain — the few-streams skew case the q64
      // scaladoc's (lang, shard) note is about)
      "q96_upsert_changelog", "q99_quantile_sketch", "q100_corpus_build",
      // round-9 continuation: the heaviest new streaming replay (both-side
      // state expiry), the bounded-state dedup (10x keys through fixed
      // stores), and the culled winnowing join (the pre-cull 47x case)
      "q208_stream_full_outer", "q213_dedup_bounded", "q214_winnowing")
    // args beyond srcDir/outDir select a probe subset (re-runs stay cheap)
    val probes = if (args.length > 2) args.drop(2).toSeq else defaultProbes
    def opHistogram(df: DataFrame): Map[String, Int] =
      df.queryExecution.executedPlan.toString.linesIterator
        .map(_.dropWhile(c => !c.isLetter).takeWhile(c => c.isLetterOrDigit))
        .filter(_.nonEmpty).toSeq.groupBy(identity).map { case (k, v) => k -> v.size }

    // Same cleanup discipline as the graded Bench (round-10): blocking
    // unpersist FIRST (clearCache alone deregisters cached RDDs with
    // blocking=false, so their eviction lands inside the next timed run),
    // then the registry clear, then a synchronous broadcast scrub. Without
    // this, the histogram-construction pass of an EAGER query (q47's
    // component solve, the store queries) left its multi-GB sf1 caches
    // resident while the timed run re-cached its own copy — double
    // footprint, spills, and 2-7x inflated "ratios" that read as
    // super-linear cliffs when the operator was actually linear.
    def cleanup(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      org.apache.spark.graft.BlockHygiene.dropBroadcasts(spark.sparkContext)
      System.gc()
    }
    probes.foreach { name => try {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, srcDir).count() // warm JIT/codegen at the small SF
      cleanup()
      val shapeSmall = opHistogram(fn(spark, srcDir))
      cleanup() // an eager query's construction may itself cache
      val t0s = System.nanoTime(); val nSmall = fn(spark, srcDir).count()
      val dtSmall = (System.nanoTime() - t0s) / 1e9
      cleanup()
      val shapeBig = opHistogram(fn(spark, outDir))
      cleanup()
      val t0 = System.nanoTime(); val nBig = fn(spark, outDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup()
      val heap = (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / (1 << 20)
      val drift = (shapeSmall.keySet ++ shapeBig.keySet)
        .filter(k => shapeSmall.getOrElse(k, 0) != shapeBig.getOrElse(k, 0))
        .toSeq.sorted
        .map(k => s"$k ${shapeSmall.getOrElse(k, 0)}->${shapeBig.getOrElse(k, 0)}")
      println(f"[probe] $name sf0.1: $dtSmall%.2fs ($nSmall rows)  sf1: $dt%.2fs ($nBig rows)  " +
        f"ratio ${dt / dtSmall}%.1fx  heapAfter ${heap}MB")
      println(s"[probe] $name plan drift: ${if (drift.isEmpty) "none" else drift.mkString(", ")}")
    } catch {
      case e: Throwable =>
        println(s"[probe] $name FAILED at 10x: ${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("").take(300)}")
    }}
    spark.stop()
  }
}
