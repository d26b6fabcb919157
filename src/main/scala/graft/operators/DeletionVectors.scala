package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion vectors + merge-on-read — the zero-rewrite mutation tier of
  * the store, complementing the copy-on-write paths:
  *
  *  - `TableStore.upsert` / q25: full rewrite (small tables, total merges)
  *  - `TableStore.upsertPartitioned` / q183: partition-pruned rewrite
  *  - [[BloomSkip.cowUpsert]] / q239: Bloom-pruned FILE-level rewrite
  *  - here / q240–q241: NO data file is touched at all — a delete marks
  *    (file, row position) pairs in a sidecar; an upsert marks the old
  *    rows of updated keys and APPENDS the delta as new part files.
  *
  * This is the Iceberg v2 / Delta deletion-vector move: mutation latency
  * becomes O(delta) with zero write amplification, at the price of a
  * read-side anti-join against the vector — which stays cheap because
  * the vector is delta-sized and broadcasts, so the base scan never
  * shuffles. Row positions come from parquet's stable in-file row index
  * (`_metadata.row_index`), the same identity Delta's DVs use; positions
  * survive any reader because parquet row order within an immutable file
  * is part of the format.
  *
  * The sidecar is one TSV manifest (`_deletion_vectors/dv.tsv`,
  * atomically swapped) in the store tier's manifest convention
  * ([[SkippingIndex]], [[BloomSkip]]); `compact` materializes survivors
  * — rewriting ONLY the files that carry deletions — and resets the
  * vector, bounding read-side debt.
  */
object DeletionVectors {

  val DvDir = "_deletion_vectors"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The live (file, rowIndex) deletion set; empty if no vector exists.
    * Sidecar IO via [[graft.store.Sidecar]] — the vector swap IS the
    * visible mutation, so the shared fence-then-swap is the commit point.
    * The sidecar also carries the CDC batch LEDGER (`B\t<id>` lines, see
    * [[morApplyCdc]]): ledger and mask commit in ONE atomic swap, which
    * is what makes the streaming MoR apply exactly-once.
    */
  def readDv(spark: SparkSession, path: String): Seq[(String, Long)] =
    sidecarLines(spark, path).collect {
      case line if !line.startsWith("B\t") =>
        val Array(file, idx) = line.split("\t")
        (file, idx.toLong)
    }

  /** Batch ids already applied to this table (the exactly-once ledger). */
  def appliedBatches(spark: SparkSession, path: String): Set[Long] =
    sidecarLines(spark, path).collect {
      case line if line.startsWith("B\t") => line.split("\t")(1).toLong
    }.toSet

  private def sidecarLines(spark: SparkSession, path: String): Seq[String] =
    graft.store.Sidecar.read(spark, path, DvDir + "/dv.tsv")
      .map(_.split("\n").toSeq.filter(_.nonEmpty)).getOrElse(Nil)

  /** Vector write PRESERVES the ledger (compaction resets masks, never
    * replay protection).
    */
  def writeDv(spark: SparkSession, path: String, dv: Seq[(String, Long)]): Unit =
    writeSidecar(spark, path, dv, appliedBatches(spark, path))

  private def writeSidecar(spark: SparkSession, path: String,
                           dv: Seq[(String, Long)], batches: Set[Long]): Unit =
    graft.store.Sidecar.swap(spark, path, DvDir + "/dv.tsv",
      batches.toSeq.sorted.map(b => s"B\t$b\n").mkString +
        dv.sorted.map { case (file, i) => s"$file\t$i\n" }.mkString)

  /** Mark every row whose key appears in `keys` as deleted — one
    * distributed pass locating (file, row_index) for matching keys, NO
    * data file touched. The located set is delta-sized by definition
    * (it IS the deleted rows), so collecting it into the manifest is the
    * same boundedness contract as the other manifests' file lists.
    */
  def dvDelete(spark: SparkSession, path: String, keys: DataFrame, keyCol: String): Long =
    mask(spark, path, locateHits(spark, path, keys, keyCol))

  /** (file, row_index) of every current row whose key is in `keys`. */
  private def locateHits(spark: SparkSession, path: String, keys: DataFrame,
                         keyCol: String): Seq[(String, Long)] =
    spark.read.parquet(path)
      .select(col(keyCol), col("_metadata.file_path").as("__file"),
        col("_metadata.row_index").as("__row"))
      .join(broadcast(keys.select(col(keyCol)).distinct()), Seq(keyCol), "left_semi")
      .select(col("__file"), col("__row"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Merge `hits` into the vector (the commit point); returns newly-masked count. */
  private def mask(spark: SparkSession, path: String, hits: Seq[(String, Long)]): Long = {
    val prior = readDv(spark, path)
    val merged = (prior ++ hits).distinct
    writeDv(spark, path, merged)
    merged.size.toLong - prior.size.toLong
  }

  /** The table as of the vector: base rows minus deletions. The vector
    * broadcasts (delta-sized), so the base scan is one pass, no shuffle —
    * the read-side cost of zero-rewrite mutation.
    */
  def dvRead(spark: SparkSession, path: String): DataFrame = {
    val base = spark.read.parquet(path)
    val dv = readDv(spark, path)
    if (dv.isEmpty) base
    else {
      import spark.implicits._
      val dvDf = dv.toDF("__file", "__row")
      base
        .withColumn("__file", col("_metadata.file_path"))
        .withColumn("__row", col("_metadata.row_index"))
        .join(broadcast(dvDf), Seq("__file", "__row"), "left_anti")
        .drop("__file", "__row")
    }
  }

  /** Merge-on-read upsert: APPEND the delta as new part files, then
    * DV-mask the PRE-APPEND rows of the updated keys — no existing file
    * is modified. `incoming` must be key-unique (checked). Returns the
    * number of newly-masked rows.
    *
    * Ordering is load-bearing: the old rows are LOCATED before the
    * append (so freshly-appended rows can never be masked), the append
    * lands first, and the vector swap — the commit — comes last. A
    * failure after the append but before the swap leaves transient
    * DUPLICATES for the updated keys, never loss; retrying the same
    * upsert converges (the retry's locate pass sees old + duplicate rows
    * and masks both before appending one fresh copy).
    */
  def morUpsert(spark: SparkSession, path: String, incoming: DataFrame,
                keyCol: String): Long = {
    val n = incoming.count()
    require(incoming.select(col(keyCol)).distinct().count() == n,
      "incoming rows must be key-unique")
    val hits = locateHits(spark, path, incoming.select(col(keyCol)), keyCol)
    appendDelta(spark, path, incoming)
    mask(spark, path, hits)
  }

  /** Append `rows` as new `mor-*` part files via a staging dir + rename:
    * Spark's append mode could leave partial files on failure; rename-in
    * keeps the visible commit atomic per file and collision-free via a
    * nonce prefix.
    */
  private def appendDelta(spark: SparkSession, path: String, rows: DataFrame): Unit = {
    val dst = new Path(path)
    val f = fs(spark, dst)
    val nonce = java.lang.Long.toHexString(System.nanoTime())
    val tmp = new Path(path, s"__append_$nonce")
    rows.write.mode("overwrite").parquet(tmp.toString)
    try {
      graft.store.WriterLease.fence(spark, path) // before the visible appends
      f.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet")).foreach { st =>
        val out = new Path(dst, s"mor-$nonce-${st.getPath.getName}")
        if (!f.rename(st.getPath, out))
          throw new java.io.IOException(s"append move failed for $out")
      }
    } finally f.delete(tmp, true) // fenced-out staging must not linger
  }

  /** EXACTLY-ONCE merge-on-read CDC apply: one changelog batch (`op` ∈
    * I/U/D + the replica's columns) against a MoR table, replay-protected
    * by a batch ledger living INSIDE the deletion-vector sidecar — the
    * mask and the ledger entry commit in the SAME atomic swap, so "batch
    * applied" and "its old rows masked" cannot be observed apart.
    *
    * Crash/replay analysis (the q241 ordering argument extended): a batch
    * whose swap committed is skipped by the ledger before ANY work; a
    * batch that crashed after its append but before its swap left orphan
    * duplicate rows and NO ledger entry — the replay's locate pass sees
    * old + orphan rows for the batch's keys, masks them all, and appends
    * one fresh copy: the visible state converges to exactly-once.
    * Returns false iff the ledger skipped the batch.
    */
  def morApplyCdc(spark: SparkSession, path: String, batch: DataFrame,
                  keyCol: String, batchId: Long): Boolean = {
    if (appliedBatches(spark, path).contains(batchId)) return false
    val n = batch.count()
    require(batch.select(col(keyCol)).distinct().count() == n,
      s"batch $batchId must be key-unique")
    val upserts = batch.filter(col("op").isin("I", "U")).drop("op")
    val allKeys = batch.select(col(keyCol)) // D keys mask-only; I/U keys replace
    val hits = locateHits(spark, path, allKeys, keyCol)
    if (upserts.limit(1).count() > 0) appendDelta(spark, path, upserts)
    val prior = readDv(spark, path)
    writeSidecar(spark, path, (prior ++ hits).distinct,
      appliedBatches(spark, path) + batchId) // ONE swap: mask + ledger
    true
  }

  /** Materialize the vector: rewrite ONLY the files that carry deletions
    * (survivor rows re-packed), leave every clean file in place, reset
    * the vector. Returns (filesRewritten, filesUntouched).
    */
  def compact(spark: SparkSession, path: String): (Int, Int) = {
    val dv = readDv(spark, path)
    if (dv.isEmpty) return (0, countDataFiles(spark, path))
    import spark.implicits._
    val dirty = dv.map(_._1).distinct
    val dst = new Path(path)
    val f = fs(spark, dst)
    val dvDf = dv.toDF("__file", "__row")
    val survivors = spark.read.parquet(dirty: _*)
      .withColumn("__file", col("_metadata.file_path"))
      .withColumn("__row", col("_metadata.row_index"))
      .join(broadcast(dvDf), Seq("__file", "__row"), "left_anti")
      .drop("__file", "__row")
    val nonce = java.lang.Long.toHexString(System.nanoTime())
    val tmp = new Path(path, s"__compact_$nonce")
    survivors.repartition(math.max(1, dirty.size))
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: move survivors in FIRST, reset the vector, then drop the dirty
    // originals — a crash between steps leaves extra rows masked by a
    // stale DV (still masked: DV rows reference the dirty files) or
    // double-present rows only AFTER the DV reset, which the final delete
    // bounds to a crash window the store's recover-on-read tiers document
    graft.store.WriterLease.fence(spark, path) // before the visible moves
    val moved = f.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet")).map { st =>
      val out = new Path(dst, s"cmp-$nonce-${st.getPath.getName}")
      if (!f.rename(st.getPath, out))
        throw new java.io.IOException(s"compact move failed for $out")
      out
    }
    f.delete(tmp, true)
    writeDv(spark, path, Nil)
    // housekeeping fence before dropping originals (the vacuum rationale)
    graft.store.WriterLease.fence(spark, path)
    dirty.foreach(d => f.delete(new Path(d), false))
    (moved.length, countDataFiles(spark, path) - moved.length)
  }

  private def countDataFiles(spark: SparkSession, path: String): Int = {
    val p = new Path(path)
    fs(spark, p).listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
  }
}
