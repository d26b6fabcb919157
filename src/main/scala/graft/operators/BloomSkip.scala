package graft.operators

import java.util.Base64

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.expressions.{BloomFilterExprs, BloomProbe}

/** Per-file Bloom-filter data skipping — the point-lookup complement of
  * [[SkippingIndex]]'s min/max manifest.
  *
  * Min/max pruning only bites when the table is clustered on the lookup
  * key; on any other layout (hash-scattered ingest output, a table
  * clustered on time while lookups come by id) every file's [min,max]
  * span covers the whole key domain and a point lookup opens all of
  * them. A per-file Bloom filter prunes by CONTENT, not span: a key
  * lookup opens only the files whose filter might contain the key —
  * expected O(keys · (1 + ε·files)) file opens on any layout. At 100 TB
  * (O(100k) files) that is the difference between a point lookup
  * touching ~1 file and touching the table.
  *
  * Build is one distributed pass (`groupBy(_metadata.file_path)` over
  * the mergeable [[graft.functions.expressions.BloomBuildAgg]]); the
  * manifest is file → (rows, base64 bloom) in an underscore-prefixed
  * sidecar directory that plain readers ignore, atomically swapped like
  * [[SkippingIndex]]'s. Lookups stay EXACT: Bloom filters have no false
  * negatives, and the residual `IN` filter on the opened files removes
  * false positives — pruning can only cost extra file opens, never rows.
  */
object BloomSkip {

  val ManifestDir = "_bloom_manifest"

  case class FileBloom(file: String, rows: Long, bloom: Array[Byte])

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write `df` hash-scattered on `scatterCol` into `numFiles` files (the
    * layout ingest naturally produces — and the one min/max skipping is
    * useless on) and build the per-file Bloom manifest over `keyCol`.
    */
  def writeIndexed(spark: SparkSession, df: DataFrame, path: String,
                   keyCol: String, scatterCol: String, numFiles: Int,
                   numBits: Int = 1 << 17, numHashes: Int = 5): Unit = {
    df.repartition(numFiles, col(scatterCol))
      .write.mode("overwrite").parquet(path)
    buildManifest(spark, path, keyCol, numBits, numHashes)
  }

  /** One distributed pass building (rows, bloom) per file. Keys are
    * hashed via their canonical string form so the driver-side probe
    * ([[lookupFiles]]) evaluates the identical xxhash64 path.
    */
  def buildManifest(spark: SparkSession, path: String, keyCol: String,
                    numBits: Int, numHashes: Int): Unit = {
    BloomFilterExprs.register(spark)
    val stats = spark.read.parquet(path)
      .select(col(keyCol).cast("string").as("k"),
        col("_metadata.file_path").as("file"))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("rows"),
        BloomFilterExprs.bloomBuild(col("k"), numBits, numHashes).as("bloom"))
      .collect() // bounded by file count, not row count
      .map(r => FileBloom(r.getString(0), r.getLong(1), r.getAs[Array[Byte]]("bloom")))
      .toSeq
    writeManifest(spark, path, stats)
  }

  // sidecar IO via graft.store.Sidecar: fence-then-swap on write (the
  // store tier's commit contract), one shared read/swap implementation
  def writeManifest(spark: SparkSession, path: String, stats: Seq[FileBloom]): Unit =
    graft.store.Sidecar.swap(spark, path, ManifestDir + "/manifest.tsv",
      stats.sortBy(_.file).map { s =>
        s"${s.file}\t${s.rows}\t${Base64.getEncoder.encodeToString(s.bloom)}\n"
      }.mkString)

  def readManifest(spark: SparkSession, path: String): Seq[FileBloom] =
    graft.store.Sidecar.readRequired(spark, path, ManifestDir + "/manifest.tsv")
      .split("\n").iterator.filter(_.nonEmpty).map { line =>
        val Array(file, rows, b64) =
          graft.store.Sidecar.fields(path, ManifestDir + "/manifest.tsv", line, 3)
        FileBloom(file, rows.toLong, Base64.getDecoder.decode(b64))
      }.toSeq

  /** The files whose Bloom filter might contain ANY of `keys` (canonical
    * string form — must match [[buildManifest]]'s cast).
    */
  def lookupFiles(stats: Seq[FileBloom], keys: Seq[String]): Seq[FileBloom] = {
    val u = keys.map(UTF8String.fromString)
    stats.filter { s =>
      val probe = new BloomProbe(s.bloom)
      u.exists(probe.contains)
    }
  }

  /** Result of a Bloom-pruned copy-on-write upsert: how many data files
    * were carried over untouched vs rewritten.
    */
  case class UpsertStats(filesKept: Int, filesRewritten: Int, rowsIncoming: Long)

  /** Bloom-pruned copy-on-write upsert into `dstPath` — the file-level
    * MERGE pruning move (the jump Delta/Iceberg make over
    * rewrite-the-table): files whose Bloom filter rules out EVERY
    * incoming key are carried over byte-for-byte (at scale: a
    * metadata-only manifest pointer); only maybe-hit files are read,
    * anti-joined against the incoming keys, merged with the delta, and
    * rewritten. Correct by the no-false-negative property: an untouched
    * file definitively contains none of the incoming keys. The manifest
    * is maintained incrementally — untouched files keep their rows, only
    * rewritten output is re-profiled — so maintenance cost is
    * proportional to the delta's file footprint, not the table.
    *
    * Semantics mirror `TableStore.upsert`: incoming rows replace same-key
    * rows and append new keys; `incoming` must be key-unique (checked).
    * The incoming key set is collected to drive the driver-side file
    * probe — bounded by `maxDriverKeys`, the explicit smallness contract
    * an upsert delta has (a delta approaching table size should take the
    * full-rewrite path instead).
    */
  def cowUpsert(spark: SparkSession, srcPath: String, dstPath: String,
                keyCol: String, incoming: DataFrame,
                maxDriverKeys: Int = 1 << 20): UpsertStats = {
    // guard against an in-place call: the first visible step wipes dst,
    // so src == dst would destroy the source irrecoverably
    require(new Path(srcPath) != new Path(dstPath),
      s"cowUpsert is copy-on-write into a NEW directory; src and dst are both $srcPath " +
        "— for in-place semantics upsert into a fresh dst and swap, or use TableStore.upsert")
    val stats = readManifest(spark, srcPath)
    require(stats.nonEmpty, s"no bloom manifest at $srcPath")
    val nIncoming = incoming.count()
    val keys = incoming.select(col(keyCol).cast("string").as("k"))
      .distinct().collect().map(_.getString(0)).toSeq
    require(keys.length == nIncoming, "incoming rows must be key-unique")
    require(keys.length <= maxDriverKeys,
      s"delta too large for pruned upsert (${keys.length} keys > $maxDriverKeys) — use the full-rewrite path")
    val victims = lookupFiles(stats, keys)
    val victimFiles = victims.map(_.file).toSet
    val kept = stats.filterNot(s => victimFiles.contains(s.file))

    val dst = new Path(dstPath)
    val f = fs(spark, dst)
    graft.store.WriterLease.fence(spark, dstPath) // before the destructive wipe
    if (f.exists(dst)) f.delete(dst, true)
    f.mkdirs(dst)

    // untouched files: straight copy, same basename (no Spark job)
    val keptStats = kept.map { s =>
      val src = new Path(s.file)
      val out = new Path(dst, src.getName)
      org.apache.hadoop.fs.FileUtil.copy(f, src, f, out, false,
        spark.sparkContext.hadoopConfiguration)
      s.copy(file = f.makeQualified(out).toString)
    }

    // victims ∪ delta: survivors (anti-join on key) + all incoming rows,
    // one Spark job over JUST the maybe-hit files
    val survivors =
      if (victims.isEmpty) incoming.limit(0)
      else spark.read.parquet(victims.map(_.file): _*)
        .join(incoming.select(col(keyCol)), Seq(keyCol), "left_anti")
    val merged = survivors.unionByName(incoming)
    val tmp = new Path(dst, "__rw_tmp")
    merged.repartition(math.max(1, victims.size))
      .write.mode("overwrite").parquet(tmp.toString)
    val parts = f.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet"))
    graft.store.WriterLease.fence(spark, dstPath) // before the visible moves
    val moved = parts.map { st =>
      val out = new Path(dst, "rw-" + st.getPath.getName)
      if (!f.rename(st.getPath, out))
        throw new java.io.IOException(s"rewrite move failed for $out")
      f.makeQualified(out).toString
    }.toSeq
    f.delete(tmp, true)

    // re-profile ONLY the rewritten files, at the manifest's own sizing
    // (self-describing header: numHashes in the bytes, numBits from length)
    val numHashes = graft.functions.expressions.BloomFilterFormat.decodeNumHashes(stats.head.bloom)
    val numBits = (stats.head.bloom.length - 4) * 8
    val rewrittenStats =
      if (moved.isEmpty) Nil
      else {
        graft.functions.expressions.BloomFilterExprs.register(spark)
        spark.read.parquet(moved: _*)
          .select(col(keyCol).cast("string").as("k"),
            col("_metadata.file_path").as("file"))
          .groupBy(col("file"))
          .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("rows"),
            graft.functions.expressions.BloomFilterExprs
              .bloomBuild(col("k"), numBits, numHashes).as("bloom"))
          .collect()
          .map(r => FileBloom(r.getString(0), r.getLong(1), r.getAs[Array[Byte]]("bloom")))
          .toSeq
      }
    writeManifest(spark, dstPath, keptStats ++ rewrittenStats)
    UpsertStats(keptStats.size, rewrittenStats.size, nIncoming)
  }

  /** Bloom-pruned point lookup: open only maybe-hit files, then the exact
    * residual `IN` filter. Returns (frame, filesRead, filesTotal) — the
    * spec asserts filesRead ≪ filesTotal on a scattered layout.
    */
  def prunedLookup(spark: SparkSession, path: String, keyCol: String,
                   keys: Seq[Long]): (DataFrame, Int, Int) = {
    val stats = readManifest(spark, path)
    val keep = lookupFiles(stats, keys.map(_.toString))
    val df =
      if (keep.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(keep.map(_.file): _*)
        .filter(col(keyCol).isin(keys: _*))
    (df, keep.size, stats.size)
  }
}
