package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping over a clustered parquet table: a per-file
  * min/max manifest written next to the data, consulted at read time so a
  * key-range scan OPENS only the files whose span intersects the range,
  * and a copy-on-write range delete that rewrites only the files that can
  * contain matches.
  *
  * Why this exists when parquet already has row-group statistics: row-group
  * pruning still requires opening every file's footer. At 100 TB a table is
  * O(100k) files, and footer reads are O(files) round-trips to the object
  * store before the first byte of data; a manifest makes pruning O(1) listing
  * + a driver-side interval filter, which is exactly the jump Delta/Iceberg
  * make over raw parquet directories. The manifest lives in an
  * underscore-prefixed subdirectory, which Spark's file index treats as
  * hidden — plain `spark.read.parquet(path)` on the table keeps working.
  *
  * The manifest is maintained incrementally on delete (untouched files keep
  * their rows; only rewritten files are re-profiled), so maintenance cost is
  * proportional to the change, not the table.
  */
object SkippingIndex {

  val ManifestDir = "_skip_manifest"

  /** Per-file manifest stats. `file` is the absolute file path as reported
    * by `_metadata.file_path` at profile time.
    */
  case class FileStats(file: String, minKey: Long, maxKey: Long, rows: Long)

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Range-cluster `df` on `keyCol` into `numFiles` files (disjoint spans —
    * the precondition for skipping to bite) and write the per-file manifest.
    * Explicit partition count, not AQE-chosen: coalescing small inputs into
    * one file would defeat the layout, exactly as in [[Layout]].
    */
  def writeIndexed(spark: SparkSession, df: DataFrame, path: String,
                   keyCol: String, numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode("overwrite").parquet(path)
    val stats = profile(spark, spark.read.parquet(path), keyCol)
    writeManifest(spark, path, stats)
  }

  /** One distributed pass computing (min, max, rows) per file via the
    * `_metadata.file_path` hidden column — no per-file driver loop.
    */
  def profile(spark: SparkSession, df: DataFrame, keyCol: String): Seq[FileStats] = {
    df.select(col(keyCol).cast("long").as("k"), col("_metadata.file_path").as("file"))
      .groupBy(col("file"))
      .agg(min(col("k")).as("minKey"), max(col("k")).as("maxKey"),
        count(lit(1)).as("rows"))
      .collect() // bounded by file count, not row count
      .map(r => FileStats(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  // sidecar IO via graft.store.Sidecar (shared fence-then-swap commit)
  def writeManifest(spark: SparkSession, path: String, stats: Seq[FileStats]): Unit =
    graft.store.Sidecar.swap(spark, path, ManifestDir + "/manifest.tsv",
      stats.sortBy(_.file)
        .map(s => s"${s.file}\t${s.minKey}\t${s.maxKey}\t${s.rows}\n").mkString)

  def readManifest(spark: SparkSession, path: String): Seq[FileStats] =
    graft.store.Sidecar.readRequired(spark, path, ManifestDir + "/manifest.tsv")
      .split("\n").iterator.filter(_.nonEmpty).map { line =>
        val Array(file, lo, hi, rows) =
          graft.store.Sidecar.fields(path, ManifestDir + "/manifest.tsv", line, 4)
        FileStats(file, lo.toLong, hi.toLong, rows.toLong)
      }.toSeq

  /** The files whose [min,max] span intersects [lo,hi]. */
  def overlapping(stats: Seq[FileStats], lo: Long, hi: Long): Seq[FileStats] =
    stats.filter(s => s.minKey <= hi && s.maxKey >= lo)

  /** Manifest-pruned range scan: open only the overlapping files, then
    * apply the residual predicate (file spans are coarse). Returns the
    * frame plus (filesRead, filesTotal) for observability — the spec
    * asserts filesRead < filesTotal on a clustered table.
    */
  def prunedRead(spark: SparkSession, path: String, keyCol: String,
                 lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val stats = readManifest(spark, path)
    val keep = overlapping(stats, lo, hi)
    val df =
      if (keep.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(keep.map(_.file): _*)
        .filter(col(keyCol).between(lo, hi))
    (df, keep.size, stats.size)
  }

  /** Manifest-only table stats: (rows, minKey, maxKey) with ZERO data
    * files opened — the Iceberg-shaped metadata answer to `COUNT(*)` /
    * `MIN` / `MAX`, valid because the profiler counts every row and the
    * key column is non-null by the clustering contract. At 100 TB this
    * is the difference between a driver-side manifest read and a
    * full-table scan for the most common dashboard queries.
    */
  def tableStats(spark: SparkSession, path: String): (Long, Long, Long) = {
    val stats = readManifest(spark, path)
    require(stats.nonEmpty, s"empty manifest at $path")
    (stats.map(_.rows).sum, stats.map(_.minKey).min, stats.map(_.maxKey).max)
  }

  /** Metadata-accelerated EXACT range count: files whose span is fully
    * inside [lo,hi] contribute their manifest row counts without being
    * opened; only BOUNDARY files (overlapping but not contained) are
    * scanned with the residual predicate. On a clustered table a range
    * has at most two boundary files regardless of range size — scan cost
    * is O(1) files while the answer stays exact. Returns
    * (count, filesScanned, filesTotal).
    */
  def rangeCount(spark: SparkSession, path: String, keyCol: String,
                 lo: Long, hi: Long): (Long, Int, Int) = {
    val stats = readManifest(spark, path)
    val overlap = overlapping(stats, lo, hi)
    val (full, partial) = overlap.partition(s => s.minKey >= lo && s.maxKey <= hi)
    val metaCount = full.map(_.rows).sum
    val scanned =
      if (partial.isEmpty) 0L
      else spark.read.parquet(partial.map(_.file): _*)
        .filter(col(keyCol).between(lo, hi)).count()
    (metaCount + scanned, partial.size, stats.size)
  }

  /** Result of a copy-on-write delete: how many data files were carried
    * over untouched vs rewritten (the rewrite set is the manifest's
    * overlap set — cost proportional to the deleted range's footprint,
    * not the table).
    */
  case class DeleteStats(filesKept: Int, filesRewritten: Int, rowsDeleted: Long)

  /** Copy-on-write range delete into `dstPath`: files whose span cannot
    * contain [lo,hi] are copied byte-for-byte (at scale: a metadata-only
    * manifest pointer, here a file copy keeps the table self-contained);
    * overlapping files are read, filtered, and rewritten. The manifest is
    * maintained incrementally — untouched files keep their stats rows,
    * only rewritten output is re-profiled.
    */
  def deleteRange(spark: SparkSession, srcPath: String, dstPath: String,
                  keyCol: String, lo: Long, hi: Long): DeleteStats = {
    val stats = readManifest(spark, srcPath)
    val hit = overlapping(stats, lo, hi)
    val hitFiles = hit.map(_.file).toSet
    val kept = stats.filterNot(s => hitFiles.contains(s.file))

    val dst = new Path(dstPath)
    val f = fs(spark, dst)
    if (f.exists(dst)) f.delete(dst, true)
    f.mkdirs(dst)

    // untouched files: straight copy, same basename (no Spark job needed)
    val keptStats = kept.map { s =>
      val src = new Path(s.file)
      val out = new Path(dst, src.getName)
      org.apache.hadoop.fs.FileUtil.copy(f, src, f, out, false,
        spark.sparkContext.hadoopConfiguration)
      s.copy(file = f.makeQualified(out).toString)
    }

    // overlapping files: one Spark job over JUST those files
    var deleted = 0L
    val rewrittenStats =
      if (hit.isEmpty) Nil
      else {
        val before = hit.map(_.rows).sum
        val tmp = new Path(dst, "__rw_tmp")
        val survivors = spark.read.parquet(hit.map(_.file): _*)
          .filter(!col(keyCol).between(lo, hi))
        survivors
          .repartitionByRange(math.max(1, hit.size), col(keyCol))
          .sortWithinPartitions(col(keyCol))
          .write.mode("overwrite").parquet(tmp.toString)
        // move the rewritten parts up with a disambiguating prefix, then
        // profile only them for the manifest
        val parts = f.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet"))
        val moved = parts.map { st =>
          val out = new Path(dst, "rw-" + st.getPath.getName)
          if (!f.rename(st.getPath, out))
            throw new java.io.IOException(s"rewrite move failed for $out")
          f.makeQualified(out).toString
        }.toSeq
        f.delete(tmp, true)
        val rs =
          if (moved.isEmpty) Nil
          else profile(spark, spark.read.parquet(moved: _*), keyCol)
        deleted = before - rs.map(_.rows).sum
        rs
      }

    writeManifest(spark, dstPath, keptStats ++ rewrittenStats)
    DeleteStats(keptStats.size, rewrittenStats.size, deleted)
  }
}
