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

  def writeManifest(spark: SparkSession, path: String, stats: Seq[FileBloom]): Unit = {
    val p = new Path(path, ManifestDir + "/manifest.tsv")
    val f = fs(spark, p)
    val tmp = new Path(path, ManifestDir + "/manifest.tsv__tmp")
    val out = f.create(tmp, true)
    try {
      val body = stats.sortBy(_.file).map { s =>
        s"${s.file}\t${s.rows}\t${Base64.getEncoder.encodeToString(s.bloom)}\n"
      }.mkString
      out.write(body.getBytes("UTF-8"))
    } finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new java.io.IOException(s"bloom manifest swap failed for $path")
  }

  def readManifest(spark: SparkSession, path: String): Seq[FileBloom] = {
    val p = new Path(path, ManifestDir + "/manifest.tsv")
    val f = fs(spark, p)
    val in = f.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](64 * 1024)
      Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
        .foreach(n => buf.write(chunk, 0, n))
      buf.toString("UTF-8")
    } finally in.close()
    text.split("\n").iterator.filter(_.nonEmpty).map { line =>
      val Array(file, rows, b64) = line.split("\t")
      FileBloom(file, rows.toLong, Base64.getDecoder.decode(b64))
    }.toSeq
  }

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
