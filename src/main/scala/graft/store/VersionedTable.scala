package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Copy-on-write versioned snapshots over parquet — time travel, rollback,
  * and reader isolation for the upsert pipeline.
  *
  * [[TableStore.atomicWrite]] swaps the table in place: correct for a
  * single logical table, but history is gone the moment the rename lands.
  * Here every write lands in a fresh `v=N` directory and a CURRENT
  * pointer file names the live version, so:
  *  - readers pinned to a version are NEVER disturbed (their files are
  *    immutable — no delete+rename window at all),
  *  - any past snapshot stays queryable ([[readVersion]]) until vacuumed,
  *  - rollback is a pointer flip, not a data rewrite.
  *
  * This is the minimal shape of what table formats (Delta/Iceberg-style)
  * do with manifest files; on an object store the pointer write becomes a
  * conditional put. The pointer flip is an OVERWRITE rename (FileContext)
  * — atomic on HDFS; on RawLocalFileSystem it delegates to
  * delete-then-rename, so [[currentVersion]]'s fallback to the max
  * existing `v=N` directory covers both that tiny absent window and a
  * bootstrap crash (data written, pointer never created). Writers
  * may serialize through [[WriterLease]] — the flip fences first.
  *
  * At 100 TB: each upsert rewrites one new snapshot (the same copy-on-
  * write cost the flat table pays) but old files are shared-nothing
  * copies here for simplicity — a production format would reuse
  * unchanged files via manifests; the API surface (snapshot, read@v,
  * rollback, vacuum) is the part pipelines program against.
  */
object VersionedTable {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(path: String) = new Path(path, "CURRENT")

  private def versionDir(path: String, v: Int) = s"$path/v=$v"

  private def listVersions(spark: SparkSession, path: String): Seq[Int] = {
    val root = new Path(path)
    val f = fs(spark, root)
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toInt)
      .sorted
  }

  /** Snapshot versions present on disk, ascending — the maintenance
    * tier's census (SQL VACUUM reports versions before/after from it).
    */
  def versions(spark: SparkSession, path: String): Seq[Int] =
    listVersions(spark, path)

  /** The live version: the CURRENT pointer, or (mid-pointer-flip
    * fallback) the highest staged version directory. None for an empty
    * table.
    */
  def currentVersion(spark: SparkSession, path: String): Option[Int] = {
    val f = fs(spark, pointer(path))
    if (f.exists(pointer(path))) {
      val in = f.open(pointer(path))
      try {
        val r = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
        Some(r.readLine().trim.toInt)
      } finally in.close()
    } else listVersions(spark, path).lastOption
  }

  def readVersion(spark: SparkSession, path: String, v: Int): DataFrame =
    spark.read.parquet(versionDir(path, v))

  /** Read the live snapshot. */
  def read(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path, currentVersion(spark, path)
      .getOrElse(throw new java.util.NoSuchElementException(s"no versions at $path")))

  private def setPointer(spark: SparkSession, path: String, v: Int): Unit = {
    val f = fs(spark, pointer(path))
    WriterLease.fence(spark, path) // leased writers die loudly pre-flip
    val tmp = new Path(path, "CURRENT__tmp")
    val out = f.create(tmp, true)
    try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
    // overwrite rename: atomic on HDFS; the local FS's delete-then-rename
    // window is covered by currentVersion's max-version fallback
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      tmp.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, pointer(path), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Write `df` as the next snapshot and move the pointer; returns the
    * new version number. The data write completes fully before the
    * pointer moves, so a crash mid-write leaves the table at the old
    * version with an orphan directory (re-vacuumable), never a torn read.
    */
  def writeSnapshot(spark: SparkSession, df: DataFrame, path: String): Int = {
    // allocate past the HIGHEST STAGED version, not the pointer: after a
    // rollback the pointer sits below existing versions, and pointer+1
    // would silently overwrite history
    val next = listVersions(spark, path).lastOption.getOrElse(0) + 1
    df.write.mode("overwrite").parquet(versionDir(path, next))
    setPointer(spark, path, next)
    next
  }

  /** Merge `incoming` into the live snapshot (same semantics as
    * [[TableStore.upsert]], including partial update-column lists) and
    * land the result as a NEW version — prior snapshots stay readable.
    */
  def upsert(spark: SparkSession, path: String, incoming: DataFrame,
             keys: Seq[String], updateColumns: Option[Seq[String]] = None): Int =
    currentVersion(spark, path) match {
      case None => writeSnapshot(spark, incoming, path)
      case Some(v) =>
        val merged = TableStore.mergePlan(readVersion(spark, path, v),
          incoming, keys, updateColumns)
        writeSnapshot(spark, merged, path)
    }

  /** Non-destructive rollback: point CURRENT at an existing older
    * version. The rolled-back-over versions remain until [[vacuum]].
    */
  def rollback(spark: SparkSession, path: String, v: Int): Unit = {
    require(listVersions(spark, path).contains(v), s"version $v does not exist at $path")
    setPointer(spark, path, v)
  }

  /** Drop all version directories except the newest `keepLast` (the
    * current pointer's target is always kept) — but never a version
    * younger than `minAgeMs` (by directory mtime) and NEVER a version
    * with a live [[ReaderPins]] pin, regardless of age or retention: a
    * reader pinned to an old version must not lose its files mid-query.
    * The age guard remains as the blunt instrument for readers that did
    * not pin; the default 0 keeps pure count-based retention for callers
    * that KNOW no unpinned reader outlives a snapshot cycle. Vacuum
    * fences first: the deletes are not a commit point, but a fenced-out
    * writer's stale vacuum racing the new holder's publish must die
    * loudly rather than delete versions the new holder still references.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int,
             minAgeMs: Long = 0L): Unit = {
    WriterLease.fence(spark, path)
    val keep = listVersions(spark, path).takeRight(keepLast).toSet ++
      currentVersion(spark, path) ++ ReaderPins.livePinned(spark, path)
    val f = fs(spark, new Path(path))
    val cutoff = System.currentTimeMillis() - minAgeMs
    listVersions(spark, path).filterNot(keep)
      .filter(v => f.getFileStatus(new Path(versionDir(path, v))).getModificationTime < cutoff)
      .foreach { v => f.delete(new Path(versionDir(path, v)), true) }
  }

  /** [[readVersion]] under a live reader pin: the version's files cannot
    * be vacuumed while `body` runs (heartbeat keeps the pin alive past
    * its ttl), however aggressive the retention. The pin is released on
    * exit — success or failure. The pin-vs-vacuum race (a vacuum deleting
    * `v` in the instant between the caller choosing it and the pin file
    * landing) is closed by re-checking existence AFTER the pin: once the
    * pin is live and the directory still exists, no subsequent vacuum can
    * touch it, and a loss of that race fails loudly here rather than
    * mid-query.
    */
  def readVersionPinned[T](spark: SparkSession, path: String, v: Int,
                           ttlMs: Long = 60000L)(body: DataFrame => T): T =
    ReaderPins.withPin(spark, path, v, ttlMs) {
      if (!fs(spark, new Path(path)).exists(new Path(versionDir(path, v))))
        throw new java.util.NoSuchElementException(
          s"version $v at $path was vacuumed before the pin landed")
      body(readVersion(spark, path, v))
    }
}
