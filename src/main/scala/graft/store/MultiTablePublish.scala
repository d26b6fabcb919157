package graft.store

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic MULTI-table publish: N tables land together or not at all —
  * the cross-table transaction a warehouse needs when a fact table and
  * its derived aggregates (or a corpus and its index) must never be
  * readable from different versions. Single-table swaps
  * ([[TableStore.atomicWrite]], [[VersionedTable]]) cannot give this: a
  * crash between two independent swaps leaves table A at v2 and table B
  * at v1, and every join across them is silently torn.
  *
  * Protocol (manifest-pointer flip, the object-store-friendly shape):
  *  1. stage every table under `root/v=N/<table>` — old version untouched;
  *  2. create the `_STAGED` marker inside `v=N` (atomic create, written
  *     only after every table dir is complete);
  *  3. create the `_COMMIT` intent marker inside `v=N` — the durable
  *     commit point;
  *  4. flip the group's single `CURRENT` pointer to N with an OVERWRITE
  *     rename (`FileContext.rename(..., Rename.OVERWRITE)`) — atomic where
  *     the FS supports it (HDFS); on RawLocalFileSystem FileContext
  *     delegates to delete-then-rename, so a tiny pointer-absent window
  *     remains there and correctness rests on [[currentVersion]]'s
  *     fallback to the highest `_COMMIT`'d version, not on the flip alone.
  * Crash cases: during staging → no marker, readers stay on the old
  * pointer; after `_STAGED` but before `_COMMIT` → the publish is simply
  * lost (pointer still names the old version; both tables consistent; a
  * re-publish allocates past the orphan) and crucially the stage can
  * NEVER be silently resurrected — [[currentVersion]]'s pointer-absent
  * fallback only ever resolves versions that reached their `_COMMIT`
  * point (round-9 advice: the old roll-forward to merely-_STAGED versions
  * could revive a crashed, never-committed publish the moment the pointer
  * file was lost); after `_COMMIT` but before the flip → pointer still
  * names the old version (consistent; the intent matters only for the
  * bootstrap publish, where no pointer exists yet to keep naming the old
  * version). At every point all tables resolve through ONE version
  * number — torn cross-table reads are structurally impossible when read
  * through [[readAll]]/[[readAt]]. MultiPublishSpec drives each crash
  * point through the [[crashHook]] seam.
  *
  * Concurrency: one publisher per root — enforceable with
  * [[WriterLease.withLease]] on `root` (the flip fences first; a
  * publisher whose lease was broken dies loudly with the group intact).
  * Readers are always safe; for MULTI-table reads use [[readAll]] (or
  * [[readAt]] with a version from [[currentVersion]]): per-call [[read]]
  * resolves the pointer independently each time, so two `read` calls
  * racing a concurrent publish can observe different versions — exactly
  * the torn pair this store exists to prevent (round-9 advice).
  */
object MultiTablePublish {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(root: String) = new Path(root, "CURRENT")
  private def versionDir(root: String, v: Int) = s"$root/v=$v"
  private def marker(root: String, v: Int) = new Path(versionDir(root, v), "_STAGED")
  private def commitMark(root: String, v: Int) = new Path(versionDir(root, v), "_COMMIT")

  /** Test seam: labels `staged` (all tables + marker written), `intent`
    * (`_COMMIT` durable) and `committed` (pointer flipped). Production
    * no-op.
    */
  private[store] var crashHook: String => Unit = _ => ()

  private def listVersions(spark: SparkSession, root: String,
                           withMark: Option[Int => Path]): Seq[Int] = {
    val r = new Path(root)
    val f = fs(spark, r)
    if (!f.exists(r)) Nil
    else f.listStatus(r).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toInt)
      .filter(v => withMark.forall(m => f.exists(m(v))))
      .sorted
  }

  /** The live version: the pointer if present, else (bootstrap crash, or
    * the local-FS delete-then-rename window of the pointer flip) the
    * highest version whose `_COMMIT` intent is durable. A
    * version that is `_STAGED` but never reached `_COMMIT` is NEVER
    * resolved — a crashed publish cannot be resurrected by pointer loss.
    */
  def currentVersion(spark: SparkSession, root: String): Option[Int] = {
    val f = fs(spark, pointer(root))
    if (f.exists(pointer(root))) {
      val in = f.open(pointer(root))
      try {
        val r = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
        Some(r.readLine().trim.toInt)
      } finally in.close()
    } else listVersions(spark, root, Some(commitMark(root, _))).lastOption
  }

  /** Stage every table of the next version, mark it complete, record
    * commit intent, flip the group pointer atomically. Returns the
    * published version number.
    */
  def publish(spark: SparkSession, root: String,
              tables: Map[String, DataFrame]): Int = {
    require(tables.nonEmpty, "publish needs at least one table")
    val f = fs(spark, new Path(root))
    val next = (listVersions(spark, root, None) :+ 0).max + 1
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"${versionDir(root, next)}/$name")
    }
    val out = f.create(marker(root, next), true)
    try out.write("staged\n".getBytes("UTF-8")) finally out.close()
    crashHook("staged")
    // the fence sits BEFORE the durable commit point: a publisher whose
    // lease was broken dies while its stage is still unresolvable
    WriterLease.fence(spark, root)
    f.create(commitMark(root, next), true).close()
    crashHook("intent")
    val tmp = new Path(root, "CURRENT__tmp")
    val o = f.create(tmp, true)
    try o.write(s"$next\n".getBytes("UTF-8")) finally o.close()
    // overwrite rename: atomic on HDFS; on the local FS the _COMMIT
    // fallback in currentVersion covers its delete-then-rename window
    val fc = FileContext.getFileContext(tmp.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, pointer(root), Options.Rename.OVERWRITE)
    crashHook("committed")
    next
  }

  /** Read `table` at an EXPLICIT version — the primitive multi-table
    * readers compose: resolve [[currentVersion]] once, then read every
    * table at that pinned number.
    */
  def readAt(spark: SparkSession, root: String, v: Int, table: String): DataFrame =
    spark.read.parquet(s"${versionDir(root, v)}/$table")

  /** Read ALL the named tables at ONE pinned version — the cross-table
    * guarantee. Returns (version, table → frame). This, not N separate
    * [[read]] calls, is the safe shape under a concurrent publisher.
    */
  def readAll(spark: SparkSession, root: String,
              tables: Seq[String]): (Int, Map[String, DataFrame]) = {
    val v = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no published version at $root"))
    (v, tables.map(t => t -> readAt(spark, root, v, t)).toMap)
  }

  /** Read `table` at the group's live version. SINGLE-table convenience:
    * each call resolves the pointer independently, so two `read` calls
    * with a publish landing between them can observe different versions —
    * use [[readAll]]/[[readAt]] whenever more than one table participates
    * in the same computation.
    */
  def read(spark: SparkSession, root: String, table: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no published version at $root"))
    spark.read.parquet(s"${versionDir(root, v)}/$table")
  }

  /** Drop versions below the live one minus `keep` (retention count),
    * but never a version younger than `minAgeMs` (by directory mtime)
    * and NEVER a version with a live [[ReaderPins]] pin, regardless of
    * age or retention: a long-running reader pinned via [[readAllPinned]]
    * must not lose its files mid-query. The age guard remains for readers
    * that did not pin (round-9 advice item 8); `minAgeMs = 0` restores
    * pure count-based retention for callers that KNOW no unpinned reader
    * outlives a publish cycle. Vacuum fences first: a fenced-out
    * publisher's stale vacuum must die loudly rather than delete versions
    * the new holder still references.
    */
  def vacuum(spark: SparkSession, root: String, keep: Int = 1,
             minAgeMs: Long = 0L): Unit = {
    WriterLease.fence(spark, root)
    val pinned = ReaderPins.livePinned(spark, root)
    val f = fs(spark, new Path(root))
    val cutoff = System.currentTimeMillis() - minAgeMs
    currentVersion(spark, root).foreach { cur =>
      listVersions(spark, root, Some(marker(root, _)))
        .filter(_ < cur - keep)
        .filterNot(pinned)
        .filter(v => f.getFileStatus(new Path(versionDir(root, v))).getModificationTime < cutoff)
        .foreach { v => f.delete(new Path(versionDir(root, v)), true) }
    }
  }

  /** [[readAll]] under a live reader pin on the resolved version: the
    * pinned version cannot be vacuumed while `body` runs (heartbeat keeps
    * the pin alive past its ttl). This is the safe shape for a SLOW
    * cross-table consumer under both a concurrent publisher and an
    * aggressive vacuum.
    */
  def readAllPinned[T](spark: SparkSession, root: String, tables: Seq[String],
                       ttlMs: Long = 60000L)(body: (Int, Map[String, DataFrame]) => T): T = {
    val f = fs(spark, new Path(root))
    // the resolve→pin window can race an aggressive vacuum (the pin only
    // protects once its file is on disk): re-check the version dir AFTER
    // pinning and retry once against the freshly resolved version — after
    // a successful check the live pin makes any later vacuum skip us
    var attempt = 0
    while (true) {
      val v = currentVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(s"no published version at $root"))
      val result = ReaderPins.withPin(spark, root, v, ttlMs) {
        if (!f.exists(new Path(versionDir(root, v)))) None
        else Some(body(v, tables.map(t => t -> readAt(spark, root, v, t)).toMap))
      }
      result match {
        case Some(r) => return r
        case None if attempt == 0 => attempt = 1 // vacuumed mid-pin: re-resolve
        case None => throw new java.util.NoSuchElementException(
          s"version $v at $root vanished before the pin landed, twice — " +
            "a vacuum with zero retention is racing every read")
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
