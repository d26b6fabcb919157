package graft.store

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Shared sidecar-manifest IO for the store tier's underscore-prefixed
  * metadata files (min/max manifests, Bloom manifests, deletion vectors,
  * shard manifests): read-fully and fence-then-atomic-swap in ONE place,
  * so a hardening fix (bounds, fsync, fencing) lands once instead of
  * drifting across four copies. `swap` fences on the TABLE root (the
  * opt-in no-op-for-lease-less-callers contract of every store commit)
  * before the visible rename.
  *
  * Durability + atomicity (round-11 advice, both findings closed here):
  *
  *  - The tmp file is `hsync`'d before the rename, so a power loss after
  *    the swap returns cannot surface an empty or mid-line-truncated
  *    sidecar (`FSDataOutputStream.hsync` degrades to `flush` on streams
  *    that are not `Syncable`, which is the best a filesystem without
  *    sync can offer).
  *  - The visible rename OVERWRITES in one step (`FileContext.rename`
  *    with `Options.Rename.OVERWRITE` — atomic on HDFS and POSIX local
  *    rename) instead of delete-then-rename: the old sidecar survives
  *    until the new one lands, so there is no crash window in which NO
  *    sidecar exists — which for a deletion vector would silently read
  *    as "no deletions" and resurrect deleted rows. Filesystems with no
  *    `AbstractFileSystem` binding fall back to delete+rename with the
  *    degraded window logged once.
  *  - Every swap body carries a `#graft-sidecar lines=N` header that
  *    `read` verifies and strips: a torn file (truncated at OR inside a
  *    line) fails with a typed [[Sidecar.SidecarCorruptionError]] naming
  *    the path, never an empty-looking read. Headerless files (external
  *    fixtures) are accepted verbatim for compatibility — EXCEPT content
  *    leading with '#', which can only be a truncated or garbled header
  *    (our writer always emits the full tag) and raises typed corruption
  *    rather than slipping through the detector's own first bytes.
  *  - "Sidecar absent but its `__tmp` present" — the signature of a
  *    crash during the very FIRST swap — is a diagnosable typed error,
  *    not an empty read.
  */
object Sidecar {

  /** The deletion-vector sidecar's path relative to the table root — ONE
    * definition shared by the DV tier, the SQL front door's
    * merge-on-read probe, and the store rewrite guards (a rename in one
    * place must not silently disable a guard in another).
    */
  val DvRel = "_deletion_vectors/dv.tsv"

  /** A sidecar exists but cannot be trusted: truncated, header mismatch,
    * malformed line, or a crashed first write. Carries the path so the
    * operator knows exactly which file to inspect or re-derive.
    */
  final class SidecarCorruptionError(val sidecarPath: String, msg: String)
    extends RuntimeException(s"corrupt sidecar $sidecarPath: $msg")

  private val Header = "#graft-sidecar lines="

  /** How old an orphan `__tmp` must be before a missing-target read calls
    * it crash corruption rather than an in-flight first swap. A healthy
    * swap's stage→fence→rename spans milliseconds; a minute of margin
    * covers GC pauses without delaying crash diagnosis meaningfully.
    */
  val StagingGraceMs: Long = 60000L

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Full UTF-8 content of `tableRoot/rel` (integrity header verified and
    * stripped), or None if absent. A missing sidecar whose `__tmp` twin
    * exists is a crashed first write — raised as typed corruption, not
    * silently empty.
    */
  def read(spark: SparkSession, tableRoot: String, rel: String): Option[String] = {
    val p = new Path(tableRoot, rel)
    val f = fs(spark, p)
    if (!f.exists(p)) {
      val tmp = new Path(tableRoot, rel + "__tmp")
      val tmpStat =
        try Some(f.getFileStatus(tmp))
        catch { case _: java.io.FileNotFoundException => None }
      tmpStat.foreach { st =>
        // a FRESH staging file is a live writer's first swap in flight —
        // a concurrent reader must see "no sidecar yet" (the pre-swap
        // state), not corruption; only a STALE one means a dead process
        val age = System.currentTimeMillis() - st.getModificationTime
        if (age > StagingGraceMs)
          throw new SidecarCorruptionError(p.toString,
            s"sidecar missing but staging file $tmp is ${age}ms old — a writer " +
              "crashed before its first commit rename; inspect/remove the " +
              "staging file or re-run the writer (treating this as 'no " +
              "sidecar' would silently drop its contents, e.g. read a " +
              "deletion vector as empty)")
      }
      None
    } else {
      val in = f.open(p)
      val raw = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64 * 1024)
        Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
          .foreach(n => buf.write(chunk, 0, n))
        buf.toString("UTF-8")
      } finally in.close()
      Some(verifyHeader(p.toString, raw))
    }
  }

  private def verifyHeader(path: String, raw: String): String = {
    if (!raw.startsWith(Header)) {
      // The torn-write detector must not have a hole in its own first
      // bytes: our writer always emits the header, so '#'-leading content
      // that is NOT the full header is a truncated/garbled header (e.g. a
      // file cut inside '#graft-sid'), never a legitimate fixture —
      // returning it verbatim would hand downstream parsers garbage.
      if (raw.nonEmpty && Header.startsWith(raw))
        throw new SidecarCorruptionError(path,
          "truncated inside the integrity header — torn write; re-derive or restore")
      if (raw.startsWith("#"))
        throw new SidecarCorruptionError(path,
          s"malformed integrity header '${raw.takeWhile(_ != '\n').take(40)}' — " +
            "every graft-written sidecar starts with the full header; " +
            "'#'-leading content that does not is a torn or garbled write")
      return raw // headerless external fixture
    }
    val nl = raw.indexOf('\n')
    if (nl < 0)
      throw new SidecarCorruptionError(path, "truncated inside the integrity header")
    val declared =
      try raw.substring(Header.length, nl).trim.toLong
      catch { case _: NumberFormatException =>
        throw new SidecarCorruptionError(path, s"unparseable integrity header '${raw.take(nl)}'")
      }
    val body = raw.substring(nl + 1)
    if (body.nonEmpty && !body.endsWith("\n"))
      throw new SidecarCorruptionError(path,
        "truncated mid-line (no trailing newline) — torn write; re-derive or restore")
    val got = body.count(_ == '\n').toLong
    if (got != declared)
      throw new SidecarCorruptionError(path,
        s"header declares $declared lines but file carries $got — truncated or " +
          "concatenated torn write; re-derive or restore")
    body
  }

  def readRequired(spark: SparkSession, tableRoot: String, rel: String): String =
    read(spark, tableRoot, rel).getOrElse(
      throw new java.io.FileNotFoundException(s"missing sidecar $rel under $tableRoot"))

  /** Split a sidecar line into exactly `n` tab-separated fields, raising
    * typed corruption naming the sidecar instead of a bare `MatchError`
    * from an `Array(…)` destructure. All manifest readers parse through
    * here.
    */
  def fields(tableRoot: String, rel: String, line: String, n: Int): Array[String] = {
    val parts = line.split("\t", -1)
    if (parts.length != n)
      throw new SidecarCorruptionError(new Path(tableRoot, rel).toString,
        s"expected $n tab-separated fields, got ${parts.length} in line '${line.take(80)}'")
    parts
  }

  @volatile private var warnedNonAtomic = false

  /** Write `body` to `tableRoot/rel` via tmp + hsync + fence + atomic
    * OVERWRITE rename (the old version survives until the new one lands).
    */
  def swap(spark: SparkSession, tableRoot: String, rel: String, body: String): Unit = {
    val p = new Path(tableRoot, rel)
    val f = fs(spark, p)
    val tmp = new Path(tableRoot, rel + "__tmp")
    val out = f.create(tmp, true)
    try {
      out.write((Header + body.count(_ == '\n') + "\n" + body).getBytes("UTF-8"))
      out.hsync() // durable BEFORE visible; degrades to flush() if not Syncable
    } finally out.close()
    // a FENCED-OUT (or otherwise failed) swap must not leave staging behind:
    // read() treats target-absent-but-tmp-present as crash corruption, which
    // must mean a dead process, never a cleanly-refused writer
    try WriterLease.fence(spark, tableRoot)
    catch { case e: Throwable => f.delete(tmp, false); throw e }
    try {
      val fc = FileContext.getFileContext(f.makeQualified(p).toUri,
        spark.sparkContext.hadoopConfiguration)
      fc.rename(f.makeQualified(tmp), f.makeQualified(p), Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no AbstractFileSystem binding: degraded two-step swap — the only
        // path with a no-sidecar crash window, and it says so once
        if (!warnedNonAtomic) {
          warnedNonAtomic = true
          System.err.println(s"[sidecar] WARN: ${p.toUri.getScheme} has no " +
            "FileContext binding; falling back to delete+rename (non-atomic swap)")
        }
        if (f.exists(p)) f.delete(p, false)
        if (!f.rename(tmp, p))
          throw new java.io.IOException(s"sidecar swap failed for $p")
      case e: Throwable =>
        f.delete(tmp, false) // failed swap leaves no staging (see fence above)
        throw e
    }
  }
}
