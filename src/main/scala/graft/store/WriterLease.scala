package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Multi-writer coordination for the log-less stores ([[TableStore]],
  * [[MultiTablePublish]], [[VersionedTable]]) — closes the round-9 gap
  * that every swap protocol was single-writer *by contract only*
  * ("serialize writers externally"). At 100 TB with a scheduler retrying
  * jobs, two writers on one table is a when-not-if; the reference never
  * faced this because Postgres upserts are transactional
  * (`/root/reference/db.py:115-144`).
  *
  * Design — lease file + FENCING TOKEN (the standard lock-service shape,
  * cf. the fencing discussion popularized by the distributed-systems
  * literature on lock correctness):
  *
  *  - `<root>__lease/LEASE` is the mutex: acquired with an atomic
  *    create-exclusive (`FileSystem.create(p, overwrite=false)` — atomic
  *    on HDFS and local FS; on an object store substitute a conditional
  *    put). Content: `token ownerId`.
  *  - `<root>__lease/EPOCH` is the monotonic token source: only a writer
  *    that just WON the create-exclusive race advances it, so tokens
  *    strictly increase across acquisitions (including lease breaks).
  *  - Liveness: the holder heartbeats the lease file's mtime; a lease
  *    older than its ttl may be BROKEN by a new writer (delete +
  *    re-race). A broken-but-actually-alive holder is exactly why the
  *    token exists: the old holder's next [[fence]] re-reads the lease,
  *    sees a different (token, owner), and fails LOUDLY before its
  *    commit rename can clobber the new holder's work.
  *  - [[fence]] is invoked by the store protocols immediately before
  *    every commit-point rename (see [[TableStore.atomicWrite]],
  *    [[MultiTablePublish.publish]]) for paths registered through
  *    [[withLease]]; unregistered paths keep the old single-writer
  *    contract (zero overhead, no behavior change).
  *
  * What this does and does not give: two interleaved writers can never
  * both commit — the loser dies at the fence with the table at a single
  * consistent version. It does NOT make concurrent commits mergeable
  * (losers must re-read and retry) — that is a transaction log's job,
  * out of scope for a swap-based store.
  */
object WriterLease {

  final case class Lease(root: String, token: Long, ownerId: String)

  class LockHeldException(msg: String) extends RuntimeException(msg)
  class FencedException(msg: String) extends RuntimeException(msg)

  private def leaseDir(root: String) = new Path(root + "__lease")
  private def leasePath(root: String) = new Path(leaseDir(root), "LEASE")
  private def epochPath(root: String) = new Path(leaseDir(root), "EPOCH")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Leases held by THIS process, consulted by the store protocols'
    * fence checks. Process-wide (not thread-local): Spark jobs for one
    * logical writer hop threads freely.
    */
  private val held = new java.util.concurrent.ConcurrentHashMap[String, Lease]()

  private def readLease(f: org.apache.hadoop.fs.FileSystem,
                        root: String): Option[(Long, String, Long)] = {
    val p = leasePath(root)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val content = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
      val mtime = f.getFileStatus(p).getModificationTime
      content.trim.split(" ", 2) match {
        case Array(tok, owner) => Some((tok.toLong, owner, mtime))
        case _ => None // torn write of a dying holder: treat as breakable
      }
    }
  }

  private def readEpoch(f: org.apache.hadoop.fs.FileSystem, root: String): Long = {
    val p = epochPath(root)
    if (!f.exists(p)) 0L
    else {
      val in = f.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  /** Acquire the writer lease for `root`, breaking a stale one (mtime
    * older than `ttlMs`). Throws [[LockHeldException]] when a live holder
    * exists or another acquirer wins the create-exclusive race — callers
    * back off and retry; they must NOT proceed unfenced.
    */
  def acquire(spark: SparkSession, root: String, ownerId: String,
              ttlMs: Long): Lease = {
    val f = fs(spark, leasePath(root))
    f.mkdirs(leaseDir(root))
    readLease(f, root) match {
      case Some((tok, owner, mtime))
          if System.currentTimeMillis() - mtime <= ttlMs =>
        throw new LockHeldException(
          s"writer lease on $root held by $owner (token $tok, " +
            s"age ${System.currentTimeMillis() - mtime}ms <= ttl ${ttlMs}ms)")
      case Some(_) => f.delete(leasePath(root), false) // stale: break it
      case None => ()
    }
    // the atomic mutex: exactly one concurrent acquirer's create succeeds
    val out =
      try f.create(leasePath(root), false)
      catch { case _: java.io.IOException =>
        throw new LockHeldException(s"lost the lease race on $root")
      }
    // WON: advance the fencing token (safe to read-modify-write — only
    // the current holder ever writes EPOCH, and we hold the lease now)
    val token = readEpoch(f, root) + 1
    try out.write(s"$token $ownerId\n".getBytes("UTF-8")) finally out.close()
    val eo = f.create(epochPath(root), true)
    try eo.write(s"$token\n".getBytes("UTF-8")) finally eo.close()
    val lease = Lease(root, token, ownerId)
    held.put(root, lease)
    lease
  }

  /** Refresh the lease's liveness clock. Throws [[FencedException]] if the
    * lease was broken and re-acquired since — stop work immediately.
    */
  def heartbeat(spark: SparkSession, lease: Lease): Unit = {
    val f = fs(spark, leasePath(lease.root))
    verify(f, lease)
    f.setTimes(leasePath(lease.root), System.currentTimeMillis(), -1)
  }

  private def verify(f: org.apache.hadoop.fs.FileSystem, lease: Lease): Unit =
    readLease(f, lease.root) match {
      case Some((tok, owner, _)) if tok == lease.token && owner == lease.ownerId => ()
      case Some((tok, owner, _)) =>
        throw new FencedException(
          s"lease on ${lease.root} was broken: now held by $owner token $tok, " +
            s"we hold token ${lease.token} — aborting before the commit rename")
      case None =>
        throw new FencedException(
          s"lease on ${lease.root} disappeared (released or broken) — aborting")
    }

  /** The fence: called by store protocols immediately before each
    * commit-point rename on `path`. No-op unless this process holds a
    * registered lease for `path` (the opt-in keeps lease-less callers on
    * the documented single-writer contract). Throws [[FencedException]]
    * when the on-disk lease no longer matches ours.
    */
  def fence(spark: SparkSession, path: String): Unit = {
    val lease = held.get(path)
    if (lease != null) verify(fs(spark, leasePath(path)), lease)
  }

  /** Release: delete the lease iff we still hold it (a broken-and-
    * re-acquired lease belongs to the new holder — leave it).
    */
  def release(spark: SparkSession, lease: Lease): Unit = {
    held.remove(lease.root, lease)
    val f = fs(spark, leasePath(lease.root))
    readLease(f, lease.root) match {
      case Some((tok, owner, _)) if tok == lease.token && owner == lease.ownerId =>
        f.delete(leasePath(lease.root), false)
      case _ => ()
    }
  }

  /** Adopt a lease handle as THIS process's registered writer identity
    * for its root. The registry is keyed by path because a real
    * deployment has one writer process per table; adopt exists for (a)
    * a restarted driver resuming with a persisted lease handle, and (b)
    * two-writer simulations in one JVM (WriterLeaseSpec, q228), which
    * re-adopt to switch whose perspective the fence checks.
    */
  def adopt(lease: Lease): Unit = held.put(lease.root, lease)

  private[store] def register(lease: Lease): Unit = adopt(lease)

  /** Scoped acquire/release: run `body` under the lease, always release.
    * The store protocols fence automatically for `root` inside. For work
    * that can outlast `ttlMs`, use [[withHeartbeat]] — a silent holder
    * looks dead and invites a break.
    */
  def withLease[T](spark: SparkSession, root: String, ownerId: String,
                   ttlMs: Long = 60000L)(body: Lease => T): T = {
    val lease = acquire(spark, root, ownerId, ttlMs)
    try body(lease) finally release(spark, lease)
  }

  /** [[withLease]] plus a daemon heartbeat every ttl/3: a write running
    * longer than the ttl would otherwise let its OWN lease go stale and
    * invite a break mid-write — the fence would stop the resulting
    * clobber, but the honest long writer would die spuriously. The
    * heartbeat keeps the mtime fresh for as long as the body runs; if
    * the lease is broken anyway (e.g. a pause longer than the ttl), the
    * heartbeat's FencedException is swallowed here and the protocol
    * fence inside the next commit rename delivers the loud failure at
    * the point that matters.
    */
  def withHeartbeat[T](spark: SparkSession, root: String, ownerId: String,
                       ttlMs: Long = 60000L)(body: Lease => T): T = {
    val lease = acquire(spark, root, ownerId, ttlMs)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beat = new Thread(() => {
      val interval = math.max(ttlMs / 3, 100L)
      while (!stop.get()) {
        try heartbeat(spark, lease) catch { case _: Throwable => () }
        var waited = 0L
        while (!stop.get() && waited < interval) { Thread.sleep(50); waited += 50 }
      }
    }, s"writer-lease-heartbeat-$ownerId")
    beat.setDaemon(true)
    beat.start()
    try body(lease)
    finally {
      stop.set(true); beat.join(2000)
      release(spark, lease)
    }
  }
}
