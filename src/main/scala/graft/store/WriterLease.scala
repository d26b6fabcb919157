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
  *    older than its ttl may be BROKEN by a new writer. The break is an
  *    atomic RENAME to a one-off tombstone (not a delete): of N breakers
  *    racing one stale lease exactly one rename succeeds, and the break
  *    re-validates the lease's mtime immediately before renaming, so a
  *    LIVE lease acquired by a rival in the read-to-break window is never
  *    evicted. A broken-but-actually-alive holder is exactly why the
  *    token exists: the old holder's next [[fence]] re-reads the lease,
  *    sees a different (token, owner), and fails LOUDLY before its
  *    commit rename can clobber the new holder's work.
  *  - A lease file that EXISTS but cannot be parsed (torn write of a
  *    dying holder, or the instant between create-exclusive and the
  *    content write) is breakable too — but only once its mtime is older
  *    than the ttl. An immediate delete would evict a healthy writer
  *    mid-create; the ttl gate cannot (no holder can ever heartbeat or
  *    verify a torn lease, so its mtime never refreshes and the ttl
  *    genuinely applies — the torn file can never wedge acquisition
  *    permanently).
  *  - `ownerId` MUST be unique per writer instance (two schedulers
  *    retrying with the same ownerId could, in a break race, both mint
  *    the same token and pass each other's fence). [[acquire]] makes this
  *    structural: it suffixes the caller's ownerId with a random nonce,
  *    so the identity stored in the lease file (and carried in the
  *    returned [[Lease]]) is unique even when callers reuse names.
  *  - [[fence]] is invoked by the store protocols immediately before
  *    every commit-point rename (see [[TableStore.atomicWrite]],
  *    [[MultiTablePublish.publish]]) for paths registered through
  *    [[withLease]]; unregistered paths keep the old single-writer
  *    contract (zero overhead, no behavior change). Besides the
  *    token/owner match, fence requires the lease mtime to be FRESH
  *    (within ttl/2) and re-touches it on success, so the window between
  *    a passing fence and its rename is bounded well inside the break
  *    threshold: a breaker needs age > ttl, which is at least ttl/2 of
  *    wall clock after any passing fence.
  *
  * What this does and does not give: under the break threshold's timing
  * assumption, two interleaved writers cannot both commit — the loser
  * dies at the fence with the table at a single consistent version. A
  * RESIDUAL window remains on filesystems without compare-and-swap
  * renames: a writer that passes its fence and then stalls for more than
  * ttl/2 (GC pause, hypervisor stall) before its rename lands can still
  * clobber a new holder that broke the lease inside that stall. Closing
  * it fully needs a rename conditioned on the token (a transaction log or
  * an object store's conditional put); the fence freshness check bounds
  * the exposure to pathological stalls instead of arbitrary scheduling.
  * It also does NOT make concurrent commits mergeable (losers must
  * re-read and retry) — that is a transaction log's job, out of scope for
  * a swap-based store.
  */
object WriterLease {

  final case class Lease(root: String, token: Long, ownerId: String, ttlMs: Long)

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

  /** On-disk lease observation: absent / exists-but-unparseable / held.
    * The distinction matters (round-10 advice): an unparseable lease must
    * still AGE OUT via the ttl — folding it into "absent" skipped the
    * break and wedged acquisition forever, while folding it into "held"
    * with no mtime lost the ttl.
    */
  private sealed trait LeaseState
  private case object Absent extends LeaseState
  private final case class Torn(mtime: Long) extends LeaseState
  private final case class Held(token: Long, owner: String, mtime: Long) extends LeaseState

  private def readLease(f: org.apache.hadoop.fs.FileSystem,
                        root: String): LeaseState = {
    val p = leasePath(root)
    val st =
      try f.getFileStatus(p)
      catch { case _: java.io.FileNotFoundException => return Absent }
    val in =
      try f.open(p)
      catch { case _: java.io.FileNotFoundException => return Absent }
    val content = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    content.trim.split(" ", 2) match {
      case Array(tok, owner) if tok.nonEmpty && tok.forall(_.isDigit) =>
        Held(tok.toLong, owner, st.getModificationTime)
      case _ => Torn(st.getModificationTime) // torn write or mid-create
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

  /** Break a stale (or torn) lease whose mtime was observed as
    * `observedMtime` by the staleness decision. Re-validates immediately
    * before the break, then claims via an atomic RENAME to a one-off
    * tombstone — the two together close the round-10 delete race where a
    * breaker could remove a rival's freshly created LIVE lease: a lease
    * re-created (or even re-touched) since the staleness read has a
    * different mtime and is left alone; of several breakers racing the
    * SAME stale lease, rename's source-must-exist semantics let exactly
    * one proceed.
    */
  /** Test seam (WriterLeaseSpec): runs between the staleness read and the
    * break's re-validation — the window where a rival breaker + fresh
    * holder can land. Production no-op.
    */
  private[store] var breakHook: () => Unit = () => ()

  private def breakStale(f: org.apache.hadoop.fs.FileSystem, root: String,
                         observedMtime: Long): Unit = {
    breakHook()
    val p = leasePath(root)
    val st =
      try Some(f.getFileStatus(p))
      catch { case _: java.io.FileNotFoundException => None }
    st match {
      case None => () // a rival already broke it; create-exclusive arbitrates
      case Some(s) if s.getModificationTime != observedMtime =>
        throw new LockHeldException(
          s"lease on $root changed since the staleness read — a new holder " +
            "(or a heartbeat) landed; not breaking a live lease")
      case Some(_) =>
        val tomb = new Path(leaseDir(root),
          s"LEASE.broken.${java.util.UUID.randomUUID()}")
        if (!f.rename(p, tomb))
          throw new LockHeldException(s"lost the stale-lease break race on $root")
        f.delete(tomb, false) // claimed: the tombstone served its purpose
    }
  }

  /** Acquire the writer lease for `root`, breaking a stale one (mtime
    * older than `ttlMs`; torn/unparseable leases age out the same way).
    * Throws [[LockHeldException]] when a live holder exists or another
    * acquirer wins the break/create race — callers back off and retry;
    * they must NOT proceed unfenced. The returned lease's `ownerId` is
    * the caller's suffixed with a random nonce (uniqueness is
    * load-bearing for fence correctness — see the class doc).
    */
  def acquire(spark: SparkSession, root: String, ownerId: String,
              ttlMs: Long): Lease = {
    val f = fs(spark, leasePath(root))
    f.mkdirs(leaseDir(root))
    val now = System.currentTimeMillis()
    readLease(f, root) match {
      case Held(tok, owner, mtime) if now - mtime <= ttlMs =>
        throw new LockHeldException(
          s"writer lease on $root held by $owner (token $tok, " +
            s"age ${now - mtime}ms <= ttl ${ttlMs}ms)")
      case Held(_, _, mtime) => breakStale(f, root, mtime)
      case Torn(mtime) if now - mtime <= ttlMs =>
        throw new LockHeldException(
          s"unparseable lease on $root (torn write or mid-create, " +
            s"age ${now - mtime}ms) — breakable once older than ttl ${ttlMs}ms")
      case Torn(mtime) => breakStale(f, root, mtime)
      case Absent => ()
    }
    // the atomic mutex: exactly one concurrent acquirer's create succeeds
    val out =
      try f.create(leasePath(root), false)
      catch { case _: java.io.IOException =>
        throw new LockHeldException(s"lost the lease race on $root")
      }
    // WON: advance the fencing token (safe to read-modify-write — only
    // the current holder ever writes EPOCH, and we hold the lease now).
    // EPOCH is written BEFORE the lease content: a crash between the two
    // leaves a torn lease (ages out) with the epoch already advanced, so
    // the next acquirer mints a strictly higher token — never an equal one.
    val token = readEpoch(f, root) + 1
    val eo = f.create(epochPath(root), true)
    try eo.write(s"$token\n".getBytes("UTF-8")) finally eo.close()
    val unique = s"$ownerId#${java.util.UUID.randomUUID().toString.take(8)}"
    try out.write(s"$token $unique\n".getBytes("UTF-8")) finally out.close()
    val lease = Lease(root, token, unique, ttlMs)
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

  /** Token/owner match against the on-disk lease; returns its mtime. */
  private def verify(f: org.apache.hadoop.fs.FileSystem, lease: Lease): Long =
    readLease(f, lease.root) match {
      case Held(tok, owner, mtime) if tok == lease.token && owner == lease.ownerId =>
        mtime
      case Held(tok, owner, _) =>
        throw new FencedException(
          s"lease on ${lease.root} was broken: now held by $owner token $tok, " +
            s"we hold token ${lease.token} — aborting before the commit rename")
      case Torn(_) =>
        throw new FencedException(
          s"lease on ${lease.root} is unreadable (torn) — aborting; it no " +
            "longer proves our ownership")
      case Absent =>
        throw new FencedException(
          s"lease on ${lease.root} disappeared (released or broken) — aborting")
    }

  /** The fence: called by store protocols immediately before each
    * commit-point rename on `path`. No-op unless this process holds a
    * registered lease for `path` (the opt-in keeps lease-less callers on
    * the documented single-writer contract). Throws [[FencedException]]
    * when the on-disk lease no longer matches ours, OR when it matches
    * but its mtime is older than ttl/2 — a lease that quiet is too close
    * to breakable for a commit to be safe (the freshness bound keeps the
    * fence-to-rename window well inside the break threshold; see the
    * class doc for the residual stall window this does not close —
    * demonstrated and PINNED by WriterLeaseSpec "residual window": a
    * repair was evaluated and rejected as non-race-free on filesystems
    * without conditional renames, because the shared __tmp/__old staging
    * paths make any post-rename rollback able to clobber the new
    * holder's own in-flight commit). On success the mtime is re-touched,
    * so fence doubles as a heartbeat.
    */
  def fence(spark: SparkSession, path: String): Unit = {
    val lease = held.get(path)
    if (lease != null) {
      val f = fs(spark, leasePath(path))
      val mtime = verify(f, lease)
      val age = System.currentTimeMillis() - mtime
      if (age > lease.ttlMs / 2)
        throw new FencedException(
          s"lease on $path is ours but ${age}ms quiet (> ttl/2 = " +
            s"${lease.ttlMs / 2}ms): too close to breakable to commit safely " +
            "— heartbeat (or use withHeartbeat) and retry")
      f.setTimes(leasePath(path), System.currentTimeMillis(), -1)
    }
  }

  /** Release: delete the lease iff we still hold it (a broken-and-
    * re-acquired lease belongs to the new holder — leave it). The mtime
    * re-check narrows the verify-to-delete race the same way the break
    * path does: if anything moved the lease since the verify (a breaker's
    * rename + a rival's re-create), the mtime differs and we leave it.
    */
  def release(spark: SparkSession, lease: Lease): Unit = {
    held.remove(lease.root, lease)
    val f = fs(spark, leasePath(lease.root))
    readLease(f, lease.root) match {
      case Held(tok, owner, mtime) if tok == lease.token && owner == lease.ownerId =>
        val st =
          try Some(f.getFileStatus(leasePath(lease.root)))
          catch { case _: java.io.FileNotFoundException => None }
        if (st.exists(_.getModificationTime == mtime))
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
    * that can outlast `ttlMs` — or even ttl/2, the fence freshness bound —
    * use [[withHeartbeat]]: a silent holder looks dead and invites a break.
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
