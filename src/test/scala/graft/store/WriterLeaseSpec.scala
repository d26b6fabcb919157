package graft.store

import graft.SparkSuite
import java.nio.file.Files
import org.apache.hadoop.fs.Path

/** Multi-writer coordination contract ([[WriterLease]]): two interleaved
  * writers can never both commit — the loser dies loudly at the fence
  * (inside [[TableStore.atomicWrite]] / the partition swap /
  * [[MultiTablePublish.publish]]) and the table stays at a single
  * consistent version.
  */
class WriterLeaseSpec extends SparkSuite {
  import spark.implicits._

  private def mkPath(name: String) =
    Files.createTempDirectory("lease").resolve(name).toString

  private def hfs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Age a lease file so the next acquirer sees it as stale. */
  private def backdate(root: String, byMs: Long): Unit = {
    val p = new Path(root + "__lease", "LEASE")
    hfs(root).setTimes(p, System.currentTimeMillis() - byMs, -1)
  }

  test("second writer cannot acquire a live lease; release frees it") {
    val root = mkPath("t1")
    val a = WriterLease.acquire(spark, root, "writerA", ttlMs = 60000)
    intercept[WriterLease.LockHeldException] {
      WriterLease.acquire(spark, root, "writerB", ttlMs = 60000)
    }
    WriterLease.heartbeat(spark, a) // holder stays healthy
    WriterLease.release(spark, a)
    val b = WriterLease.acquire(spark, root, "writerB", ttlMs = 60000)
    assert(b.token > a.token) // fencing tokens strictly increase
    WriterLease.release(spark, b)
  }

  test("interleaved writers: the fenced loser fails at the commit rename, table stays consistent") {
    val root = mkPath("t2")
    TableStore.atomicWrite(spark, Seq((1L, "v0")).toDF("id", "v"), root)

    // writer A acquires, then stalls (simulated: its lease goes stale)
    val a = WriterLease.acquire(spark, root, "writerA", ttlMs = 60000)
    backdate(root, byMs = 120000)

    // writer B breaks the stale lease, wins a HIGHER token, commits
    val b = WriterLease.acquire(spark, root, "writerB", ttlMs = 60000)
    assert(b.token == a.token + 1)
    TableStore.atomicWrite(spark, Seq((1L, "vB")).toDF("id", "v"), root)

    // writer A wakes up and tries to commit: its fence MUST kill it
    // before the backup rename (separate-process simulation: restore A's
    // lease as this process's registered perspective)
    WriterLease.register(a)
    intercept[WriterLease.FencedException] {
      TableStore.atomicWrite(spark, Seq((1L, "vA-late")).toDF("id", "v"), root)
    }
    // the table is exactly writer B's version — the loser changed nothing
    WriterLease.register(b)
    assert(TableStore.read(spark, root).select("v").head().getString(0) == "vB")
    assert(TableStore.read(spark, root).count() == 1L)
    WriterLease.release(spark, b)
  }

  test("fenced loser dies before the partitioned swap's staged marker") {
    val root = mkPath("t3")
    val df0 = Seq((1L, "a", "d1"), (2L, "b", "d2")).toDF("id", "v", "day")
    TableStore.atomicWritePartitioned(spark, df0, root, "day")

    val a = WriterLease.acquire(spark, root, "writerA", ttlMs = 60000)
    backdate(root, byMs = 120000)
    val b = WriterLease.acquire(spark, root, "writerB", ttlMs = 60000)
    TableStore.upsertPartitioned(spark, root,
      Seq((1L, "aB", "d1")).toDF("id", "v", "day"), Seq("id"), "day")

    WriterLease.register(a)
    intercept[WriterLease.FencedException] {
      TableStore.upsertPartitioned(spark, root,
        Seq((1L, "aLATE", "d1")).toDF("id", "v", "day"), Seq("id"), "day")
    }
    // loser's stage must NOT be roll-forward-able: no staged marker means
    // recover() leaves the table alone and reads see writer B's commit
    WriterLease.register(b)
    val rows = TableStore.read(spark, root).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "aB"), (2L, "b")))
    WriterLease.release(spark, b)
  }

  test("fenced publisher dies before the group commit point") {
    val root = mkPath("t4")
    def tablesOf(v: Int) = Map(
      "fact" -> Seq((1L, v.toLong)).toDF("id", "ver"),
      "agg" -> Seq((v.toLong, 1L)).toDF("ver", "n"))
    MultiTablePublish.publish(spark, root, tablesOf(1))

    val a = WriterLease.acquire(spark, root, "pubA", ttlMs = 60000)
    backdate(root, byMs = 120000)
    val b = WriterLease.acquire(spark, root, "pubB", ttlMs = 60000)
    MultiTablePublish.publish(spark, root, tablesOf(2))

    WriterLease.register(a)
    intercept[WriterLease.FencedException] {
      MultiTablePublish.publish(spark, root, tablesOf(99))
    }
    // the loser's stage never reached _COMMIT: resolution stays at B's v2
    WriterLease.register(b)
    val (v, t) = MultiTablePublish.readAll(spark, root, Seq("fact", "agg"))
    assert(v == 2)
    assert(t("fact").select("ver").head().getLong(0) == 2L)
    WriterLease.release(spark, b)
  }

  test("withHeartbeat keeps a long writer's lease alive past its ttl") {
    val root = mkPath("t6")
    val result = WriterLease.withHeartbeat(spark, root, "longWriter", ttlMs = 600) { lease =>
      // body outlives the ttl by 3x; the heartbeat must keep refreshing
      Thread.sleep(1800)
      // a second writer probing NOW must still see a LIVE lease — without
      // the heartbeat the 600ms ttl lapsed three times over
      intercept[WriterLease.LockHeldException] {
        WriterLease.acquire(spark, root, "impatient", ttlMs = 600)
      }
      lease.token
    }
    assert(result == 1L)
    // released: the next writer acquires with the advanced token
    val next = WriterLease.acquire(spark, root, "after", ttlMs = 600)
    assert(next.token == 2L)
    WriterLease.release(spark, next)
  }

  test("two breakers race one stale lease: the loser never evicts the winner's live lease") {
    val root = mkPath("t7")
    val stale = WriterLease.acquire(spark, root, "staleHolder", ttlMs = 60000)
    backdate(root, byMs = 120000)
    // breaker B observes staleness; in the read-to-break window a RIVAL
    // breaker wins the same stale lease and acquires fresh (the seam fires
    // exactly between B's staleness read and its break)
    var rival: WriterLease.Lease = null
    var fired = false // the rival's own acquire re-enters the seam
    WriterLease.breakHook = () => {
      if (!fired) {
        fired = true
        rival = WriterLease.acquire(spark, root, "rivalBreaker", ttlMs = 60000)
      }
    }
    try {
      // B must lose LOUDLY — and must NOT delete the rival's live lease
      intercept[WriterLease.LockHeldException] {
        WriterLease.acquire(spark, root, "lateBreaker", ttlMs = 60000)
      }
    } finally WriterLease.breakHook = () => ()
    assert(rival != null && rival.token == stale.token + 1)
    // the rival's lease survived intact: its heartbeat passes and a third
    // writer is refused on liveness
    WriterLease.adopt(rival)
    WriterLease.heartbeat(spark, rival)
    intercept[WriterLease.LockHeldException] {
      WriterLease.acquire(spark, root, "third", ttlMs = 60000)
    }
    WriterLease.release(spark, rival)
  }

  test("torn lease wedges only until its ttl, then breaks like a stale one") {
    val root = mkPath("t8")
    // a dying holder's torn write: the file exists but cannot be parsed
    val dir = new Path(root + "__lease")
    hfs(root).mkdirs(dir)
    val out = hfs(root).create(new Path(dir, "LEASE"), false)
    out.write("garbage-no-space-token".getBytes("UTF-8")); out.close()
    // within the ttl: refused (could be a mid-create live writer)
    intercept[WriterLease.LockHeldException] {
      WriterLease.acquire(spark, root, "w", ttlMs = 60000)
    }
    // past the ttl: the torn lease ages out — acquisition is NOT wedged
    backdate(root, byMs = 120000)
    val w = WriterLease.acquire(spark, root, "w", ttlMs = 60000)
    assert(w.token == 1L) // torn file never held a token; epoch starts fresh
    WriterLease.release(spark, w)
  }

  test("fence refuses a quiet lease (mtime older than ttl/2) until heartbeat") {
    val root = mkPath("t9")
    val lease = WriterLease.acquire(spark, root, "quietWriter", ttlMs = 60000)
    // simulate ttl/2 of silence without wall-clock sleeping
    backdate(root, byMs = 40000) // > ttl/2 = 30000, < ttl
    val e = intercept[WriterLease.FencedException] {
      WriterLease.fence(spark, root)
    }
    assert(e.getMessage.contains("quiet"))
    // a heartbeat restores freshness; the fence passes and re-touches
    WriterLease.heartbeat(spark, lease)
    WriterLease.fence(spark, root)
    WriterLease.release(spark, lease)
  }

  test("a fenced-out holder's vacuum dies loudly without deleting the new holder's versions") {
    val root = mkPath("t10")
    def df(v: Int) = Seq((1L, v.toLong)).toDF("id", "ver")
    VersionedTable.writeSnapshot(spark, df(1), root)
    VersionedTable.writeSnapshot(spark, df(2), root)
    val a = WriterLease.acquire(spark, root, "vacA", ttlMs = 60000)
    backdate(root, byMs = 120000)
    val b = WriterLease.acquire(spark, root, "vacB", ttlMs = 60000)
    VersionedTable.writeSnapshot(spark, df(3), root) // b's publish
    WriterLease.adopt(a)
    intercept[WriterLease.FencedException] {
      VersionedTable.vacuum(spark, root, keepLast = 1)
    }
    // nothing was deleted by the fenced vacuum: all three versions remain
    assert(VersionedTable.readVersion(spark, root, 1).count() == 1L)
    assert(VersionedTable.readVersion(spark, root, 2).count() == 1L)
    assert(VersionedTable.read(spark, root).head().getLong(1) == 3L)
    WriterLease.adopt(b)
    WriterLease.release(spark, b)
  }

  test("withLease releases on success and failure; unleased paths fence as no-op") {
    val root = mkPath("t5")
    WriterLease.withLease(spark, root, "w1") { lease =>
      assert(lease.token == 1L)
      TableStore.atomicWrite(spark, Seq((1L, "x")).toDF("id", "v"), root)
    }
    // released: a new writer acquires immediately, token advanced
    WriterLease.withLease(spark, root, "w2") { lease =>
      assert(lease.token == 2L)
    }
    // no lease registered: plain writes keep working (old contract)
    TableStore.atomicWrite(spark, Seq((1L, "y")).toDF("id", "v"), root)
    assert(TableStore.read(spark, root).select("v").head().getString(0) == "y")
  }

  test("PINNED residual window: a stall between a passing fence and the rename can clobber") {
    // This test DEMONSTRATES the documented limitation (WriterLease class
    // doc, 'What this does and does not give'), so a regression in either
    // direction — silently closing it with a non-atomic repair, or
    // widening it — fails loudly. The window: writer A passes its fence
    // (mtime fresh), then stalls longer than the break threshold before
    // its commit rename; B breaks the lease and acquires; A's wake-up
    // rename still lands because nothing re-checks the lease after the
    // fence. Closing it needs a rename conditioned on the token (commit
    // log / conditional put) — not available on a plain filesystem.
    val t = mkPath("stall")
    val a = WriterLease.acquire(spark, t, "A", ttlMs = 60000)
    TableStore.atomicWrite(spark, Seq((1L, "v0")).toDF("k", "v"), t)
    var b: WriterLease.Lease = null
    TableStore.crashHook = {
      case "backedUp" if b == null =>
        // A is between its passing fence and its commit rename: simulate
        // the stall (lease ages past ttl) and B breaking + acquiring
        backdate(t, 120000)
        b = WriterLease.acquire(spark, t, "B", ttlMs = 60000)
      case _ => ()
    }
    try {
      // A's write COMPLETES despite B now holding the lease — the window
      TableStore.atomicWrite(spark, Seq((1L, "vA")).toDF("k", "v"), t)
    } finally TableStore.crashHook = _ => ()
    assert(b != null, "hook must have fired")
    assert(TableStore.read(spark, t).select("v").head().getString(0) == "vA",
      "the stalled loser's commit landed under B's lease — the pinned residual window")
    // the exposure is bounded: B's next commit supersedes the stale write,
    // and A's next fence dies loudly (held registry still maps t -> B)
    TableStore.atomicWrite(spark, Seq((1L, "vB")).toDF("k", "v"), t)
    assert(TableStore.read(spark, t).select("v").head().getString(0) == "vB")
    WriterLease.adopt(a)
    intercept[WriterLease.FencedException](
      TableStore.atomicWrite(spark, Seq((1L, "vA2")).toDF("k", "v"), t))
    WriterLease.adopt(b)
    WriterLease.release(spark, b)
  }
}
