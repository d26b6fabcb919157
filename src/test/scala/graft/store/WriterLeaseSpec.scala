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
}
