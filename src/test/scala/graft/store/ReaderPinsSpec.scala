package graft.store

import graft.SparkSuite
import java.nio.file.Files
import org.apache.hadoop.fs.Path

/** Reader-pin registry contract ([[ReaderPins]]): a pinned version
  * survives ANY vacuum (retention 1, age 0) until the pin is released or
  * lapses past its ttl — the explicit upgrade of the min-age heuristic
  * (round-10 verdict item 6).
  */
class ReaderPinsSpec extends SparkSuite {
  import spark.implicits._

  private def mkPath(name: String) =
    Files.createTempDirectory("pins").resolve(name).toString

  private def hfs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def backdatePin(pin: ReaderPins.Pin, byMs: Long): Unit =
    hfs(pin.root).setTimes(pin.path, System.currentTimeMillis() - byMs, -1)

  test("versioned table: a live pin keeps its version through an aggressive vacuum; release frees it") {
    val root = mkPath("vt")
    def df(v: Int) = Seq((1L, v.toLong)).toDF("id", "ver")
    (1 to 3).foreach(v => VersionedTable.writeSnapshot(spark, df(v), root))

    val pin = ReaderPins.pin(spark, root, version = 1, ttlMs = 60000)
    VersionedTable.vacuum(spark, root, keepLast = 1, minAgeMs = 0)
    // v1 pinned → kept; v2 unpinned, outside retention → gone; v3 current
    assert(VersionedTable.readVersion(spark, root, 1).head().getLong(1) == 1L)
    intercept[Throwable] { VersionedTable.readVersion(spark, root, 2).count() }
    assert(VersionedTable.read(spark, root).head().getLong(1) == 3L)

    ReaderPins.release(spark, pin)
    VersionedTable.vacuum(spark, root, keepLast = 1, minAgeMs = 0)
    intercept[Throwable] { VersionedTable.readVersion(spark, root, 1).count() }
    assert(VersionedTable.read(spark, root).head().getLong(1) == 3L)
  }

  test("a lapsed pin no longer protects (and is GC'd); heartbeat extends a live one") {
    val root = mkPath("lapse")
    def df(v: Int) = Seq((1L, v.toLong)).toDF("id", "ver")
    (1 to 3).foreach(v => VersionedTable.writeSnapshot(spark, df(v), root))

    val pin = ReaderPins.pin(spark, root, version = 1, ttlMs = 5000)
    // heartbeat refreshes: after a near-lapse backdate + beat, still live
    backdatePin(pin, byMs = 4000)
    ReaderPins.heartbeat(spark, pin)
    assert(ReaderPins.livePinned(spark, root) == Set(1))
    // lapse it: mtime older than ttl → dead, and the pin file is GC'd
    backdatePin(pin, byMs = 10000)
    assert(ReaderPins.livePinned(spark, root).isEmpty)
    assert(!hfs(root).exists(pin.path))
    VersionedTable.vacuum(spark, root, keepLast = 1, minAgeMs = 0)
    intercept[Throwable] { VersionedTable.readVersion(spark, root, 1).count() }
  }

  test("multi-table publish: readAllPinned survives a publish + vacuum landing mid-read") {
    val root = mkPath("mtp")
    def tablesOf(v: Int) = Map(
      "fact" -> Seq((1L, v.toLong)).toDF("id", "ver"),
      "agg" -> Seq((v.toLong, 1L)).toDF("ver", "n"))
    MultiTablePublish.publish(spark, root, tablesOf(1))

    MultiTablePublish.readAllPinned(spark, root, Seq("fact", "agg")) { (v, frames) =>
      assert(v == 1)
      // a publisher + aggressive vacuum land while the reader is mid-flight
      MultiTablePublish.publish(spark, root, tablesOf(2))
      MultiTablePublish.publish(spark, root, tablesOf(3))
      MultiTablePublish.vacuum(spark, root, keep = 0, minAgeMs = 0)
      // the pinned version's files are still there: the read completes
      assert(frames("fact").head().getLong(1) == 1L)
      assert(frames("agg").head().getLong(0) == 1L)
    }
    // pin released: the old version is now reclaimable
    MultiTablePublish.vacuum(spark, root, keep = 0, minAgeMs = 0)
    val (v, frames) = MultiTablePublish.readAll(spark, root, Seq("fact"))
    assert(v == 3 && frames("fact").head().getLong(1) == 3L)
    intercept[Throwable] {
      MultiTablePublish.readAt(spark, root, 1, "fact").count()
    }
  }

  test("unparseable pin content fails CLOSED (protects) until the conservative ttl") {
    val root = mkPath("torn")
    def df(v: Int) = Seq((1L, v.toLong)).toDF("id", "ver")
    (1 to 2).foreach(v => VersionedTable.writeSnapshot(spark, df(v), root))
    // torn pin: exists, content unparseable
    val d = new Path(root + "__pins")
    hfs(root).mkdirs(d)
    val p = new Path(d, "v=1.tornpin")
    val out = hfs(root).create(p, false)
    out.write("not-a-number".getBytes("UTF-8")); out.close()
    assert(ReaderPins.livePinned(spark, root) == Set(1))
    VersionedTable.vacuum(spark, root, keepLast = 1, minAgeMs = 0)
    assert(VersionedTable.readVersion(spark, root, 1).count() == 1L)
    // past the conservative ttl the torn pin ages out like any other
    hfs(root).setTimes(p,
      System.currentTimeMillis() - ReaderPins.TornPinTtlMs - 60000, -1)
    assert(ReaderPins.livePinned(spark, root).isEmpty)
  }
}
