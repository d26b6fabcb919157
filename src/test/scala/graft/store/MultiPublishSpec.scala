package graft.store

import graft.SparkSuite
import java.nio.file.Files

/** Crash-safety contract of [[MultiTablePublish]]: at every injected
  * crash point BOTH tables resolve through one version — a torn pair
  * (fact at v2, aggregate at v1) is structurally impossible — and a
  * publish that never reached its `_COMMIT` intent can never be
  * resurrected by pointer loss (round-9 advice).
  */
class MultiPublishSpec extends SparkSuite {
  import spark.implicits._

  private def mkRoot() = Files.createTempDirectory("multipub").resolve("wh").toString

  private def tablesOf(v: Int) = Map(
    "fact" -> Seq((1L, v.toLong), (2L, v.toLong)).toDF("id", "ver"),
    "agg"  -> Seq((v.toLong, 2L)).toDF("ver", "n"))

  private def readVers(root: String): (Long, Long) = {
    // pinned multi-table read: one version resolution for both tables
    val (_, t) = MultiTablePublish.readAll(spark, root, Seq("fact", "agg"))
    (t("fact").select("ver").head().getLong(0),
      t("agg").select("ver").head().getLong(0))
  }

  test("publish lands both tables at one version; vacuum keeps retention") {
    val root = mkRoot()
    assert(MultiTablePublish.publish(spark, root, tablesOf(1)) == 1)
    assert(MultiTablePublish.publish(spark, root, tablesOf(2)) == 2)
    assert(readVers(root) == ((2L, 2L)))
    MultiTablePublish.vacuum(spark, root, keep = 0)
    assert(MultiTablePublish.currentVersion(spark, root).contains(2))
    assert(readVers(root) == ((2L, 2L)))
  }

  test("vacuum age guard keeps young versions a pinned reader may hold") {
    val root = mkRoot()
    MultiTablePublish.publish(spark, root, tablesOf(1))
    MultiTablePublish.publish(spark, root, tablesOf(2))
    // a reader pinned to v1 via readAt; vacuum with a 1h age guard must
    // NOT delete v1 (it was created milliseconds ago)
    val pinned = MultiTablePublish.readAt(spark, root, 1, "fact")
    MultiTablePublish.vacuum(spark, root, keep = 0, minAgeMs = 3600 * 1000L)
    assert(pinned.count() == 2L) // files still there
    // with the guard lapsed (0ms) the old version goes
    MultiTablePublish.vacuum(spark, root, keep = 0, minAgeMs = 0L)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/v=1")))
    assert(readVers(root) == ((2L, 2L)))
  }

  test("crash before the pointer flip leaves readers on the OLD consistent pair") {
    val root = mkRoot()
    MultiTablePublish.publish(spark, root, tablesOf(1))
    MultiTablePublish.crashHook = step =>
      if (step == "staged") throw new RuntimeException("injected crash")
    try intercept[RuntimeException] {
      MultiTablePublish.publish(spark, root, tablesOf(2))
    } finally MultiTablePublish.crashHook = _ => ()
    // v2 is fully staged but unpublished: both tables still read v1
    assert(MultiTablePublish.currentVersion(spark, root).contains(1))
    assert(readVers(root) == ((1L, 1L)))
    // a re-publish allocates PAST the orphaned stage and succeeds
    assert(MultiTablePublish.publish(spark, root, tablesOf(3)) == 3)
    assert(readVers(root) == ((3L, 3L)))
  }

  test("a staged-but-never-committed version is NOT resurrected by pointer loss") {
    val root = mkRoot()
    MultiTablePublish.publish(spark, root, tablesOf(1))
    MultiTablePublish.crashHook = step =>
      if (step == "staged") throw new RuntimeException("injected crash")
    try intercept[RuntimeException] {
      MultiTablePublish.publish(spark, root, tablesOf(2))
    } finally MultiTablePublish.crashHook = _ => ()
    // even if the pointer file is lost (external damage — the atomic
    // overwrite flip never leaves it absent itself), resolution falls
    // back to the highest version with COMMIT INTENT: v1, never the
    // crashed v2 (the round-9 advice resurrection bug)
    val f = new org.apache.hadoop.fs.Path(root, "CURRENT")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(root, "CURRENT"), false)
    assert(MultiTablePublish.currentVersion(spark, root).contains(1))
    assert(readVers(root) == ((1L, 1L)))
  }

  test("commit intent without the flip: pointer keeps naming the old version; bootstrap rolls forward") {
    val root = mkRoot()
    MultiTablePublish.publish(spark, root, tablesOf(1))
    MultiTablePublish.crashHook = step =>
      if (step == "intent") throw new RuntimeException("injected crash")
    try intercept[RuntimeException] {
      MultiTablePublish.publish(spark, root, tablesOf(2))
    } finally MultiTablePublish.crashHook = _ => ()
    // pointer was never flipped and is still present (atomic overwrite):
    // readers stay on v1, consistently
    assert(MultiTablePublish.currentVersion(spark, root).contains(1))
    assert(readVers(root) == ((1L, 1L)))

    // BOOTSTRAP case: no pointer exists yet, crash after intent — the
    // intent marker makes roll-forward correct (the publish reached its
    // durable commit point)
    val root2 = mkRoot()
    MultiTablePublish.crashHook = step =>
      if (step == "intent") throw new RuntimeException("injected crash")
    try intercept[RuntimeException] {
      MultiTablePublish.publish(spark, root2, tablesOf(1))
    } finally MultiTablePublish.crashHook = _ => ()
    assert(MultiTablePublish.currentVersion(spark, root2).contains(1))
    assert(readVers(root2) == ((1L, 1L)))
  }

  test("unmarked (partially staged) versions are never resolved") {
    val root = mkRoot()
    MultiTablePublish.publish(spark, root, tablesOf(1))
    // fake a torn stage: a v=9 directory with data but NO markers
    tablesOf(9)("fact").write.parquet(s"$root/v=9/fact")
    val f = new org.apache.hadoop.fs.Path(root, "CURRENT")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(root, "CURRENT"), false)
    assert(MultiTablePublish.currentVersion(spark, root).contains(1))
    assert(readVers(root) == ((1L, 1L)))
  }
}
