package graft.store

import graft.SparkSuite
import java.nio.file.Files

/** Crash-safety contract of [[MultiTablePublish]]: at every injected
  * crash point BOTH tables resolve through one version — a torn pair
  * (fact at v2, aggregate at v1) is structurally impossible.
  */
class MultiPublishSpec extends SparkSuite {
  import spark.implicits._

  private def mkRoot() = Files.createTempDirectory("multipub").resolve("wh").toString

  private def tablesOf(v: Int) = Map(
    "fact" -> Seq((1L, v.toLong), (2L, v.toLong)).toDF("id", "ver"),
    "agg"  -> Seq((v.toLong, 2L)).toDF("ver", "n"))

  private def readVers(root: String): (Long, Long) = (
    MultiTablePublish.read(spark, root, "fact").select("ver").head().getLong(0),
    MultiTablePublish.read(spark, root, "agg").select("ver").head().getLong(0))

  test("publish lands both tables at one version; vacuum keeps retention") {
    val root = mkRoot()
    assert(MultiTablePublish.publish(spark, root, tablesOf(1)) == 1)
    assert(MultiTablePublish.publish(spark, root, tablesOf(2)) == 2)
    assert(readVers(root) == ((2L, 2L)))
    MultiTablePublish.vacuum(spark, root, keep = 0)
    assert(MultiTablePublish.currentVersion(spark, root).contains(2))
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

  test("pointer lost mid-flip rolls FORWARD to the highest fully-staged version") {
    val root = mkRoot()
    MultiTablePublish.publish(spark, root, tablesOf(1))
    MultiTablePublish.crashHook = step =>
      if (step == "staged") throw new RuntimeException("injected crash")
    try intercept[RuntimeException] {
      MultiTablePublish.publish(spark, root, tablesOf(2))
    } finally MultiTablePublish.crashHook = _ => ()
    // simulate the delete+rename pointer window: the pointer file is gone
    val f = new org.apache.hadoop.fs.Path(root, "CURRENT")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(root, "CURRENT"), false)
    // resolution rolls forward to v2 — complete by its _STAGED marker —
    // and BOTH tables agree on it
    assert(MultiTablePublish.currentVersion(spark, root).contains(2))
    assert(readVers(root) == ((2L, 2L)))
  }

  test("unmarked (partially staged) versions are never resolved") {
    val root = mkRoot()
    MultiTablePublish.publish(spark, root, tablesOf(1))
    // fake a torn stage: a v=9 directory with data but NO _STAGED marker
    tablesOf(9)("fact").write.parquet(s"$root/v=9/fact")
    val f = new org.apache.hadoop.fs.Path(root, "CURRENT")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(root, "CURRENT"), false)
    assert(MultiTablePublish.currentVersion(spark, root).contains(1))
    assert(readVers(root) == ((1L, 1L)))
  }
}
