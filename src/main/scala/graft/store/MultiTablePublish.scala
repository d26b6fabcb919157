package graft.store

import org.apache.hadoop.fs.Path
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
  *  3. flip the group's single `CURRENT` pointer to N.
  * Crash cases: during staging → no marker, readers stay on the old
  * pointer; after the marker but before the flip → pointer still names
  * the old version (both tables consistent; the publish is simply lost
  * and a re-publish is safe); inside the pointer's delete+rename window →
  * pointer absent, and [[currentVersion]] rolls FORWARD to the highest
  * `_STAGED` version, which the marker guarantees complete. At every
  * point all tables resolve through ONE version number — torn cross-table
  * reads are structurally impossible. MultiPublishSpec drives each crash
  * point through the [[crashHook]] seam.
  *
  * Concurrency: one publisher per root (the standard log-less contract,
  * TableStore.recover's note); readers are always safe.
  */
object MultiTablePublish {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(root: String) = new Path(root, "CURRENT")
  private def versionDir(root: String, v: Int) = s"$root/v=$v"
  private def marker(root: String, v: Int) = new Path(versionDir(root, v), "_STAGED")

  /** Test seam: labels `staged` (all tables + marker written) and
    * `committed` (pointer flipped). Production no-op.
    */
  private[store] var crashHook: String => Unit = _ => ()

  private def listStagedVersions(spark: SparkSession, root: String): Seq[Int] = {
    val r = new Path(root)
    val f = fs(spark, r)
    if (!f.exists(r)) Nil
    else f.listStatus(r).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toInt)
      .filter(v => f.exists(marker(root, v)))
      .sorted
  }

  /** The live version: the pointer if present, else (mid-flip crash) the
    * highest FULLY-STAGED version — the `_STAGED` marker makes the
    * roll-forward safe, an unmarked directory is never resolved.
    */
  def currentVersion(spark: SparkSession, root: String): Option[Int] = {
    val f = fs(spark, pointer(root))
    if (f.exists(pointer(root))) {
      val in = f.open(pointer(root))
      try {
        val r = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
        Some(r.readLine().trim.toInt)
      } finally in.close()
    } else listStagedVersions(spark, root).lastOption
  }

  /** Stage every table of the next version, mark it complete, flip the
    * group pointer. Returns the published version number.
    */
  def publish(spark: SparkSession, root: String,
              tables: Map[String, DataFrame]): Int = {
    require(tables.nonEmpty, "publish needs at least one table")
    val r = new Path(root)
    val f = fs(spark, r)
    val all = if (!f.exists(r)) Nil
      else f.listStatus(r).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
        .map(_.getPath.getName.stripPrefix("v=").toInt)
    val next = (all :+ 0).max + 1
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"${versionDir(root, next)}/$name")
    }
    val out = f.create(marker(root, next), true)
    try out.write("staged\n".getBytes("UTF-8")) finally out.close()
    crashHook("staged")
    val tmp = new Path(root, "CURRENT__tmp")
    val o = f.create(tmp, true)
    try o.write(s"$next\n".getBytes("UTF-8")) finally o.close()
    if (f.exists(pointer(root))) f.delete(pointer(root), false)
    if (!f.rename(tmp, pointer(root)))
      throw new java.io.IOException(s"group pointer flip failed for $root")
    crashHook("committed")
    next
  }

  /** Read `table` at the group's live version. Every table read through
    * here resolves the SAME version number — the cross-table guarantee.
    */
  def read(spark: SparkSession, root: String, table: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no published version at $root"))
    spark.read.parquet(s"${versionDir(root, v)}/$table")
  }

  /** Drop all versions below the live one minus `keep` (retention). */
  def vacuum(spark: SparkSession, root: String, keep: Int = 1): Unit = {
    val f = fs(spark, new Path(root))
    currentVersion(spark, root).foreach { cur =>
      listStagedVersions(spark, root).filter(_ < cur - keep).foreach { v =>
        f.delete(new Path(versionDir(root, v)), true)
      }
    }
  }
}
