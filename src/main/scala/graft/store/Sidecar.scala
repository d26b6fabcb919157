package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared sidecar-manifest IO for the store tier's underscore-prefixed
  * metadata files (min/max manifests, Bloom manifests, deletion vectors,
  * shard manifests): read-fully and fence-then-atomic-swap in ONE place,
  * so a hardening fix (bounds, fsync, fencing) lands once instead of
  * drifting across four copies. `swap` fences on the TABLE root (the
  * opt-in no-op-for-lease-less-callers contract of every store commit)
  * before the visible rename.
  */
object Sidecar {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Full UTF-8 content of `tableRoot/rel`, or None if absent. */
  def read(spark: SparkSession, tableRoot: String, rel: String): Option[String] = {
    val p = new Path(tableRoot, rel)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64 * 1024)
        Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
          .foreach(n => buf.write(chunk, 0, n))
        Some(buf.toString("UTF-8"))
      } finally in.close()
    }
  }

  def readRequired(spark: SparkSession, tableRoot: String, rel: String): String =
    read(spark, tableRoot, rel).getOrElse(
      throw new java.io.FileNotFoundException(s"missing sidecar $rel under $tableRoot"))

  /** Write `body` to `tableRoot/rel` via tmp + fence + atomic rename. */
  def swap(spark: SparkSession, tableRoot: String, rel: String, body: String): Unit = {
    val p = new Path(tableRoot, rel)
    val f = fs(spark, p)
    val tmp = new Path(tableRoot, rel + "__tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    WriterLease.fence(spark, tableRoot)
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new java.io.IOException(s"sidecar swap failed for $p")
  }
}
