package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.model.Schemas

/** The reference's `;`-separated 17-column invoice CSV exchange format
  * (S6/S7 — `/root/reference/shopifydb.py:115,144-145`): single-file write
  * with header, schema-pinned read (no inference, SURVEY §1.2).
  */
object InvoiceCsv {

  /** Write the invoice frame as ONE `;`-CSV file at `path` (the reference
    * emits a single file for hand-editing). coalesce(1) is deliberate and
    * documented: the export is a human-exchange artifact, not a data lake
    * write — for bulk sinks keep partitioned output.
    */
  def write(df: DataFrame, path: String): Unit = {
    val tmp = path + "__csvtmp"
    df.select(Schemas.invoiceCsvColumns.map(col): _*)
      .coalesce(1)
      .write.mode("overwrite")
      .option("sep", ";").option("header", "true")
      .csv(tmp)
    // promote the single part file to the requested path
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = new Path(tmp).getFileSystem(conf)
    val part = fs.globStatus(new Path(tmp, "part-*"))(0).getPath
    val target = new Path(path)
    if (fs.exists(target)) fs.delete(target, false)
    fs.rename(part, target)
    fs.delete(new Path(tmp), true)
    // Drop the ChecksumFileSystem sidecar the rename carried along: a stale
    // .<name>.crc breaks any later Hadoop-FS read of a hand-edited export
    // (the format exists to be hand-edited, ChecksumException otherwise).
    val crc = new Path(target.getParent, "." + target.getName + ".crc")
    if (fs.exists(crc)) fs.delete(crc, false)
  }

  /** Schema-pinned read of a (possibly hand-edited) invoice CSV. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", ";").option("header", "true")
      .schema(Schemas.invoiceCsv)
      .csv(path)
}
