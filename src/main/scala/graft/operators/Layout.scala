package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan pruning: Z-order (Morton) keys over two
  * bucketized dimensions, and a clustered parquet writer that range-
  * partitions + sorts on the key so every output file covers a tight,
  * disjoint key range.
  *
  * Why it matters at 100 TB: parquet row-group/file pruning works off
  * min/max statistics; a table clustered on ONE column prunes only that
  * column's predicates. Interleaving the bits of two dimensions gives
  * locality in BOTH — a filter on either column (or a rectangle in the
  * pair) touches a small, contiguous band of files instead of all of them.
  * All-integer arithmetic, so the key is reproducible in any engine.
  */
object Layout {

  /** Morton interleave of two non-negative ints bucketized to `bits` bits
    * each: bit b of `x` lands at position 2b, bit b of `y` at 2b+1.
    * Built-in expressions only (shiftleft/shiftright/and/sum) — codegen'd,
    * and mirrored term-for-term by the q70 DuckDB oracle.
    */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1,31]")
    val terms = (0 until bits).flatMap { b =>
      Seq(
        shiftleft(shiftrightunsigned(x.cast("long"), b).bitwiseAND(lit(1L)), 2 * b),
        shiftleft(shiftrightunsigned(y.cast("long"), b).bitwiseAND(lit(1L)), 2 * b + 1))
    }
    terms.reduce(_ + _)
  }

  /** Write `df` clustered by the z-order of (xCol, yCol): range-partition
    * on the key into `numFiles` explicit partitions (explicit because AQE
    * would coalesce small inputs into one file, defeating the layout),
    * sort within partitions, drop the helper column. Produces one file per
    * range partition with disjoint [min,max] key spans
    * (LayoutSpec-asserted). Size numFiles so a file ≈ one parquet
    * row-group at the target scale.
    */
  def clusteredWrite(df: DataFrame, xCol: Column, yCol: Column, path: String,
                     numFiles: Int, bits: Int = 16): Unit = {
    df.withColumn("__zkey", zorderKey(xCol, yCol, bits))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a fragmented table into `targetFiles` files range-clustered
    * (and sorted) on `clusterCol` — the small-file maintenance pass every
    * long-lived ingest pipeline needs: incremental upserts and streaming
    * sinks accrete files whose listing/open overhead eventually dominates
    * scan cost, and naive coalescing would destroy pruning. Range
    * clustering keeps per-file min/max spans disjoint (LayoutSpec-
    * asserted), so predicate pushdown on `clusterCol` prunes as well
    * after compaction as before — one shuffle, content-identical
    * (q94's oracle is the table itself).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, srcPath: String,
              dstPath: String, clusterCol: String, targetFiles: Int): Unit =
    spark.read.parquet(srcPath)
      .repartitionByRange(targetFiles, col(clusterCol))
      .sortWithinPartitions(col(clusterCol))
      .write.mode("overwrite").parquet(dstPath)
}
