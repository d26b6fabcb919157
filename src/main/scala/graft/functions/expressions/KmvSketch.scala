package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** K-minimum-values distinct-count sketch as a native Catalyst
  * TypedImperativeAggregate — the "novel sketch" custom-operator tier:
  * mergeable aggregation state (partial aggregation works map-side, the
  * buffers union under `merge`), explicit serialization, deterministic
  * output independent of row order and partitioning.
  *
  * State: the k smallest DISTINCT xxhash64 values of the input. If fewer
  * than k distinct hashes were seen the sketch IS the exact distinct
  * count; otherwise the estimator (k−1)/u_k applies, where u_k is the
  * k-th smallest hash mapped to (0,1] uniformly. Standard KMV theory
  * (Bar-Yossef et al., "Counting distinct elements in a data stream",
  * RANDOM 2002): relative error ≈ 1/√(k−2).
  *
  * Scale: a groupBy with this aggregate ships k longs per group per
  * partition instead of the value set — distinct-count at 100 TB without
  * the `countDistinct` shuffle explosion. k tunes accuracy vs state.
  */
case class KmvSketch(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 2, s"k must be ≥ 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  // hashes compare as UNSIGNED longs so the "k smallest" map uniformly
  // onto (0,1]; flip the sign bit to get unsigned order from signed order
  private def ord(h: Long): Long = h ^ Long.MinValue

  override def update(buf: java.util.TreeSet[Long], input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // hash the already-evaluated datum directly (same algorithm as the
      // XxHash64 expression) — evaluating the child once per row
      val h = ord(org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(v, child.dataType, 42L))
      add(buf, h)
    }
    buf
  }

  private def add(buf: java.util.TreeSet[Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { if (buf.add(h)) { buf.pollLast(); () } }
  }

  override def merge(b1: java.util.TreeSet[Long], b2: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    if (buf.size < k) buf.size.toLong
    else {
      // u_k = k-th smallest hash as a fraction of the unsigned hash space:
      // stored values are sign-flipped, so (v − Long.Min)/2^64 ∈ [0,1)
      val u = (buf.last().toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      math.round((k - 1) / math.max(u, java.lang.Double.MIN_VALUE))
    }
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketch {
  val FunctionName = "graft_kmv_distinct"

  /** Registry builder: `graft_kmv_distinct(col, k)` with a literal k. */
  val builder: Seq[Expression] => Expression = { exprs =>
    val k = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$FunctionName k must be an integer literal, got $other")
    }
    KmvSketch(exprs(0), k).toAggregateExpression()
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "built-in")

  /** Column-API entry point; requires [[register]] (or GraftExtensions). */
  def kmvDistinct(c: Column, k: Int): Column =
    call_function(FunctionName, c, org.apache.spark.sql.functions.lit(k))
}
