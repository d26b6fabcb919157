package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** HyperLogLog register array (Flajolet et al., AofA 2007) as a native
  * Catalyst TypedImperativeAggregate — the cardinality member of the
  * sketch family (KMV = order-statistics distinct, Count-Min = frequency,
  * Misra-Gries = heavy hitters, Bloom = membership, histogram = quantiles).
  * KMV estimates distinct counts from the k smallest hashes; HLL gets the
  * same job done in m bytes of rank state and — unlike KMV — its state
  * union is a plain elementwise MAX, which is why it is the industry
  * default for mergeable distinct sketches (Iceberg/Druid/BigQuery).
  *
  * The input is NOT the raw item but a pre-computed `array(bucket, rho)`
  * pair: bucketing and the leading-zero rank both derive from the
  * portable 60-bit md5 hash in codegen'd column expressions
  * ([[graft.functions.TextFunctions.portableHash60]]), so a DuckDB oracle
  * rebuilds every register cell-for-cell (see
  * [[graft.queries.ScaleOps.hllDistinctSql]]) and the estimate is
  * integer-exact cross-engine (the harmonic mean runs in scaled-integer
  * space — no float sum whose order could drift). The aggregate itself is
  * a pure max-register grid.
  *
  * Scale story: distinct counts over a 100 TB stream with NO per-key
  * shuffle and NO per-key state — partial aggregation builds one m-long
  * register array per map task and the exchange carries
  * `partitions × m × 8` bytes. `merge` is elementwise max: idempotent,
  * commutative, associative — the result is exactly row-order-,
  * duplication- and partitioning-independent, which is what makes it
  * hash-stable under the oracle AND safe to OR into from retried tasks.
  */
case class HyperLogLog(child: Expression, m: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16: $m")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hll"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val pair = v.asInstanceOf[ArrayData]
      require(pair.numElements() == 2, s"expected [bucket, rho], got ${pair.numElements()} elems")
      val b = pair.getLong(0)
      val rho = pair.getLong(1)
      require(b >= 0 && b < m, s"bucket $b out of [0,$m)")
      require(rho >= 1 && rho <= 60, s"rho $rho out of [1,60]")
      if (rho > buf(b.toInt)) buf(b.toInt) = rho
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HyperLogLog =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HyperLogLog =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Re-aggregation of STORED HLL register arrays — the `hll_union_agg`
  * warehouse primitive: input rows are m-long register arrays (what
  * [[HyperLogLog]] emits and a table stores per partition/day), the
  * aggregate is the same elementwise max, so distinct-over-any-subset
  * reduces to one GROUP BY over 2 KB rows without touching raw data.
  * Same merge algebra as the base sketch — idempotent, commutative,
  * associative — so the union of sketches IS the sketch of the union.
  */
case class HllMerge(child: Expression, m: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16: $m")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hll_merge"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val regs = v.asInstanceOf[ArrayData]
      require(regs.numElements() == m, s"expected $m registers, got ${regs.numElements()}")
      var i = 0
      while (i < m) {
        val r = regs.getLong(i)
        if (r > buf(i)) buf(i) = r
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HyperLogLog {
  val FunctionName = "graft_hll"
  val MergeFunctionName = "graft_hll_merge"

  /** `graft_hll(array(bucket, rho), m)` with literal register count. */
  val builder: Seq[Expression] => Expression = { exprs =>
    val m = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$FunctionName m must be an integer literal, got $other")
    }
    HyperLogLog(exprs.head, m).toAggregateExpression()
  }

  val mergeBuilder: Seq[Expression] => Expression = { exprs =>
    val m = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$MergeFunctionName m must be an integer literal, got $other")
    }
    HllMerge(exprs.head, m).toAggregateExpression()
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MergeFunctionName, mergeBuilder, "built-in")
  }

  /** Column-API entry point; requires [[register]] (or GraftExtensions). */
  def hll(bucketRho: Column, m: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(FunctionName, bucketRho, lit(m))
  }

  /** Union of stored register arrays; requires [[register]]. */
  def hllMerge(registers: Column, m: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(MergeFunctionName, registers, lit(m))
  }
}
