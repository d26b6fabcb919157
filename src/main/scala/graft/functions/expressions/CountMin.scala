package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * native Catalyst TypedImperativeAggregate — the approximate-frequency
  * member of the sketch family (KMV = distinct count, Misra-Gries = heavy
  * hitters, Bloom = membership, KLL-ish = quantiles).
  *
  * The input is NOT the raw item but its `depth` pre-computed bucket
  * indices (an `array<long>`, one per hash row): bucketing stays in
  * codegen'd column expressions (md5-derived, so a DuckDB oracle can
  * recompute the sketch cell-for-cell — see
  * [[graft.queries.TextOps.cmsFreqSql]]), and the aggregate itself is a
  * pure counter grid. State: `depth × width` longs (32 KB at 4×1024).
  *
  * Scale story: frequency estimates over a 100 TB token stream without the
  * per-key shuffle — partial aggregation builds one grid per map task and
  * the exchange carries `partitions × depth × width × 8` bytes instead of
  * a vocabulary-sized hash aggregate. `merge` is elementwise add, so the
  * result is exactly row-order- and partitioning-independent (integer
  * sums), which is what makes the estimate hash-stable cross-engine.
  */
case class CountMin(child: Expression, depth: Int, width: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_count_min"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val idx = v.asInstanceOf[ArrayData]
      require(idx.numElements() == depth,
        s"expected $depth bucket indices, got ${idx.numElements()}")
      var j = 0
      while (j < depth) {
        val b = idx.getLong(j)
        require(b >= 0 && b < width, s"bucket $b out of [0,$width)")
        buf(j * width + b.toInt) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CountMin {
  val FunctionName = "graft_count_min"

  /** `graft_count_min(bucketIdxArray, depth, width)` with literal shape. */
  val builder: Seq[Expression] => Expression = { exprs =>
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$FunctionName $what must be an integer literal, got $other")
    }
    CountMin(exprs(0), intLit(exprs(1), "depth"), intLit(exprs(2), "width"))
      .toAggregateExpression()
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "built-in")

  /** Column-API entry point; requires [[register]] (or GraftExtensions). */
  def countMin(bucketIdx: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(FunctionName, bucketIdx, lit(depth), lit(width))
  }
}
