package graft.functions.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native mergeable Catalyst
  * aggregate — frequency estimation over string columns with at most
  * `capacity` counters of state per partition, independent of
  * cardinality.
  *
  * Classic streaming update (Misra & Gries 1982): hit → increment; miss
  * with room → insert; miss at capacity → decrement every counter (each
  * such round retires capacity+1 mass, so rounds ≤ n/(capacity+1) —
  * amortized O(1) per row). Merge follows Agarwal et al., "Mergeable
  * summaries" (PODS 2012): add counts keywise, then subtract the
  * (capacity+1)-th largest count from all and drop non-positives. The
  * combined guarantee: every sketch count is an underestimate by at most
  * n/(capacity+1) TOTAL across any partitioning/merge tree, so every item
  * with true count > n/(capacity+1) is present in the final sketch.
  *
  * That survivor guarantee is what [[graft.operators.HeavyHitters]]
  * builds on: sketch → candidate set (≤ capacity items) → broadcast
  * exact confirm → EXACT top-k, with the full corpus never shuffling on
  * the item key. Output: array<struct<item,count>> sorted by item
  * (deterministic regardless of hash-map iteration order).
  */
case class MisraGries(child: Expression, capacity: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity >= 1 && capacity <= (1 << 20),
    s"capacity must be in [1, 2^20], got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key, 1L)
        case None =>
          // decrement-all round: retires capacity+1 total mass
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything; at
      // most `capacity` items can stay strictly positive afterwards
      val pivot = b1.values.toArray.sortInPlaceWith(_ > _).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace((_, c) => c - pivot)
      b1.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortInPlaceBy(_._1)
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val payloads = entries.map { case (k, c) => (k.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + payloads.map(_._1.length + 12).sum)
    bb.putInt(payloads.length)
    payloads.foreach { case (kb, c) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGries {
  val FunctionName = "graft_misra_gries"

  /** Registry builder: `graft_misra_gries(col, capacity)` with a literal
    * capacity.
    */
  val builder: Seq[Expression] => Expression = { exprs =>
    val c = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$FunctionName capacity must be an integer literal, got $other")
    }
    MisraGries(exprs(0), c).toAggregateExpression()
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "built-in")

  /** Column-API entry point; requires [[register]] (or GraftExtensions). */
  def sketch(c: Column, capacity: Int): Column =
    call_function(FunctionName, c, org.apache.spark.sql.functions.lit(capacity))
}
