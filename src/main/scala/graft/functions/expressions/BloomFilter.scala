package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Literal, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distributed Bloom filter as a pair of native Catalyst expressions — the
  * scale path for membership prefilters (benchmark decontamination, URL /
  * fingerprint block-lists) where the "small" set is too large to ship as
  * an IN-list but far too small to justify shuffling the 100 TB side into
  * a join.
  *
  * Build side: [[BloomBuildAgg]] — a mergeable TypedImperativeAggregate
  * whose state is the bit array itself (partial aggregation works
  * map-side; partitions OR together under `merge`, so the result is
  * independent of row order and partitioning). Probe side:
  * [[BloomMightContain]] — a scalar expression over the serialized filter
  * with `doGenCode`, so the probe runs inside whole-stage codegen as a
  * map-side filter: zero shuffle, zero network, one broadcast-sized byte
  * array.
  *
  * Bits are set per Kirsch–Mitzenmacher double hashing: position_i =
  * (h1 + i·h2) mod m with h1/h2 two seeds of xxhash64 — k independent-ish
  * probes from two hash evaluations ("Less hashing, same performance",
  * Kirsch & Mitzenmacher 2006). The serialized form is self-describing
  * (numHashes header + bit words), so build and probe cannot disagree on
  * k.
  *
  * A Bloom filter has NO false negatives, so `bloom-prefilter → exact
  * confirm on survivors` computes the exact join result while the
  * expensive side never shuffles: false positives only cost confirm-join
  * input, never correctness. That composition is
  * [[graft.operators.BloomDecon]].
  */
case class BloomBuildAgg(child: Expression, numBits: Int, numHashes: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1,16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_build"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h1 = XxHash64Function.hash(v, child.dataType, BloomFilterFormat.Seed1)
      val h2 = XxHash64Function.hash(v, child.dataType, BloomFilterFormat.Seed2)
      var i = 0
      while (i < numHashes) {
        val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
        buf(pos >> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = BloomFilterFormat.encode(numHashes, buf)

  override def serialize(buf: Array[Long]): Array[Byte] = BloomFilterFormat.encode(numHashes, buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomFilterFormat.decodeWords(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Self-describing wire format: 4-byte numHashes header, then the bit
  * words. Probe-side parsing lives here so both expressions share one
  * definition of the bytes.
  */
object BloomFilterFormat {
  val Seed1 = 41L
  val Seed2 = 43L

  def encode(numHashes: Int, words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + words.length * 8)
    bb.putInt(numHashes)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def decodeNumHashes(bytes: Array[Byte]): Int = ByteBuffer.wrap(bytes).getInt

  def decodeWords(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt
    val words = new Array[Long]((bytes.length - 4) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    words
  }
}

/** Deserialized probe kernel, referenced from generated code via
  * `addReferenceObj` — the hot path is two xxhash64 evaluations plus k
  * word probes, no allocation.
  */
final class BloomProbe(bytes: Array[Byte]) extends Serializable {
  private val k: Int = BloomFilterFormat.decodeNumHashes(bytes)
  private val words: Array[Long] = BloomFilterFormat.decodeWords(bytes)
  private val numBits: Long = words.length.toLong * 64L

  def contains(s: UTF8String): Boolean = {
    val h1 = XxHash64Function.hash(s, StringType, BloomFilterFormat.Seed1)
    val h2 = XxHash64Function.hash(s, StringType, BloomFilterFormat.Seed2)
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits).toInt
      if ((words(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `graft_bloom_contains(str, bloomBytes)` — true iff the string MIGHT be
  * in the set the filter was built over (no false negatives). The filter
  * argument must be foldable (a literal / collected build result): it is
  * deserialized once per executor, not per row, and the probe loop runs
  * inside whole-stage codegen.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, BinaryType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) bloom filter argument")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val probe: BloomProbe = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null && bytes.length >= 12,
      s"$prettyName: bloom filter bytes are null or truncated")
    new BloomProbe(bytes)
  }

  override def nullSafeEval(s: Any, _bloom: Any): Any =
    probe.contains(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val probeRef = ctx.addReferenceObj("bloomProbe", probe, classOf[BloomProbe].getName)
    nullSafeCodeGen(ctx, ev, (s, _) => s"${ev.value} = $probeRef.contains($s);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomFilterExprs {
  val BuildName = "graft_bloom_build"
  val ContainsName = "graft_bloom_contains"

  private def intLit(name: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name argument must be an integer literal, got $other")
  }

  /** Registry builder: `graft_bloom_build(col, numBits, numHashes)`. */
  val buildBuilder: Seq[Expression] => Expression = { exprs =>
    BloomBuildAgg(exprs(0), intLit(BuildName, exprs(1)), intLit(BuildName, exprs(2)))
      .toAggregateExpression()
  }

  /** Registry builder: `graft_bloom_contains(col, bloomBytes)`. */
  val containsBuilder: Seq[Expression] => Expression = { exprs =>
    BloomMightContain(exprs(0), exprs(1))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      BuildName, buildBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ContainsName, containsBuilder, "built-in")
  }

  /** Column-API entry points; require [[register]] (or GraftExtensions). */
  def bloomBuild(c: Column, numBits: Int, numHashes: Int): Column =
    call_function(BuildName, c,
      org.apache.spark.sql.functions.lit(numBits),
      org.apache.spark.sql.functions.lit(numHashes))

  def bloomContains(c: Column, bloom: Column): Column =
    call_function(ContainsName, c, bloom)
}
