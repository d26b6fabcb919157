package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.functions.expressions.HyperLogLog

/** HyperLogLog register aggregate: register equality vs a scalar reference
  * implementation, duplication/partitioning invariance (max-merge), the
  * documented ±~2σ accuracy band at m=256, and input validation.
  */
class HyperLogLogSpec extends SparkSuite {
  import spark.implicits._

  private val m = 256

  private def bucketRho(c: org.apache.spark.sql.Column) = {
    val h = graft.functions.TextFunctions.portableHash60(c)
    val w = (h / m).cast("long")
    val rho = when(w === 0, lit(53L)).otherwise(lit(53L) - length(bin(w)).cast("long"))
    array(pmod(h, lit(m)).cast("long"), rho)
  }

  private def registersOf(items: Seq[String], parts: Int): Array[Long] = {
    HyperLogLog.register(spark)
    val df = items.toDF("item").repartition(parts)
    df.select(HyperLogLog.hll(bucketRho($"item"), m).as("regs"))
      .head().getSeq[Long](0).toArray
  }

  /** Scalar reference: same md5-derived bucket/rho, plain max fold. */
  private def referenceRegisters(items: Seq[String]): Array[Long] = {
    val regs = new Array[Long](m)
    items.foreach { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      val hv = java.lang.Long.parseLong(hex, 16)
      val b = (hv % m).toInt
      val w = hv / m
      val rho = if (w == 0) 53L else 53L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(b)) regs(b) = rho
    }
    regs
  }

  private def estimate(regs: Array[Long]): Double = {
    val s = regs.map(r => 1L << (53 - r).toInt).sum
    (BigInt("544998871055020014822227968000") / (BigInt(1285395) * BigInt(s))).toDouble / 1000.0
  }

  test("registers match the scalar reference bit-for-bit") {
    val items = (0 until 5000).map(i => s"k$i")
    assert(registersOf(items, 8).toSeq == referenceRegisters(items).toSeq)
  }

  test("registers are invariant to duplication and partitioning (max-merge)") {
    val items = (0 until 2000).map(i => s"v${i % 700}")
    val once = registersOf((0 until 700).map(i => s"v$i"), 1)
    assert(registersOf(items, 1).toSeq == once.toSeq)
    assert(registersOf(items, 13).toSeq == once.toSeq)
  }

  test("estimate lands within ±15% at m=256 across cardinality decades") {
    Seq(500, 5000, 50000).foreach { n =>
      val est = estimate(registersOf((0 until n).map(i => s"id$i"), 8))
      assert(math.abs(est - n) <= 0.15 * n, s"n=$n est=$est")
    }
  }

  test("graft_hll_merge over stored register arrays equals one direct sketch") {
    HyperLogLog.register(spark)
    val items = (0 until 3000).map(i => (i % 5, s"u$i")) // 5 "days"
    val df = items.toDF("day", "item")
    val perDay = df.groupBy($"day")
      .agg(HyperLogLog.hll(bucketRho($"item"), m).as("regs"))
    val merged = perDay.agg(HyperLogLog.hllMerge($"regs", m).as("regs"))
      .head().getSeq[Long](0).toArray
    val direct = registersOf(items.map(_._2), 4)
    assert(merged.toSeq == direct.toSeq,
      "union of per-day sketches must equal the sketch of the union")
  }

  test("malformed input fails loudly") {
    HyperLogLog.register(spark)
    val bad = Seq(1L).toDF("x")
      .select(expr(s"graft_hll(array(CAST(999 AS BIGINT), CAST(1 AS BIGINT)), $m)"))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("bucket") || e.getCause != null)
  }
}
