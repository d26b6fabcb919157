package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins the int8At/int8 split introduced in the optimization round: the
  * materialized-scale path must quantize exactly like the inline form,
  * and the report must keep its reconstruction-error contract.
  */
class QuantizeSpec extends SparkSuite {
  import spark.implicits._

  test("int8At over a projected scale equals the inline int8 form") {
    val df = Seq(
      (1L, Seq(0.5, -1.0, 0.25, 127.0)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0)), // all-zero: scale 0, quantizes to zeros
      (3L, Seq(-3.5, 2.5, 1.5, -0.5))
    ).toDF("id", "v")
    val (scaleInline, qInline) = Quantize.int8(col("v"))
    val inline = df.select(col("id"), scaleInline.as("s"), qInline.as("q"))
    val projected = df
      .select(col("id"), col("v"), (Quantize.absMax(col("v")) / lit(127.0d)).as("s"))
      .select(col("id"), col("s"), Quantize.int8At(col("v"), col("s")).as("q"))
    assert(inline.orderBy("id").collect().toSeq ==
      projected.orderBy("id").collect().toSeq)
  }

  test("report: zero vector has zero error; max_err bounded by scale/2") {
    val df = Seq((1L, Seq(1.0, -0.5, 0.3)), (2L, Seq(0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val r = Quantize.report(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    val scale1 = r(0).getDouble(1)
    assert(r(0).getDouble(3) <= scale1 / 2 + 1e-12)
    assert(r(1).getDouble(1) == 0.0 && r(1).getDouble(3) == 0.0)
    assert(r(1).getSeq[Int](2).forall(_ == 0))
  }
}
