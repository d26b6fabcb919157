package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for storage/serving: symmetric per-vector int8 —
  * scale = max(|x|)/127, q_i = round(x_i/scale) clamped to [-127,127].
  * Pure higher-order-function arithmetic (codegen'd, no UDF); the whole
  * transform is a map over the vector column — no shuffle at any scale.
  *
  * Determinism note: x/scale is one IEEE double division + HALF_UP round,
  * bit-identical across engines; the all-zero vector keeps scale 0 and
  * quantizes to zeros (guarded division).
  */
object Quantize {

  /** max(|x_i|) as a double. */
  def absMax(vec: Column): Column =
    aggregate(vec, lit(0.0d), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** int8 quantization of `vec` against an ALREADY-MATERIALIZED scale
    * column. The scale must be projected in a previous select: an inline
    * aggregate expression referenced inside the transform lambda would be
    * re-evaluated per vector ELEMENT (O(d²) per vector — the q85/q138
    * lambda lesson; higher-order functions get no common-subexpression
    * elimination).
    */
  def int8At(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0, lit(0))
        .otherwise(
          greatest(lit(-127), least(lit(127),
            round(x.cast("double") / scale, 0).cast("int")))))

  /** (scale, int8 array) columns for a float-vector column. Prefer
    * projecting [[absMax]]/127 first and calling [[int8At]] — see its
    * scaladoc for why the inline form is quadratic in vector length.
    */
  def int8(vec: Column): (Column, Column) = {
    val scale = absMax(vec) / lit(127.0d)
    (scale, int8At(vec, scale))
  }

  /** Dequantized reconstruction (for error measurement): q_i * scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Per-vector quantization report: scale, quantized vector, and max
    * absolute reconstruction error.
    */
  def report(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // scale projected FIRST, so the q8 transform reads a materialized
    // double instead of re-running the absMax aggregate per element
    val withQ = df
      .select(col(idCol), col(vecCol), (absMax(col(vecCol)) / lit(127.0d)).as("scale"))
      .select(col(idCol), col(vecCol), col("scale"),
        int8At(col(vecCol), col("scale")).as("q8"))
    withQ.select(
      col(idCol), col("scale"), col("q8"),
      aggregate(
        zip_with(col(vecCol), dequantize(col("q8"), col("scale")),
          (a, b) => abs(a.cast("double") - b)),
        lit(0.0d), (acc, x) => greatest(acc, x)).as("max_err"))
  }
}
