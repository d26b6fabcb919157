package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY scale posture; complements
  * AQE's runtime skew-join splitting with a plan-level tool usable where
  * AQE can't reach — e.g. under windows or when one hot key dominates).
  *
  * Semantics: exactly a plain inner/left equi-join. The fact side gets a
  * deterministic salt in [0, factor) derived from its whole row (so the
  * same row always lands in the same salted partition — rerun-stable);
  * the dim side is exploded ×factor so every salted key finds its match.
  */
object SkewJoin {

  /** A deterministic row salt: hash of the given columns mod factor. */
  def salt(factor: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(factor)).cast("int")

  /** fact ⋈ dim on `key`, salted ×`factor`. `saltSource` columns (default:
    * all fact columns) feed the salt hash; pass high-cardinality columns
    * for an even spread.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, factor: Int,
                 joinType: String = "inner",
                 saltSource: Seq[String] = Nil): DataFrame = {
    require(factor > 0)
    val src = if (saltSource.nonEmpty) saltSource else fact.columns.toSeq
    val saltedFact = fact.withColumn("__salt", salt(factor, src.map(col): _*))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
