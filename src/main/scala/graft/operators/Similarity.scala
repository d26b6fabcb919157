package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exactness baseline and
  * a random-hyperplane LSH bucketed variant as the scale path.
  *
  * All vector math uses `zip_with`/`aggregate` higher-order functions over
  * the array column — no UDFs, single pass, codegen-compatible.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a left-fold — deterministic evaluation order; elements are
    * widened to double BEFORE the multiply (float×float would round at
    * float precision).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  // Native-expression kernel (graft.functions.expressions.DotProduct):
  // same accumulation order as the HOF fold → bit-identical doubles, ~3×
  // faster (codegen'd primitive loop). Requires registerNative(session).
  def registerNative(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.expressions.DotProduct.register(spark)

  def ndot(a: Column, b: Column): Column =
    graft.functions.expressions.DotProduct.dot(a, b)

  def nnorm(a: Column): Column = sqrt(ndot(a, a))

  /** Brute-force exact cosine top-k for every vector against the corpus.
    *
    * Scale: O(n·m) — correct baseline and oracle for the LSH variant. For a
    * big corpus the right physical shape is exactly this plan with the
    * QUERY side small (broadcast), so Spark executes it as a broadcast
    * nested-loop with no shuffle of the corpus; top-k folds into a
    * window-rank per query.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    registerNative(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
      .withColumn("nbr_norm", nnorm(col("nbr_vec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", nnorm(col("q_vec")))
    val scored = broadcast(q).join(c, col("query_id") =!= col("nbr_id"))
      .withColumn("cos", ndot(col("q_vec"), col("nbr_vec")) / (col("q_norm") * col("nbr_norm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("nbr_id"), col("cos"))
  }

  /** Unit-normalize vectors once (linear pass) so any downstream pair
    * kernel is a bare dot product. Typed primitive loop: the numeric
    * kernels here are the documented mapPartitions-tier exception
    * (guide: "(d) as a last resort") — interpreted HOF eval per element
    * is ~10× slower than a JIT-compiled loop.
    */
  private def unitVectors(corpus: DataFrame, idCol: String, vecCol: String) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, vec) =>
        var n = 0.0; var i = 0
        while (i < vec.length) { n += vec(i).toDouble * vec(i); i += 1 }
        val inv = 1.0 / math.sqrt(n)
        val u = new Array[Double](vec.length)
        i = 0
        while (i < vec.length) { u(i) = vec(i) * inv; i += 1 }
        (id, u)
      }
  }

  /** Embedding-cosine near-duplicate pairs (the fifth dedup method of the
    * training-data pipeline): ALL pairs with cosine ≥ threshold — exact,
    * via a BLOCKED self-join.
    *
    * An exact all-pairs similarity join is Ω(n²) work no matter the plan;
    * the scale question is the physical SHAPE of that work. Here vectors
    * hash into `blocks` blocks and every unordered block pair (p ≤ q)
    * becomes one equi-join key, so the pair space executes as
    * B(B+1)/2 independent shuffle-join partitions: work spreads evenly
    * across executors, per-task memory is bounded by 2n/B vectors,
    * nothing is broadcast, no nested-loop/cartesian operator appears in
    * the plan (PlanSpec-asserted), and replication is B× per side. Pick
    * blocks ≈ √(cluster cores) upward until a block fits a task.
    * (LSH/IVF candidate generation — [[lshCosineTopK]], IvfIndex — stays
    * the approximate route for high thresholds where missing a pair is
    * acceptable; at threshold 0.4 no hash family gives recall 1.)
    */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         minCosine: Double, blocks: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val b = blocks
    val v = unitVectors(corpus, idCol, vecCol)
      .map { case (id, u) => (id, u, (((id % b) + b) % b).toInt) }
    // left role: block p joins into keys (p, q) for q ≥ p; right role:
    // block q joins into keys (p, q) for p ≤ q — every unordered
    // cross-block pair lands on exactly one key, the diagonal key holds
    // the within-block pairs (filtered to d1 < d2 below).
    val lhs = v.flatMap { case (id, u, blk) =>
      (blk until b).map(q => (blk * b + q, id, u, blk)) }
      .toDF("bk", "d1", "v1", "b1")
    val rhs = v.flatMap { case (id, u, blk) =>
      (0 to blk).map(p => (p * b + blk, id, u, blk)) }
      .toDF("bk", "d2", "v2", "b2")
    lhs.join(rhs, "bk")
      .filter(col("b1") =!= col("b2") || col("d1") < col("d2"))
      .select(col("d1"), col("v1"), col("d2"), col("v2"))
      .as[(Long, Array[Double], Long, Array[Double])]
      .flatMap { case (d1, v1, d2, v2) =>
        var d = 0.0; var i = 0
        while (i < v1.length) { d += v1(i) * v2(i); i += 1 }
        if (d >= minCosine) Some((math.min(d1, d2), math.max(d1, d2), d)) else None
      }
      .toDF("d1", "d2", "cos")
  }

  /** Single-task brute-force twin of [[cosineNearDupPairs]] (d1 < d2
    * nested loop): the spec oracle the blocked join is verified against.
    * Never the production path.
    */
  def cosineNearDupPairsBrute(corpus: DataFrame, idCol: String, vecCol: String,
                              minCosine: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val v = unitVectors(corpus, idCol, vecCol)
    val a = v.toDF("d1", "v1")
    val b = v.toDF("d2", "v2")
    a.join(b, col("d1") < col("d2"))
      .as[(Long, Array[Double], Long, Array[Double])]
      .flatMap { case (d1, v1, d2, v2) =>
        var d = 0.0; var i = 0
        while (i < v1.length) { d += v1(i) * v2(i); i += 1 }
        if (d >= minCosine) Some((d1, d2, d)) else None
      }
      .toDF("d1", "d2", "cos")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a value in [-1,1) derived from the portable md5-based 60-bit hash of
    * the canonical string "plane|dim" — stable across runs, no RNG state
    * to ship, and exactly reproducible in DuckDB SQL (q35's oracle
    * recomputes the full hyperplane family from md5). Computed DRIVER-SIDE
    * and shipped as plan literals: the family is data-independent, so
    * evaluating md5 per row (planes × dims digests per vector) would be
    * pure waste — this is the same value the SQL mirror derives, pinned
    * by SimilaritySpec against the in-engine expression.
    */
  private[operators] def planeComponentValue(plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$plane|$dim".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    (h % 2000001L).toDouble / 1000000.0 - 1.0
  }

  /** The same component as an in-engine expression — exists only so the
    * spec can pin literal/engine/oracle agreement; never in a hot path.
    */
  private[operators] def planeComponentExpr(plane: Int, dim: Column): Column =
    (pmod(graft.functions.TextFunctions.portableHash60(
        concat_ws("|", lit(plane), dim)),
      lit(2000001L)).cast("double") / lit(1000000.0)) - lit(1.0)

  /** Random-hyperplane signature: bit i = sign(v · plane_i). Returns
    * `bucket` (long with `planes` bits). Cosine-similar vectors agree on
    * most bits, so same-bucket collision probability grows with cosine.
    * `dims` must equal the vector length (the hyperplane family is a
    * fixed-size literal matrix in the plan).
    */
  def hyperplaneBucket(vec: Column, planes: Int, dims: Int = 64): Column = {
    val bits = (0 until planes).map { pIdx =>
      val comps = array((0 until dims).map(d => lit(planeComponentValue(pIdx, d))): _*)
      val proj = aggregate(
        zip_with(vec, comps, (x, c) => x * c),
        lit(0.0d), (acc, x) => acc + x)
      when(proj > 0, lit(1L << pIdx)).otherwise(lit(0L))
    }
    // loud failure on a dims mismatch: zip_with would null-pad the shorter
    // side, null-poison every projection, and silently collapse all
    // signatures into bucket 0 (a full-cartesian candidate set downstream).
    // assert_true returns NULL when the predicate holds, so the coalesce
    // contributes 0 to the bucket and stays inside codegen.
    val guard = coalesce(
      assert_true(size(vec) === dims,
        concat(lit(s"hyperplaneBucket: expected $dims dims, got "),
          size(vec).cast("string"))).cast("long"),
      lit(0L))
    bits.reduce((a, b) => a.bitwiseOR(b)) + guard
  }

  /** LSH-bucketed ANN: signature → band buckets → exact cosine only within
    * buckets → top-k. Multi-band (bandBits-sized slices of the signature)
    * gives OR-amplification like MinHash LSH.
    *
    * Scale: replaces the O(n·m) scan with per-bucket joins; recall depends
    * on the cosine concentration of the corpus (documented: near-uniform
    * random vectors have weak LSH gain, planted near-dups are caught with
    * high probability).
    */
  def lshCosineTopK(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, planes: Int = 16, bandBits: Int = 4,
                    dims: Int = 64): DataFrame = {
    require(planes % bandBits == 0)
    val bands = planes / bandBits
    // Bucket on ids only — the banded self-join never shuffles the vectors;
    // they are joined back onto the (much smaller) candidate pair set.
    val sig = corpus.select(col(idCol),
      hyperplaneBucket(col(vecCol), planes, dims).as("bucket"))
    val banded = sig.select(col(idCol),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("bucket"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1))): _*)).as(Seq("band", "bandVal")))
    val cand = banded.select(col(idCol).as("query_id"), col("band"), col("bandVal"))
      .join(banded.select(col(idCol).as("nbr_id"), col("band"), col("bandVal")),
        Seq("band", "bandVal"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"))
      .distinct()
    registerNative(corpus.sparkSession)
    val vecs = corpus.select(col(idCol), col(vecCol), nnorm(col(vecCol)).as("vnorm"))
    val scored = cand
      .join(vecs.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        col("vnorm").as("q_norm")), Seq("query_id"))
      .join(vecs.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"),
        col("vnorm").as("nbr_norm")), Seq("nbr_id"))
      .withColumn("cos",
        ndot(col("q_vec"), col("nbr_vec")) / (col("q_norm") * col("nbr_norm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("nbr_id"), col("cos"))
  }
}
