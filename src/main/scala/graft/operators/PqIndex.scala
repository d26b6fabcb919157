package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Similarity.{ndot, registerNative}

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011): split each vector into M contiguous
  * subspaces, learn a small per-subspace codebook (k-means), store each
  * vector as M byte-sized code ids, and answer queries with asymmetric
  * distance computation (ADC) — the query builds an M×K table of exact
  * subspace distances to every codeword, and a vector's approximate
  * distance is the fixed-order sum of M table lookups.
  *
  * This is the memory-bound scale path the IVF-flat index
  * ([[IvfIndex]]) doesn't cover: IVF prunes WHICH vectors are scored,
  * PQ compresses HOW each vector is scored (M bytes instead of D
  * floats — 64-dim float vectors shrink 64×). At 100 TB the two
  * compose (IVF-PQ); here PQ is built and graded standalone so its
  * quantization error is observable against the exact baseline.
  *
  * Determinism (the DuckDB-oracle contract, same style as [[IvfIndex]]):
  * codebook seeds are the k lowest-id vectors' slices; one Lloyd step
  * refines them as per-dimension grouped means CAST TO FLOAT (the float
  * rounding absorbs summation-order ulps); every distance is computed as
  * (⟨a,a⟩ − 2⟨a,b⟩) + ⟨b,b⟩ over float inputs with double accumulation
  * in index order — bit-identical in the native kernel and in DuckDB's
  * DOUBLE[] inner product over promoted floats. Floats are used for
  * ORDERING only; outputs carry ids and integer ranks.
  *
  * Scale: codebooks are M×K rows (broadcast everywhere); encoding is one
  * broadcast join + per-(vector, subspace) argmin — no corpus self-join;
  * ADC scoring shuffles the M-byte codes, never the vectors.
  */
object PqIndex {

  /** Squared L2 with a fixed expression tree: (⟨a,a⟩ − 2⟨a,b⟩) + ⟨b,b⟩. */
  private def d2(a: Column, b: Column): Column =
    (ndot(a, a) - lit(2.0) * ndot(a, b)) + ndot(b, b)

  /** Explode a vector column into (id, m, sv): M contiguous slices of
    * dsub dims each. Local array expansion — no shuffle.
    */
  def subvectors(df: DataFrame, idCol: String, vecCol: String,
                 m: Int, dsub: Int): DataFrame =
    df.select(col(idCol), explode(array((0 until m).map(i =>
        struct(lit(i).as("m"), slice(col(vecCol), i * dsub + 1, dsub).as("sv"))): _*)).as("s"))
      .select(col(idCol), col("s.m").as("m"), col("s.sv").as("sv"))

  /** Nearest-codeword assignment per (vector, subspace): broadcast the
    * M×K codebook, argmin by squared L2 with code_id tie-break.
    */
  def assign(sub: DataFrame, idCol: String, codebook: DataFrame): DataFrame = {
    registerNative(sub.sparkSession)
    val w = Window.partitionBy(col("m"), col(idCol))
      .orderBy(col("d").asc, col("code_id").asc)
    sub.join(broadcast(codebook), Seq("m"))
      .withColumn("d", d2(col("sv"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("m"), col("code_id"))
  }

  /** Learn per-subspace codebooks: k lowest-id seed slices + one Lloyd
    * refinement (per-dim grouped means, float-rounded).
    */
  def codebooks(corpus: DataFrame, idCol: String, vecCol: String,
                m: Int, dsub: Int, k: Int): DataFrame = {
    registerNative(corpus.sparkSession)
    val sub = subvectors(corpus, idCol, vecCol, m, dsub)
    val seeds = subvectors(corpus.orderBy(col(idCol)).limit(k), idCol, vecCol, m, dsub)
      .withColumn("code_id",
        (row_number().over(Window.partitionBy(col("m")).orderBy(col(idCol))) - 1).cast("int"))
      .select(col("m"), col("code_id"), col("sv").as("centroid"))
    val a0 = assign(sub, idCol, seeds)
    val byDim = sub.join(a0, Seq(idCol, "m"))
      .select(col("m"), col("code_id"), posexplode(col("sv")).as(Seq("dim", "x")))
      .groupBy(col("m"), col("code_id"), col("dim"))
      .agg(avg(col("x")).as("mu"))
    byDim
      .groupBy(col("m"), col("code_id"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mu")))).as("ds"))
      .select(col("m"), col("code_id"),
        transform(col("ds"), d => d.getField("mu").cast("float")).as("centroid"))
  }

  /** ADC shortlist: approximate distance (fixed-order sum of the M table
    * lookups) ranked per query, top `shortlist` candidate ids.
    */
  def adcShortlist(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                   m: Int, dsub: Int, k: Int, shortlist: Int): DataFrame = {
    val cb = codebooks(corpus, idCol, vecCol, m, dsub, k).cache()
    val codes = assign(subvectors(corpus, idCol, vecCol, m, dsub), idCol, cb)
      .withColumnRenamed(idCol, "nbr_id")
    val qsub = subvectors(queries, idCol, vecCol, m, dsub)
      .withColumnRenamed(idCol, "query_id")
    val dtab = qsub.join(broadcast(cb), Seq("m"))
      .select(col("query_id"), col("m"), col("code_id"),
        d2(col("sv"), col("centroid")).as("d"))
    val perM = (0 until m).map(i =>
      max(when(col("m") === i, col("d"))).as(s"d$i"))
    val adist = (0 until m).map(i => col(s"d$i")).reduceLeft(_ + _)
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("nbr_id").asc)
    codes.join(dtab, Seq("m", "code_id"))
      .filter(col("query_id") =!= col("nbr_id"))
      .groupBy(col("query_id"), col("nbr_id"))
      .agg(perM.head, perM.tail: _*)
      .withColumn("adist", adist)
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= shortlist)
      .select(col("query_id"), col("nbr_id"))
  }

  /** Full PQ search with exact refinement (the FAISS IVFPQ+refine shape):
    * the compressed codes produce a `shortlist` of candidates per query
    * by ADC, then ONLY those candidates' true vectors are fetched and
    * re-ranked by exact squared L2. At scale this is the whole point of
    * PQ — the exact distance runs on shortlist×queries vectors, not the
    * corpus — and it is what makes top-k recall robust to quantization
    * error on tightly clustered data (ADC-only ranking measured 0.04
    * recall@5 on the normalized clustered test corpus; shortlist 50 +
    * refine measured 0.56, see PqIndexSpec).
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              m: Int, dsub: Int, k: Int, topk: Int, shortlist: Int = 50): DataFrame = {
    val cand = adcShortlist(corpus, queries, idCol, vecCol, m, dsub, k, shortlist)
    val nvec = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nv"))
    val qvec = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("xdist").asc, col("nbr_id").asc)
    cand
      .join(nvec, Seq("nbr_id"))
      .join(broadcast(qvec), Seq("query_id"))
      .withColumn("xdist", d2(col("qv"), col("nv")))
      .withColumn("rk", row_number().over(rankW))
      .filter(col("rk") <= topk)
      .select(col("query_id"), col("rk"), col("nbr_id"))
  }
}
