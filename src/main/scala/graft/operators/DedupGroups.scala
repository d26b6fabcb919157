package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** From near-duplicate PAIRS to deduplicated CORPORA: connected components
  * over the pair graph, a keep-min-id representative per component, and
  * the filtered corpus. Composes with any pair generator — exact n-gram
  * Jaccard (oracle-able), MinHash/LSH, SimHash, or embedding-cosine pairs.
  *
  * Scale design: min-label propagation — per round, every vertex adopts
  * the smallest label among itself and its neighbors; rounds = component
  * diameter. Near-dup components are overwhelmingly tiny (pairs of
  * re-posts, small mirror clusters), so 2-4 rounds converge; each round is
  * one shuffle join on vertex id + one aggregate, all map-side-combinable.
  * Crucially the loop runs over the EDGE-INDUCED SUBGRAPH only: a vertex
  * with no incident pair can never change its label, so the untouched bulk
  * of the corpus (the overwhelming majority at any scale) is stitched back
  * AFTER convergence with one left join instead of being shuffled every
  * round. The driver only checks the per-round convergence COUNT (a
  * scalar), and per-round results are persisted then unpersisted so
  * lineage stays flat (no exponential recompute under lazy evaluation).
  */
object DedupGroups {

  /** Connected components of the undirected pair graph restricted to
    * `vertices`. Returns (idCol, rep) where rep is the component's minimum
    * id; singleton vertices are their own rep.
    *
    * @param pairs     (d1, d2) edges, any orientation, duplicates fine
    * @param maxRounds safety bound on propagation rounds (components wider
    *                  than this would be left partially merged — throw
    *                  instead so the caller learns the graph is pathological)
    */
  def connectedComponents(vertices: DataFrame, idCol: String,
                          pairs: DataFrame, maxRounds: Int = 20,
                          localSolveMaxEdges: Long = 2000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val vs = vertices.select(col(idCol).as("id"))
    // Materialize the pair generator ONCE before anything else touches it:
    // the two union orientations below would otherwise each re-run the full
    // (expensive — quadratic shingle join or LSH pipeline) lineage. A
    // persist suffices here — both consumers land inside ONE job (the gate
    // count below), which caches pr mid-flight instead of paying a separate
    // eager-checkpoint materialization pass (the round-8 q47/q48 bench
    // regression). Lineage CUTTING is only needed by the iterative loop,
    // and is applied there, above the gate only.
    val pr = pairs.select(col("d1"), col("d2")).persist(StorageLevel.MEMORY_AND_DISK)
    // Materialize pr in its OWN job before the union consumes it twice:
    // two concurrently-scheduled branch stages inside one job can each
    // miss the still-cold cache and run the expensive pair pipeline in
    // parallel. (A/B vs the round-8 eager-checkpoint pre-gate measured
    // IDENTICAL wall time under load — the persist form is kept because
    // cached InMemoryRelation blocks are recomputable on block loss,
    // where localCheckpoint blocks are fatally lost; see the loop note.)
    pr.count()
    // undirected: keep each edge in both orientations, restricted to the
    // vertex set (edges referencing unknown ids never influenced labels in
    // the all-vertices formulation either — the src side fell out of the
    // label join and the dst side fell out of the left join). Duplicate
    // edges are harmless under the min-aggregate, so no distinct() pass.
    val e0 = pr.toDF("src", "dst")
      .unionByName(pr.select(col("d2").as("src"), col("d1").as("dst")))
      .join(vs.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(vs.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = e0.count() // cheap: reads the cached pair blocks
    // Size-gated LOCAL solve — the connected-components analog of a
    // broadcast join: near-dup edge sets are minuscule relative to the
    // corpus (pairs of re-posts, small mirror clusters), so when the
    // materialized edge list is driver-sized, union-find on the driver
    // replaces ~6 shuffle jobs + convergence probes with one collect and
    // one broadcast join back. Numeric-id corpora only (min-rep needs an
    // ordering); anything bigger or non-numeric takes the distributed loop
    // below — the 100 TB path.
    val numericIds = vs.schema.head.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    if (numericIds && nEdges <= localSolveMaxEdges) {
      val edgeRows = e0.collect() // cache hit from the gate count's job
      pr.unpersist(); e0.unpersist()
      val reps = localUnionFind(edgeRows.map(r =>
        (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue())))
      val sub = vs.sparkSession
        .createDataFrame(reps.toSeq).toDF("id", "rep")
        .select(col("id").cast(vs.schema.head.dataType),
          col("rep").cast(vs.schema.head.dataType).as("rep"))
      return vs.join(broadcast(sub), Seq("id"), "left")
        .select(col("id").as(idCol), coalesce(col("rep"), col("id")).as("rep"))
    }
    // Distributed path: NOW cut lineage — the loop references the edge
    // frame every round and the labels twice per step, so without a
    // checkpoint the plan STRING doubles per step (4^round; persist keeps
    // execution flat but the SQL listener still renders the full tree per
    // job, combinatorial around round ~6). NOTE: localCheckpoint blocks
    // are lost on executor failure (single-JVM local mode has no such
    // mode of loss; on a real cluster prefer reliable checkpointing for
    // multi-hour loops).
    val e = e0.localCheckpoint(eager = true)
    pr.unpersist(); e0.unpersist()
    // only vertices incident to an edge can ever change label — iterate
    // over that induced subgraph; everyone else is their own rep, stitched
    // back after the loop
    var labels = e.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("rep")).localCheckpoint(true)
    // one propagation step: every vertex adopts the min label among itself
    // and its neighbors
    def step(ls: DataFrame): DataFrame = {
      val fromNbrs = e.join(ls.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("rep")).as("nbrRep"))
      ls.join(fromNbrs, Seq("id"), "left")
        .select(col("id"), least(col("rep"), coalesce(col("nbrRep"), col("rep"))).as("rep"))
    }
    var round = 0
    var converged = false
    while (!converged) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"component diameter exceeds ${2 * maxRounds} propagation steps")
      // TWO steps per convergence probe: the probe is a driver round-trip
      // as expensive as a step, and near-dup components have tiny
      // diameters, so most inputs converge with a single probe.
      val next = step(step(labels)).localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("rep", "prev"), "id")
        .filter(col("rep") =!= col("prev")).limit(1).count()
      // the prior round's checkpoint blocks are dead as soon as `next` is
      // materialized AND the convergence probe (which reads both) has run —
      // free them NOW instead of letting storage grow with round count
      // until driver GC + ContextCleaner get around to it (round-8 ADVICE)
      freeLocalCheckpoint(labels)
      labels = next
      converged = changed == 0
      round += 1
    }
    // the FINAL labels' checkpoint blocks belong to the returned frame and
    // are released with it by the ContextCleaner
    val sub = labels
    // untouched vertices (no incident edge) are their own representative
    vs.join(sub, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("rep"), col("id")).as("rep"))
  }

  /** Unpersist the cached RDD behind a localCheckpoint-ed frame. The
    * Dataset API offers no handle to it (`df.unpersist` only consults the
    * CacheManager, which doesn't track checkpoint blocks) — the RDD lives
    * inside the plan's LogicalRDD leaf.
    */
  private[graft] def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Driver-side union-find with path compression for the size-gated local
    * solve: returns node → component-minimum-id for every node incident to
    * an edge. Deterministic regardless of edge order.
    */
  private[operators] def localUnionFind(edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- edges) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val minOfRoot = scala.collection.mutable.HashMap.empty[Long, Long]
    for (n <- parent.keys) {
      val r = find(n)
      minOfRoot(r) = math.min(minOfRoot.getOrElse(r, n), n)
    }
    parent.keys.map(n => n -> minOfRoot(find(n))).toMap
  }

  /** The deduplicated corpus: keep one representative (minimum id) per
    * component plus every untouched document — i.e. drop exactly the
    * non-representative members of each near-dup group.
    */
  def dedupCorpus(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(df.select(col(idCol)), idCol, pairs)
    val drop = comps.filter(col(idCol) =!= col("rep")).select(col(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }
}
