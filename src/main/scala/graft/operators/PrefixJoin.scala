package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Prefix-filtered EXACT set-similarity self-join (AllPairs/PPJoin family):
  * all id pairs whose element sets have Jaccard ≥ τ, found WITHOUT the
  * quadratic share-an-element join and WITHOUT approximation.
  *
  * This completes the dedup triad: q29 (`Dedup.ngramJaccardPairs`) is the
  * brute-force ground truth, q30 (MinHash LSH) is the probabilistic scale
  * path; this operator is the exact scale path — the SAME answer as the
  * brute force (the q125 oracle IS q29's brute-force SQL), sub-quadratic
  * candidate generation.
  *
  * The filter stack (classic AllPairs, Bayardo et al. WWW'07):
  *  - Elements order rarest-first by (document frequency, element) — a
  *    total order that needs NO materialized global rank: the losslessness
  *    proof only requires both join sides to order elements identically,
  *    so each doc sorts its own elements by the joined-in frequency
  *    locally (one per-doc window, no range-partitioned rank pass).
  *  - PREFIX filter: if J(A,B) ≥ τ then |A∩B| ≥ ⌈τ·|A|⌉ (the union is at
  *    least |A|), so any valid partner shares at least one of A's first
  *    |A| − ⌈τ·|A|⌉ + 1 elements in that order. Candidates come from an
  *    equi-join on PREFIX elements only — the RAREST elements, so bucket
  *    fan-out stays small even when the corpus shares boilerplate (the
  *    frequent elements that would explode a share-any-element join sit
  *    at the END of the order and never generate candidates).
  *  - LENGTH filter: J ≤ min(|A|,|B|)/max(|A|,|B|), so q·min ≥ p·max
  *    prunes size-incompatible pairs inside the candidate join.
  *  - VERIFY on candidates only: element arrays are collected ONLY for
  *    ids that appear in some candidate pair (semi-join first — at corpus
  *    scale the candidate set is orders of magnitude smaller than the
  *    corpus), then the intersection is a LOCAL `array_intersect` — no
  *    element-level shuffle in the verify stage.
  *
  * The element list is localCheckpoint-materialized once: three consumers
  * (frequency aggregate, frequency join, verify arrays) would otherwise
  * re-run the upstream lineage per reference — for shingle inputs that is
  * the tokenize+window pass, and the 10× probe measured re-derivation
  * dominating the runtime (same rationale as `DedupGroups`'s checkpointed
  * edges; a `cache()` instead would hide size stats from AQE and forfeit
  * its broadcast decisions).
  *
  * τ is the rational p/q and every threshold compares in integer
  * cross-multiplied form (⌈(p·n)/q⌉ = (p·n + q − 1) DIV q), so no
  * floating-point boundary can disagree across engines; the reported
  * jaccard is a single IEEE division, bit-stable like q29's.
  */
object PrefixJoin {

  /** All pairs (d1 < d2) of ids in `elements` (columns: idCol, elCol;
    * rows distinct per (id, element)) whose sets have Jaccard ≥ p/q.
    * Output: d1, d2, inter, n1, n2, jaccard — the q29 contract.
    */
  def jaccardSelfJoin(elements: DataFrame, idCol: String, elCol: String,
                      p: Int, q: Int): DataFrame = {
    require(p > 0 && q > 0 && p <= q, s"tau must be in (0,1]: $p/$q")
    val spark = elements.sparkSession
    import spark.implicits._
    val tok = elements.select(col(idCol).as("id"), col(elCol).as("el"))
      .localCheckpoint(eager = true)
    // element document frequencies; joined back so each doc can order its
    // elements rarest-first locally
    val dfreq = tok.groupBy($"el").agg(count(lit(1)).as("dfc"))
    val tr = tok.join(dfreq, "el")
    // per-doc size + rarity-ordered position in ONE doc-bounded window
    val wDoc = Window.partitionBy($"id")
    val pos = tr
      .withColumn("pos", row_number().over(wDoc.orderBy($"dfc", $"el")))
      .withColumn("n", count(lit(1)).over(wDoc))
    // prefix length: n − ⌈(p·n)/q⌉ + 1
    val prefix = pos
      .filter(col("pos") <= col("n") - expr(s"($p * n + ${q - 1}) DIV $q") + lit(1))
      .select($"id", $"el", $"n")
    // candidates: share a prefix element, size-compatible, canonical d1 < d2
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.el") === col("b.el") && col("a.id") < col("b.id") &&
          lit(q) * least(col("a.n"), col("b.n")) >= lit(p) * greatest(col("a.n"), col("b.n")))
      .select(col("a.id").as("d1"), col("b.id").as("d2"))
      .distinct()
      .localCheckpoint(eager = true) // consumed 3×: id semi-join + 2 verify joins
    // verify on candidates only: collect arrays ONLY for ids that appear
    // in a candidate pair, then intersect locally — no element shuffle
    val candIds = cand.select($"d1".as("id")).unionByName(cand.select($"d2".as("id"))).distinct()
    val sets = tok.join(candIds, Seq("id"), "left_semi")
      .groupBy($"id")
      .agg(sort_array(collect_list($"el")).as("ts"), count(lit(1)).as("n"))
    cand
      .join(sets.select($"id".as("d1"), $"ts".as("t1"), $"n".as("n1")), "d1")
      .join(sets.select($"id".as("d2"), $"ts".as("t2"), $"n".as("n2")), "d2")
      .withColumn("inter", size(array_intersect($"t1", $"t2")).cast("long"))
      .filter(lit(q) * $"inter" >= lit(p) * ($"n1" + $"n2" - $"inter"))
      .select($"d1", $"d2", $"inter", $"n1", $"n2",
        ($"inter".cast("double") / ($"n1" + $"n2" - $"inter")).as("jaccard"))
      .orderBy($"d1", $"d2")
  }
}
