package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.SkewJoin
import Tables._

/** Scale-technique queries: salting for skew (oracle = the equivalent
  * plain join — salting must be semantically invisible) and composite
  * text-quality scoring.
  */
object ScaleOps {

  /** Salted skewed join: lineitem (fact, skew on orderkey irrelevant — the
    * salt spreads any hot key) ⋈ orders (dim) ×8 salt, aggregated back.
    * The oracle is the UNsalted join: identical results prove the rewrite
    * is semantics-preserving.
    */
  def saltedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = lineitem(spark, dir).select($"l_orderkey", $"l_extendedprice", $"l_discount",
      $"l_linenumber", $"l_partkey")
    val o = orders(spark, dir).select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    SkewJoin.saltedJoin(li, o, "l_orderkey", factor = 8,
        saltSource = Seq("l_orderkey", "l_linenumber", "l_partkey"))
      .groupBy($"o_orderstatus")
      .agg(
        round(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(MoneyDec)), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"o_orderstatus")
  }

  val saltedJoinAggSql: String =
    """SELECT o_orderstatus,
      | CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Composite quality scoring + BPE-ish token counting over documents —
    * all-IEEE double arithmetic, exactly mirrored in SQL.
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stop = Seq("the", "a", "of", "and", "to")
    documents(spark, dir).select(
      $"doc_id",
      TextFunctions.bpeishTokenCount($"text").as("bpeish_tokens"),
      TextFunctions.punctCount($"text").as("n_punct"),
      TextFunctions.qualityScore($"text", stop).as("quality"),
    ).orderBy($"doc_id")
  }

  val textQualitySql: String = {
    val toks = "string_split(text, ' ')"
    val n = s"CAST(len($toks) AS DOUBLE)"
    val uniq = s"CAST(len(list_distinct($toks)) AS DOUBLE)"
    val sw = s"CAST(len(list_filter($toks, x -> x IN ('the','a','of','and','to'))) AS DOUBLE)"
    s"""SELECT doc_id,
       | len(string_split(regexp_replace(regexp_replace(text, '([a-zA-Z])([0-9])', '\\1 \\2', 'g'), '([0-9])([a-zA-Z])', '\\1 \\2', 'g'), ' ')) AS bpeish_tokens,
       | length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS n_punct,
       | least($n / 50.0, 1.0) * 0.4
       |   + $uniq / greatest($n, 1.0) * 0.4
       |   + least($sw / greatest($n, 1.0) * 10.0, 1.0) * 0.2 AS quality
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  /** q89: the co-located bucketed join — orders ⋈ customer both
    * hash-bucketed (and sorted) on the customer key by
    * [[graft.operators.BucketedTables]], so the join itself plans with
    * ZERO Exchange on either side (asserted in NewOpsPlanSpec): the
    * write-once layout absorbs the shuffle that a plain parquet join
    * pays on every run — the decisive plan shape for a 100 TB hub join
    * executed thousands of times. The MERGE hint pins sort-merge so the
    * bucketed path (not a broadcast) is what's measured; the oracle is
    * the plain unbucketed join — layout must be semantically invisible.
    */
  def bucketedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (o, c) = graft.operators.BucketedTables.ordersCustomer(spark, dir)
    o.join(c.hint("MERGE"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast(MoneyDec)), 2).cast("double").as("total_price"))
      .orderBy($"c_nationkey")
  }

  val bucketedJoinAggSql: String =
    """SELECT c_nationkey, COUNT(*) AS n_orders,
      | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  // q94 temp root (fixtures + output), deleted on JVM exit
  private lazy val compactRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_compact")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(f => try java.nio.file.Files.delete(f) catch { case _: Throwable => () })
    }))
    p
  }

  private val compactStaged =
    scala.collection.concurrent.TrieMap.empty[String, java.nio.file.Path]

  // the small-file shape an ingest pipeline accretes: 64 hash-scattered
  // fragments of the events projection, staged once per (JVM, sfDir)
  private def fragmentedEvents(spark: SparkSession, dir: String): java.nio.file.Path =
    compactStaged.getOrElseUpdate(dir, {
      import spark.implicits._
      val p = compactRoot.resolve("frag_" + java.lang.Integer.toHexString(dir.hashCode))
      events(spark, dir).select($"event_id", $"user_id", $"event_type", $"value")
        .repartition(64)
        .write.mode("overwrite").parquet(p.toString)
      p
    })

  /** q94: small-file compaction — [[graft.operators.Layout.compact]]
    * rewrites a 64-fragment table (the shape incremental upserts and
    * streaming sinks accrete) into 4 range-clustered files sorted on
    * event_id, timed end-to-end per trial. The oracle is the table
    * itself: compaction must be content-identical, and the layout
    * properties (file count, disjoint per-file key spans → pruning
    * preserved) are LayoutSpec-asserted.
    */
  def compaction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = fragmentedEvents(spark, dir)
    val dst = compactRoot.resolve("compacted")
    graft.operators.Layout.compact(spark, src.toString, dst.toString, "event_id", 4)
    spark.read.parquet(dst.toString).orderBy($"event_id")
  }

  val compactionSql: String =
    """SELECT event_id, user_id, event_type, value
      |FROM events
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_salted_join"  -> saltedJoinAgg,
    "q41_text_quality" -> textQuality,
    "q89_bucketed_join" -> bucketedJoinAgg,
    "q94_compaction"   -> compaction,
  )

  val oracles: Map[String, String] = Map(
    "q40_salted_join"  -> saltedJoinAggSql,
    "q41_text_quality" -> textQualitySql,
    "q89_bucketed_join" -> bucketedJoinAggSql,
    "q94_compaction"   -> compactionSql,
  )
}
