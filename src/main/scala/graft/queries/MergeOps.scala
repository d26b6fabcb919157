package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.TableStore
import Tables._

/** S5 + §2.12 upsert semantics as an oracle-checkable query: merge a
  * derived incoming batch into `orders` with a PARTIAL update-column list
  * (`o_orderstatus` is insert-only, mirroring `orders.financial_status`
  * staying stale on conflict — `/root/reference/db.py:129-140`).
  */
object MergeOps {

  private val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Incoming batch: every orderkey ≡ 0 (mod 10) with doubled price and
    * status 'X' (conflict rows), plus clones shifted by +10,000,000 (new
    * rows). After merge: conflict rows show doubled price but ORIGINAL
    * status; new rows keep status 'X'.
    */
  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val existing = orders(spark, dir).select(cols.map(col): _*)
    val conflicts = existing.filter($"o_orderkey" % 10 === 0)
      .withColumn("o_totalprice", $"o_totalprice" * 2.0)
      .withColumn("o_orderstatus", lit("X"))
    val news = existing.filter($"o_orderkey" % 10 === 3)
      .withColumn("o_orderkey", $"o_orderkey" + 10000000L)
      .withColumn("o_orderstatus", lit("X"))
    val incoming = conflicts.unionByName(news).select(cols.map(col): _*)
    TableStore.mergePlan(existing, incoming, Seq("o_orderkey"),
        updateColumns = Some(Seq("o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority")))
      .orderBy($"o_orderkey")
  }

  val upsertMergeSql: String =
    """WITH inc AS (
      |  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
      |         o_totalprice * 2.0 AS o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, 'X', o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 10 = 3
      |)
      |SELECT COALESCE(e.o_orderkey, i.o_orderkey) AS o_orderkey,
      | CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_custkey ELSE e.o_custkey END AS o_custkey,
      | CASE WHEN e.o_orderkey IS NOT NULL THEN e.o_orderstatus ELSE i.o_orderstatus END AS o_orderstatus,
      | CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_totalprice ELSE e.o_totalprice END AS o_totalprice,
      | CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderdate ELSE e.o_orderdate END AS o_orderdate,
      | CASE WHEN i.o_orderkey IS NOT NULL THEN i.o_orderpriority ELSE e.o_orderpriority END AS o_orderpriority
      |FROM orders e FULL JOIN inc i ON e.o_orderkey = i.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_upsert_merge" -> upsertMerge,
  )

  val oracles: Map[String, String] = Map(
    "q25_upsert_merge" -> upsertMergeSql,
  )
}
