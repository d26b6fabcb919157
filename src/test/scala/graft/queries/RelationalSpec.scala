package graft.queries

import graft.SparkSuite

class RelationalSpec extends SparkSuite {

  test("every declared query has an oracle or is explicitly rows-only") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
  }

  test("q01_agg_sum: grouped decimal-exact aggregation") {
    val df = Relational.aggSum(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 9) // |returnflag| x |linestatus|
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "count_order", "n_orders"))
    // counts are consistent: distinct orders never exceeds line count
    rows.foreach(r => assert(r.getAs[Long]("n_orders") <= r.getAs[Long]("count_order")))
  }

  test("q02_filter_dates: bounded scan only returns in-range rows") {
    import org.apache.spark.sql.functions._
    val df = Relational.filterDates(spark, sf)
    assert(df.count() > 0)
    val outOfRange = df.filter(
      col("o_orderdate") < lit("1996-01-01").cast("timestamp") ||
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp")).count()
    assert(outOfRange == 0)
  }

  test("q03_join_agg: broadcast dim join preserves every lineitem row") {
    val total = Relational.joinAgg(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_lines")).head().getLong(0)
    val liCount = Tables.lineitem(spark, sf).count()
    assert(total == liCount) // inner join on FK + left join dim: no row loss/dup
  }

  test("q04_window_rank: exactly one row per customer with orders") {
    val df = Relational.windowRank(spark, sf)
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(df.count() == nCust)
    assert(df.select("o_custkey").distinct().count() == nCust)
  }

  test("q05_union_distinct: dedup is load-bearing (branch 3 collapses)") {
    val df = Relational.unionDistinct(spark, sf)
    val n = df.count()
    assert(n == df.distinct().count())
    // branch3 rows are exact duplicates of branch1's F-subset → distinct
    // count equals union of b1 and b2 alone
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf)
    val b1 = o.select(col("o_orderkey").as("id"), lit("order").as("src"), col("o_orderstatus").as("tag"))
    val b2 = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("id"), lit("line").as("src"), col("l_returnflag").as("tag"))
    assert(n == b1.unionByName(b2).distinct().count())
  }

  test("q06_gap_detect: finds exactly the synthesized multiples of 7") {
    val rows = Relational.gapDetect(spark, sf).collect().map(_.getLong(0))
    assert(rows.nonEmpty)
    assert(rows.forall(_ % 7 == 0))
  }
}
