package graft.queries

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** q150 in-pass observability: the CollectMetrics node delivers audit
  * counters from the SAME scan that feeds the aggregate — no second pass —
  * and leaves the query result untouched.
  */
class ObserveSpec extends SparkSuite {
  import spark.implicits._

  test("observed metrics match an independent recount; result unchanged") {
    val res = Relational.observedMonthlyRevenue(spark, sf)
    // drive it through an Observation so the metrics are retrievable
    val obs = Observation()
    val base = Tables.lineitem(spark, sf).filter($"l_shipdate" >= "1998-01-01")
    val observed = base.observe(obs,
      count(lit(1)).as("rows_scanned"),
      count(when($"l_returnflag".isNull, 1)).as("null_returnflag"),
      sum($"l_quantity".cast("long")).as("total_qty"))
    observed.groupBy(date_format($"l_shipdate", "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_lines")).collect()
    val m = obs.get
    val expectRows = base.count()
    val expectQty = base.agg(sum($"l_quantity".cast("long"))).head().getLong(0)
    assert(m("rows_scanned") == expectRows)
    assert(m("null_returnflag") == 0L)
    assert(m("total_qty") == expectQty)
    // and the registered query returns the same rows as its un-observed twin
    val plain = Tables.lineitem(spark, sf).filter($"l_shipdate" >= "1998-01-01")
      .groupBy(date_format($"l_shipdate", "yyyy-MM").as("month"))
      .agg(round(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .cast(Tables.MoneyDec)), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"month")
    assert(res.collect().toSeq == plain.collect().toSeq)
  }

  test("plan shape: exactly one lineitem scan feeds the observed aggregate") {
    val res = Relational.observedMonthlyRevenue(spark, sf)
    res.collect()
    val full = res.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"expected 1 parquet scan:\n${plan.take(1500)}")
    assert(res.queryExecution.optimizedPlan.toString.contains("CollectMetrics"),
      "the observe node must survive optimization")
  }
}
