package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** DataQuality rule engine: each rule tier against planted violations,
  * applicability bounds, and the single-scan shape of the column tier.
  */
class DataQualitySpec extends SparkSuite {
  import spark.implicits._
  import DataQuality._

  private lazy val df = Seq(
    (1L, Some(10.0), "A"),
    (2L, Some(-3.0), "B"),   // negative
    (3L, None, "A"),         // null amount
    (3L, Some(200.0), "Z"),  // dup key, out of range, bad code
  ).toDF("id", "amount", "code")

  test("column rules: violations and applicability counts") {
    val rep = columnRules(df, Seq(
      notNull("amount_not_null", $"amount"),
      nonNegative("amount_non_negative", $"amount"),
      inRange("amount_range", $"amount", 0.0, 100.0),
      inSet("code_domain", $"code", Seq("A", "B"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep("amount_not_null") == ((1L, 4L)))    // 1 null of 4 rows
    assert(rep("amount_non_negative") == ((1L, 3L))) // checked only non-null
    assert(rep("amount_range") == ((2L, 3L)))        // -3 and 200
    assert(rep("code_domain") == ((1L, 4L)))         // Z
  }

  test("uniqueness counts rows beyond the first per key") {
    val r = uniqueKey(df, "id_unique", Seq("id")).head()
    assert(r.getLong(1) == 1L && r.getLong(2) == 4L)
  }

  test("referential counts orphans") {
    val parent = Seq(1L, 2L).toDF("id")
    val r = referential(df, "id", parent, "id", "fk").head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 4L) // both id=3 rows orphaned
  }

  test("report unions tiers with pass verdicts, ordered") {
    val rep = report(Seq(
      columnRules(df, Seq(notNull("a", $"amount"))),
      uniqueKey(df, "b", Seq("id"))))
    val rows = rep.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows.forall(!_.getBoolean(3))) // both rules have violations
  }

  test("column tier is one scan (single aggregate, no shuffle of rows per rule)") {
    val plan = columnRules(df, Seq(
      notNull("r1", $"amount"), nonNegative("r2", $"amount"),
      inRange("r3", $"amount", 0, 1), inSet("r4", $"code", Seq("A"))))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan for 4 rules:\n${plan.take(800)}")
  }

  test("clean data passes everything") {
    val clean = Seq((1L, Some(5.0), "A"), (2L, Some(6.0), "B")).toDF("id", "amount", "code")
    val rep = report(Seq(
      columnRules(clean, Seq(notNull("n", $"amount"), nonNegative("g", $"amount"))),
      uniqueKey(clean, "u", Seq("id"))))
    assert(rep.filter(!$"pass").count() == 0)
  }
}
