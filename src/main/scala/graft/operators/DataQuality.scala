package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ/expectations shape): a rule
  * set evaluated over a table in ONE scan, emitting a (rule, n_violations,
  * n_checked, pass) report.
  *
  * Column rules (not-null, non-negative, range, set-membership, custom
  * predicate) compile to conditional-count aggregate expressions over a
  * single pass — N rules cost one scan and one 1-row aggregate, not N
  * jobs. Uniqueness is a key-grouped duplicate count (one shuffle);
  * referential integrity is a left-anti join against the parent. The
  * report unions all three tiers.
  *
  * Scale: the column-rule pass is a map-side-combining aggregate
  * (#rules × longs of state); uniqueness and referential shuffle once on
  * their own keys. Nothing is driver-side but the final ≤#rules rows.
  */
object DataQuality {

  /** A named violation predicate over a row: `violated` must evaluate
    * true exactly when the row breaks the rule; `applicable` bounds the
    * checked population (n_checked) for rules that only apply to some
    * rows.
    */
  final case class Rule(name: String, violated: Column,
                        applicable: Column = lit(true))

  def notNull(name: String, c: Column): Rule = Rule(name, c.isNull)
  def nonNegative(name: String, c: Column): Rule =
    Rule(name, c < 0, c.isNotNull)
  def inRange(name: String, c: Column, lo: Double, hi: Double): Rule =
    Rule(name, c < lo || c > hi, c.isNotNull)
  def inSet(name: String, c: Column, values: Seq[String]): Rule =
    Rule(name, !c.isin(values: _*), c.isNotNull)

  /** One-scan column-rule report. */
  def columnRules(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.flatMap { r =>
      Seq(sum(when(r.applicable && r.violated, 1L).otherwise(0L)).as(s"v_${r.name}"),
        sum(when(r.applicable, 1L).otherwise(0L)).as(s"c_${r.name}"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.map { r =>
      struct(lit(r.name).as("rule"), col(s"v_${r.name}").as("n_violations"),
        col(s"c_${r.name}").as("n_checked"))
    }
    wide.select(explode(array(entries: _*)).as("e"))
      .select(col("e.rule"), col("e.n_violations"), col("e.n_checked"))
  }

  /** Duplicate-key rule: n_violations = rows beyond the first per key. */
  def uniqueKey(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") - 1).as("n_violations"), sum(col("n")).as("n_checked"))
      .select(lit(name).as("rule"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        coalesce(col("n_checked"), lit(0L)).as("n_checked"))

  /** Referential rule: child keys with no parent (left-anti count). */
  def referential(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String,
                  name: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("n_checked"))
    val orphans = child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    orphans.crossJoin(total)
      .select(lit(name).as("rule"), col("n_violations"), col("n_checked"))
  }

  /** Assemble the full report with the pass verdict, ordered by rule. */
  def report(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("rule"))
}
