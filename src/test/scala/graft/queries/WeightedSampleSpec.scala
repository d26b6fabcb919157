package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class WeightedSampleSpec extends SparkSuite {
  import spark.implicits._

  test("globalCumsum equals the single-partition window cumsum") {
    val df = (1 to 997).map(i => (i.toLong, (i % 13 + 1).toLong))
      .toDF("id", "w").repartition(7)
    val got = CorpusOps.globalCumsum(df, "w", "cum", $"id".asc)
      .select($"id", $"cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = df.withColumn("cum",
        sum($"w").over(Window.orderBy($"id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("systematic resampling: multiplicities sum to exactly k and cover heavy docs") {
    val out = CorpusOps.weightedSample(spark, sf)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum == 100L,
      "systematic resampling emits exactly k samples in total")
    assert(rows.forall(_._3 >= 1))
    // any doc with weight strictly above the point spacing W/k must be hit
    val total = Tables.documents(spark, sf)
      .agg(sum(graft.functions.TextFunctions.tokenCount($"text"))).head().getLong(0)
    val heavy = Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.TextFunctions.tokenCount($"text").as("w"))
      .filter($"w" * 100 > total)
      .collect().map(_.getLong(0)).toSet
    val sampled = rows.map(_._1).toSet
    assert(heavy.subsetOf(sampled))
  }
}
