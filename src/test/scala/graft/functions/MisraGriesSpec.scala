package graft.functions

import graft.SparkSuite
import graft.functions.expressions.MisraGries
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSuite {
  import spark.implicits._

  MisraGries.register(spark)

  private def sketchOf(df: org.apache.spark.sql.DataFrame, capacity: Int): Map[String, Long] =
    df.agg(MisraGries.sketch($"v", capacity).as("s"))
      .select(explode($"s").as("e"))
      .select($"e.item", $"e.count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  // ~Zipfian: item i appears ceil(4000/i) times, i = 1..60
  private lazy val zipf: Seq[String] =
    (1 to 60).flatMap(i => Seq.fill((4000 + i - 1) / i)(s"item$i"))

  test("capacity above cardinality ⇒ exact counts (sketch saturates)") {
    val got = sketchOf(zipf.toDF("v").repartition(5), 1024)
    val exact = zipf.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    assert(got == exact)
  }

  test("tight capacity: survivor guarantee and bounded underestimates") {
    val capacity = 16
    val n = zipf.size.toLong
    val bound = n / (capacity + 1L)
    val got = sketchOf(zipf.toDF("v").repartition(7), capacity)
    val exact = zipf.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    assert(got.size <= capacity)
    // every item with true count above the error bound must survive
    exact.filter(_._2 > bound).keys.foreach { k =>
      assert(got.contains(k), s"heavy item $k (count ${exact(k)}) missing at bound $bound")
    }
    // sketch counts only ever underestimate, by at most the bound
    got.foreach { case (k, c) =>
      assert(c <= exact(k), s"$k overestimated: $c > ${exact(k)}")
      assert(exact(k) - c <= bound, s"$k underestimated past the bound")
    }
  }

  test("single-partition update path matches the streaming MG guarantee too") {
    val got = sketchOf(zipf.toDF("v").coalesce(1), 16)
    val exact = zipf.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val bound = zipf.size.toLong / 17L
    exact.filter(_._2 > bound).keys.foreach(k => assert(got.contains(k)))
  }

  test("HeavyHitters.topK equals the exact groupBy ranking") {
    val df = zipf.toDF("v").repartition(6)
    val got = graft.operators.HeavyHitters.topK(df, $"v", k = 10, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = df.groupBy($"v".as("item")).agg(count(lit(1)).as("count"))
      .orderBy($"count".desc, $"item".asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
  }

  test("topK refuses to certify when capacity is too small for the distribution") {
    val uniform = (1 to 2000).map(i => s"u${i % 200}")
    intercept[IllegalArgumentException] {
      graft.operators.HeavyHitters.topK(uniform.toDF("v"), $"v", k = 10, capacity = 8)
    }
  }

  test("invalid capacity rejected") {
    intercept[IllegalArgumentException] {
      graft.functions.expressions.MisraGries(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 0)
    }
  }
}
