package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.functions.expressions.CountMin

/** CountMin sketch aggregate: one-sided error bound, exactness when
  * buckets don't collide, partitioning-independence (merge path), and
  * input validation.
  */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  private val d = 4
  private val w = 64

  private def buckets(c: org.apache.spark.sql.Column) =
    array((0 until d).map(j =>
      conv(substring(md5(c), 1 + 8 * j, 8), 16, 10).cast("long") % w): _*)

  private def sketchOf(items: Seq[String], parts: Int): Array[Long] = {
    CountMin.register(spark)
    val df = items.toDF("item").repartition(parts)
    df.select(CountMin.countMin(buckets($"item"), d, w).as("s"))
      .head().getSeq[Long](0).toArray
  }

  private def estimate(sk: Array[Long], item: String): Long = {
    val row = spark.range(1).select(buckets(lit(item)).as("b")).head()
    val bk = row.getSeq[Long](0)
    (0 until d).map(j => sk(j * w + bk(j).toInt)).min
  }

  test("estimate is exact for a skewed stream with few distinct items") {
    val items = Seq.fill(100)("alpha") ++ Seq.fill(7)("beta") ++ Seq("gamma")
    val sk = sketchOf(items, parts = 3)
    assert(estimate(sk, "alpha") == 100L)
    assert(estimate(sk, "beta") == 7L)
    assert(estimate(sk, "gamma") == 1L)
  }

  test("estimate never underestimates (one-sided error)") {
    val items = (0 until 500).map(i => s"tok${i % 130}") // forces collisions at w=64
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = sketchOf(items, parts = 4)
    exact.foreach { case (item, n) =>
      assert(estimate(sk, item) >= n, s"underestimated $item")
    }
    // total mass per hash row is conserved: each row sums to the stream size
    (0 until d).foreach { j =>
      assert(sk.slice(j * w, (j + 1) * w).sum == items.size.toLong)
    }
  }

  test("result is independent of partitioning (merge = elementwise add)") {
    val items = (0 until 300).map(i => s"item${i % 37}")
    assert(sketchOf(items, 1).toSeq == sketchOf(items, 7).toSeq)
  }

  test("out-of-range bucket index fails loudly") {
    CountMin.register(spark)
    val ex = intercept[Exception] {
      Seq(1L).toDF("x")
        .select(CountMin.countMin(array(lit(0L), lit(1L), lit(2L), lit(9999L)), d, w))
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
