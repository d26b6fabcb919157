package graft.operators

import graft.SparkSuite
import graft.queries.Tables
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  test("salted join result equals plain join (inner)") {
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
    val o = Tables.orders(spark, sf).select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    val salted = SkewJoin.saltedJoin(li, o, "l_orderkey", 8)
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
    val plain = li.join(o, Seq("l_orderkey"))
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("salted join preserves left-join null rows") {
    val fact = Seq((1L, "a"), (2L, "b"), (99L, "orphan")).toDF("k", "v")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("k", "d")
    val salted = SkewJoin.saltedJoin(fact, dim, "k", 4, joinType = "left")
      .orderBy("k").collect()
    assert(salted.length == 3)
    assert(salted.last.isNullAt(2), "orphan keeps null dim side")
  }

  test("salt spreads a hot key across the full factor range") {
    val hot = Seq.tabulate(1000)(i => (1L, i.toLong)).toDF("k", "seq")
    val salts = hot.select(SkewJoin.salt(8, col("k"), col("seq")).as("s"))
      .distinct().as[Int].collect().toSet
    assert(salts == (0 until 8).toSet, s"got $salts")
  }
}
