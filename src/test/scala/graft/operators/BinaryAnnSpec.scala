package graft.operators

import graft.SparkSuite
import graft.queries.Tables
import org.apache.spark.sql.functions._

class BinaryAnnSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  /** Driver-side reference packing: bit i of word w set iff v(64w+i) >= 0. */
  private def refPack(v: Array[Float]): Array[Long] = {
    val words = new Array[Long]((v.length + 63) / 64)
    var i = 0
    while (i < v.length) {
      if (v(i) >= 0f) words(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    words
  }

  private def refHamming(a: Array[Long], b: Array[Long]): Long = {
    var h = 0L; var i = 0
    while (i < a.length) { h += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    h
  }

  test("packSignBits matches driver-side reference packing for every vector") {
    val got = emb.select($"vec_id", BinaryAnn.packSignBits($"embedding").as("sig"))
      .as[(Long, Array[Long])].collect().toMap
    val raw = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    assert(got.nonEmpty && got.size == raw.size)
    raw.foreach { case (id, v) =>
      assert(got(id).toSeq == refPack(v).toSeq, s"vec $id")
    }
  }

  test("hamming column equals sign-disagreement count, incl. non-multiple-of-64 dims") {
    // 70 dims: 2 words, last word 6 live bits — padding must not count
    val a = Array.tabulate(70)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val b = Array.tabulate(70)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val expected = (0 until 70).count(i => (a(i) >= 0) != (b(i) >= 0)).toLong
    val got = Seq((a, b)).toDF("a", "b")
      .select(BinaryAnn.hamming(
        BinaryAnn.packSignBits($"a"), BinaryAnn.packSignBits($"b")).as("h"))
      .head().getLong(0)
    assert(got == expected)
  }

  test("hammingTopK matches a driver-side replay of the two-stage pipeline") {
    val raw = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    val sigs = raw.view.mapValues(refPack).toMap
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) { d += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i); i += 1 }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    def ref(qid: Long, shortlist: Int, k: Int): Seq[(Long, Long)] = {
      val short = sigs.toSeq.filter(_._1 != qid)
        .map { case (id, s) => (id, refHamming(sigs(qid), s)) }
        .sortBy { case (id, h) => (h, id) }.take(shortlist)
      short.map { case (id, h) => (id, h, cos(raw(qid), raw(id))) }
        .sortBy { case (id, _, c) => (-c, id) }.take(k)
        .map { case (id, h, _) => (id, h) }
    }
    val got = graft.operators.BinaryAnn.hammingTopK(
        emb, emb.filter($"vec_id" % 50 === 0), "vec_id", "embedding",
        shortlist = 20, k = 5)
      .orderBy($"query_id", $"rk")
      .select($"query_id", $"nbr_id", $"ham").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    assert(got.nonEmpty)
    got.foreach { case (qid, pairs) =>
      assert(pairs == ref(qid, 20, 5), s"query $qid")
    }
  }
}
