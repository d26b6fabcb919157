package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.store.TableStore
import graft.queries.InvoiceView

/** Property-based suites (SURVEY §5): upsert algebra, F1 CHAR(12)
  * faithfulness, union-dedup equivalence, gap detection vs brute force.
  * Uses raw ScalaCheck generators with a fixed seed (scalatestplus isn't
  * in the offline dependency set).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 25): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  // ---- F1: trim+substring == PG CAST(RIGHT(CAST(id AS CHAR(12)),9) AS INT)

  /** Driver-side reference of the PG semantics: CHAR(12) right-pads the
    * decimal text (truncating past 12), RIGHT(…,9) keeps chars 4..12, the
    * int cast trims. Blank slice (ids < 1000) errors in PG → None here
    * (the library yields null, documented divergence).
    */
  private def pgRight9(id: Long): Option[Int] = {
    val s = id.toString.take(12).padTo(12, ' ')
    val r = s.substring(s.length - 9).trim
    if (r.isEmpty) None else Some(r.toInt)
  }

  test("portableHash60: Spark expression equals the JVM reference on arbitrary strings") {
    // the q31/q35 oracle parity (and Similarity's literal hyperplanes)
    // rests on conv(substring(md5(x),1,15),16,10) being exactly the first
    // 60 bits of the md5 digest — pin it against a driver-side digest
    def jvmHash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val strs = samples(Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("æøå", "日本", "🙂", "|", "")).map(_.mkString)), 60)
      .filter(_ != null)
    val df = strs.toDF("s")
      .select($"s", graft.functions.TextFunctions.portableHash60($"s").as("h"))
    df.collect().foreach { r =>
      assert(r.getLong(1) == jvmHash60(r.getString(0)), s"mismatch for '${r.getString(0)}'")
    }
  }

  test("F1 tripletexId matches PG CHAR(12) semantics across id magnitudes") {
    val ids = samples(Gen.chooseNum(1L, 9999999999999L), 40) ++
      Seq(1L, 9L, 999L, 1000L, 999999999L, 1000000000L, 9876543210L,
        999999999999L, 4000000001L, 9000000001L)
    val got = ids.distinct.toDF("id")
      .select(col("id"), InvoiceView.tripletexId(col("id")).as("t"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    ids.foreach(id => assert(got(id) == pgRight9(id), s"id=$id"))
  }

  // ---- upsert algebra

  private def df(rows: Seq[(Long, String, Double)]) = rows.toDF("id", "status", "price")

  private val rowGen = for {
    id <- Gen.chooseNum(1L, 20L)
    status <- Gen.oneOf("a", "b", "c")
    price <- Gen.chooseNum(0, 1000).map(_ / 10.0)
  } yield (id, status, price)

  private val batchGen = Gen.listOfN(8, rowGen)
    .map(rows => rows.zipWithIndex.groupBy(_._1._1).map { case (_, g) => g.maxBy(_._2)._1 }.toSeq)

  test("upsert idempotence: upsert(upsert(T,b),b) == upsert(T,b)") {
    samples(Gen.zip(batchGen, batchGen), 10).foreach { case (base, batch) =>
      val once = TableStore.mergePlan(df(base), df(batch), Seq("id"))
      val twice = TableStore.mergePlan(once, df(batch), Seq("id"))
      assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
    }
  }

  test("upsert commutativity on key-disjoint batches") {
    samples(batchGen, 10).foreach { rows =>
      val (b1, b2) = rows.partition(_._1 % 2 == 0) // disjoint key sets
      val ab = TableStore.mergePlan(df(b1), df(b2), Seq("id"))
      val ba = TableStore.mergePlan(df(b2), df(b1), Seq("id"))
      assert(ab.orderBy("id", "status", "price").collect().toSeq ==
        ba.orderBy("id", "status", "price").collect().toSeq)
    }
  }

  // ---- union-dedup ≡ per-branch distinct then distinct (U1, §7.4 risk 6)

  test("union distinct equals pre-deduped union distinct") {
    samples(Gen.zip(batchGen, batchGen), 10).foreach { case (a, b) =>
      val u1 = df(a).unionByName(df(b)).distinct()
      val u2 = df(a).distinct().unionByName(df(b).distinct()).distinct()
      assert(u1.orderBy("id", "status", "price").collect().toSeq ==
        u2.orderBy("id", "status", "price").collect().toSeq)
    }
  }

  // ---- gap detection vs brute force (U2)

  test("anti-join gap detection equals brute-force set difference") {
    samples(Gen.nonEmptyListOf(Gen.chooseNum(1L, 60L)), 15).foreach { keys0 =>
      val keys = keys0.distinct
      val (lo, hi) = (keys.min, keys.max)
      val expected = ((lo + 1) until hi).filterNot(keys.contains).toList
      val got = spark.range(lo + 1, hi).toDF("id")
        .join(keys.toDF("id"), Seq("id"), "left_anti")
        .orderBy("id").as[Long].collect().toList
      assert(got == expected)
    }
  }

  // ---- price tolerance boundary (P11)

  test("1% tolerance predicate boundary behavior") {
    val cases = samples(Gen.zip(Gen.chooseNum(1, 100000), Gen.chooseNum(-200, 200)), 40)
    val rows = cases.map { case (paidC, deltaPct100) =>
      val paid = paidC / 100.0
      (paid, math.abs(paid * (deltaPct100 / 10000.0)))
    }
    val flagged = rows.toDF("paid", "diff")
      .withColumn("flag", col("diff") > abs(col("paid")) * 0.01)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getBoolean(2)))
    flagged.foreach { case (paid, diff, f) =>
      assert(f == (diff > math.abs(paid) * 0.01), s"paid=$paid diff=$diff")
    }
  }
}
