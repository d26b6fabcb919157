package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** BPE merge learning: greedy left-to-right application semantics
  * (including overlapping runs), deterministic tie-breaks, and a
  * hand-computed merge sequence on a toy vocabulary.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def applied(word: String, l: String, r: String): Seq[String] =
    Seq(word).toDF("w")
      .select(Bpe.applyMerge(Bpe.chars($"w"), l, r).as("s"))
      .head().getSeq[String](0)

  test("merge application is greedy left-to-right (first pair wins in runs)") {
    assert(applied("aaa", "a", "a") == Seq("aa", "a"))
    assert(applied("aaaa", "a", "a") == Seq("aa", "aa"))
    assert(applied("aaaaa", "a", "a") == Seq("aa", "aa", "a"))
    assert(applied("abab", "a", "b") == Seq("ab", "ab"))
    assert(applied("xaay", "a", "a") == Seq("x", "aa", "y"))
    assert(applied("ab", "b", "a") == Seq("a", "b")) // no match, unchanged
  }

  test("single-character words produce no pairs and survive merging") {
    assert(applied("a", "a", "a") == Seq("a"))
    val p = Seq("a").toDF("w").select(Bpe.pairs(Bpe.chars($"w")).as("p"))
      .head().getSeq[Any](0)
    assert(p.isEmpty)
  }

  test("learn() reproduces a hand-computed merge sequence") {
    // freq-weighted pairs: "low"x5 -> (l,o)5 (o,w)5 ; "lower"x2 adds
    // (l,o)2 (o,w)2 (w,e)2 (e,r)2 ; "newest"x6 adds (n,e)6 (e,w)6 (w,e)6
    // (e,s)6 (s,t)6. Best: (w,e) = 2+6 = 8.
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L))
      .toDF("word", "freq")
    val m = Bpe.learn(vocab, 3).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "w", "e", 8L)))
    // after (w,e): "low"->[l,o,w]; "lower"->[l,o,we,r]; "newest"->[n,e,we,s,t]
    // pairs: (l,o)7, (o,w)5, (o,we)2, (we,r)2, (n,e)6, (e,we)6, (we,s)6, (s,t)6
    assert(m(1) == ((2, "l", "o", 7L)))
    // after (l,o): "low"->[lo,w]; "lower"->[lo,we,r]; "newest" unchanged
    // ties at 6 break lexicographically: ("e","we") < ("n","e") < ("s","t") < ("we","s")
    assert(m(2) == ((3, "e", "we", 6L)))
  }

  test("applyMerge matches the reference greedy fold on randomized inputs") {
    // reference implementation: plain Scala greedy left-to-right merge
    def ref(syms: List[String], l: String, r: String): List[String] = syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: ref(rest, l, r)
      case a :: rest => a :: ref(rest, l, r)
      case Nil => Nil
    }
    val rnd = new scala.util.Random(42)
    val alphabet = Seq("a", "b", "ab", "c")
    val cases = (1 to 60).map { _ =>
      val n = 1 + rnd.nextInt(9)
      val syms = List.fill(n)(alphabet(rnd.nextInt(alphabet.length)))
      val l = alphabet(rnd.nextInt(alphabet.length))
      val r = alphabet(rnd.nextInt(alphabet.length))
      (syms, l, r)
    }
    // evaluate all cases in one Spark job; chars() can't build multi-char
    // symbols, so feed the symbol arrays directly
    val df = cases.zipWithIndex.map { case ((syms, l, r), i) => (i, syms, l, r) }
      .toDF("i", "syms", "l", "r")
    cases.zipWithIndex.foreach { case ((syms, l, r), i) =>
      val got = df.filter($"i" === i)
        .select(Bpe.applyMerge($"syms", l, r).as("out"))
        .head().getSeq[String](0).toList
      assert(got == ref(syms, l, r), s"case $i: $syms merge ($l,$r)")
    }
  }

  test("learn() stops early when no pairs remain") {
    val vocab = Seq(("ab", 3L)).toDF("word", "freq")
    val m = Bpe.learn(vocab, 10).collect()
    assert(m.length == 1) // (a,b) then the word is one symbol: no more pairs
    assert(m.head.getString(1) == "a" && m.head.getString(2) == "b")
  }
}
