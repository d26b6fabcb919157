package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b a c"),
    (2L, "b a b"),
    (3L, "c c c a b c"),
  ).toDF("doc_id", "text")

  test("build: df/cf/postings hand-checked, both levels sorted") {
    val idx = InvertedIndex.build(docs, "doc_id", "text")
      .orderBy($"term").collect()
    assert(idx.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    val a = idx(0)
    assert(a.getLong(1) == 3 && a.getLong(2) == 4) // df=3 docs, cf=4 occurrences
    val aPost = a.getSeq[org.apache.spark.sql.Row](3)
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toList
    assert(aPost == List((1L, List(0, 2)), (2L, List(1)), (3L, List(3))))
    val c = idx(2)
    assert(c.getLong(1) == 2 && c.getLong(2) == 5) // doc1 once + doc3 four times
  }

  test("phraseSearch: adjacent-pair counts, no false positives across positions") {
    val idx = InvertedIndex.build(docs, "doc_id", "text")
    val ab = InvertedIndex.phraseSearch(idx, Seq("a", "b"))
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // "a b": doc1 pos0-1; doc2 pos1-2; doc3 pos3-4
    assert(ab == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
    // "b a" exists in doc1 (1,2) and doc2 (0,1) but NOT doc3
    val ba = InvertedIndex.phraseSearch(idx, Seq("b", "a"))
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ba == Seq((1L, 1L), (2L, 1L)))
  }

  test("phraseSearch: 3-term phrase and repeated-term phrase align correctly") {
    val idx = InvertedIndex.build(docs, "doc_id", "text")
    val abc = InvertedIndex.phraseSearch(idx, Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(abc == Seq((3L, 1L))) // only doc3 "...a b c" at pos 3..5
    // repeated term: doc3 "c c c a b c" has c at 0,1,2,5 — adjacent pairs
    // (0,1) and (1,2) overlap-count as 2 matches
    val cc = InvertedIndex.phraseSearch(idx, Seq("c", "c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cc == Seq((3L, 2L)))
  }

  test("phraseSearch: absent term yields empty result, not an error") {
    val idx = InvertedIndex.build(docs, "doc_id", "text")
    assert(InvertedIndex.phraseSearch(idx, Seq("a", "zz")).count() == 0)
  }
}
