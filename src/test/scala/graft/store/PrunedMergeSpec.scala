package graft.store

import graft.SparkSuite
import graft.store.{MergeMatchedAction => A, MergeWhenMatched => M, MergeWhenNotMatched => NM}
import java.nio.file.Files

/** The FILE-pruned conditional MERGE on flat tables (round-13 verdict
  * item 5): clean files keep byte length and mtime (hard-linked, never
  * re-encoded), victim discovery is exactly the key match set, and the
  * degenerate shapes (no-op, insert-only, all-victims) take their
  * cheapest correct path.
  */
class PrunedMergeSpec extends SparkSuite {
  import spark.implicits._

  /** 4 range files: keys 0-24, 25-49, 50-74, 75-99. */
  private def mk(name: String): String = {
    val tbl = Files.createTempDirectory("prmerge").resolve(name).toString
    spark.range(0, 100).select($"id".as("k"), ($"id" * 10).as("v"))
      .repartitionByRange(4, $"k").write.mode("overwrite").parquet(tbl)
    tbl
  }

  private def files(tbl: String) = new java.io.File(tbl).listFiles()
    .filter(_.getName.endsWith(".parquet"))
    .map(f => (f.getName, f.lastModified(), f.length())).sortBy(_._1).toSeq

  test("conditional merge rewrites only victim files; clean files keep mtime+length") {
    val tbl = mk("cond")
    val before = files(tbl)
    assert(before.size == 4)
    // matches confined to keys 10..14 (file 1); inserts are new keys
    val src = ((10L to 14L).map(k => (k, k * 1000L)) :+ (200L, 1L) :+ (201L, 2L))
      .toDF("k", "v")
    TableStore.mergeClauses(spark, tbl, src, Seq("k"),
      Seq(M(Some("s.k % 2 = 0"), A.Delete), M(None, A.Update(None))),
      Some(NM(None)), Nil)
    val after = files(tbl)
    val survivors = after.filter(f => before.exists(_._1 == f._1))
    assert(survivors.size == 3, s"three clean files must survive by link: $survivors")
    assert(survivors == before.filter(f => survivors.exists(_._1 == f._1)),
      "clean files must keep their exact bytes and mtime")
    assert(after.exists(_._1.startsWith("rw-")))
    val got = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!got.contains(10L) && !got.contains(12L) && !got.contains(14L),
      "even matched keys delete (first TRUE clause wins)")
    assert(got(11L) == 11000L && got(13L) == 13000L, "odd matched keys update")
    assert(got(200L) == 1L && got(201L) == 2L, "unmatched source rows insert")
    assert(got(15L) == 150L && got(9L) == 90L, "neighbors keep stored values")
  }

  test("a source with no matches and no insert clause is a zero-write no-op") {
    val tbl = mk("noop")
    val before = files(tbl)
    TableStore.mergeClauses(spark, tbl, Seq((500L, 1L)).toDF("k", "v"), Seq("k"),
      Seq(M(None, A.Update(None))), None, Nil)
    assert(files(tbl) == before, "nothing may be written — not even a swap")
  }

  test("insert-only effect links every file and stages just the inserts") {
    val tbl = mk("insonly")
    val before = files(tbl)
    TableStore.mergeClauses(spark, tbl, Seq((500L, 1L)).toDF("k", "v"), Seq("k"),
      Seq(), Some(NM(None)), Nil)
    val after = files(tbl)
    assert(after.filter(f => before.exists(_._1 == f._1)) == before,
      "all existing files survive byte-identical")
    assert(after.count(_._1.startsWith("rw-")) >= 1)
    assert(TableStore.read(spark, tbl).count() == 101)
  }

  test("every file a victim degenerates to the full rewrite, semantics intact") {
    val tbl = mk("allvic")
    val src = Seq(10L, 30L, 60L, 90L).map(k => (k, -k)).toDF("k", "v")
    TableStore.mergeClauses(spark, tbl, src, Seq("k"),
      Seq(M(None, A.Update(None))), None, Nil)
    val got = TableStore.read(spark, tbl).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(10L) == -10L && got(90L) == -90L && got(11L) == 110L)
    assert(got.size == 100)
  }
}
