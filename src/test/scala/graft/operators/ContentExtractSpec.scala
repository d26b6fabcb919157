package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class ContentExtractSpec extends AnyFunSuite {
  import ContentExtract._

  private val page =
    """<html><body>
      |<nav><a href="/">home sweet home</a> <a href="/x">more navigation links</a></nav>
      |<p>This is the real article text, long enough to count as prose.</p>
      |<div>short</div>
      |<div>A second paragraph of genuine content with a single <a href="/ref">reference</a> inside a lot of surrounding prose words.</div>
      |<footer><a href="/t">terms</a> <a href="/p">privacy</a> (c) example</footer>
      |</body></html>""".stripMargin

  test("blocks: per-block text and link accounting") {
    val bs = blocks(page)
    val nav = bs.find(_.text.contains("home sweet home")).get
    // only the single inter-anchor space is non-link text
    assert(nav.density > 0.9, s"nav is (almost) all links: $nav")
    val art = bs.find(_.text.startsWith("This is the real article")).get
    assert(art.linkChars == 0 && art.totalChars > 20)
    val mixed = bs.find(_.text.contains("second paragraph")).get
    assert(mixed.linkChars == "reference".length)
    assert(mixed.density < 0.33)
  }

  test("mainText keeps prose, drops nav/footer/short blocks") {
    val m = mainText(page)
    assert(m == "This is the real article text, long enough to count as prose. " +
      "A second paragraph of genuine content with a single reference inside a lot of surrounding prose words.")
    assert(keptBlocks(page) == 2)
  }

  test("stripHtml mirrors the column chain incl. single-pass entity decode") {
    assert(stripHtml("<b>a</b>&nbsp;&amp;lt;") == "a &lt;")
    assert(stripHtml("<script>var x = '<p>';</script>kept") == "kept")
  }

  test("stripHtml is the exact twin of the htmlToText column chain") {
    // the two implementations must never drift: random tag/entity soup
    // through both paths, char-for-char equality
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val piece = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.const(" "), Gen.const("<p class='x'>"), Gen.const("</p>"),
      Gen.const("<script>var a = '<b>';</script>"), Gen.const("<style>p{}</style>"),
      Gen.const("<!-- note -->"), Gen.const("&amp;"), Gen.const("&lt;tag&gt;"),
      Gen.const("&amp;lt;"), Gen.const("&nbsp;"), Gen.const("<a href='/x'>link</a>"),
      Gen.const("\t"), Gen.const("\n"))
    val gen = Gen.listOfN(30, piece).map(_.mkString)
    val htmls = (0 until 40).flatMap(i => gen.apply(Gen.Parameters.default, Seed(77L + i)))
    val spark = graft.SparkSuite.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val viaColumn = htmls.toDF("h")
      .select(graft.functions.TextFunctions.htmlToText(col("h")).as("t"))
      .as[String].collect().toSeq
    htmls.zip(viaColumn).foreach { case (h, c) =>
      assert(ContentExtract.stripHtml(h) == c, s"drift on: $h")
    }
  }

  test("degenerate inputs") {
    assert(mainText("") == "")
    assert(mainText("<nav><a href='/'>only links here at all</a></nav>") == "")
    // all-text page with no block tags is one block
    assert(mainText("just some plain text that is long enough") ==
      "just some plain text that is long enough")
  }
}
