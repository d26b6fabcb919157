package graft.operators

/** Main-content extraction by link density — the jusText/trafilatura-
  * shaped boilerplate removal step AFTER tag stripping: navigation bars,
  * footers, and related-link rails are mostly anchor text, while article
  * prose is mostly plain text, so segmenting the page into block-level
  * chunks and dropping blocks whose link-text share exceeds a threshold
  * (or that are too short to be prose) recovers the article. Tag
  * stripping alone ([[graft.functions.TextFunctions.htmlToText]], q243)
  * keeps nav words; the density gate is what removes them.
  *
  * Per-document string work on the executor map tier (the documented
  * codec-tier exception — per-block accounting doesn't decompose into a
  * column expression chain); deterministic, no tunables beyond the two
  * published thresholds.
  */
object ContentExtract {

  case class Block(text: String, linkChars: Int) {
    def totalChars: Int = text.length
    def density: Double =
      if (totalChars == 0) 1.0 else linkChars.toDouble / totalChars
  }

  /** Plain-Scala twin of `TextFunctions.htmlToText` (same passes, same
    * order): script/style subtrees, comments, tags, the five core
    * entities (`&amp;` last), whitespace normalization.
    */
  def stripHtml(html: String): String = {
    var s = html
    s = s.replaceAll("(?is)<script\\b[^>]*>.*?</script>", " ")
    s = s.replaceAll("(?is)<style\\b[^>]*>.*?</style>", " ")
    s = s.replaceAll("(?s)<!--.*?-->", " ")
    s = s.replaceAll("<[^>]*>", " ")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foreach { case (from, to) => s = s.replace(from, to) }
    s.replaceAll("\\s+", " ").trim
  }

  // zero-width split: the '<' stays with the following chunk
  private val BlockSplit =
    "(?i)(?=</?(?:p|div|nav|footer|header|aside|li|ul|ol|h[1-6]|td|tr|table|article|section)\\b)".r
  private val Anchor = "(?is)<a\\b[^>]*>(.*?)</a>".r

  /** Segment `html` into block-level chunks with per-block link-text
    * accounting. The split points are block-level tag boundaries; inline
    * markup (anchors, em, spans) stays inside its block.
    */
  def blocks(html: String): Seq[Block] =
    BlockSplit.split(html).toSeq.map { chunk =>
      val linkChars = Anchor.findAllMatchIn(chunk)
        .map(m => stripHtml(m.group(1)).length).sum
      Block(stripHtml(chunk), linkChars)
    }.filter(_.totalChars > 0)

  /** The page's main text: blocks long enough to be prose whose link
    * share is at most `maxDensity`, joined in order.
    */
  def mainText(html: String, minChars: Int = 20, maxDensity: Double = 0.33): String =
    blocks(html)
      .filter(b => b.totalChars >= minChars && b.density <= maxDensity)
      .map(_.text).mkString(" ")

  /** Kept-block count under the same thresholds (for grading). */
  def keptBlocks(html: String, minChars: Int = 20, maxDensity: Double = 0.33): Int =
    blocks(html).count(b => b.totalChars >= minChars && b.density <= maxDensity)
}
