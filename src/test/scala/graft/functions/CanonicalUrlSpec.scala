package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Edge cases for [[TextFunctions.canonicalizeUrl]] beyond the q184 fixture
  * shapes: default vs non-default ports per scheme, bare hosts, root paths,
  * tracking-only queries, duplicate/empty params, fragments mid-query.
  */
class CanonicalUrlSpec extends SparkSuite {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(TextFunctions.canonicalizeUrl($"u").as("c"))
      .as[String].collect().toSeq

  test("scheme/host case-folding, www, default ports, fragments") {
    assert(canon(
      "HTTPS://WWW.Site.COM:443/A/b#frag",
      "https://site.com/A/b",
      "http://www.site.com:80/A/b",
      "http://site.com/A/b"
    ) == Seq(
      "https://site.com/A/b", // path case is SIGNIFICANT, host case is not
      "https://site.com/A/b",
      "http://site.com/A/b",
      "http://site.com/A/b"))
  }

  test("non-default ports survive; default port of the OTHER scheme survives") {
    assert(canon(
      "https://site.com:8443/x",
      "http://site.com:443/x", // 443 is NOT http's default
      "https://site.com:80/x"  // 80 is NOT https's default
    ) == Seq(
      "https://site.com:8443/x",
      "http://site.com:443/x",
      "https://site.com:80/x"))
  }

  test("bare host and trailing slashes normalize to the root path") {
    assert(canon(
      "https://site.com",
      "https://site.com/",
      "https://site.com///"
    ) == Seq.fill(3)("https://site.com/"))
  }

  test("query params: tracking removed, survivors sorted, empties dropped") {
    assert(canon(
      "https://s.com/p?b=2&utm_campaign=x&a=1&ref=tw&&",
      "https://s.com/p?a=1&b=2",
      "https://s.com/p?utm_source=only", // everything removed → no query
      "https://s.com/p?ref"              // bare ref marker removed too
    ) == Seq(
      "https://s.com/p?a=1&b=2",
      "https://s.com/p?a=1&b=2",
      "https://s.com/p",
      "https://s.com/p"))
  }

  test("fragment after the query is dropped, query kept") {
    assert(canon("https://s.com/p?a=1#sec?b=2") == Seq("https://s.com/p?a=1"))
  }

  private def host(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(TextFunctions.canonicalHost($"u").as("h"))
      .as[String].collect().toSeq

  test("canonicalHost folds case/www/default ports; keeps others") {
    assert(host(
      "HTTPS://WWW.Site.COM:443/A/b#frag",
      "http://www.site.com:80/A/b?x=1",
      "https://site.com:8443/x",
      "http://site.com:443/x", // 443 is NOT http's default — kept
      "https://site.com"       // bare host, no path
    ) == Seq("site.com", "site.com", "site.com:8443", "site.com:443", "site.com"))
  }

  test("canonicalHost agrees with the host component of canonicalizeUrl") {
    val urls = Seq(
      "HTTPS://WWW.A.COM:443/p?b=2&a=1", "http://B.org:80//", "https://c.net:8080/x#f",
      "http://www.d.io/p?utm_source=x", "https://e.co")
    val got = urls.toDF("u").select(
      TextFunctions.canonicalHost($"u").as("h"),
      // host slice of the canonical URL: between "://" and the next "/" or "?"
      regexp_extract(TextFunctions.canonicalizeUrl($"u"), "^[a-z+.-]+://([^/?]*)", 1).as("uh"))
      .as[(String, String)].collect()
    got.foreach { case (h, uh) => assert(h == uh, s"host mismatch: $h vs $uh") }
  }
}
