package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {
  import Robots._

  private val policy =
    """# example policy
      |User-agent: megabot
      |Disallow: /m
      |
      |User-agent: graftbot
      |User-agent: minibot
      |Disallow: /blocked
      |Allow: /blocked/ok
      |Disallow: /*.zip$
      |Allow:
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  test("group selection: specific agent wins over *, multi-agent lines, decoys ignored") {
    val r = parse(policy, "GraftBot") // case-insensitive
    assert(r == Seq(Rule(false, "/blocked"), Rule(true, "/blocked/ok"),
      Rule(false, "/*.zip$")))
    assert(parse(policy, "minibot") == r)   // shared group
    assert(parse(policy, "unknown") == Seq(Rule(false, "/"))) // falls to *
    assert(parse(policy, "megabot") == Seq(Rule(false, "/m")))
  }

  test("empty Disallow contributes no rule (allow-all)") {
    assert(parse("User-agent: *\nDisallow:\n", "x").isEmpty)
  }

  test("two user-agent groups split by rules start a new group") {
    val p = "User-agent: a\nDisallow: /1\nUser-agent: b\nDisallow: /2\n"
    assert(parse(p, "a") == Seq(Rule(false, "/1")))
    assert(parse(p, "b") == Seq(Rule(false, "/2")))
  }

  test("RFC 9309: unrecognized fields neither split a group nor end an agent run") {
    // crawl-delay between the agent lines must NOT split a and b apart
    val p = "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /x\n"
    assert(parse(p, "a") == Seq(Rule(false, "/x")), "a shares b's group")
    assert(parse(p, "b") == Seq(Rule(false, "/x")))
    // and inside a rule run they are plain ignored
    val q = "User-agent: a\nDisallow: /1\nSitemap: http://s.test/map\nAllow: /1/ok\n"
    assert(parse(q, "a") == Seq(Rule(false, "/1"), Rule(true, "/1/ok")))
  }

  test("crawl-delay: read in passing, group-scoped, most conservative wins") {
    val p = "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /x\n" +
      "User-agent: a\nCrawl-delay: 2.5\nDisallow: /y\n" +
      "User-agent: *\nCrawl-delay: 9\n"
    // a appears in two groups: delays 1 and 2.5 — max (most conservative)
    assert(Robots.crawlDelay(p, "a").contains(2.5))
    assert(Robots.crawlDelay(p, "b").contains(1.0), "b shares a's first group")
    // an agent matching no named group falls back to the * group
    assert(Robots.crawlDelay(p, "stranger").contains(9.0))
    // absent delay → None; unparseable values ignored
    assert(Robots.crawlDelay("User-agent: a\nDisallow: /x\n", "a").isEmpty)
    assert(Robots.crawlDelay("User-agent: a\nCrawl-delay: soon\n", "a").isEmpty)
    // reading the delay never perturbs rule selection
    assert(parse(p, "a") == Seq(Rule(false, "/x"), Rule(false, "/y")))
  }

  test("wildcard and anchor matching") {
    assert(matches("/", "/anything"))
    assert(matches("/src1", "/src1/5") && matches("/src1", "/src10/5"))
    assert(!matches("/src1", "/src2/5"))
    assert(matches("/*.zip$", "/files/a.zip"))
    assert(!matches("/*.zip$", "/files/a.zip.html"))
    assert(matches("/a*c", "/abc") && matches("/a*c", "/a/b/c...".take(6)))
    assert(!matches("/a*c", "/ab"))
    assert(matches("/p$", "/p") && !matches("/p$", "/page"))
    assert(matches("/x*", "/x") && matches("/x*", "/xyz"))
  }

  test("decision: longest match wins, equal-length allow beats disallow, no match allows") {
    val rules = Seq(Rule(false, "/blocked"), Rule(true, "/blocked/ok"))
    assert(!decide(rules, "/blocked/page"))
    assert(decide(rules, "/blocked/ok/page"))
    assert(decide(rules, "/elsewhere"))
    // exact tie: allow wins (RFC 9309 §2.2.2)
    val tie = Seq(Rule(false, "/p"), Rule(true, "/p"))
    assert(decide(tie, "/page"))
    // anchored rule is more specific by octet count incl. the anchor
    val anch = Seq(Rule(true, "/dl"), Rule(false, "/dl/*.zip$"))
    assert(decide(anch, "/dl/readme"))
    assert(!decide(anch, "/dl/a.zip"))
  }
}
