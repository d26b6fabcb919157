package graft.operators

/** robots.txt parser + crawl-policy matcher (RFC 9309 subset) — the
  * compliance gate a crawl pipeline applies between the URL frontier and
  * the fetch: group selection by user-agent product token (specific
  * groups win over `*`, multiple matching groups merge), allow/disallow
  * rules with `*` wildcards and the `$` end anchor, and the RFC's
  * most-specific-match decision: the matching rule with the most octets
  * wins; an equally-specific allow beats a disallow; no match ⇒ allowed.
  *
  * The matcher is driver-parseable into a RULE TABLE — the Spark-first
  * shape: robots policies are a per-domain dimension (tiny), so the
  * graded query broadcasts (domain, allow, rule) and decides with a
  * join + window argmax instead of per-row re-parsing.
  */
object Robots {

  case class Rule(allow: Boolean, pattern: String)

  /** Rules applying to `agent` (case-insensitive product token): all
    * groups naming the agent, else all `*` groups. Comments (`#`) and
    * blank lines per the RFC; an empty Disallow value means allow-all
    * and contributes no rule.
    */
  def parse(robotsTxt: String, agent: String): Seq[Rule] =
    chosenGroups(robotsTxt, agent).flatMap(_.rules)

  /** The effective Crawl-delay for `agent` (seconds), if its selected
    * groups carry one — the politeness-rate dimension a scheduler (q251's
    * shape) joins per host. Crawl-delay is a de-facto extension outside
    * RFC 9309: reading it does NOT affect group selection or rule state
    * (the RFC's ignore-unknown-lines behavior is preserved — the line is
    * read in passing, never structural). Multiple applicable delays keep
    * the most conservative (maximum); unparseable values are ignored.
    *
    * Known divergence, chosen deliberately: some delay-honoring crawlers
    * (Bing, Yandex) treat Crawl-delay as a group rule that ENDS the
    * user-agent run, which would split `User-agent: a / Crawl-delay: 1 /
    * User-agent: b / Disallow: /x` into two groups. We follow RFC 9309's
    * letter instead (unknown lines never terminate a group — the exact
    * behavior the round-11 advice prescribed and RobotsSpec pins), and
    * matching the grouping of RFC-conformant parsers (Google's reference
    * parser reads the example as ONE group for the same reason); the
    * conservative-max delay merge means the merged reading can only slow
    * our crawler down relative to the split reading, never speed it up.
    */
  def crawlDelay(robotsTxt: String, agent: String): Option[Double] =
    chosenGroups(robotsTxt, agent).flatMap(_.delays) match {
      case Nil => None
      case ds => Some(ds.max)
    }

  private final case class Group(agents: Seq[String], rules: Seq[Rule],
                                 delays: Seq[Double])

  private def chosenGroups(robotsTxt: String, agent: String): Seq[Group] = {
    val groups = Seq.newBuilder[Group]
    var agents = Seq.empty[String]
    var rules = Seq.empty[Rule]
    var delays = Seq.empty[Double]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules, delays)
      agents = Seq.empty; rules = Seq.empty; delays = Seq.empty; inRules = false
    }
    robotsTxt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) {
          val field = line.take(i).trim.toLowerCase
          val value = line.drop(i + 1).trim
          field match {
            case "user-agent" =>
              if (inRules) flush()
              agents :+= value.toLowerCase
            case "allow" | "disallow" =>
              inRules = true
              if (value.nonEmpty) rules :+= Rule(field == "allow", value)
            case "crawl-delay" =>
              // read in passing; deliberately NOT structural (no inRules
              // change) — see the RFC note in the case below
              try delays :+= value.toDouble
              catch { case _: NumberFormatException => () }
            case _ => () // RFC 9309 §2.2.4: lines outside the defined ones
            // (sitemap, …) are ignored WITHOUT terminating the group —
            // 'User-agent: a / Crawl-delay: 1 / User-agent: b /
            // Disallow: /x' keeps a and b in ONE group sharing the rule
          }
        }
      }
    }
    flush()
    val all = groups.result()
    val mine = all.filter(_.agents.contains(agent.toLowerCase))
    if (mine.nonEmpty) mine else all.filter(_.agents.contains("*"))
  }

  /** Does `pattern` (literal with `*` wildcards, optional trailing `$`
    * end anchor) match a PREFIX of `path`? Per the RFC, a pattern
    * matches if it matches from the first octet of the path.
    */
  def matches(pattern: String, path: String): Boolean = {
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    // greedy segment walk: each literal segment must appear in order;
    // the first segment must match at offset 0
    val segs = pat.split("\\*", -1)
    var pos = 0
    var first = true
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      if (first) {
        if (!path.startsWith(s)) return false
        pos = s.length
        first = false
      } else if (s.nonEmpty) {
        val at =
          if (i == segs.length - 1 && anchored) {
            val want = path.length - s.length
            if (want >= pos && path.regionMatches(want, s, 0, s.length)) want else -1
          } else path.indexOf(s, pos)
        if (at < 0) return false
        pos = at + s.length
      } else if (i == segs.length - 1) {
        // trailing '*': matches anything (incl. empty)
        pos = path.length
      }
      i += 1
    }
    !anchored || pos == path.length
  }

  /** RFC 9309 decision: most octets wins, equal-length allow beats
    * disallow, no matching rule allows.
    */
  def decide(rules: Seq[Rule], path: String): Boolean = {
    val hits = rules.filter(r => matches(r.pattern, path))
    if (hits.isEmpty) true
    else {
      val best = hits.maxBy(r => (r.pattern.length, r.allow))
      best.allow
    }
  }
}
