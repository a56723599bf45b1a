package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Robots

/** RFC 9309 parser/matcher semantics, spec-derived cases (no Spark). */
class RobotsSpec extends AnyFunSuite {

  test("group selection: exact agent match, * fallback, combining, case") {
    val txt =
      """User-agent: botA
        |Disallow: /a
        |
        |User-agent: BOTB
        |User-agent: botC
        |Disallow: /bc
        |
        |User-agent: botA
        |Disallow: /a2
        |
        |User-agent: *
        |Disallow: /x
        |""".stripMargin
    val g = Robots.parse(txt)
    // two botA groups COMBINE (RFC 9309 §2.2.1)
    assert(Robots.rulesFor(g, "botA").map(_.pattern) === Seq("/a", "/a2"))
    // consecutive User-agent lines share one rule block
    assert(Robots.rulesFor(g, "botb").map(_.pattern) === Seq("/bc"))
    assert(Robots.rulesFor(g, "BotC").map(_.pattern) === Seq("/bc"))
    // unknown agent takes the * group, never a named one
    assert(Robots.rulesFor(g, "stranger").map(_.pattern) === Seq("/x"))
  }

  test("longest-match precedence; allow wins length ties; no match = allowed") {
    val rules = Seq(
      Robots.Rule(allow = false, "/dir/"),
      Robots.Rule(allow = true, "/dir/page.html"))
    assert(!Robots.isAllowed(rules, "/dir/other.html"))
    assert(Robots.isAllowed(rules, "/dir/page.html"), "longer allow wins")
    assert(Robots.isAllowed(rules, "/elsewhere"), "unmatched path is allowed")
    // exact length tie: allow wins (§2.2.2)
    val tie = Seq(Robots.Rule(allow = false, "/p"), Robots.Rule(allow = true, "/p"))
    assert(Robots.isAllowed(tie, "/page"))
  }

  test("wildcards: mid-pattern *, trailing $ anchor, combinations") {
    assert(Robots.patternMatches("/*.php", "/index.php"))
    assert(Robots.patternMatches("/*.php", "/a/b/c.php?x=1"))
    assert(!Robots.patternMatches("/*.php$", "/index.php?x=1"))
    assert(Robots.patternMatches("/*.php$", "/index.php"))
    assert(Robots.patternMatches("/fish*.php", "/fishheads/catfish.php?p=2"))
    assert(!Robots.patternMatches("/fish*.php$", "/fishheads/catfish.php?p=2"))
    assert(Robots.patternMatches("/*?s=*", "/d1/p3.html?s=1&t=0"))
    assert(!Robots.patternMatches("/*?s=*", "/d1/p3.html"))
    // a pattern is a PREFIX match unless anchored
    assert(Robots.patternMatches("/p", "/page"))
    assert(!Robots.patternMatches("/p$", "/page"))
  }

  test("hostile wildcard pileup terminates fast (greedy match, not exponential)") {
    // robots.txt is crawler-adversarial input: the old recursive
    // backtracker was exponential on star-dense anchored patterns
    // (each '*' forked |path| branches). The greedy single-backtrack
    // matcher is O(|pat|·|path|); this would previously hang for
    // geological time.
    val pat = ("/a" + "*a" * 40) + "b$"
    val path = "/" + "a" * 2000
    val t0 = System.nanoTime()
    assert(!Robots.patternMatches(pat, path))
    assert(Robots.patternMatches(("/" + "*" * 500) + "a" * 5 + "$", "/" + "a" * 2000))
    val ms = (System.nanoTime() - t0) / 1000000
    assert(ms < 2000, s"hostile pattern took ${ms}ms")
    // semantics unchanged by star-run collapsing
    assert(Robots.patternMatches("/a***b", "/axxxb"))
    assert(!Robots.patternMatches("/a***b$", "/axxxbc"))
  }

  test("parse robustness: comments, empty Disallow, orphan rules, unknown keys") {
    val txt =
      """Disallow: /orphan   # rules before any group are ignored
        |# full comment line
        |User-agent: bot  # trailing comment
        |Disallow:
        |Crawl-delay: 10
        |Sitemap: https://x/s.xml
        |Disallow: /real  # comment after value
        |""".stripMargin
    val rules = Robots.rulesFor(Robots.parse(txt), "bot")
    // the empty Disallow places no restriction and is dropped
    assert(rules === Seq(Robots.Rule(allow = false, "/real")))
    assert(!Robots.isAllowed(rules, "/real/sub"))
    assert(Robots.isAllowed(rules, "/orphan"))
  }

  test("synthetic fixture: engine verdicts equal the oracle's decision formula") {
    // the exact formula crawl_robots_gate's oracle replays
    def formula(t: Long, d: Long, p: Long, hasQuery: Boolean): Boolean =
      if (d == t % 5 && p == t) true
      else if (d == t % 5) false
      else if (t % 7 == 0 && hasQuery) false
      else true
    for {
      t <- Seq(0L, 1L, 5L, 7L, 14L, 23L, 96L)
      d <- 0L until 5L
      p <- Seq(0L, 1L, 5L, 7L, 14L, 23L, 49L)
      q <- Seq(false, true)
    } {
      val path = s"/d$d/p$p.html" + (if (q) "?s=1&t=0" else "")
      assert(Robots.allowed(Robots.syntheticRobotsTxt(t), "graftbot", path)
        === formula(t, d, p, q), s"t=$t d=$d p=$p q=$q")
      // the otherbot deny-all group blocks everything for otherbot
      assert(!Robots.allowed(Robots.syntheticRobotsTxt(t), "otherbot", path))
      // an unknown agent only loses /private/
      assert(Robots.allowed(Robots.syntheticRobotsTxt(t), "elsebot", path))
      assert(!Robots.allowed(Robots.syntheticRobotsTxt(t), "elsebot", "/private/x"))
    }
  }
}
