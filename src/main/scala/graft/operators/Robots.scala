package graft.operators

/** Robots Exclusion Protocol (RFC 9309) — parser and matcher, built
  * from the published spec only (like the WARC/JPEG/PNG/WAV/Y4M
  * codecs: zero third-party code).
  *
  * Parsing (§2.2): `key: value` lines, case-insensitive keys,
  * `#`-comments stripped, unknown keys ignored; a GROUP is one or
  * more consecutive `User-agent` lines followed by its rules; rules
  * before any `User-agent` line are ignored per spec.
  *
  * Group selection (§2.2.1): the crawler's product token matches a
  * group's agent case-insensitively and EXACTLY; every matching
  * group's rules combine. No match → the `*` groups.
  *
  * Rule matching (§2.2.2): patterns match as prefixes of the URI's
  * path-and-query, `*` matches any octet sequence, a trailing `$`
  * anchors the end. The MOST SPECIFIC match wins — longest pattern in
  * octets; on a length tie the ALLOW rule wins. No rule matches →
  * allowed. An empty pattern (`Disallow:` with no value) places no
  * restriction (§2.2.2) and is dropped at parse.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)
  final case class Group(agents: Seq[String], rules: Seq[Rule])

  def parse(txt: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var inAgents = false // consecutive user-agent lines accumulate
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, rules.toSeq)
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    }
    txt.split("\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            inAgents = true
            agents += value.toLowerCase
          case "allow" | "disallow" =>
            inAgents = false
            // empty pattern = no restriction: dropped here so the
            // matcher never sees a zero-length always-match
            if (value.nonEmpty && agents.nonEmpty)
              rules += Rule(allow = key == "allow", pattern = value)
          case _ => inAgents = false // sitemap, crawl-delay, unknown
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** `pattern` as a wildcard prefix of `path` (§2.2.2): `*` = any
    * octets, trailing `$` = end anchor. Greedy two-pointer match with
    * a single backtrack point per `*` — O(|pattern|·|path|) worst
    * case, linear on real patterns. robots.txt is crawler-adversarial
    * input, so the matcher must not blow up on hostile wildcard
    * pileups; runs of `*` are also collapsed (semantically identical)
    * so pathological `****…` padding cannot inflate the bound.
    */
  def patternMatches(pattern: String, path: String): Boolean = {
    val endAnchor = pattern.endsWith("$")
    val raw = if (endAnchor) pattern.substring(0, pattern.length - 1) else pattern
    // collapse consecutive '*'s: "a***b" ≡ "a*b"
    val pat = {
      val sb = new java.lang.StringBuilder(raw.length)
      var i = 0
      while (i < raw.length) {
        val c = raw.charAt(i)
        if (c != '*' || sb.length == 0 || sb.charAt(sb.length - 1) != '*') sb.append(c)
        i += 1
      }
      sb.toString
    }
    var pi = 0
    var si = 0
    var starPi = -1 // pattern index just past the last '*'
    var starSi = 0  // path index the last '*' is currently pinned to
    while (true) {
      if (pi == pat.length) {
        // pattern consumed: a prefix match suffices unless anchored
        if (!endAnchor || si == path.length) return true
        if (starPi < 0) return false
        starSi += 1
        if (starSi > path.length) return false
        si = starSi; pi = starPi
      } else if (pat.charAt(pi) == '*') {
        starPi = pi + 1; starSi = si; pi += 1
      } else if (si < path.length && path.charAt(si) == pat.charAt(pi)) {
        pi += 1; si += 1
      } else if (starPi >= 0) {
        starSi += 1
        if (starSi > path.length) return false
        si = starSi; pi = starPi
      } else return false
    }
    false // unreachable
  }

  /** The rules applying to `agent`: all exactly-matching groups'
    * rules combined, falling back to the `*` groups.
    */
  def rulesFor(groups: Seq[Group], agent: String): Seq[Rule] = {
    val a = agent.toLowerCase
    val exact = groups.filter(_.agents.contains(a)).flatMap(_.rules)
    if (groups.exists(_.agents.contains(a))) exact
    else groups.filter(_.agents.contains("*")).flatMap(_.rules)
  }

  /** Longest-match verdict for `pathAndQuery` (allowed when no rule
    * matches; on a specificity tie, allow wins).
    */
  def isAllowed(rules: Seq[Rule], pathAndQuery: String): Boolean = {
    val matching = rules.filter(r => patternMatches(r.pattern, pathAndQuery))
    if (matching.isEmpty) true
    else {
      val best = matching.map(_.pattern.length).max
      matching.exists(r => r.allow && r.pattern.length == best)
    }
  }

  /** One-call convenience: parse + select + decide. */
  def allowed(robotsTxt: String, agent: String, pathAndQuery: String): Boolean =
    isAllowed(rulesFor(parse(robotsTxt), agent), pathAndQuery)

  /** Per-URL verdict under the synthetic per-host robots fixture for
    * agent `graftbot`, host parsed from the URL and its rules memoized
    * in `cache` (the enrichment-cache pattern — one parse per host per
    * partition). ONE definition shared by the batch crawl_robots_gate
    * query and the streaming frontier scheduler gate, so the two
    * sides cannot drift.
    */
  def syntheticVerdict(url: String,
      cache: scala.collection.mutable.HashMap[String, Seq[Rule]]): (String, Boolean) = {
    val hostStart = url.indexOf("://") + 3
    val pathStart = url.indexOf('/', hostStart)
    val host = url.substring(hostStart, pathStart)
    val pathAndQuery = url.substring(pathStart)
    val rules = cache.getOrElseUpdate(host, {
      val t = host.stripPrefix("w").takeWhile(_.isDigit).toLong
      rulesFor(parse(syntheticRobotsTxt(t)), "graftbot")
    })
    (host, isAllowed(rules, pathAndQuery))
  }

  /** Synthetic robots.txt of host index `t` in the linked-WARC host
    * space (`w<t>.example.org`) — exercises group selection (an
    * `otherbot` deny-all group the gate's agent must ignore),
    * directory disallow + longer allow exception, a `*`-wildcard
    * query rule on every 7th host, comments, and an empty Disallow:
    *
    *   - graftbot may not fetch `/d<t%5>/` EXCEPT the host's own
    *     flagship page `/d<t%5>/p<t>.html` (longest-match allow);
    *   - hosts with t % 7 == 0 also block any `?s=`-query URL unless
    *     a longer allow wins;
    *   - everyone else (`*`) only loses `/private/`.
    */
  def syntheticRobotsTxt(t: Long): String = {
    val extra = if (t % 7 == 0) "Disallow: /*?s=*\n" else ""
    s"""# synthetic robots for w$t.example.org
       |User-agent: otherbot
       |Disallow: /
       |
       |User-agent: graftbot
       |Disallow: /d${t % 5}/
       |Allow: /d${t % 5}/p$t.html
       |Disallow:
       |$extra
       |User-agent: *
       |Disallow: /private/
       |""".stripMargin
  }
}
