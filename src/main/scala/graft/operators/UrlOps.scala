package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization for crawl dedup — the stage upstream of every
  * per-domain policy (caps, robots, frontier dedup): the same resource
  * arrives under case-shuffled schemes/hosts, explicit default ports,
  * fragments, tracking params, shuffled query order, and trailing
  * slashes, and a frontier that treats those as distinct re-fetches the
  * corpus many times over.
  *
  * Everything here is a pure Column expression over built-in string
  * functions — whole-stage codegen'd, map-side, zero state — so the
  * canonical key is computed during the scan and the only exchange in a
  * consuming dedup is the groupBy on the canonical URL itself. The
  * rule set is the conservative RFC 3986 §6 subset every crawler
  * agrees on (lowercase scheme/host, default-port strip, fragment
  * drop, §6.2.2.2 decode of UNRESERVED-character escapes + uppercase
  * hex for the rest) plus the two conventions from the C4/CCNet
  * lineage (tracking-param drop, query-param sort); path dot-segment
  * resolution and decoding of RESERVED characters are deliberately
  * out of scope — they change fetch semantics on hostile servers.
  */
object UrlOps {

  /** Percent-encoding normalization — the RFC 3986 §6.2.2 safe
    * subset: escapes of UNRESERVED characters (`%41`..`%5A`,
    * `%61`..`%7A`, `%30`..`%39`, `-` `.` `_` `~`) decode to the bare
    * character (they are never delimiters, so decoding cannot change
    * URL structure — safe to run on the RAW string before parsing),
    * every other well-formed escape keeps its meaning but gets
    * UPPERCASE hex (`%2f` -> `%2F`, §6.2.2.1), and a `%` NOT followed
    * by two hex digits passes through byte-for-byte (rejecting would
    * turn a frontier dedup into a crash loop on real crawl data).
    * Idempotent: decoded output contains no `%` that the rules would
    * touch again (`%25` — the escaped `%` itself — is reserved, so it
    * stays encoded and cannot re-expose an escape).
    */
  def normalizePercent(u: Column): Column =
    graft.functions.TextExpressions.percent_normalize(u)

  /** RFC 3986 §5.2 reference resolution against a base URI (native
    * [[graft.functions.ResolveUrl]] — fragments dropped, dot segments
    * removed): the step between `extract_links` and frontier
    * admission/[[canonicalizeUrl]] in the crawl-graph chain.
    */
  def resolveUrl(base: Column, ref: Column): Column =
    graft.functions.TextExpressions.resolve_url(base, ref)

  /** The split/transform HOF formulation of [[normalizePercent]] —
    * kept as the cross-checked REFERENCE semantics (the DotProduct-vs-
    * fold contract; UrlOpsSpec asserts equality against the native
    * pass on the messy-variant space). Not the production path:
    * canonicalization embeds the normalized string in many split
    * subtrees, HOF-bearing projections fall out of codegen without
    * common-subexpression elimination, and the optimizer's inlining
    * re-evaluated this whole chain ~10x per row.
    */
  def normalizePercentHof(u: Column): Column = {
    val parts = split(u, "%", -1)
    val decoded = transform(slice(parts, lit(2), greatest(size(parts) - 1, lit(0))), p => {
      val h1 = call_function("locate", lower(p.substr(lit(1), lit(1))), lit("0123456789abcdef"))
      val h2 = call_function("locate", lower(p.substr(lit(2), lit(1))), lit("0123456789abcdef"))
      val rest = p.substr(lit(3), length(p))
      val d = (h1 - 1) * 16 + (h2 - 1)
      val unreserved = (d >= 65 && d <= 90) || (d >= 97 && d <= 122) ||
        (d >= 48 && d <= 57) || d.isin(45, 46, 95, 126)
      // length guard FIRST: locate('', s) is 1 by SQL convention, so a
      // short piece must be classed malformed before d is trusted
      when(length(p) < 2 || h1 === 0 || h2 === 0, concat(lit("%"), p))
        .when(unreserved, concat(call_function("char", d), rest))
        .otherwise(concat(lit("%"), upper(p.substr(lit(1), lit(2))), rest))
    })
    when(instr(u, "%") > 0,
      concat(element_at(parts, 1), array_join(decoded, ""))).otherwise(u)
  }

  /** Canonical form: percent-normalize (see [[normalizePercent]]),
    * lowercase scheme+host, strip `:80`/`:443`, drop the `#fragment`,
    * drop `utm_*` tracking params, sort what remains, collapse
    * trailing slashes (empty path prints as `/`). A string with no
    * `://` (relative link, `mailto:`, bare host — all common in real
    * frontiers) is not a parseable absolute URL: it passes through
    * UNCHANGED rather than coming back mangled by component splits
    * that found no components. Idempotent (canon(canon(u)) ==
    * canon(u)) — pinned by UrlOpsSpec.
    */
  def canonicalizeUrl(u: Column): Column = {
    val pu = normalizePercent(u)
    val noFrag = substring_index(pu, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    val qstr = when(instr(noFrag, "?") > 0,
      noFrag.substr(instr(noFrag, "?") + 1, length(noFrag))).otherwise(lit(""))
    val scheme = lower(substring_index(base, "://", 1))
    val hostPath = substring_index(base, "://", -1)
    val hostPort = substring_index(hostPath, "/", 1)
    val rawPath = hostPath.substr(length(hostPort) + 1, length(hostPath))
    // the default port is SCHEME-relative: http on :443 (or https on
    // :80) is a different origin and must survive canonicalization
    val lowered = lower(hostPort)
    val host = when(scheme === "http", regexp_replace(lowered, ":80$", ""))
      .when(scheme === "https", regexp_replace(lowered, ":443$", ""))
      .otherwise(lowered)
    val trimmed = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val params = filter(split(qstr, "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val canon = concat(scheme, lit("://"), host, path,
      when(size(params) > 0, concat(lit("?"), array_join(array_sort(params), "&")))
        .otherwise(lit("")))
    when(instr(u, "://") > 0, canon).otherwise(u)
  }
}
