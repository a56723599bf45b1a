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
  * drop) plus the two conventions from the C4/CCNet lineage (tracking-
  * param drop, query-param sort); path dot-segment resolution and
  * percent-encoding normalization are deliberately out of scope — they
  * change fetch semantics on hostile servers.
  */
object UrlOps {

  /** Canonical form: lowercase scheme+host, strip `:80`/`:443`, drop
    * the `#fragment`, drop `utm_*` tracking params, sort what remains,
    * collapse trailing slashes (empty path prints as `/`). Idempotent
    * (canon(canon(u)) == canon(u)) — pinned by UrlOpsSpec.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = substring_index(u, "#", 1)
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
    concat(scheme, lit("://"), host, path,
      when(size(params) > 0, concat(lit("?"), array_join(array_sort(params), "&")))
        .otherwise(lit("")))
  }
}
