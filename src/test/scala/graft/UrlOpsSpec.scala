package graft

import org.apache.spark.sql.functions._
import graft.operators.UrlOps

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).as[String].collect().toSeq

  test("canonicalization rules: case, ports, fragments, utm, order, slashes") {
    assert(canon("HTTPS://WWW.Example.ORG/Path") === Seq("https://www.example.org/Path"),
      "scheme+host lowercase; path case PRESERVED (paths are case-sensitive)")
    assert(canon("https://h.org:443/a", "http://h.org:80/a") ===
      Seq("https://h.org/a", "http://h.org/a"), "default ports strip")
    assert(canon("https://h.org:8080/a") === Seq("https://h.org:8080/a"),
      "non-default port survives")
    assert(canon("http://h.org:443/a", "https://h.org:80/a") ===
      Seq("http://h.org:443/a", "https://h.org:80/a"),
      "the OTHER scheme's default port is a real origin and survives")
    assert(canon("https://h.org/a#sec-2") === Seq("https://h.org/a"), "fragment drops")
    assert(canon("https://h.org/a?utm_source=x&b=2&a=1") === Seq("https://h.org/a?a=1&b=2"),
      "utm params drop, the rest sort")
    assert(canon("https://h.org/a?utm_source=x") === Seq("https://h.org/a"),
      "all-tracking query drops the '?' entirely")
    assert(canon("https://h.org/a/", "https://h.org/a///") ===
      Seq("https://h.org/a", "https://h.org/a"), "trailing slashes collapse")
    assert(canon("https://h.org", "https://h.org/") ===
      Seq("https://h.org/", "https://h.org/"), "empty path prints as /")
  }

  test("percent-encoding: unreserved decode, reserved uppercase, malformed passthrough") {
    assert(canon("https://h.org/%70/%41%7e?a=%31") === Seq("https://h.org/p/A~?a=1"),
      "escapes of unreserved chars (p, A, ~, 1) decode to the bare character")
    assert(canon("https://h.org/a%2fb?c=x%2fy") === Seq("https://h.org/a%2Fb?c=x%2Fy"),
      "reserved escapes stay ENCODED but hex uppercases (%2f = '/')")
    assert(canon("https://h.org/a?b=%25zz") === Seq("https://h.org/a?b=%25zz"),
      "%25 (the escaped %) is reserved: stays encoded, does not re-expose an escape")
    assert(canon("https://h.org/a?b=100%", "https://h.org/a?b=%z1") ===
      Seq("https://h.org/a?b=100%", "https://h.org/a?b=%z1"),
      "a % not followed by two hex digits passes through byte-for-byte")
    assert(canon("https://h.org/%70%2f%70") === Seq("https://h.org/p%2Fp"),
      "mixed: decode around a preserved reserved escape")
  }

  test("strings without :// pass through unchanged (relative links, mailto, bare hosts)") {
    for (u <- Seq("mailto:admin@example.org", "/relative/path?b=2&a=1",
        "example.org/p/1", "HTTPS:no-slashes", ""))
      assert(canon(u) === Seq(u), s"non-absolute input must not be mangled: $u")
  }

  test("native percent_normalize == the HOF reference formulation, byte for byte") {
    // the production path is the single-pass native expression; the
    // split/transform HOF chain is the reference semantics — they must
    // be indistinguishable on every escape shape, including malformed
    val inputs = Seq(
      "https://h.org/%70/%41%7e?a=%31", "https://h.org/a%2fb?c=x%2Fy",
      "no escapes at all", "", "%", "100%", "%z1", "%4%41", "%%41",
      "%2541", "a%ffb", "%0a", "trailing%4", "unicodeé%41",
      "%2F%2f%2E%2e%7E%7e%5F%5f")
    val df = inputs.toDF("u")
      .select(UrlOps.normalizePercent(col("u")).as("native"),
        UrlOps.normalizePercentHof(col("u")).as("ref"))
    val rows = df.as[(String, String)].collect()
    for (((n, r), in) <- rows.zip(inputs))
      assert(n === r, s"native/HOF divergence on '$in': '$n' vs '$r'")
  }

  test("property: canonicalization is idempotent on the messy-variant space") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check => scCheck, Parameters}
    val genUrl = for {
      up <- Gen.oneOf(true, false)
      port <- Gen.oneOf("", ":443", ":8080")
      pesc <- Gen.oneOf("", "/%70x", "/x%2fy", "/x%zz", "/100%")
      slash <- Gen.oneOf("", "/", "//")
      frag <- Gen.oneOf("", "#x")
      params <- Gen.someOf(Seq("a=1", "b=2", "utm_c=3", "z=9", "e=%41", "f=x%2fy"))
      n <- Gen.choose(0, 99)
    } yield {
      val host = if (up) s"H$n.Example.ORG" else s"h$n.example.org"
      val q = if (params.isEmpty) "" else "?" + scala.util.Random.shuffle(params).mkString("&")
      s"https://$host$port/p/$n$pesc$slash$q$frag"
    }
    val prop = Prop.forAll(genUrl) { u =>
      val once = canon(u).head
      canon(once).head == once
    }
    assert(scCheck(Parameters.default.withMinSuccessfulTests(40), prop).passed)
  }

  test("messy variants of one resource collapse to one canonical key") {
    val variants = Seq(
      "https://w5.example.org/p/5?a=1&b=2",
      "HTTPS://W5.EXAMPLE.ORG/p/5?b=2&a=1",
      "https://w5.example.org:443/p/5?a=1&b=2#frag",
      "https://w5.example.org/p/5/?utm_source=feed&a=1&b=2",
      "https://w5.example.org/%70/5?a=%31&b=2")
    val keys = canon(variants: _*).distinct
    assert(keys === Seq("https://w5.example.org/p/5?a=1&b=2"))
    // reserved escapes: hex case collapses, the escape itself survives
    assert(canon("https://h.org/d?c=x%2fy", "https://h.org/d?c=x%2Fy").distinct ===
      Seq("https://h.org/d?c=x%2Fy"))
  }
}
