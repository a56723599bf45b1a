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

  test("property: canonicalization is idempotent on the messy-variant space") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check => scCheck, Parameters}
    val genUrl = for {
      up <- Gen.oneOf(true, false)
      port <- Gen.oneOf("", ":443", ":8080")
      slash <- Gen.oneOf("", "/", "//")
      frag <- Gen.oneOf("", "#x")
      params <- Gen.someOf(Seq("a=1", "b=2", "utm_c=3", "z=9"))
      n <- Gen.choose(0, 99)
    } yield {
      val host = if (up) s"H$n.Example.ORG" else s"h$n.example.org"
      val q = if (params.isEmpty) "" else "?" + scala.util.Random.shuffle(params).mkString("&")
      s"https://$host$port/p/$n$slash$q$frag"
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
      "https://w5.example.org/p/5/?utm_source=feed&a=1&b=2")
    val keys = canon(variants: _*).distinct
    assert(keys === Seq("https://w5.example.org/p/5?a=1&b=2"))
  }
}
