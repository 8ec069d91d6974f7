package graft.functions

import graft.SparkSpec

/** URL canonicalization contracts: each RFC-3986 / crawl-convention
  * rule pinned on hand-written vectors, plus never-throw fuzzing.
  */
class UrlNormalizeSpec extends SparkSpec {
  private def n(u: String) = UrlNormalize.normalize(u)

  test("golden vectors: every rule individually and composed") {
    // case folding (scheme + host; path case PRESERVED)
    assert(n("HTTPS://Example.COM/Path") === "https://example.com/Path")
    // default ports stripped, non-default kept
    assert(n("http://h.com:80/x") === "http://h.com/x")
    assert(n("https://h.com:443/x") === "https://h.com/x")
    assert(n("https://h.com:8443/x") === "https://h.com:8443/x")
    assert(n("http://h.com:443/x") === "http://h.com:443/x") // not http's default
    // RFC 3986 §6.2.3: empty port dropped; zero-padded ports compare
    // NUMERICALLY (':080' is port 80), non-defaults keep canonical digits
    assert(n("https://h.com:/x") === "https://h.com/x")
    assert(n("http://h.com:080/x") === "http://h.com/x")
    assert(n("https://h.com:0443/x") === "https://h.com/x")
    assert(n("https://h.com:08443/x") === "https://h.com:8443/x")
    assert(n("https://h.com:abc/x") === null) // non-numeric port
    // IPv6 literal: the in-bracket colons are not port separators
    assert(n("https://[2001:DB8::1]:443/x") === "https://[2001:db8::1]/x")
    assert(n("https://[2001:db8::1]:8080/x") === "https://[2001:db8::1]:8080/x")
    // fragment removed
    assert(n("https://h.com/x#frag") === "https://h.com/x")
    assert(n("https://h.com/x?a=1#frag") === "https://h.com/x?a=1")
    // tracking params dropped, remainder sorted by key (stable)
    assert(n("https://h.com/x?b=2&a=1&utm_source=f&gclid=g&fbclid=h") ===
      "https://h.com/x?a=1&b=2")
    assert(n("https://h.com/x?a=2&a=1") === "https://h.com/x?a=2&a=1",
      "equal keys keep their relative order (stable sort)")
    // all params tracking → no query at all
    assert(n("https://h.com/x?utm_campaign=c") === "https://h.com/x")
    // empty path → /, trailing slash dropped, root slash kept
    assert(n("https://h.com") === "https://h.com/")
    assert(n("https://h.com/") === "https://h.com/")
    assert(n("https://h.com/a/b/") === "https://h.com/a/b")
    // query with no path
    assert(n("https://h.com?b=2&a=1") === "https://h.com/?a=1&b=2")
    // everything at once
    assert(n("HTTPS://WWW.Ex.COM:443/Docs/5/?b=2&a=1&utm_source=feed#top") ===
      "https://www.ex.com/Docs/5?a=1&b=2")
  }

  test("malformed or non-crawlable input → null") {
    assert(n(null) === null)
    assert(n("") === null)
    assert(n("not a url") === null)
    assert(n("ftp://h.com/x") === null)
    assert(n("mailto:a@b.com") === null)
    assert(n("://h.com") === null)
    assert(n("https://") === null) // empty authority
    assert(n("https://#only-frag") === null)
    // a port with no host strips to nothing — malformed, not canonical
    assert(n("https://:443/x") === null)
    assert(n("http://:80") === null)
    assert(n("https://:8443/x") === null)
  }

  test("never throws on garbage (fuzz)") {
    val rnd = new scala.util.Random(20260814L)
    val pieces = Array("https://", "HTTP://", "://", "h.com", "?", "&", "=",
      "#", "/", ":443", ":80", "utm_", "a=1", "%", "\u0000", "日本")
    (0 until 20000).foreach { _ =>
      val s = (0 until rnd.nextInt(8)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString
      UrlNormalize.normalize(s) // null or a string — must not throw
    }
  }

  test("SQL surface: url_normalize is registered and null-propagating") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val got = Seq(
      (1L, "HTTPS://H.com:443/a/?b=2&a=1&utm_source=x#f"),
      (2L, "junk"),
      (3L, null.asInstanceOf[String])
    ).toDF("id", "u")
      .selectExpr("id", "url_normalize(u) AS n").orderBy("id").collect()
    assert(got(0).getString(1) === "https://h.com/a?a=1&b=2")
    assert(got(1).isNullAt(1) && got(2).isNullAt(1))
  }
}
