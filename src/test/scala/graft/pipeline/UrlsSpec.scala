package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Urls.withCanonical]]: each normalization rule on hand-built URLs —
  * scheme/case, www + port stripping, trailing slash, fragment, utm
  * filtering + param sorting, and the registrable-domain label rules
  * (2-label host, deep subdomain, 2-letter-cc second-level suffix). */
class UrlsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[(String, String, String, String)] =
    Urls.withCanonical(urls.toDF("url"), col("url"))
      .select(col("url"), col("host"), col("domain"), col("url_canon"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSeq

  test("scheme, www, port, fragment, trailing slash all normalize away") {
    val Seq((_, host, domain, c)) =
      canon("HTTPS://WWW.News.Example.COM:8443/a/b/#frag")
    assert(host === "news.example.com")
    assert(domain === "example.com")
    assert(c === "news.example.com/a/b")
  }

  test("utm params drop; the rest sort; empty query leaves no '?'") {
    val out = canon(
      "http://a.io/p?z=1&utm_source=x&a=2",
      "http://a.io/p?utm_campaign=only",
      "http://a.io/p")
    assert(out.map(_._4) === Seq("a.io/p?a=2&z=1", "a.io/p", "a.io/p"))
    // param-order-insensitive: permutations canonicalize identically
    val Seq(p1, p2) = canon("http://b.io/x?b=2&a=1", "http://b.io/x?a=1&b=2")
    assert(p1._4 === p2._4)
  }

  test("registrable domain: 2-label host, deep subdomain, cc second level") {
    val out = canon(
      "http://ab.org/",
      "http://x.y.z.deepsite.net/q",
      "http://cdn.shop.co.uk/",
      "http://www.kyoto.ac.jp/",
      // 'co' second level but a LONG tld -> plain last-two rule
      "http://a.co.test/")
    assert(out.map(_._3) === Seq(
      "ab.org", "deepsite.net", "shop.co.uk", "kyoto.ac.jp", "co.test"))
  }

  test("host without path or query canonicalizes to the bare host") {
    val Seq((_, host, _, c)) = canon("https://www.solo.com")
    assert(host === "solo.com" && c === "solo.com")
  }

  test("a pre-existing reserved column fails fast instead of clobbering") {
    val withHost = Seq(("http://a.io/p", "pre")).toDF("url", "host")
    val e = intercept[IllegalArgumentException] {
      Urls.withCanonical(withHost, col("url"))
    }
    assert(e.getMessage.contains("host"))
  }
}
