package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.plans.UrlCanon

/** URL canonicalization rules and edge cases; the dedup composition is
  * cd3's VALUES oracle. */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  test("core rules: case, ports, fragments, tracking params, order, slashes") {
    UrlCanon.canonicalize(
      " HTTP://Example.COM:80/a/?utm_source=x&b=2&a=1#frag ") shouldBe
      "http://example.com/a?a=1&b=2"
    UrlCanon.canonicalize("https://example.com:443/a/") shouldBe
      "https://example.com/a"
    UrlCanon.canonicalize("https://example.com:8443/a") shouldBe
      "https://example.com:8443/a" // non-default port kept
    UrlCanon.canonicalize("http://example.com") shouldBe "http://example.com/"
    UrlCanon.canonicalize("http://example.com/") shouldBe "http://example.com/"
    UrlCanon.canonicalize("http://example.com/b?gclid=z&fbclid=y") shouldBe
      "http://example.com/b" // tracking-only query drops the '?'
    UrlCanon.canonicalize("http://example.com/p?z=1&a=2&a=1") shouldBe
      "http://example.com/p?a=1&a=2&z=1" // duplicates kept, sorted
  }

  test("safety rails: userinfo, IPv6, non-http schemes, relative, garbage") {
    UrlCanon.canonicalize("http://user@EXAMPLE.com:8080/x") shouldBe
      "http://user@example.com:8080/x"
    // IPv6 literal: the port split must not cut inside the brackets
    UrlCanon.canonicalize("http://[2001:DB8::1]/x") shouldBe
      "http://[2001:db8::1]/x"
    UrlCanon.canonicalize("http://[::1]:8080/x") shouldBe
      "http://[::1]:8080/x"
    UrlCanon.canonicalize("http://[::1]:80/x") shouldBe "http://[::1]/x"
    // non-http schemes: scheme lowercased, the rest untouched
    UrlCanon.canonicalize("FTP://Files.example.com/Data") shouldBe
      "ftp://Files.example.com/Data"
    // no scheme → trimmed passthrough (cannot canonicalize safely)
    UrlCanon.canonicalize("  relative/path?x=1 ") shouldBe "relative/path?x=1"
    UrlCanon.canonicalize("://broken") shouldBe "://broken"
    UrlCanon.canonicalize("1ab://odd") shouldBe "1ab://odd" // bad scheme head
    // percent-encoding and dot segments deliberately untouched
    UrlCanon.canonicalize("http://example.com/a%2Fb/../c") shouldBe
      "http://example.com/a%2Fb/../c"
  }

  test("Column and SQL forms agree with the driver function, null propagates") {
    val rows = Seq((1L, Some("HTTP://A.com:80/p/?utm_x=1&k=v")), (2L, None))
      .toDF("id", "url")
    val viaCol = rows.select(col("id"), T.canonicalUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    viaCol(1L) shouldBe Some(UrlCanon.canonicalize("HTTP://A.com:80/p/?utm_x=1&k=v"))
    viaCol(2L) shouldBe None
    rows.createOrReplaceTempView("url_sql_view")
    val viaSql = spark.sql(
      "SELECT id, graft_canonical_url(url) AS c FROM url_sql_view")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    viaSql shouldBe viaCol
  }
}
