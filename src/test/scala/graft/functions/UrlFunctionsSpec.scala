package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

class UrlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlFunctions.canonicalUrl(col("url")))
      .as[String].collect().toSeq

  test("case, default ports, fragments, trailing slashes normalize away") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/a/b/?x=1#frag",
      "https://www.example.com/a/b?x=1",
      "HTTP://host.org:80/",
      "http://host.org"
    ) === Seq(
      "https://www.example.com/a/b?x=1",
      "https://www.example.com/a/b?x=1",
      "http://host.org",
      "http://host.org"))
  }

  test("non-default ports and cross-scheme default ports are kept") {
    assert(canon(
      "http://h.io:8080/p",
      "http://h.io:443/p", // 443 is NOT http's default
      "https://h.io:80/p"  // 80 is NOT https' default
    ) === Seq(
      "http://h.io:8080/p",
      "http://h.io:443/p",
      "https://h.io:80/p"))
  }

  test("utm params drop, the rest sort, empty query collapses") {
    assert(canon(
      "https://a.co/p?utm_source=x&b=2&a=1&utm_campaign=y",
      "https://a.co/p?a=1&b=2",
      "https://a.co/p?utm_source=x",
      "https://a.co/p?"
    ) === Seq(
      "https://a.co/p?a=1&b=2",
      "https://a.co/p?a=1&b=2",
      "https://a.co/p",
      "https://a.co/p"))
  }

  test("registered domain takes the last two labels") {
    val got = Seq("www.shop.example.com", "example.com", "localhost")
      .toDF("h").select(UrlFunctions.registeredDomain(col("h")))
      .as[String].collect().toSeq
    assert(got === Seq("example.com", "example.com", ""))
  }

  test("native canonicalParts is bit-equal to the relational reference") {
    // adversarial corpus: malformed schemes, empty authorities, '?' in
    // fragments, repeated/trailing separators, consecutive-dot hosts,
    // non-default ports, non-ASCII params, bare strings
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/a/b/?x=1#frag",
      "http://h.io:8080/p", "https://h.io:80/p", "http://h.io:443/p",
      "http://h:80:80/p", // only the TRAILING :80 strips
      "https://a.co/p?utm_source=x&b=2&a=1&utm_campaign=y",
      "https://a.co/p?", "https://a.co/p?&&a=1&utm_x=2&A=1&b",
      "http://h/p?z=9&a=\u00e9&y=2", // non-ASCII param value
      "http://h/p#frag?x=1",         // first '?' is inside the fragment
      "http://?x=1", "http://#f", "http://",
      "http://a..b/p", "http://x.a..b/p", "http://a.b./p",
      "HtTp://MiXeD.CaSe.Org//", "ftp://X.Y:21/a//",
      "a:b://x", "ab:cd://x", "a.b://x/y", "h2+x-y://H/P",
      "", "notaurl", "www.example.com/x", "a?b#c", "?only=query",
      "http:/missing", "http://h/p???a=1", "http://h/p?a=1&a=1&a=0")
    val df = urls.toDF("url")
    val got = df.select(
      UrlFunctions.canonicalUrl(col("url")).as("c"),
      UrlFunctions.canonicalParts(col("url")).getField("reg_domain").as("d"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val want = df.select(
      UrlFunctions.relationalCanonicalUrl(col("url")).as("c"),
      UrlFunctions.registeredDomain(UrlFunctions.urlHost(col("url"))).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === want)
  }

  test("x26: groups are exactly the canonical cells; collapsing conserves rows") {
    val d = "/root/testdata/sf0.001"
    val out = graft.ExtensionQueries.x26UrlCanonical(spark, d).collect()
    assert(out.nonEmpty)
    // conservation: every key lands in exactly one canonical cell
    val keys = graft.Tables.orders(spark, d)
      .select(col("o_orderkey")).as[Long].collect()
    assert(out.map(_.getLong(2)).sum === keys.length.toLong)
    // the parser must recover EXACTLY the cell structure the synthesis
    // encodes: (scheme-pair, host%7, path%13, id%11) — group count equals
    // the distinct cell count computed straight from the key arithmetic,
    // so every multi-key cell really collapsed and no cell split
    val cells = keys.map(k =>
      (if (k % 4 < 2) "http" else "https", k % 7, k % 13, k % 11))
      .distinct.length
    assert(out.length === cells)
    assert(out.forall(r => r.getString(0).startsWith("http") &&
      !r.getString(0).contains("utm_") && !r.getString(0).contains("#")))
  }
}
