package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.UrlOps

class UrlsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(s: String): String = UrlOps.canonical(s)

  test("canonicalization rules: case, www, default port, fragment, tracking, sort, trailing slash") {
    assert(canon("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag")
      == "https://example.com/a/b?a=1&b=2")
    assert(canon("http://example.com:80/") == "http://example.com")
    assert(canon("http://example.com:8080/x") == "http://example.com:8080/x")
    // https on port 80 is NOT default — stays
    assert(canon("https://example.com:80/x") == "https://example.com:80/x")
    assert(canon("http://a.com/p?fbclid=1&gclid=2&ref=nav&utm_medium=m")
      == "http://a.com/p")
    // path case and internal duplicate slashes are semantic — preserved
    assert(canon("http://A.com//X//Y/") == "http://a.com//X//Y")
    // userinfo passes through; root path canonicalizes away
    assert(canon("ftp://user:pw@Host.com/") == "ftp://user:pw@host.com")
    // empty params drop; equal spellings converge
    assert(canon("http://a.com/p?&&b=2&a=1&")
      == canon("http://a.com/p/?a=1&b=2#x"))
    // www-only host does NOT strip to empty (nothing follows the
    // prefix, so the rule leaves it alone)
    assert(canon("http://www./x") == "http://www./x")
  }

  test("not-a-URL inputs are NULL, never exceptions") {
    for (bad <- Seq("", "   ", "example.com/path", "://x", "1http://a.com",
        "http//a.com", "http://", "http://#f"))
      assert(canon(bad) == null, s"input: '$bad'")
  }

  test("column expression: null in → null out; codegen parity under CODEGEN_ONLY") {
    val factory = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(factory)
    try {
      spark.conf.set(factory, "CODEGEN_ONLY")
      val out = Seq(("HTTP://WWW.A.com:80/p/?b=2&a=1#z"), (null: String))
        .toDF("u")
        .select(graft.functions.UrlF.canonUrl(col("u"))).collect()
      assert(out(0).getString(0) == "http://a.com/p?a=1&b=2")
      assert(out(1).isNullAt(0))
    } finally {
      prev.fold(spark.conf.unset(factory))(spark.conf.set(factory, _))
    }
  }

  test("canonicalization is idempotent: canon(canon(u)) == canon(u) over randomized messy URLs") {
    // a canonical form that re-canonicalizes differently would make the
    // dedup key depend on how many times a pipeline stage ran
    val rnd = new scala.util.Random(99)
    val schemes = Seq("http", "HTTPS", "ftp")
    val hosts = Seq("WWW.A-b.com", "x.Y.org", "www.site.co.uk", "HOST.io")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/", "/A/b/", "//x//", "/p")
    val queries = Seq("", "?b=2&a=1", "?utm_source=x&z=1&", "?a=1&a=0")
    val frags = Seq("", "#f", "#a?b=1")
    for (_ <- 1 to 200) {
      def pick(xs: Seq[String]) = xs(rnd.nextInt(xs.length))
      val u = s"${pick(schemes)}://${pick(hosts)}${pick(ports)}" +
        s"${pick(paths)}${pick(queries)}${pick(frags)}"
      val c1 = canon(u)
      assert(c1 != null, s"url: $u")
      assert(canon(c1) == c1, s"not idempotent: $u -> $c1 -> ${canon(c1)}")
    }
  }

  test("urlDedup collapses spelling variants to one key; survivors keep unparseable rows") {
    val df = Seq(
      (1L, "https://www.Site.com/a/?utm_source=x"),
      (2L, "HTTPS://site.com:443/a"),
      (3L, "https://site.com/a#top"),
      (4L, "https://site.com/b"),
      (5L, "not a url"),
    ).toDF("doc_id", "url")
    val keys = Urls.urlDedup(df, "doc_id", "url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(keys == Set(("https://site.com/a", 1L, 3L),
      ("https://site.com/b", 4L, 1L)))
    val surv = Urls.urlSurvivors(df, "doc_id", "url")
      .collect().map(_.getLong(0)).toSet
    assert(surv == Set(1L, 4L, 5L))
  }
}
