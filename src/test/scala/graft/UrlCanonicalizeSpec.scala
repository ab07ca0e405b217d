package graft

import graft.functions.UrlCanonicalizeExpr

import org.apache.spark.sql.functions._

class UrlCanonicalizeSpec extends SparkSpec {

  private def canon(url: String): String =
    UrlCanonicalizeExpr(null).canonicalize(url)

  test("scheme and host casefold; default ports drop; explicit ports survive") {
    assert(canon("HTTP://Example.COM/x") === "http://example.com/x")
    assert(canon("http://example.com:80/x") === "http://example.com/x")
    assert(canon("https://example.com:443/x") === "https://example.com/x")
    assert(canon("http://example.com:8080/x") === "http://example.com:8080/x")
    assert(canon("https://example.com:80/x") === "https://example.com:80/x")
    assert(canon("http://user:p@Example.com/x") === "http://user:p@example.com/x")
  }

  test("dot segments resolve per RFC 3986 5.2.4") {
    assert(canon("http://h.io/a/./b/../c") === "http://h.io/a/c")
    assert(canon("http://h.io/a/b/..") === "http://h.io/a/")
    assert(canon("http://h.io/a/.") === "http://h.io/a/")
    assert(canon("http://h.io/../a") === "http://h.io/a")
    assert(canon("http://h.io/a//b") === "http://h.io/a//b") // empty segs preserved
    assert(canon("http://h.io") === "http://h.io/")
  }

  test("percent escapes: unreserved decode, others uppercase") {
    assert(canon("http://h.io/%7eq") === "http://h.io/~q")
    assert(canon("http://h.io/%7Eq") === "http://h.io/~q")
    assert(canon("http://h.io/a%2fb") === "http://h.io/a%2Fb") // reserved '/' stays escaped
    assert(canon("http://h.io/%41%2d") === "http://h.io/A-")
    assert(canon("http://h.io/p?x=%7e") === "http://h.io/p?x=~")
  }

  test("query: tracking params strip, pairs byte-sort, fragment drops") {
    assert(canon("http://h.io/p?utm_source=x&b=2&a=1#frag") === "http://h.io/p?a=1&b=2")
    assert(canon("http://h.io/p?b=2&a=1") === "http://h.io/p?a=1&b=2")
    assert(canon("http://h.io/p?fbclid=1&gclid=2&msclkid=3&utm_campaign=c")
      === "http://h.io/p")
    assert(canon("http://h.io/p#only-frag") === "http://h.io/p")
    assert(canon("http://h.io/p?") === "http://h.io/p")
  }

  test("non-URL and non-http input passes through unchanged") {
    assert(canon("not a url") === "not a url")
    assert(canon("ftp://h.io/x") === "ftp://h.io/x")
    assert(canon("mailto:a@b.c") === "mailto:a@b.c")
    assert(canon("") === "")
  }

  test("SQL surface: url_canonicalize registered and usable from spark.sql") {
    graft.functions.Registry.registerAll(spark)
    import spark.implicits._
    val out = Seq("HTTP://A.io:80/x/./y/../z?utm_source=s&b=1").toDF("u")
      .createOrReplaceTempView("urls")
    val r = spark.sql("SELECT url_canonicalize(u) AS c FROM urls").collect()
    assert(r.head.getString(0) === "http://a.io/x/z?b=1")
  }
}
