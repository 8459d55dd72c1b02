package graft.functions

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {

  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalize(col("url")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
      .toSeq

  test("canonicalize: case, www, default port, trailing slash, " +
      "tracking params, param order, fragment all fold") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag")
      === Seq("https://example.com/a/b?a=1&b=2"))
  }

  test("canonicalize: non-default port kept, root path restored") {
    assert(canon("http://example.com:8080/") ===
      Seq("http://example.com:8080/"))
    assert(canon("http://example.com:80") ===
      Seq("http://example.com/"))
    assert(canon("https://example.com") ===
      Seq("https://example.com/"))
  }

  test("canonicalize: http:80 default dropped but https:80 kept " +
      "(default is per scheme)") {
    assert(canon("https://example.com:80/x") ===
      Seq("https://example.com:80/x"))
    assert(canon("http://example.com:443/x") ===
      Seq("http://example.com:443/x"))
  }

  test("canonicalize: tracking params drop, bare params keep and " +
      "sort, empty query drops the '?'") {
    assert(canon("https://e.com/p?z&a=1&fbclid=123&gclid=9") ===
      Seq("https://e.com/p?a=1&z"))
    assert(canon("https://e.com/p?utm_medium=a&utm_campaign=b") ===
      Seq("https://e.com/p"))
  }

  test("canonicalize: no scheme means NULL — unparseable inputs opt " +
      "out of dedup, never merge") {
    assert(canon("not a url", "example.com/path", "") ===
      Seq(null, null, null))
  }

  test("canonicalize: distinct pages stay distinct (different host, " +
      "path, non-tracking query)") {
    val c = canon("https://a.com/x", "https://b.com/x",
      "https://a.com/y", "https://a.com/x?id=2")
    assert(c.distinct.size === 4)
  }

  test("canonicalize: a '?' inside the fragment is fragment text, " +
      "never a query (fragment strips FIRST)") {
    assert(canon("http://h.com/p#a?x=1") === Seq("http://h.com/p"))
    // and a '#' before the '?' ends parsing even mid-path
    assert(canon("http://h.com/p#frag",
      "http://h.com/p?a=1#frag?b=2") ===
      Seq("http://h.com/p", "http://h.com/p?a=1"))
  }

  test("percent normalization: unreserved triplets decode, reserved " +
      "triplets uppercase, malformed pass through") {
    // %7E/%7e -> '~' (unreserved decodes); %2f -> %2F (reserved
    // folds case but never decodes — no new '/' delimiter)
    assert(canon("https://e.com/%7Euser", "https://e.com/%7euser",
      "https://e.com/~user") ===
      Seq("https://e.com/~user", "https://e.com/~user",
        "https://e.com/~user"))
    assert(canon("https://e.com/a%2fb", "https://e.com/a%2Fb") ===
      Seq("https://e.com/a%2Fb", "https://e.com/a%2Fb"))
    // malformed: bad hex, lone trailing % — untouched
    assert(canon("https://e.com/a%G1b", "https://e.com/a%") ===
      Seq("https://e.com/a%G1b", "https://e.com/a%"))
    // decode applies in the query too, and the decoded form sorts
    // with the plain one
    assert(canon("https://e.com/p?x=%41&a=1") ===
      Seq("https://e.com/p?a=1&x=A"))
  }

  test("dot segments: /./ drops, /seg/../ pops, leading .. vanishes " +
      "at the root, %2E resolves as a dot AFTER percent decode") {
    assert(canon("https://e.com/a/./b", "https://e.com/a/x/../b",
      "https://e.com/a/b") ===
      Seq("https://e.com/a/b", "https://e.com/a/b",
        "https://e.com/a/b"))
    // leading '..' cannot climb above the root; chains resolve
    assert(canon("https://e.com/../a", "https://e.com/a/../../../b",
      "https://e.com/a/b/c/../../d") ===
      Seq("https://e.com/a", "https://e.com/b",
        "https://e.com/a/d"))
    // a path that collapses entirely restores '/'
    assert(canon("https://e.com/..", "https://e.com/a/..",
      "https://e.com/.") ===
      Seq("https://e.com/", "https://e.com/", "https://e.com/"))
    // '..' pops an EMPTY segment too (the RFC '//..' behavior)
    assert(canon("https://e.com/a//../b") === Seq("https://e.com/a/b"))
    // %2E is unreserved: it decodes to '.' first, THEN resolves
    assert(canon("https://e.com/a/%2E/b", "https://e.com/a/%2E%2E/b")
      === Seq("https://e.com/a/b", "https://e.com/b"))
    // dots inside a segment name are ordinary characters
    assert(canon("https://e.com/v1.2/x.html", "https://e.com/a..b")
      === Seq("https://e.com/v1.2/x.html", "https://e.com/a..b"))
  }

  test("normalizePercent alone: digits/letters decode, %25 ('%') " +
      "stays encoded so the fold is idempotent") {
    val out = Seq("100%25+%31%32%33", "%", "%%41", "a%25b")
      .toDF("s").select(Urls.normalizePercent(col("s")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("100%25+123", "%", "%A", "a%25b"))
  }
}
