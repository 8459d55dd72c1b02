package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

class UrlDedupSpec extends SparkSpec {

  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._

  private val corpus = Seq(
    (1L, "https://a.com/x?utm_source=f"),
    (2L, "HTTPS://WWW.a.com:443/x"), // same page as 1 → canonical 1
    (3L, "https://b.com/y"),
    (4L, "not a url")) // unparseable — never indexes
    .toDF("doc_id", "url")

  test("urlIndex: one row per canonical URL, min-id canonical, " +
      "variant accounting; unparseable never indexes") {
    val idx = UrlDedup.urlIndex(corpus, "doc_id", "url")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(idx === Map(
      "https://a.com/x" -> ((1L, 2L)),
      "https://b.com/y" -> ((3L, 1L))))
  }

  test("flagIncremental: delta probes the corpus index — variant " +
      "matches, new page misses, unparseable opts out") {
    val delta = Seq(
      (10L, "https://A.com/x/"), // variant of page 1 → dup of 1
      (11L, "https://c.com/z"), // new page
      (12L, "??!")) // unparseable
      .toDF("doc_id", "url")
    val out = UrlDedup.flagIncremental(delta, corpus, "doc_id", "url")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Boolean]("is_dup"),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out === Map(
      10L -> ((true, 1L)),
      11L -> ((false, -1L)),
      12L -> ((false, -1L))))
  }

  test("capPerHost: best-N by (score desc, id asc) per host, ties to " +
      "the smaller id, null hosts opt out uncapped") {
    val docs = Seq(
      (1L, "a.com", 10L), (2L, "a.com", 30L), (3L, "a.com", 30L),
      (4L, "a.com", 5L), // rank 4 on a.com → dropped at cap 2
      (5L, "b.com", 1L), // lone doc on b.com → kept
      (6L, null.asInstanceOf[String], 99L)) // null host → uncapped
      .toDF("doc_id", "host", "score")
    val out = UrlDedup.capPerHost(docs, "doc_id", "host", "score", 2)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) -1 else r.getInt(3),
          r.getAs[Boolean]("is_kept")))).toMap
    assert(out === Map(
      1L -> ((3, false)), // 10 ranks below both 30s
      2L -> ((1, true)), // 30, tie → smaller id first
      3L -> ((2, true)),
      4L -> ((4, false)),
      5L -> ((1, true)),
      6L -> ((-1, true)))) // null host: rank NULL, always kept
  }

  test("capPerHost: cap >= host size keeps everything; bad cap throws") {
    val docs = Seq((1L, "a.com", 1L), (2L, "a.com", 2L))
      .toDF("doc_id", "host", "score")
    assert(UrlDedup.capPerHost(docs, "doc_id", "host", "score", 5)
      .filter(col("is_kept")).count() === 2L)
    intercept[IllegalArgumentException] {
      UrlDedup.capPerHost(docs, "doc_id", "host", "score", 0)
    }
  }

  test("applyBlocklist: whole-host and path-prefix rules match the " +
      "CANONICAL key; clean hosts and unparseable URLs pass") {
    val docs = Seq(
      (1L, "HTTPS://WWW.Bad.example.ORG:443/anything?utm_source=x"),
      (2L, "https://ok.example.org/docs/page"),
      (3L, "https://mixed.example.org/private/secret"),
      (4L, "https://mixed.example.org/public/page"),
      (5L, "not a url")) // opts out — never blocked
      .toDF("doc_id", "url")
    val rules = Seq(("bad.example.org", "/"),
      ("mixed.example.org", "/private"))
      .toDF("host", "path_prefix")
    val out = UrlDedup.applyBlocklist(docs, rules, "doc_id", "url")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Boolean]("is_blocked"),
          Option(r.getAs[String]("blocked_prefix")).getOrElse("-"))))
      .toMap
    assert(out === Map(
      1L -> ((true, "/")), // case/www/port/param games don't dodge
      2L -> ((false, "-")),
      3L -> ((true, "/private")),
      4L -> ((false, "-")),
      5L -> ((false, "-"))))
  }
}
