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
}
