package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact span-level dedup: pair counts, the whole-doc fallback for short
  * documents, the hub cap, and the doc-level flag agreeing with the pair
  * form.
  */
class SpanDedupSpec extends SparkSpec {

  // spans of 4 tokens; the copied passage is 6 tokens -> 3 shared spans
  private val passage = "one two three four five six"

  private def docs: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, s"intro a1 b1 $passage outro c1"),
      (2L, s"other d2 e2 f2 $passage tail"),
      (3L, "nothing shared here at all in this document whatsoever"),
      (4L, "tiny doc"), // < 4 tokens: whole-doc fallback span
      (5L, "tiny doc") // exact short dup -> pairs via the fallback span
    ).toDF("doc_id", "text")
  }

  test("sharedSpanPairs counts distinct shared k-spans; short docs pair " +
      "via the whole-doc fallback") {
    val pairs = SpanDedup
      .sharedSpanPairs(docs, "doc_id", "text", spanTokens = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    // docs 1,2 share the 6-token passage: sliding 4-grams of it that are
    // intact in both = 3 ("one two three four", "two three four five",
    // "three four five six"); docs 4,5 share their single fallback span
    assert(pairs === Seq((1L, 2L, 3L), (4L, 5L, 1L)))
  }

  test("hub cap excludes template spans from pair generation") {
    val s = spark
    import s.implicits._
    // 5 docs all carrying the same span: with maxDf=4 the span is a hub
    // and generates NO pairs; with the default it generates all C(5,2)
    val hub = (1L to 5L).map(i => (i, s"$passage filler$i pad$i more$i"))
      .toDF("doc_id", "text")
    val capped = SpanDedup
      .sharedSpanPairs(hub, "doc_id", "text", spanTokens = 4, maxDf = 4)
      .count()
    assert(capped === 0L)
    val uncapped = SpanDedup
      .sharedSpanPairs(hub, "doc_id", "text", spanTokens = 4, maxDf = 50)
      .groupBy().agg(countDistinct(col("a_id"), col("b_id"))).collect()
      .head.getLong(0)
    assert(uncapped === 10L)
  }

  test("containmentVerifiedPairs equals the quadratic baseline restricted " +
      "to span-sharing candidates, on the real sf0.001 corpus") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val tau = 0.6
    val verified = SpanDedup
      .containmentVerifiedPairs(corpus, "doc_id", "text", tau = tau)
      .select("a_id", "b_id", "cont").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // quadratic baseline: every ordered pair at containment >= tau
    val t = corpus.select(col("doc_id"), array_distinct(
      graft.functions.TextFunctions.tokens(col("text"))).as("toks"))
    val baseline = t.as("a").join(t.as("b"),
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        round(graft.functions.DedupFunctions
          .containment(col("a.toks"), col("b.toks")), 4).as("cont"))
      .filter(col("cont") >= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // the production path is a SUBSET of the baseline (no false
    // admissions: verify is exact)...
    assert(verified.keySet.subsetOf(baseline.keySet),
      s"false admissions: ${verified.keySet.diff(baseline.keySet)}")
    verified.foreach { case (k, c) => assert(baseline(k) === c) }
    // ...and is EXACTLY the baseline restricted to span-sharing
    // candidates (the declared recall bound: pairs with no shared
    // 12-token span are MinHash territory, not span evidence)
    val candPairs = SpanDedup
      .sharedSpanPairs(corpus, "doc_id", "text", spanTokens = 12)
      .select("a_id", "b_id").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0)))).toSet
    assert(verified.keySet === baseline.keySet.intersect(candPairs))
    assert(verified.nonEmpty, "fixture should produce verified pairs")
  }

  test("weighted containment: ubiquitous-token overlap passes the plain " +
      "verify but fails the idf-weighted one; distinctive overlap " +
      "passes both") {
    val s = spark
    import s.implicits._
    val span = (1 to 12).map(i => s"s$i")  // tokens made COMMON below
    val span2 = (1 to 12).map(i => s"t$i") // tokens that stay rare
    val docs = (Seq(
      (1L, (span ++ (1 to 6).map(i => s"a$i")).mkString(" ")),
      (2L, (span ++ (1 to 6).map(i => s"b$i")).mkString(" ")),
      (3L, (span2 ++ (1 to 6).map(i => s"r$i")).mkString(" ")),
      (4L, (span2 ++ (1 to 6).map(i => s"r$i")).mkString(" "))
    ) ++ (5L to 20L).map { i =>
      // background: span-S TOKENS (reversed, so never span S itself)
      // in 16 of 20 docs -> df(s*) = 18/20, idf weight ~ ln(20/18)
      (i, (span.reverse :+ s"x$i").mkString(" "))
    }).toDF("doc_id", "text")

    // plain containment: (1,2) passes on common-token mass alone
    // (12 shared of 18 = 0.67), as does the true dup (3,4)
    val plain = SpanDedup
      .containmentVerifiedPairs(docs, "doc_id", "text", tau = 0.6)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain.contains((1L, 2L)) && plain.contains((3L, 4L)))

    // idf-weighted: the s* tokens carry ~ln(20/18) each vs ln(20) for
    // the distinctive ones, so (1,2) collapses to ~0.07 while the true
    // dup (3,4) stays at 1.0 — only distinctive overlap survives
    val weighted = SpanDedup
      .weightedContainmentVerifiedPairs(docs, "doc_id", "text", tau = 0.6)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(weighted.contains((3L, 4L)) && weighted((3L, 4L)) === 1.0)
    assert(weighted.contains((4L, 3L)))
    assert(!weighted.keySet.exists(p => p == ((1L, 2L)) || p == ((2L, 1L))),
      s"common-token pair survived the idf weighting: $weighted")
  }

  test("flagSpanDuplicated agrees with the pair form and keeps all rows") {
    val flagged = SpanDedup
      .flagSpanDuplicated(docs, "doc_id", "text", spanTokens = 4)
    assert(flagged.count() === docs.count())
    val dupIds = flagged.filter(col("has_dup_span"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairIds = SpanDedup
      .sharedSpanPairs(docs, "doc_id", "text", spanTokens = 4)
      .select(explode(array(col("a_id"), col("b_id"))).as("id"))
      .collect().map(_.getLong(0)).toSet
    assert(dupIds === pairIds)
    // per-doc distinct shared-span count matches the passage arithmetic
    val n1 = flagged.filter(col("doc_id") === 1L)
      .select("n_dup_spans").collect().head.getLong(0)
    assert(n1 === 3L)
  }

  test("removeDuplicateTiles keeps first occurrences (cross- AND " +
      "within-doc), reassembles in order, and preserves clean docs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // 2 tiles of 2: "a b" / "c d"
      (0L, "a b c d"),
      // wholesale aligned copy of doc 0 -> fully removed
      (1L, "a b c d"),
      // first tile repeats doc 0's "a b"; second tile "x y" is original
      (2L, "a b x y"),
      // within-doc repeat: "p q" twice -> second occurrence removed
      (3L, "p q p q"),
      // clean doc, odd length -> partial last tile kept
      (4L, "m n o"),
      (5L, "")
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateTiles(df, "doc_id", "text",
        tileTokens = 2)
      .select(col("doc_id"), col("n_tiles"), col("n_removed"),
        col("clean_text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) === ((2L, 0L, "a b c d")))
    assert(out(1L) === ((2L, 2L, "")), "aligned copy must vanish")
    assert(out(2L) === ((2L, 1L, "x y")))
    assert(out(3L) === ((2L, 1L, "p q")), "within-doc repeat collapses")
    assert(out(4L) === ((2L, 0L, "m n o")), "partial last tile survives")
    assert(out(5L) === ((0L, 0L, "")), "empty doc: no tiles, empty text")

    val plan = SpanDedup.removeDuplicateTiles(df, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
