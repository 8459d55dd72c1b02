package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.Row

/** Gopher repetition suite: hand-computed signal values, coverage (not
  * count) semantics for duplicated grams, deterministic top-gram
  * tie-break, and degenerate-document guards.
  */
class RepetitionSpec extends SparkSpec {

  private def signals(rows: Seq[(Long, String)]): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    Repetition.gopherSignals(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("hand-computed signals on crafted documents") {
    val m = signals(Seq(
      (1L, "a b a b"),          // pure repetition
      (2L, "one two three four"), // all distinct bigrams
      (3L, "xx")))              // shorter than the gram order
    // doc 1: top bigram "a b" count 2, char mass 2 -> 4/4; coverage =
    // every position (the "abab..." ~1.0 property)
    assert(m(1L).getAs[Double]("top_ngram_char_frac") === 1.0)
    assert(m(1L).getAs[Double]("dup_ngram_char_frac") === 1.0)
    assert(m(1L).getAs[Double]("mean_word_len") === 1.0)
    // doc 2: no duplicated bigram -> coverage 0; top = the char-longest
    // single-occurrence bigram "three four" (charlen 9 of 15)
    assert(m(2L).getAs[Double]("dup_ngram_char_frac") === 0.0)
    assert(m(2L).getAs[Double]("top_ngram_char_frac") === 9.0 / 15.0)
    // doc 3: one token, no bigram at all -> both fractions 0
    assert(m(3L).getAs[Double]("top_ngram_char_frac") === 0.0)
    assert(m(3L).getAs[Double]("dup_ngram_char_frac") === 0.0)
    assert(m(3L).getAs[Long]("n_words") === 1L)
  }

  test("coverage counts each position once under overlapping duplicates") {
    // "a a a a a": every bigram is "a a" (count 4) and every one of the
    // 5 positions is covered exactly once -> coverage 1.0 while the
    // naive occurrence-sum would claim 8/5
    val m = signals(Seq((1L, "a a a a a")))
    assert(m(1L).getAs[Double]("dup_ngram_char_frac") === 1.0)
    // top fraction IS occurrence mass by definition (4 hits x 2 chars
    // over 5) — the published metric deliberately exceeds 1 on
    // degenerate repetition, which is exactly what it is for
    assert(m(1L).getAs[Double]("top_ngram_char_frac") === 8.0 / 5.0)
  }

  test("top-gram tie-break is (count, char-length, gram) descending") {
    // "u v u v xxx yyy xxx yyy": "u v" and "xxx yyy" both occur twice;
    // the longer gram wins on char length (6 > 2), mass 12 of 16
    val m = signals(Seq((1L, "u v u v xxx yyy xxx yyy")))
    assert(m(1L).getAs[Double]("top_ngram_char_frac") === 12.0 / 16.0)
  }

  test("shape signals: alpha fraction, symbol ratio, degenerate docs") {
    val m = signals(Seq(
      (1L, "123 456 abc"),
      (2L, "### hello ... world"),
      (3L, "   ")))
    assert(m(1L).getAs[Double]("alpha_word_frac") === 1.0 / 3.0)
    // doc 2: 3 '#' chars + one '...' = 4 symbols over 4 words
    assert(m(2L).getAs[Double]("symbol_word_ratio") === 1.0)
    // whitespace-only doc: 0 words -> null ratios, never NaN
    assert(m(3L).getAs[Long]("n_words") === 0L)
    assert(m(3L).isNullAt(m(3L).fieldIndex("mean_word_len")))
    assert(m(3L).isNullAt(m(3L).fieldIndex("top_ngram_char_frac")))
  }

  test("annotateGopher names the first failing rule; corpus mix is sane") {
    val s = spark
    import s.implicits._
    val t = Repetition.Thresholds(minWords = 2, minMeanWordLen = 0.5)
    val docs = Seq(
      (1L, "solo"),                      // min_words
      (2L, "### ### ### real words"),    // symbol_ratio
      (3L, "1 2 3 4 5"),                 // alpha_frac
      (4L, "a b a b a b"),               // top_ngram
      (5L, "calm plain text with many small bits and more words that " +
        "keep the ratio low here")
    ).toDF("doc_id", "text")
    val out = Repetition.annotateGopher(docs, "doc_id", "text", t)
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[String]("drop_reason"))).toMap
    assert(out(1L) === Some("min_words"))
    assert(out(2L) === Some("symbol_ratio"))
    assert(out(3L) === Some("alpha_frac"))
    assert(out(4L) === Some("top_ngram"))
    assert(out(5L) === None)

    // real corpus: every row tagged exactly once, both verdicts present
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val tagged = Repetition.annotateGopher(corpus, "doc_id", "text")
    assert(tagged.count() === corpus.count())
    val reasons = tagged.groupBy("drop_reason").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(reasons.contains(None), "thresholds ate the whole corpus")
    assert(reasons.size > 1, "no rule ever fired on the corpus")
  }
}
