package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** The CCNet-style bigram LM scorer on a hand-computable fixture, plus
  * the discriminative property on the real corpus (training-split text
  * scores above shuffled/garbled text).
  */
class NgramLmSpec extends SparkSpec {

  test("add-alpha bigram log-probs match hand-computed values and rank " +
      "seen text above unseen above OOV-context") {
    val s = spark
    import s.implicits._
    val train = Seq(
      (1L, "a b a b"),
      (2L, "a c")
    ).toDF("doc_id", "text")
    // unigrams: a=3 b=2 c=1 -> V=3; bigrams: (a,b)=2 (b,a)=1 (a,c)=1
    val lm = NgramLm.train(train, "doc_id", "text")
    assert(lm.vocab === 3L)
    val scored = NgramLm.logProbScore(
        Seq((10L, "a b"), (11L, "b z"), (12L, "z z")).toDF("doc_id", "text"),
        "doc_id", "text", lm, alpha = 0.4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Double]("avg_lp"))))
      .toMap
    // seen pair:   ln((2+0.4)/(3+1.2))  = ln(2.4/4.2) = -0.5596
    // unseen pair: ln((0+0.4)/(2+1.2))  = ln(0.4/3.2) = -2.0794
    // OOV context: ln((0+0.4)/(0+1.2))  = ln(1/3)     = -1.0986
    assert(scored(10L) === ((1L, -0.5596)))
    assert(scored(11L) === ((1L, -2.0794)))
    assert(scored(12L) === ((1L, -1.0986)))
    // a doc below two tokens emits no row (no bigram to score)
    val none = NgramLm.logProbScore(
      Seq((13L, "solo")).toDF("doc_id", "text"), "doc_id", "text", lm)
    assert(none.count() === 0L)
  }

  test("trigram order: 3-gram over 2-gram context, hand-computed") {
    val s = spark
    import s.implicits._
    // trigrams: "a b c"x2 "b c a" "c a b"; contexts: "a b"x2 "b c"x2
    // "c a"; V = 3 distinct tokens
    val train = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val lm = NgramLm.train(train, "doc_id", "text", n = 3)
    assert(lm.n === 3 && lm.vocab === 3L)
    val scored = NgramLm.logProbScore(
        Seq((10L, "a b c"), (11L, "b c b"), (12L, "a b")).toDF("doc_id", "text"),
        "doc_id", "text", lm, alpha = 0.4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Double]("avg_lp"))))
      .toMap
    // seen:   ln((2+0.4)/(2+1.2)) = ln(0.75)    = -0.2877
    // unseen: ln((0+0.4)/(2+1.2)) = ln(0.4/3.2) = -2.0794
    assert(scored(10L) === ((1L, -0.2877)))
    assert(scored(11L) === ((1L, -2.0794)))
    // below-order docs emit no row (no fallback in LM counting)
    assert(!scored.contains(12L))
  }

  test("on the real corpus, text built from frequent train bigrams " +
      "outscores never-seen word pairs end-to-end") {
    // NOTE: the synthetic fixture's text is near-random word draws, so
    // natural vs shuffled text CANNOT separate (no sequential structure
    // to learn — measured: -3.45 vs -3.44). The property a bigram LM
    // must deliver regardless is frequency discrimination: text of
    // high-count train bigrams scores far above out-of-vocabulary
    // garble. This runs the full explode→join→aggregate path against
    // the real count tables.
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val s = spark
    import s.implicits._
    val lm = NgramLm.train(docs.filter(col("doc_id") < 250),
      "doc_id", "text")
    val top = lm.ngrams
      .orderBy(col("c_n").desc, col("gram")).limit(20)
      .collect().map(_.getString(0))
    val frequentText = top.mkString(" ")
    val garbleText = (1 to 40).map(i => s"qzx$i").mkString(" ")
    val scored = NgramLm.logProbScore(
        Seq((1L, frequentText), (2L, garbleText)).toDF("doc_id", "text"),
        "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_lp")).toMap
    info(f"avg ln-prob: frequent-bigram text ${scored(1L)}%.3f vs " +
      f"OOV garble ${scored(2L)}%.3f (train vocab ${lm.vocab})")
    // the fixture vocabulary is tiny (~31 words, near-uniform draws), so
    // every probability sits near ln(1/V) and margins are structurally
    // small — the ORDERING is the property (measured ~0.26 apart); real
    // corpora with Zipfian vocabularies separate by several nats
    assert(scored(1L) > scored(2L) + 0.1,
      s"bigram LM failed to separate frequent from OOV text: $scored")
  }
}
