package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction, OOV accounting, and boilerplate flagging
  * on corpora small enough to verify by hand.
  */
class KeywordsBoilerplateSpec extends SparkSpec {

  test("tfIdfTopTerms: corpus-wide terms score zero, distinctive terms " +
      "rank first") {
    val s = spark
    import s.implicits._
    // "common" appears in every doc (idf = ln(1) = 0); each doc has one
    // distinctive repeated term that must rank first
    val docs = Seq(
      (1L, "common alpha alpha alpha common"),
      (2L, "common beta beta common filler"),
      (3L, "common gamma gamma gamma gamma")
    ).toDF("doc_id", "text")
    val top = Keywords.tfIdfTopTerms(docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top === Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
    val all = Keywords.tfIdfTopTerms(docs, "doc_id", "text", k = 10)
    val commonScores = all.filter(col("token") === "common")
      .select("tfidf").collect().map(_.getDouble(0))
    assert(commonScores.nonEmpty && commonScores.forall(_ === 0.0),
      "a token in every document must score ln(N/N) = 0")
  }

  test("oovAgainstVocab counts exactly the tokens outside the vocab") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "aa bb cc dd"), // 2 OOV of 4
      (2L, "aa aa aa"),    // 0 OOV
      (3L, "zz yy")        // all OOV
    ).toDF("doc_id", "text")
    val vocab = Seq("aa", "bb").toDF("token")
    val out = Keywords.oovAgainstVocab(docs, "doc_id", "text", vocab)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("oov_per_1000"))))
      .toMap
    assert(out(1L) === ((4L, 2L, 500L)))
    assert(out(2L) === ((3L, 0L, 0L)))
    assert(out(3L) === ((2L, 2L, 1000L)))
  }

  test("flagBoilerplate: templated docs flagged, unique docs not") {
    val s = spark
    import s.implicits._
    val template = "all rights reserved cookie banner"
    // 4 docs share the template 5-gram; two are ONLY template (flagged),
    // two bury it under enough unique grams to stay clean
    val docs = Seq(
      (1L, template),
      (2L, template),
      (3L, s"$template unique alpha beta gamma delta epsilon zeta eta " +
        "theta iota kappa"),
      (4L, s"$template other words entirely different content here too " +
        "again more"),
      (5L, "completely unique document with no shared phrasing at all ok")
    ).toDF("doc_id", "text")
    val out = Boilerplate.flagBoilerplate(docs, "doc_id", "text",
        n = 5, minDf = 3, maxFraction = 0.5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_boilerplate"))
      .toMap
    assert(out(1L) && out(2L), "pure-template docs must be flagged")
    assert(!out(3L) && !out(4L) && !out(5L),
      s"diluted/unique docs must pass: $out")
  }

  test("gramDocFrequencies counts documents, not occurrences") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e a b c d e"), // gram "a b c d e" twice in ONE doc
      (2L, "a b c d e")
    ).toDF("doc_id", "text")
    val df5 = Boilerplate.gramDocFrequencies(docs, "doc_id", "text", 5)
      .filter(col("gram") === "a b c d e")
      .select("df").collect().map(_.getLong(0))
    assert(df5.toSeq === Seq(2L),
      "per-doc distinct shingles: df counts docs")
  }

  test("zipfFit: hand-computed least squares; a geometric corpus fits " +
      "steeply negative, a uniform one fits flat") {
    val s = spark
    import s.implicits._
    // freqs a=4 b=2 c=1 -> ranks 1,2,3: x=ln(1,2,3), y=ln(4,2,1)
    val tiny = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val row = Keywords.zipfFit(tiny, "doc_id", "text").collect().head
    val (x, y) = (Seq(1.0, 2.0, 3.0).map(math.log),
      Seq(4.0, 2.0, 1.0).map(math.log))
    val n = 3.0
    val (sx, sy) = (x.sum, y.sum)
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val sxx = x.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(row.getLong(0) === 3L && row.getLong(1) === 7L)
    assert(row.getDouble(2) ===
      BigDecimal(slope).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)

    // discriminative: word k repeated 2^(8-k) times is Zipf-like
    // (slope near -1 in log-log); 16 words once each is flat (0/0
    // degenerate avoided by distinct ranks -> slope exactly 0 since all
    // freqs equal: y constant)
    val zipfText = (1 to 8).flatMap(k => Seq.fill(1 << (8 - k))(s"w$k"))
      .mkString(" ")
    val zSlope = Keywords.zipfFit(
        Seq((1L, zipfText)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head.getDouble(2)
    val uniformText = (1 to 16).map(k => s"u$k").mkString(" ")
    val uSlope = Keywords.zipfFit(
        Seq((1L, uniformText)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head.getDouble(2)
    info(f"slope: geometric $zSlope%.3f vs uniform $uSlope%.3f")
    assert(zSlope < -1.5, s"geometric corpus must fit steeply: $zSlope")
    assert(uSlope === 0.0, s"equal frequencies must fit flat: $uSlope")

    // a one-word vocabulary has no line to fit: null, never NaN
    val degenerate = Keywords.zipfFit(
        Seq((1L, "same same same")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().head
    assert(degenerate.getLong(0) === 1L && degenerate.isNullAt(2) &&
      degenerate.isNullAt(3))
  }

  test("heapsFit: linear vocab growth fits beta near 1, a closed " +
      "vocabulary fits near 0, totals are exact, tiny corpora " +
      "degenerate to null") {
    val s = spark
    import s.implicits._
    // every doc introduces 5 brand-new words: V(N) = N exactly -> the
    // log-log fit must be beta = 1 through every checkpoint
    val novel = (0L until 64L).map(d =>
      (d, (0 until 5).map(k => s"w${d}_$k").mkString(" ")))
      .toDF("doc_id", "text")
    val nRow = Keywords.heapsFit(novel, "doc_id", "text").collect().head
    assert(nRow.getAs[Long]("n_tokens") === 320L)
    assert(nRow.getAs[Long]("n_vocab") === 320L)
    assert(math.abs(nRow.getAs[Double]("beta") - 1.0) < 1e-9,
      s"pure novelty must fit beta=1: $nRow")

    // the same 5 words in every doc: vocabulary closed after doc 0
    val closed = (0L until 64L).map(d => (d, "a b c d e"))
      .toDF("doc_id", "text")
    val cRow = Keywords.heapsFit(closed, "doc_id", "text").collect().head
    assert(cRow.getAs[Long]("n_vocab") === 5L)
    assert(cRow.getAs[Double]("beta") === 0.0,
      s"closed vocabulary must fit beta=0: $cRow")

    // one doc: a single checkpoint has no line to fit
    val one = Keywords.heapsFit(
        Seq((0L, "a b c")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(one.isNullAt(one.fieldIndex("beta")) &&
      one.isNullAt(one.fieldIndex("ln_k")), s"degenerate: $one")
  }

  test("pmiTopBigrams: hand-computed PMI, minCount floor, rounded-grid " +
      "tie-break, and single-token docs contribute nothing") {
    val s = spark
    import s.implicits._
    // bigram stream: doc1 (new,york)(york,new)(new,york); doc2
    // (new,york)(york,is)(is,big); doc3 (the,city)(city,is)(is,big);
    // doc4 has no bigrams. T = 9.
    // c(new york)=3, c(is big)=2, every other bigram hapax.
    // unigrams: new=3 york=3 is=2 big=2 the=1 city=2 solo=1.
    // pmi(is big) = ln(2*9/(2*2)) = ln 4.5 = 1.5041 ranks above
    // pmi(new york) = ln(3*9/(3*3)) = ln 3 = 1.0986.
    val docs = Seq(
      (1L, "new york new york"),
      (2L, "new york is big"),
      (3L, "the city is big"),
      (4L, "solo")
    ).toDF("doc_id", "text")
    val out = Keywords.pmiTopBigrams(docs, "doc_id", "text",
        k = 5, minCount = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("is big", 2L, 2L, 2L, 1.5041),
      ("new york", 3L, 3L, 3L, 1.0986)),
      s"hapax bigrams must be floored out: ${out.toSeq}")
    // k truncates after the deterministic order
    val top1 = Keywords.pmiTopBigrams(docs, "doc_id", "text",
        k = 1, minCount = 2).collect().map(_.getString(0))
    assert(top1.toSeq === Seq("is big"))
  }

  test("lexiconTags: one join tags all categories, rates per doc, " +
      "no-hit docs absent; profile rolls up by group") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "en", "join hash join row"),     // db:3 hits, data:1
      (2L, "en", "click click mouse"),      // web:2
      (3L, "de", "nothing relevant at all")
    ).toDF("doc_id", "lang", "text")
    val lex = Map("db" -> Seq("join", "hash"),
      "web" -> Seq("click"), "data" -> Seq("row"))
    val tags = Keywords.lexiconTags(docs, "doc_id", "text", lex)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("n_distinct_terms"),
          r.getAs[Double]("hit_rate")))).toMap
    assert(tags((1L, "db")) === ((3L, 2L, 0.75)))
    assert(tags((1L, "data")) === ((1L, 1L, 0.25)))
    assert(tags((2L, "web")) === ((2L, 1L, 0.666667)))
    assert(!tags.keySet.exists(_._1 == 3L))
    val prof = Keywords.lexiconProfile(docs, "doc_id", "text", "lang",
        lex)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("total_hits")).toMap
    assert(prof(("en", "db")) === 3L)
    assert(prof(("en", "web")) === 2L)
  }

  test("kwic: context slices clip at both edges, occurrences in " +
      "(doc, pos) order") {
    val s = spark
    import s.implicits._
    val kdocs = Seq(
      (1L, "join alpha beta join"),       // at pos 0 and pos 3
      (2L, "x y z join a b c")            // full context both sides
    ).toDF("doc_id", "text")
    val out = Keywords.kwic(kdocs, "doc_id", "text", "join",
        context = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(4)))
    assert(out.toSeq === Seq(
      (1L, 0, "", "alpha beta"),
      (1L, 3, "alpha beta", ""),
      (2L, 3, "y z", "a b")))
    // topK caps deterministically on (doc, pos)
    val capped = Keywords.kwic(kdocs, "doc_id", "text", "join", 2, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(capped.toSeq === Seq((1L, 0), (1L, 3)))
  }

  test("removeDuplicatedLines: shared header/footer removed, unique " +
      "middles kept in order, within-doc repeats count one doc") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "HDR\nalpha one\nHDR\nFTR"), // HDR twice in ONE doc: df 1×3
      (2L, "HDR\nbeta two\nFTR"),
      (3L, "HDR\ngamma three\nFTR"),
      (4L, "delta four")) // no template lines at all
      .toDF("doc_id", "text")
    // HDR/FTR live in 3 docs each; maxDf = 2 → removed; middles df 1
    val out = Boilerplate
      .removeDuplicatedLines(docs, "doc_id", "text", maxDf = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(out === Map(
      1L -> ((4L, 3L, "alpha one")), // both HDR copies removed
      2L -> ((3L, 2L, "beta two")),
      3L -> ((3L, 2L, "gamma three")),
      4L -> ((1L, 0L, "delta four"))))
  }

  test("removeDuplicatedLines: blank lines are lines; a doc of pure " +
      "boilerplate rewrites to the empty string") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "X\n\nbody a"), (2L, "X\n\nbody b"), (3L, "X\n\nbody c"),
      (4L, "X")) // nothing but the duplicated line
      .toDF("doc_id", "text")
    val out = Boilerplate
      .removeDuplicatedLines(docs, "doc_id", "text", maxDf = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))))
      .toMap
    // X (df 4) and the blank line (df 3) both exceed maxDf = 2
    assert(out === Map(
      1L -> ((2L, "body a")), 2L -> ((2L, "body b")),
      3L -> ((2L, "body c")), 4L -> ((1L, ""))))
    // the static index names exactly the removed lines
    val idx = Boilerplate
      .duplicatedLineIndex(docs, "doc_id", "text", maxDf = 2)
      .collect().map(_.getString(0)).toSet
    assert(idx === Set("X", ""))
  }

  test("lineDocFrequencies counts documents, not occurrences") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "L\nL\nL"), (2L, "L"), (3L, "other"))
      .toDF("doc_id", "text")
    val df = Boilerplate.lineDocFrequencies(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df === Map("L" -> 2L, "other" -> 1L))
  }
}
