package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-lingual dedup + language-budget mixing — the multilingual
  * corpus-curation wave: diacritic folding, order-insensitive folded
  * fingerprints, cross-language near-dup pairs, and α-sampling token
  * budgets.
  */
class CrossLingualSpec extends SparkSpec {

  test("foldText: diacritics fold 1:1, case and punctuation collapse, " +
      "non-Latin text passes through unharmed") {
    val s = spark
    import s.implicits._
    val out = Seq(
      "Résumé, naïve — Ça Brûlé!",
      "  Tabs\tand\nnewlines  ",
      "中文 текст stays").toDF("text")
      .select(CrossLingual.foldText(col("text")).as("f"))
      .collect().map(_.getString(0))
    assert(out(0).trim === "resume naive ca brule")
    assert(out(1).trim === "tabs and newlines")
    // non-Latin chars are not in [a-z0-9] -> collapse to separators;
    // the latin token survives (safe failure mode: no false merges)
    assert(out(2).trim === "stays")
  }

  test("crossLingualClusters: order/diacritic/punct variants across " +
      "languages cluster; same-language dups and singletons drop") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "Solar energy policy framework", "en"),
      (2L, "framework POLICY — énergy solar!", "fr"), // same folded set
      (3L, "solar energy policy framework", "en"),    // en dup of 1
      (4L, "completely different text here", "de"),
      (5L, "unrelated single document", "es")).toDF("doc_id", "text", "lang")
    val rows = CrossLingual.crossLingualClusters(docs, "doc_id", "text",
      "lang").collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("n_docs") === 3L)     // 1, 2, 3 share the set
    assert(r.getAs[Long]("n_langs") === 2L)    // en + fr
    assert(r.getAs[Long]("canonical_id") === 1L)
    assert(r.getAs[String]("langs") === "en,fr")
  }

  test("crossLingualNearDupPairs: high-overlap cross-language pair " +
      "survives; the same-language twin is filtered; jaccard is exact") {
    val s = spark
    import s.implicits._
    // 10 shared tokens, 'a' has 1 extra -> J = 10/11 ≈ 0.909
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared extra", "en"),
      (2L, shared, "fr"),
      (3L, shared, "fr")).toDF("doc_id", "text", "lang")
    val pairs = CrossLingual.crossLingualNearDupPairs(docs, "doc_id",
      "text", "lang", threshold = 0.8).collect()
    // (2,3) is same-language -> filtered; (1,2) and (1,3) cross
    assert(pairs.length === 2)
    assert(pairs.forall(r => r.getAs[String]("lang_a") !=
      r.getAs[String]("lang_b")))
    val j = pairs.map(_.getAs[Double]("jaccard")).distinct
    assert(j.length === 1 && math.abs(j.head - 10.0 / 11.0) < 1e-15)
  }

  test("languageBudgetMix: α = 1 budgets are proportional to token " +
      "mass; selection never exceeds budget; low-resource languages " +
      "gain share as α shrinks") {
    val s = spark
    import s.implicits._
    // lang A: 20 docs x 10 tokens = 200; lang B: 5 docs x 10 = 50
    def doc(i: Long, lang: String) =
      (i, (1 to 10).map(j => s"w${i}_$j").mkString(" "), lang)
    val docs = ((1L to 20L).map(doc(_, "aa")) ++
      (21L to 25L).map(doc(_, "bb"))).toDF("doc_id", "text", "lang")
    val p1 = Mixture.languageBudgetMix(docs, "doc_id", "text", "lang",
        budgetTokens = 100L, alpha = 1.0)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    // alpha=1: weights 200:50 -> budgets 80:20 of 100
    assert(p1("aa").getAs[Long]("budget") === 80L)
    assert(p1("bb").getAs[Long]("budget") === 20L)
    assert(p1("aa").getAs[Long]("tokens_selected") === 80L)
    assert(p1("bb").getAs[Long]("tokens_selected") === 20L)
    assert(p1("aa").getAs[Long]("n_docs") === 8L)
    assert(p1("aa").getAs[Long]("total_tokens") === 200L)
    val p3 = Mixture.languageBudgetMix(docs, "doc_id", "text", "lang",
        budgetTokens = 100L, alpha = 0.3)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    // alpha<1 compresses the ratio: bb's share must strictly grow
    assert(p3("bb").getAs[Long]("budget") >
      p1("bb").getAs[Long]("budget"))
    // budgets stay within the global budget
    assert(p3("aa").getAs[Long]("budget") +
      p3("bb").getAs[Long]("budget") <= 100L)
  }

  test("fold invariants over seeded noisy corpora: idempotent fold; " +
      "fingerprint invariant under permutation/duplication/case/" +
      "accents/punctuation; new token changes it") {
    val s = spark
    import s.implicits._
    val words = Seq("solar", "énergie", "Ünter", "policy", "braque",
      "wind", "café", "naïve", "data", "règle")
    val puncts = Seq(", ", "; ", " — ", "! ", " ... ")
    Seq(3L, 17L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = Seq.tabulate(60) { i =>
        val base = Seq.fill(4 + rnd.nextInt(12))(
          words(rnd.nextInt(words.length)))
        val noisy = rnd.shuffle(base ++ base.take(rnd.nextInt(3)))
          .map(w => if (rnd.nextBoolean()) w.toUpperCase else w)
          .mkString(puncts(rnd.nextInt(puncts.length)))
        (i.toLong, base.mkString(" "), noisy)
      }.toDF("id", "base", "noisy")
      val out = rows.select(
          CrossLingual.foldText(col("base")).as("f1"),
          CrossLingual.foldText(CrossLingual.foldText(col("base")))
            .as("f2"),
          CrossLingual.foldedFingerprint(col("base")).as("fpb"),
          CrossLingual.foldedFingerprint(col("noisy")).as("fpn"),
          CrossLingual.foldedFingerprint(
            concat(col("base"), lit(" zzznewtoken"))).as("fpx"))
        .collect()
      out.foreach { r =>
        assert(r.getString(0) === r.getString(1), s"fold not idempotent")
        assert(r.getString(2) === r.getString(3),
          s"fingerprint not noise-invariant (seed $seed)")
        assert(r.getString(2) !== r.getString(4),
          s"new token did not change the fingerprint (seed $seed)")
      }
    }
  }

  test("non-Latin contract: fully non-Latin docs get NULL fingerprints " +
      "and NEVER merge — not with each other, not across scripts; " +
      "ß/œ multi-char expansions stay out of contract") {
    val s = spark
    import s.implicits._
    // identical MEANING, different scripts — and two UNRELATED zh docs.
    // Pre-fix failure mode: all four folded to the empty token set and
    // shared md5(''), falsely merging unrelated content cross-language.
    val docs = Seq(
      (1L, "气候政策框架", "zh"),          // zh: climate policy framework
      (2L, "рамки климатической политики", "ru"),
      (3L, "إطار سياسة المناخ", "ar"),
      (4L, "完全不同的内容", "zh"),        // zh: completely different
      (5L, "solar energy policy", "en"),
      (6L, "energy solar policy!", "fr")).toDF("doc_id", "text", "lang")
    val fps = docs.select(col("doc_id"),
        CrossLingual.foldedFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("fp"))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(fps(_).isEmpty),
      "fully non-Latin docs must fingerprint to NULL")
    assert(fps(5L).nonEmpty && fps(5L) === fps(6L))
    // only the genuine en/fr cluster survives — no empty-fold cluster
    val clusters = CrossLingual.crossLingualClusters(docs, "doc_id",
      "text", "lang").collect()
    assert(clusters.length === 1)
    assert(clusters.head.getAs[Long]("canonical_id") === 5L)
    // incremental probe: a non-Latin delta doc never matches a corpus
    // of non-Latin docs (the index holds no NULL fingerprints)
    val flagged = CrossLingual.flagIncremental(
        docs.filter(col("doc_id") === 4L),
        docs.filter(col("doc_id") < 4L), "doc_id", "text", "lang")
      .collect()
    assert(flagged.length === 1 && !flagged.head.getAs[Boolean]("is_dup"))
    // multi-char expansions are OUT of contract (1:1 map): straße and
    // strasse deliberately do NOT collide — pinned so nobody "fixes"
    // the fold map casually without widening the oracle in lockstep
    val sz = Seq((7L, "die straße"), (8L, "die strasse"),
      (9L, "œuvre"), (10L, "oeuvre")).toDF("doc_id", "text")
      .select(col("doc_id"),
        CrossLingual.foldedFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("fp")).toMap
    assert(sz(7L) !== sz(8L))
    assert(sz(9L) !== sz(10L))
  }

  test("script-aware matrix, BOTH sides: same-script duplicates " +
      "collide (zh codepoint permutation, ru token permutation, ar, " +
      "latin — with punctuation/case/order noise), and cross-script " +
      "pairs NEVER merge, digits shared or not") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // zh pair: identical character set, permuted order + punctuation
      (1L, "气候政策框架", "zh"),
      (2L, "框架。政策，气候！", "zh-tw"),
      (3L, "完全不同的内容", "zh"),          // unrelated zh
      // ru pair: token permutation + case + punctuation
      (4L, "рамки климатической политики", "ru"),
      (5L, "Политики — рамки, климатической", "ru-md"),
      // ar pair: token permutation
      (6L, "إطار سياسة المناخ", "ar"),
      (7L, "المناخ إطار سياسة", "ar-eg"),
      // latin pair (back-compat: the old fold's territory)
      (8L, "solar energy policy", "en"),
      (9L, "energy SOLAR policy!", "fr"),
      // digit-bearing pairs across scripts: '42' is shared but the
      // letter tokens differ -> never merge
      (10L, "报告42", "zh"),
      (11L, "отчёт 42", "ru"),
      // pure punctuation still opts out (NULL, the empty-fold law)
      (12L, "!!! --- ...", "xx"),
      (13L, "???", "yy")).toDF("doc_id", "text", "lang")
    val fps = docs.select(col("doc_id"),
        CrossLingual.foldedFingerprintScripted(col("text")).as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("fp"))).toMap
    // same-script collisions
    assert(fps(1L).nonEmpty && fps(1L) === fps(2L), "zh pair")
    assert(fps(4L).nonEmpty && fps(4L) === fps(5L), "ru pair")
    assert(fps(6L).nonEmpty && fps(6L) === fps(7L), "ar pair")
    assert(fps(8L).nonEmpty && fps(8L) === fps(9L), "latin pair")
    // never across scripts / unrelated content
    val distinctFps = Seq(1L, 3L, 4L, 6L, 8L, 10L, 11L).map(fps)
    assert(distinctFps.distinct.size === distinctFps.size,
      s"cross-script or unrelated merge: $fps")
    // empty folds opt out, never share a hash
    assert(fps(12L).isEmpty && fps(13L).isEmpty)
    // cluster view: exactly the four planted pairs, each single-script
    val clusters = CrossLingual.scriptAwareClusters(docs, "doc_id",
        "text", "lang").collect()
    assert(clusters.length === 4, clusters.mkString("; "))
    assert(clusters.map(_.getAs[Long]("canonical_id")).sorted.toSeq
      === Seq(1L, 4L, 6L, 8L))
    // and the scripted FINGERPRINT is a fixpoint of the fold (the
    // fold re-spaces CJK chars, so the text is not textually
    // idempotent — the token-set hash is the invariant that matters)
    val idem = docs.select(
        CrossLingual.foldedFingerprintScripted(col("text")).as("f1"),
        CrossLingual.foldedFingerprintScripted(
          CrossLingual.foldTextScripted(col("text"))).as("f2"))
      .collect()
    idem.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("thai-family shingle fold, BOTH sides: run-preserving " +
      "re-crawls collide at bigram grain, same-alphabet anagram RUNS " +
      "do NOT merge (the codepoint-grain failure the bigram device " +
      "exists to avoid), th never merges lo, fixpoint holds") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // th pair: same runs, different punctuation + token order
      (1L, "การเรียนรู้ ของเครื่อง", "th"),
      (2L, "ของเครื่อง, การเรียนรู้!", "th-x"),
      // th anagram-at-run-grain: same character MULTISET as doc 3's
      // run, different order -> different bigrams -> no merge
      (3L, "กขคง", "th"),
      (4L, "งคขก", "th-y"),
      // lo pair: same runs, reordered with dash noise
      (5L, "ການຮຽນຮູ້ ເຄື່ອງຈັກ", "lo"),
      (6L, "ເຄື່ອງຈັກ — ການຮຽນຮູ້", "lo-x"),
      // km pair: Khmer is in the shingled class too
      (7L, "ការរៀនម៉ាស៊ីន", "km"),
      (8L, "ម៉ាស៊ីន ការរៀន", "km-x"),
      // a th doc and a lo doc: never merge (native characters)
      (9L, "ภาษาไทย", "th"),
      (10L, "ພາສາລາວ", "lo"),
      // single Thai character: stays a token, no bigram to explode
      (11L, "ก", "th"),
      (12L, "ก!", "th-z")).toDF("doc_id", "text", "lang")
    val fps = docs.select(col("doc_id"),
        CrossLingual.foldedFingerprintScripted(col("text")).as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("fp"))).toMap
    assert(fps(1L).nonEmpty && fps(1L) === fps(2L), "th pair")
    assert(fps(5L).nonEmpty && fps(5L) === fps(6L), "lo pair")
    assert(fps(11L).nonEmpty && fps(11L) === fps(12L),
      "single-char run")
    // anagram runs must NOT collide: bigram grain keeps local order
    assert(fps(3L).nonEmpty && fps(4L).nonEmpty && fps(3L) != fps(4L),
      "anagram runs merged — codepoint grain leaked through")
    // km pair: the two variants share the SAME runs ('ការរៀន' split
    // differently would under-merge; here doc 7's single run vs doc
    // 8's two runs differ at the boundary bigram, so they DON'T
    // merge — the documented under-merge direction, never a false
    // merge). Pin the direction:
    assert(fps(7L).nonEmpty && fps(8L).nonEmpty)
    assert(fps(7L) != fps(8L), "boundary bigrams should differ")
    // cross-script: th vs lo never merge
    assert(fps(9L).nonEmpty && fps(10L).nonEmpty &&
      fps(9L) != fps(10L))
    // cluster view over the corpus: exactly the planted collide
    // pairs (th, lo, single-char th), each ≥2 langs
    val clusters = CrossLingual.scriptAwareClusters(docs, "doc_id",
        "text", "lang").collect()
    assert(clusters.length === 3, clusters.mkString("; "))
    assert(clusters.map(_.getAs[Long]("canonical_id")).sorted.toSeq
      === Seq(1L, 5L, 11L))
    // fixpoint: re-folding folded text leaves the fingerprint fixed
    // (2-char shingles re-shingle to themselves)
    val idem = docs.select(
        CrossLingual.foldedFingerprintScripted(col("text")).as("f1"),
        CrossLingual.foldedFingerprintScripted(
          CrossLingual.foldTextScripted(col("text"))).as("f2"))
      .collect()
    idem.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("flagIncrementalScripted: a zh delta doc MATCHES the corpus " +
      "copy of its content (the Latin fold NULLed it through), " +
      "cross-script content never matches, empty folds never match") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "气候政策框架", "zh"),
      (2L, "рамки климатической политики", "ru"),
      (3L, "solar energy policy", "en")).toDF("doc_id", "text", "lang")
    val delta = Seq(
      (10L, "框架，政策。气候", "zh-tw"), // permuted zh -> dup, x-lingual
      (11L, "климатической рамки политики", "ru"), // dup, same lang
      (12L, "совсем другой текст", "ru"),          // fresh ru
      (13L, "!!!", "xx"))                          // empty fold
      .toDF("doc_id", "text", "lang")
    val out = CrossLingual.flagIncrementalScripted(delta, corpus,
        "doc_id", "text", "lang")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("is_dup"), Option(r.getAs[Any]("matched_id")),
          r.getAs[Boolean]("is_cross_lingual")))).toMap
    assert(out(10L) === ((true, Some(1L), true)))
    assert(out(11L) === ((true, Some(2L), false)))
    assert(out(12L) === ((false, None, false)))
    assert(out(13L) === ((false, None, false)))
    // the old Latin fold still waves the zh delta through — pinned so
    // the two contracts stay distinct
    val latin = CrossLingual.flagIncremental(delta, corpus, "doc_id",
        "text", "lang")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("is_dup")).toMap
    assert(!latin(10L))
  }

  test("flagIncremental: delta docs match the corpus fingerprint " +
      "index; cross-lingual only when the delta language is absent " +
      "from the matched cluster") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "solar energy policy", "en"),
      (2L, "POLICY — solar Énergy!", "fr"), // same folded set as 1
      (3L, "totally different corpus doc", "de"))
      .toDF("doc_id", "text", "lang")
    val delta = Seq(
      (10L, "energy solar policy", "es"),  // dup, es not in {en,fr}
      (11L, "solar policy energy", "en"),  // dup, en IS in the cluster
      (12L, "brand new delta text", "zh")) // no match
      .toDF("doc_id", "text", "lang")
    val out = CrossLingual.flagIncremental(delta, corpus, "doc_id",
        "text", "lang")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(10L).getAs[Boolean]("is_dup"))
    assert(out(10L).getAs[Long]("matched_id") === 1L)
    assert(out(10L).getAs[String]("matched_langs") === "en,fr")
    assert(out(10L).getAs[Boolean]("is_cross_lingual"))
    assert(out(11L).getAs[Boolean]("is_dup"))
    assert(!out(11L).getAs[Boolean]("is_cross_lingual"))
    assert(!out(12L).getAs[Boolean]("is_dup"))
    assert(!out(12L).getAs[Boolean]("is_cross_lingual"))
    assert(out(12L).getAs[Any]("matched_id") === null)
  }

  test("embeddingDupPairs: near-identical cross-language vectors pair " +
      "at the threshold; the same-language twin and the sub-threshold " +
      "neighbor are filtered") {
    val s = spark
    import s.implicits._
    // 1 and 2 are near-identical (cos ~0.9987) across languages; 3 is
    // 1's SAME-language twin (cos ~0.9999 — language filter must drop
    // it); 4 is cross-language but orthogonal (cos 0)
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), "en"),
      (2L, Seq(0.95f, 0.05f), "fr"),
      (3L, Seq(0.99f, 0.01f), "en"),
      (4L, Seq(0.0f, 1.0f), "fr")).toDF("vec_id", "embedding", "lang")
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val pairs = CrossLingual.embeddingDupPairs(vecs, "vec_id",
        "embedding", "lang", threshold = 0.9, cents, nAssign = 1)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[String]("lang_a"), r.getAs[String]("lang_b")))
    // surviving pairs: (1,2) en-fr and (2,3) fr-en; never (1,3) en-en,
    // never anything with 4 (different list AND cos 0)
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L), (2L, 3L)))
    pairs.foreach(p => assert(p._3 !== p._4))
  }

  test("bitextTopMatches: the best match is always cross-group, and " +
      "the aligned pair wins over a same-language twin") {
    val s = spark
    import s.implicits._
    // en#1 and fr#2 are near-parallel; en#3 is #1's same-language twin
    // (closer than fr#2!) and must be EXCLUDED by the group filter;
    // fr#4 is orthogonal noise
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f), "en"),
      (2L, Seq(0.95f, 0.05f, 0.0f), "fr"),
      (3L, Seq(0.99f, 0.01f, 0.0f), "en"),
      (4L, Seq(0.0f, 0.0f, 1.0f), "fr")).toDF("vec_id", "embedding", "lang")
    val out = Similarity.bitextTopMatches(vecs, "vec_id", "embedding",
        "lang", k = 2)
      .collect().map(r => r.getAs[Long]("x") ->
        r.getAs[Long]("best_match")).toMap
    assert(out(1L) === 2L) // not 3 (same lang), not 4 (orthogonal)
    assert(out(3L) === 2L)
    assert(out(2L) === 1L || out(2L) === 3L)
    // every x appears and no best match shares its language
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    val lang = Map(1L -> "en", 2L -> "fr", 3L -> "en", 4L -> "fr")
    out.foreach { case (x, m) => assert(lang(x) !== lang(m), s"$x->$m") }
  }

  test("crossLingualClustersKeepBest: the highest-score member wins " +
      "the canonical election, ties break to the smaller id") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // cluster A: doc 3 is the longest variant -> canonical
      (1L, "solar energy policy", "en", 3L),
      (2L, "policy solar — Énergy!", "fr", 3L),
      (3L, "solar energy policy framework extension", "de", 5L),
      // cluster B: equal scores -> min id 10 wins
      (10L, "wind rules", "en", 2L),
      (11L, "rules wind!", "fr", 2L))
      .toDF("doc_id", "text", "lang", "n_tok")
    val rows = CrossLingual.crossLingualClustersKeepBest(docs, "doc_id",
        "text", "lang", "n_tok")
      .collect().map(r => r.getAs[Long]("canonical_id") ->
        r.getAs[Long]("canonical_score")).toMap
    // cluster A folds docs 1 and 2 together (doc 3 differs -> its own
    // singleton drops); canonical of {1, 2} = equal scores -> id 1
    assert(rows.keySet === Set(1L, 10L))
    assert(rows(10L) === 2L)
  }

  test("hedgeMixtureWeights: the hardest domain gains mass every " +
      "round, weights stay a grid distribution, and the domain bound " +
      "fails loudly") {
    val s = spark
    import s.implicits._
    val losses = Seq(("easy", 0.1), ("mid", 0.5), ("hard", 0.9))
      .toDF("source", "loss")
    val w1 = Mixture.hedgeMixtureWeights(losses, "source", "loss",
        eta = 1.0, iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val w8 = Mixture.hedgeMixtureWeights(losses, "source", "loss",
        eta = 1.0, iters = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // monotone in loss, and sharpening with rounds
    assert(w1("hard") > w1("mid") && w1("mid") > w1("easy"))
    assert(w8("hard") > w1("hard") && w8("easy") < w1("easy"))
    // grid distribution: snapped values, sum within a grid ulp of 1
    Seq(w1, w8).foreach { w =>
      assert(math.abs(w.values.sum - 1.0) < 3e-6)
      w.values.foreach(v =>
        assert(v === graft.functions.Grid.snapD(v)))
    }
    // bound check mirrors the q202 discipline
    val e = intercept[IllegalArgumentException] {
      Mixture.hedgeMixtureWeights(losses, "source", "loss", 1.0, 2,
        maxDomains = 2)
    }
    assert(e.getMessage.contains("maxDomains=2"))
  }

  test("languageBudgetMix selection is a stable hash-ordered prefix: " +
      "rerun and row-order permutation select the identical doc set") {
    val s = spark
    import s.implicits._
    def doc(i: Long, lang: String) =
      (i, (1 to (i % 7 + 3).toInt).map(j => s"w${i}_$j").mkString(" "),
        lang)
    val rows = (1L to 40L).map(i => doc(i, if (i % 3 == 0) "xx" else "yy"))
    val a = Mixture.languageBudgetMix(rows.toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", 60L, 0.5).collect()
    val b = Mixture.languageBudgetMix(
      scala.util.Random.shuffle(rows.toList)
        .toDF("doc_id", "text", "lang").repartition(5),
      "doc_id", "text", "lang", 60L, 0.5).collect()
    assert(a.map(_.toString).sorted.toSeq ===
      b.map(_.toString).sorted.toSeq)
  }

  test("foldWidth: fullwidth ASCII twins and the ideographic space " +
      "fold to their originals; the map blocks stay offset-parallel") {
    val s = spark
    import s.implicits._
    // the literal pair can never drift from the standard
    assert(CrossLingual.WidthFrom.length === CrossLingual.WidthTo.length)
    assert(CrossLingual.WidthFrom.zip(CrossLingual.WidthTo).forall {
      case ('\u3000', ' ') => true
      case (f, t) => f - 0xFF01 === t - 0x21
    })
    val out = Seq((1L, "\uFF27\uFF30\uFF35\uFF12\uFF10\uFF12\uFF14\u3000ok"))
      .toDF("id", "text")
      .select(CrossLingual.foldWidth(col("text"))).head().getString(0)
    assert(out === "GPU2024 ok")
  }

  test("foldedFingerprintWide merges width-variant spellings that " +
      "the scripted fingerprint keeps apart; distinct content stays " +
      "distinct under both") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "\u6a21\u578b gpu7 benchmark"),
      (2L, "\u6a21\u578b\u3000\uFF47\uFF50\uFF55\uFF17 \uFF42\uFF45\uFF4E\uFF43\uFF48\uFF4D\uFF41\uFF52\uFF4B"),
      (3L, "\u6a21\u578b gpu8 benchmark")) // different page
      .toDF("id", "text")
    val fps = docs.select(col("id"),
        CrossLingual.foldedFingerprintScripted(col("text")).as("fs"),
        CrossLingual.foldedFingerprintWide(col("text")).as("fw"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2)))).toMap
    assert(fps(1L)._1 !== fps(2L)._1) // scripted alone under-merges
    assert(fps(1L)._2 === fps(2L)._2) // width fold closes the gap
    assert(fps(1L)._2 !== fps(3L)._2) // no false merge across pages
  }

  test("codeSwitchAudit: drifting docs read mixed with the right " +
      "majority; monolingual docs do not; und-only text stays und") {
    val s = spark
    import s.implicits._
    val en24 = (1 to 3).map(_ => "the and of to in is it that").mkString(" ")
    val docs = Seq(
      (1L, en24 + " der die das und ist nicht ein eine"), // en → de
      (2L, en24 + " le la les et est une dans pour"), // en → fr
      (3L, en24 + " " + en24), // pure en
      (4L, "zz yy xx ww vv uu tt ss")) // no profile hits at all
      .toDF("doc_id", "text")
    val out = CrossLingual.codeSwitchAudit(docs, "doc_id", "text", 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[String]("primary_lang"),
          r.getAs[Long]("n_langs"), r.getAs[Boolean]("is_mixed"))))
      .toMap
    assert(out(1L) === ((4L, "en", 2L, true)))
    assert(out(2L) === ((4L, "en", 2L, true)))
    assert(out(3L) === ((6L, "en", 1L, false)))
    assert(out(4L) === ((1L, "und", 0L, false)))
  }

  test("codeSwitchAudit: majority and tie order are deterministic — " +
      "equal de/fr chunk counts resolve de, the langIdOf profile order") {
    val s = spark
    import s.implicits._
    val de8 = "der die das und ist nicht ein eine"
    val fr8 = "le la les et est une dans pour"
    val doc = Seq((1L, de8 + " " + fr8)).toDF("doc_id", "text")
    val r = CrossLingual.codeSwitchAudit(doc, "doc_id", "text", 8).head()
    assert(r.getAs[Long]("n_de") === 1L && r.getAs[Long]("n_fr") === 1L)
    assert(r.getAs[String]("primary_lang") === "de")
    assert(r.getAs[Boolean]("is_mixed"))
  }

  test("stripInvisible deletes (not spaces) ZWSP/ZWNJ/ZWJ/soft-" +
      "hyphen/BOM, rejoining the word; the canonical stack merges " +
      "dressed re-crawl twins the width key keeps apart") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "\u6570\u636e data pipeline cleanup 7"),
      (2L, "\ufeff\u6570\u636e data pipe\u200bline clean\u00adup 7"),
      (3L, "\u6570\u636e data pipeline cleanup 8")) // different page
      .toDF("id", "text")
    val stripped = docs.filter(col("id") === 2L)
      .select(CrossLingual.stripInvisible(col("text")))
      .head().getString(0)
    assert(stripped === "\u6570\u636e data pipeline cleanup 7")
    val fps = docs.select(col("id"),
        CrossLingual.foldedFingerprintWide(col("text")).as("fw"),
        CrossLingual.foldedFingerprintCanonical(col("text")).as("fc"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2)))).toMap
    assert(fps(1L)._1 !== fps(2L)._1) // Cf chars split the tokens
    assert(fps(1L)._2 === fps(2L)._2) // the strip closes the gap
    assert(fps(1L)._2 !== fps(3L)._2) // no false merge across pages
  }

  test("scriptProfile: removal-device counts per class, snapped " +
      "shares, fixed-tie-order dominant, null shares on empty text") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "\u6a21\u578b ab"), // 2 han, 2 latin -> tie -> han
      (2L, "hello \u043c\u0438\u0440"), // 5 latin > 3 cyrillic
      (3L, "\u0e01\u0e02\u0e03"), // thai only
      (4L, "1234 !?"), // no class hits -> none
      (5L, "")) // empty -> shares NULL
      .toDF("id", "text")
    val out = CrossLingual.scriptProfile(docs, "id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Long]("n_han") === 2L)
    assert(out(1L).getAs[Long]("n_latin") === 2L)
    assert(out(1L).getAs[String]("dominant_script") === "han") // tie
    assert(out(2L).getAs[Long]("n_cyrillic") === 3L)
    assert(out(2L).getAs[String]("dominant_script") === "latin")
    assert(out(2L).getAs[Double]("latin_share") === 0.555556)
    assert(out(3L).getAs[String]("dominant_script") === "thai")
    assert(out(4L).getAs[String]("dominant_script") === "none")
    assert(out(5L).isNullAt(out(5L).fieldIndex("han_share")))
  }

  test("flagIncrementalCanonical: dressed width/invisible twins match " +
      "their plain corpus partner cross-lingually; fresh content " +
      "stays clean") {
    val s = spark
    import s.implicits._
    val corpus = Seq((0L, "zh", "\u6a21\u578b gpu7 benchmark cleanup"))
      .toDF("doc_id", "lang", "text")
    val delta = Seq(
      (1L, "zh-tw",
        "\ufeff\u6a21\u578b \uFF47\uFF50\uFF55\uFF17 \uFF42\uFF45\uFF4E\uFF43\uFF48\uFF4D\uFF41\uFF52\uFF4B clean\u00adup"),
      (2L, "zh", "\u6a21\u578b gpu8 benchmark cleanup")) // fresh page
      .toDF("doc_id", "lang", "text")
    val out = CrossLingual.flagIncrementalCanonical(delta, corpus,
        "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Boolean]("is_dup"),
          r.getAs[Boolean]("is_cross_lingual")))).toMap
    assert(out === Map(
      1L -> ((true, true)), // matched, and the index only knows zh
      2L -> ((false, false))))
  }
}
