package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** First-occurrence n-gram novelty and the BPE tokenizer-training
  * statistics, on corpora small enough to verify by hand.
  */
class NoveltyTokenizerSpec extends SparkSpec {

  test("gramNovelty: the first doc is all-novel, a verbatim re-crawl " +
      "contributes nothing, partial overlap counts the new grams only") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),   // 2 distinct 3-grams, both novel
      (2L, "alpha beta gamma delta"),   // verbatim copy: 0 novel
      (3L, "alpha beta gamma epsilon"), // shares "alpha beta gamma" only
      (4L, "zz")                        // short doc: whole-doc fallback gram
    ).toDF("doc_id", "text")
    val out = Novelty.gramNovelty(docs, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"))))
      .toMap
    assert(out(1L) === ((2L, 2L)))
    assert(out(2L) === ((2L, 0L)))
    assert(out(3L) === ((2L, 1L)), "\"beta gamma epsilon\" is the new gram")
    assert(out(4L) === ((1L, 1L)))
  }

  test("pairFrequencies counts occurrences (not documents) and topPairs " +
      "ranks by count with text tie-break") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b a b"), // "a b" x2, "b a" x1
      (2L, "a b c"),   // "a b", "b c"
      (3L, "solo")     // no pairs
    ).toDF("doc_id", "text")
    val top = TokenizerTraining.topPairs(docs, "doc_id", "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(top.head === ("a b" -> 3L))
    assert(top.toMap === Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
    // tie between "b a" and "b c" resolves on pair text
    assert(top.map(_._1).toSeq === Seq("a b", "b a", "b c"))
  }

  test("applyMerge rewrites adjacent pairs left-to-right, overlapping " +
      "occurrences merge leftmost-first") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Seq("a", "b", "c", "a", "b"),
      Seq("a", "a", "a"),
      Seq("x"),
      Seq.empty[String]
    ).toDF("toks")
    val out = df.select(
      TokenizerTraining.applyMerge(col("toks"), "a", "b").as("m1"),
      TokenizerTraining.applyMerge(col("toks"), "a", "a").as("m2"))
      .collect()
      .map(r => (r.getSeq[String](0), r.getSeq[String](1)))
    assert(out(0)._1 === Seq("a b", "c", "a b"))
    // "a a a" under (a, a): leftmost pair merges; the merged token
    // "a a" does not re-pair with the trailing "a"
    assert(out(1)._2 === Seq("a a", "a"))
    assert(out(2)._1 === Seq("x"))
    assert(out(3)._1 === Seq.empty)
  }

  test("containment is asymmetric: an excerpt scores ~1 against its " +
      "host but the host scores low against the excerpt") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq("a", "b", "c"), Seq("a", "b", "c", "d", "e", "f", "g", "h")),
      (Seq.empty[String], Seq("a"))
    ).toDF("small", "big")
    val out = df.select(
      graft.functions.DedupFunctions.containment(col("small"), col("big"))
        .as("fwd"),
      graft.functions.DedupFunctions.containment(col("big"), col("small"))
        .as("bwd"))
      .collect()
    assert(out(0).getDouble(0) === 1.0)
    assert(out(0).getDouble(1) === 3.0 / 8.0)
    assert(out(1).getDouble(0) === 0.0, "empty side is defined as 0")
  }

  test("trainMerges: the classic char-level BPE sequence, and early " +
      "stop when no pair reaches minCount") {
    val s = spark
    import s.implicits._
    // "symbols" are single letters; round 1 must merge (a, b) — 4
    // occurrences — and round 2 the merged token with itself
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "a b c")
    ).toDF("doc_id", "text")
    val merges = TokenizerTraining.trainMerges(docs, "doc_id", "text",
      rounds = 10, minCount = 2)
    assert(merges.take(2) === Seq(("a", "b"), ("a b", "a b")))
    // after those two merges the streams are ["a b a b", "a b"] and
    // ["a b", "c"]: no remaining pair occurs twice -> early stop
    assert(merges.size === 2)
  }

  test("encode applies the whole trained merge list in one pass: the " +
      "classic sequence round-trips and matches sequential applyMerge") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "a b c")
    ).toDF("doc_id", "text")
    val merges = TokenizerTraining.trainMerges(docs, "doc_id", "text",
      rounds = 10, minCount = 2)
    assert(merges === Seq(("a", "b"), ("a b", "a b")))
    // round-trip: encoding the TRAINING corpus reproduces the final
    // training streams exactly
    val enc = TokenizerTraining.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => r.getSeq[String](r.fieldIndex("encoded")))
    assert(enc(0) === Seq("a b a b", "a b"))
    assert(enc(1) === Seq("a b", "c"))
    // on UNSEEN text, the one-pass rank-priority encoder must equal
    // applying the merges sequentially in training order
    val fresh = Seq((1L, "a b x a b a b c"), (2L, "b a b a")).toDF("doc_id", "text")
    val viaChain = fresh.select(col("doc_id"),
        merges.foldLeft(graft.functions.TextFunctions.tokens(col("text"))) {
          case (c, (a, b)) => TokenizerTraining.applyMerge(c, a, b)
        }.as("e"))
      .orderBy("doc_id").collect().map(r => r.getSeq[String](r.fieldIndex("e")))
    val viaEncode = TokenizerTraining.encode(fresh, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => r.getSeq[String](r.fieldIndex("encoded")))
    assert(viaEncode.toSeq === viaChain.toSeq)
    // pinned by hand: (a,b) everywhere first, then the pair-of-pairs
    assert(viaEncode(0) === Seq("a b", "x", "a b a b", "c"))
    assert(viaEncode(1) === Seq("b", "a b", "a"))
  }

  test("encodeIds / vocabulary: base ids are the sorted distinct tokens, " +
      "merge ids follow in training order, OOV maps to -1") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "b a b a b")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    // base vocab sorted: a=0, b=1; merge "a b"=2
    val vocab = TokenizerTraining.vocabulary(docs, "doc_id", "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab === Map("a" -> 0L, "b" -> 1L, "a b" -> 2L))
    val ids = TokenizerTraining.encodeIds(docs, "doc_id", "text", merges)
      .orderBy("pos").collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("token_id")))
    // "b a b a b" encodes to ["b", "a b", "a b"]
    assert(ids.toSeq === Seq(("b", 1L), ("a b", 2L), ("a b", 2L)))
    // OOV: encode a NEW corpus against the FROZEN training vocab —
    // "z" is not in it and must map to -1, not drop
    val frozen = TokenizerTraining.vocabulary(docs, "doc_id", "text", merges)
    val fresh = Seq((2L, "a z")).toDF("doc_id", "text")
    val freshIds = TokenizerTraining.encodeIds(fresh, "doc_id", "text",
        merges, vocab = Some(frozen))
      .orderBy("pos").collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("token_id")))
    assert(freshIds.toSeq === Seq(("a", 0L), ("z", -1L)))
  }

  test("applyMerge round: merging the top pair strictly reduces total " +
      "token count by that pair's occurrence count") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat the cat ran"),
      (2L, "the cat is the cat")
    ).toDF("doc_id", "text")
    val toksed = docs.withColumn("toks",
      graft.functions.TextFunctions.tokens(col("text")))
    val Array(pair, n) = TokenizerTraining
      .topPairs(docs, "doc_id", "text", k = 1)
      .collect().map(r => Array(r.getString(0), r.getLong(1).toString)).head
    val Array(a, b) = pair.split(" ")
    val before = toksed.select(sum(size(col("toks")))).collect().head.getLong(0)
    val after = toksed.select(
        sum(size(TokenizerTraining.applyMerge(col("toks"), a, b))))
      .collect().head.getLong(0)
    assert(before - after === n.toLong)
  }

  test("greedy encode: longest match wins, unk fallback advances one, " +
      "pieces tile the word exactly") {
    val s = spark
    import s.implicits._
    val vocab = Seq("a", "b", "c", "ab", "abc", "bc")
    val docs = Seq(
      (1L, "abcab"),   // greedy: abc + ab (longest-first, not ab+ca+b)
      (2L, "abx"),     // x unseen -> ab + <unk>
      (3L, "xyz")      // all unk
    ).toDF("doc_id", "text")
    val out = TokenizerTraining.greedyEncode(docs, "doc_id", "text",
        vocab, maxPieceLen = 3)
      .orderBy(col("doc_id")).collect()
    // doc1: abc|ab -> 2 pieces, 0 unk
    assert(out(0).getAs[Int]("n_pieces") === 2)
    assert(out(0).getAs[Int]("n_unk") === 0)
    // doc2: ab|<unk> -> 2 pieces, 1 unk
    assert(out(1).getAs[Int]("n_pieces") === 2)
    assert(out(1).getAs[Int]("n_unk") === 1)
    // doc3: three unks
    assert(out(2).getAs[Int]("n_pieces") === 3)
    assert(out(2).getAs[Int]("n_unk") === 3)
    // md5 pins the exact stream: doc1 = "abc ab"
    assert(out(0).getAs[String]("pieces_md5") ===
      java.security.MessageDigest.getInstance("MD5")
        .digest("abc ab".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }

  test("greedy vocab: alphabet complete, tops ranked (count, piece)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aba aba abb")).toDF("doc_id", "text")
    val v = TokenizerTraining.greedySubstringVocab(docs, "text",
      Seq(2 -> 2)).toSet
    // chars a, b always present; 2-gram counts: ab=3, ba=2, bb=1 ->
    // top-2 = ab, ba
    assert(v === Set("a", "b", "ab", "ba"))
  }

  test("viterbiSegment: best-score split, earliest-i tie-break, " +
      "piece-length cap, unreachable char -> empty") {
    // "ab" as one piece (-2.5) beats a+b (-3.0)
    assert(TokenizerTraining.viterbiSegment("ab",
      Map("a" -> -1.0, "b" -> -2.0, "ab" -> -2.5), 4) === Seq("ab"))
    // exact tie: ["ab"] = -2.0 = ["a","b"]; the i=0 candidate lands
    // first and strict > never displaces it -> the longer-piece split
    assert(TokenizerTraining.viterbiSegment("ab",
      Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0), 4) === Seq("ab"))
    // maxPieceLen caps lookups: "ab" in vocab but cap 1 forces a+b
    assert(TokenizerTraining.viterbiSegment("ab",
      Map("a" -> -1.0, "b" -> -1.0, "ab" -> -0.1), 1) ===
      Seq("a", "b"))
    // a char outside the vocab makes the word unsegmentable
    assert(TokenizerTraining.viterbiSegment("ax",
      Map("a" -> -1.0), 4) === Seq.empty)
    assert(TokenizerTraining.viterbiSegment("",
      Map("a" -> -1.0), 4) === Seq.empty)
  }

  test("unigramEmRound: candidate top-k + alphabet closure, Viterbi " +
      "E-step, corpus-weighted M-step re-estimation") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "ab ab b"), (2L, "ab b b"))
      .toDF("doc_id", "text")
    // words: ab x3, b x3. candidates: b=6, a=3, ab=3.
    // k=2 keeps {b, a} (ab is rank 3 and not a single char):
    // every "ab" segments a|b -> uses a=3, b=6, total 9
    val small = TokenizerTraining.unigramEmRound(docs, "doc_id", "text",
        k = 2, maxPieceLen = 4, maxWordLen = 12, topOut = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(small.toSeq === Seq(
      ("b", 6L, 6L, math.round(math.log(6.0 / 9) * 1e4) / 1e4),
      ("a", 3L, 3L, math.round(math.log(3.0 / 9) * 1e4) / 1e4)))
    // k=3 admits "ab": lp(ab) = ln(3/12) beats lp(a)+lp(b) =
    // ln(3/12)+ln(6/12), so EM moves all of a's mass onto ab and
    // the M-step drops a entirely (n_uses: ab=3, b=3, total 6)
    val grown = TokenizerTraining.unigramEmRound(docs, "doc_id", "text",
        k = 3, maxPieceLen = 4, maxWordLen = 12, topOut = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(grown.toSeq === Seq(
      ("ab", 3L, 3L, math.round(math.log(3.0 / 6) * 1e4) / 1e4),
      ("b", 6L, 3L, math.round(math.log(3.0 / 6) * 1e4) / 1e4)))
  }

  test("charCoverage: exact prefix ranks on a hand-counted alphabet, " +
      "whitespace counted, case folded, loud bound") {
    val s = spark
    import s.implicits._
    // chars of lower(text): "aAb" -> a,a,b; "a z" -> a,' ',z
    // counts: a=3, b=1, ' '=1, z=1 -> total 6, order a, then ' ', b, z
    val docs = Seq((1L, "aAb"), (2L, "a z")).toDF("doc_id", "text")
    val out = TokenizerTraining.charCoverage(docs, "text",
        targetsBp = Seq(5000, 8000, 10000))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    // 50% of 6 = cum>=3 -> 1 char (a); 80% -> cum*1e4 >= 8000*6=48000:
    // a=3 (30000), +' '=4 (40000), +b=5 (50000) -> 3 chars; 100% -> 4
    assert(out.toSeq === Seq(
      (5000, 1L, 6L, 4L), (8000, 3L, 6L, 4L), (10000, 4L, 6L, 4L)))
    intercept[IllegalArgumentException] {
      TokenizerTraining.charCoverage(docs, "text", Seq(5000),
        maxAlphabet = 2)
    }
    intercept[IllegalArgumentException] {
      TokenizerTraining.charCoverage(docs, "text", Seq(0))
    }
  }
}
