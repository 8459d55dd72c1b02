package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-training statistics over a corpus: the adjacent-pair
  * frequency count that drives one BPE merge step, and the merge
  * application that rewrites the token stream for the next step. Training
  * a subword vocabulary IS a corpus-scale aggregation problem — each BPE
  * iteration is "count all adjacent symbol pairs, pick the most frequent,
  * rewrite" — so the engine treats it as a first-class operator family.
  *
  * 100 TB shape: [[pairFrequencies]] is explode → one partial-agg shuffle
  * (one row per distinct pair); [[topPairs]] plans the global pick as a
  * TakeOrderedAndProject heap, never a full sort. [[applyMerge]] is a
  * pure per-row Column fold — map-only, no shuffle — so a merge round
  * costs exactly one aggregation pass; the loop over rounds lives in the
  * caller, checkpointing the rewritten token column as it goes.
  */
object TokenizerTraining {

  /** Occurrence count per adjacent token pair (BPE counting base:
    * duplicates within a document all count, unlike the per-doc-distinct
    * sets dedup uses). Documents with fewer than two tokens contribute
    * nothing. Pair text is the two tokens space-joined.
    */
  def pairFrequencies(corpus: DataFrame, idCol: String, textCol: String,
      tokensCol: Option[String] = None): DataFrame =
    corpus
      .withColumn("__tt_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(explode(adjacentPairs(col("__tt_toks"))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))

  /** The `k` most frequent adjacent pairs, ties broken on pair text —
    * the merge-candidate shortlist of one BPE step.
    */
  def topPairs(corpus: DataFrame, idCol: String, textCol: String, k: Int,
      tokensCol: Option[String] = None): DataFrame =
    pairFrequencies(corpus, idCol, textCol, tokensCol)
      .orderBy(col("n").desc, col("pair"))
      .limit(k)

  /** All adjacent token pairs in order, duplicates kept; `[]` below two
    * tokens (no whole-doc fallback — a lone token is not a pair).
    */
  def adjacentPairs(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => array_join(slice(toks, i + 1, lit(2)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Adjacent pairs as (left, right) STRUCTS — the multi-round counting
    * form: after a merge the stream contains tokens with embedded
    * spaces, so the space-joined pair text of [[adjacentPairs]] becomes
    * ambiguous ("a b c" could be ("a b", "c") or ("a", "b c")); structs
    * keep the boundary exact.
    */
  def adjacentPairStructs(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => struct(get(toks, i).as("left"), get(toks, i + 1).as("right"))))
      .otherwise(
        array().cast("array<struct<left:string,right:string>>"))

  /** `rounds` of BPE training: each round counts adjacent pairs over the
    * CURRENT token stream (one partial-agg shuffle + a 1-row TakeOrdered
    * pick), merges the most frequent pair (ties on pair text), and
    * rewrites the stream with [[applyMerge]] — a lazy map-only Column
    * rewrite, so a round costs exactly one aggregation pass over the
    * corpus. Stops early when no pair reaches `minCount`. Returns the
    * ordered merge list (the BPE vocabulary delta).
    *
    * `checkpointEvery` bounds plan depth: each round nests one more
    * `aggregate` fold into the token expression, so every few rounds the
    * stream is localCheckpoint'd (lineage cut, same device as the
    * connected-components loop in [[Dedup]]).
    */
  def trainMerges(corpus: DataFrame, idCol: String, textCol: String,
      rounds: Int, minCount: Long = 2, tokensCol: Option[String] = None,
      checkpointEvery: Int = 8): Seq[(String, String)] = {
    // the tokenized base stream is re-read EVERY round (round i scans it
    // through i-1 merge rewrites) — scope-cache it so the regexp
    // tokenize pass runs once, not `rounds` times (measured: q94
    // 4.9 s -> 3.1 s at sf0.1 for 8 rounds)
    var stream = graft.CacheScope.register(corpus.select(
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))).as("__bpe"))
      .persist())
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val top = stream
        .select(explode(adjacentPairStructs(col("__bpe"))).as("p"))
        .groupBy(col("p.left").as("l"), col("p.right").as("r"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < minCount) exhausted = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        stream = stream.withColumn("__bpe",
          applyMerge(col("__bpe"), a, b))
        if ((r + 1) % checkpointEvery == 0)
          stream = stream.localCheckpoint()
      }
      r += 1
    }
    merges.toSeq
  }

  /** One BPE merge applied to a token array: every adjacent occurrence of
    * (`a`, `b`) becomes the single token `a + " " + b`, scanning left to
    * right — after a merge the merged token is what the next input token
    * is compared against, so overlapping occurrences ("a a a" under
    * (a, a)) merge leftmost-first exactly like the reference BPE scan.
    *
    * Deliberately a UDF, not a Column `aggregate` fold: the fold's
    * per-element `concat(acc, array(x))` copies the accumulator each
    * step — O(n²) array allocation per document, pathological at
    * book-length token counts — while the UDF is one linear buffer scan
    * (same justification as [[TF.rollingHash]]: a linear UDF beats a
    * quadratic codegen expression; the function is pure and
    * deterministic either way).
    */
  def applyMerge(toks: Column, a: String, b: String): Column =
    mergeUdf(toks, lit(a), lit(b))

  private val mergeUdf = udf { (toks: Seq[String], a: String, b: String) =>
    if (toks == null) null else mergeOnce(toks, a, b)
  }

  /** One leftmost-first merge scan — the single definition both
    * [[applyMerge]] (training) and [[encode]] (inference) rewrite with,
    * so the encoder reproduces the training stream exactly.
    */
  private def mergeOnce(toks: Seq[String], a: String,
      b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    toks.foreach { t =>
      if (out.nonEmpty && out.last == a && t == b)
        out(out.length - 1) = a + " " + b
      else out += t
    }
    out.toSeq
  }

  /** Encode a corpus against a TRAINED merge list in ONE corpus pass —
    * the operator a pipeline hits first after [[trainMerges]]: exporting
    * token ids means applying the whole vocabulary, not one merge.
    *
    * Per row this is the standard rank-priority BPE encoder: repeatedly
    * merge every occurrence of the lowest-rank (earliest-trained) pair
    * present until no trained pair applies. That reproduces sequential
    * training application exactly — a merge's output token (always
    * containing a space) can only participate in merges trained AFTER
    * it, so exhausting ranks in ascending order is the same rewrite
    * order training used; NoveltyTokenizerSpec round-trips the classic
    * char-level sequence to pin it, and the q94 oracle replays the full
    * train→encode chain in SQL.
    *
    * One UDF pass, map-only, no shuffle: the merge table rides in the
    * closure (a trained vocabulary is bounded — tens of thousands of
    * pairs, same class of fact as a tokenizer vocab file), NOT one
    * Spark pass per merge as chaining [[applyMerge]] would cost.
    * `tokensCol` joins the tokenize-once contract.
    */
  def encode(corpus: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], outCol: String = "encoded",
      tokensCol: Option[String] = None): DataFrame = {
    val mergesArr = merges.toArray
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val enc = udf { toks: Seq[String] => encodeTokens(toks, mergesArr, ranks) }
    corpus.withColumn(outCol,
      enc(tokensCol.map(col).getOrElse(TF.tokens(col(textCol)))))
  }

  /** The per-row rank-priority loop (exposed for spec round-trips).
    *
    * Cost bound: each iteration rescans the whole current stream for the
    * minimum rank, so the worst case is O(len · merges-applied) lookups
    * per document — quadratic-ish for book-length documents whose text
    * is mostly merge material. Fine at the gate/bench scales measured
    * (the one-pass probe is flat 5k→40k docs); if long-document profiles
    * ever show this hot, the standard fix is the adjacent-pair priority
    * queue (heap of candidate positions, O(len · log len)) — a per-row
    * rewrite, no change to the Spark plan shape.
    */
  private[operators] def encodeTokens(toks: Seq[String],
      merges: Array[(String, String)],
      ranks: Map[(String, String), Int]): Seq[String] = {
    if (toks == null) return null
    var cur = toks
    var more = true
    while (more) {
      var best = Int.MaxValue
      var i = 0
      while (i < cur.length - 1) {
        val r = ranks.getOrElse((cur(i), cur(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) more = false
      else cur = mergeOnce(cur, merges(best)._1, merges(best)._2)
    }
    cur
  }

  /** Token-ID export: [[encode]] then map each encoded token to its id in
    * the trained vocabulary = base symbols (distinct input tokens, sorted)
    * followed by one new symbol per merge in training order — the
    * standard BPE id assignment, deterministic given (corpus, merges).
    * Returns one row per (doc, position): (idCol, pos, token, token_id);
    * tokens outside the vocab (encoding a NEW corpus against an old
    * vocab) get id -1 rather than a row drop, so OOV is visible.
    *
    * The vocab side is built distributed (distinct + window rank over
    * the sorted symbol table) and the id join is a plain equi-join on
    * the token — corpus-cardinality, so un-hinted (AQE broadcasts when
    * it fits), the same rule as every df-style join in [[Keywords]].
    */
  def encodeIds(corpus: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)],
      tokensCol: Option[String] = None,
      vocab: Option[DataFrame] = None): DataFrame = {
    val enc = encode(corpus, idCol, textCol, merges, "__enc", tokensCol)
      .select(col(idCol),
        posexplode(col("__enc")).as(Seq("pos", "token")))
    // vocab defaults to THIS corpus's trained vocabulary; pass a frozen
    // (token, token_id) table to encode new data against an old vocab —
    // that is when OOV (-1) actually occurs
    val v = vocab.getOrElse(
      vocabulary(corpus, idCol, textCol, merges, tokensCol))
    enc.join(v, Seq("token"), "left")
      .select(col(idCol), col("pos"), col("token"),
        coalesce(col("token_id"), lit(-1L)).as("token_id"))
  }

  /** The trained vocabulary as (token, token_id): base symbols first
    * (sorted distinct input tokens, ids 0..nBase-1), then one id per
    * merge in training order — the standard BPE id assignment,
    * deterministic given (corpus, merges).
    *
    * The base table is corpus-cardinality (distinct tokens — billions at
    * 100 TB), so ids come from a DISTRIBUTED sort + zipWithIndex (range
    * partitioner gives a total order; per-partition offsets make the
    * index global) — never a global single-partition window. The only
    * driver-side fact is `nBase` (the vocab size, one long). Merged
    * symbols always contain a space while [[TF.tokens]] base symbols
    * never do, so the two id ranges cannot collide; two merges yielding
    * the same symbol string (possible only through pathological
    * ambiguity) keep the earlier id.
    */
  def vocabulary(corpus: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)],
      tokensCol: Option[String] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // persisted (scope-owned) BEFORE the count: the distinct + global
    // sort + zipWithIndex chain is the expensive part, and it is read by
    // the count() action here AND by every downstream union/join (an
    // encodeIds call reads it once more) — uncached, the
    // corpus-cardinality sort re-ran per reference
    val base = graft.CacheScope.register(corpus
      .select(explode(tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
        .as("token"))
      .distinct()
      .orderBy(col("token"))
      .as[String].rdd.zipWithIndex()
      .toDF("token", "token_id")
      .persist())
    val nBase = base.count()
    val merged = merges.zipWithIndex
      .map { case ((a, b), i) => (a + " " + b, nBase + i) }
      .toDF("token", "token_id")
      .groupBy(col("token")).agg(min(col("token_id")).as("token_id"))
    base.unionByName(merged)
  }

  /** Marker emitted by [[greedyEncode]] for a character outside the
    * vocabulary (an unseen-in-training char).
    */
  val Unk = "<unk>"

  /** WordPiece-flavored character-substring vocabulary: EVERY distinct
    * single character of the training tokens (the fallback alphabet),
    * plus the top-`n` most frequent contiguous substrings per length in
    * `topPerLen` — ranked on (count desc, piece asc), so the cut is
    * deterministic. Counting is one map-side explode + one
    * partial-aggregating shuffle per length; the result — alphabet +
    * Σ n pieces — is a CONFIG-bounded driver fact (the tokenizer-vocab
    * contract, same as [[encode]]'s merge table).
    */
  def greedySubstringVocab(train: DataFrame, textCol: String,
      topPerLen: Seq[(Int, Int)],
      tokensCol: Option[String] = None): Seq[String] = {
    require(topPerLen.forall { case (l, n) => l >= 2 && n > 0 },
      s"per-length tops must be (len >= 2, n > 0): $topPerLen")
    val toks = graft.CacheScope.register(train
      .select(explode(tokensCol.map(col)
        .getOrElse(TF.tokens(col(textCol)))).as("w"))
      .persist())
    // substring(w, i, l) over i = 1 .. len-l+1
    def pieces(l: Int): DataFrame = toks
      .filter(length(col("w")) >= l)
      .select(explode(transform(
        sequence(lit(1), length(col("w")) - (l - 1)),
        i => col("w").substr(i, lit(l)))).as("p"))
    val chars = pieces(1).distinct()
      .orderBy(col("p")).collect().map(_.getString(0))
    val top = topPerLen.flatMap { case (l, n) =>
      pieces(l).groupBy(col("p")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("p")).limit(n)
        .collect().map(_.getString(0))
    }
    (chars ++ top).distinct
  }

  /** Greedy longest-match segmentation of every token against a
    * substring vocabulary (the WordPiece/fast-tokenizer ENCODE path):
    * at each position take the longest vocab piece (≤ `maxPieceLen`)
    * starting there; a character no piece covers emits [[Unk]] and
    * advances one. One map-only UDF pass with the vocab set in the
    * closure — the [[encode]] contract; the greedy scan is O(len ·
    * maxPieceLen) hash probes per token.
    *
    * Output per doc: n_tokens, n_pieces, n_unk, and `pieces_md5` (md5
    * of the space-joined flat piece stream — the replay hash; vocab
    * pieces never contain spaces because tokens don't).
    */
  def greedyEncode(corpus: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], maxPieceLen: Int,
      tokensCol: Option[String] = None): DataFrame = {
    require(maxPieceLen >= 1, s"bad maxPieceLen $maxPieceLen")
    val vset = vocab.toSet
    val maxL = maxPieceLen
    val seg = udf { toks: Seq[String] =>
      if (toks == null) Seq.empty[String]
      else toks.flatMap { w =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var p = 0
        while (p < w.length) {
          var l = math.min(maxL, w.length - p)
          while (l > 0 && !vset.contains(w.substring(p, p + l))) l -= 1
          if (l == 0) { out += Unk; p += 1 }
          else { out += w.substring(p, p + l); p += l }
        }
        out.toSeq
      }
    }
    corpus
      .withColumn("__gp_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .withColumn("__gp_pieces", seg(col("__gp_toks")))
      .select(col(idCol),
        size(col("__gp_toks")).as("n_tokens"),
        size(col("__gp_pieces")).as("n_pieces"),
        size(filter(col("__gp_pieces"), _ === Unk)).as("n_unk"),
        md5(concat_ws(" ", col("__gp_pieces"))).as("pieces_md5"))
  }

  /** Spark's `round` semantics on a scalar (BigDecimal HALF_UP) — the
    * Viterbi scores must round EXACTLY like the SQL oracle's `round`.
    */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Viterbi best segmentation of one word under a log-prob vocabulary:
    * `best(j) = max_i round(best(i) + logp(word[i..j]), 6)` with the
    * per-stage 1e-6 re-round (grid-pinned trajectory) and the
    * earliest-split tie-break (strict `>` while i ascends) — the exact
    * argmax the SQL replay's `ORDER BY best DESC, i ASC` picks. The
    * alphabet-closure guarantee (every single char is in the vocab)
    * makes every word segmentable; a char outside it yields empty.
    */
  private[operators] def viterbiSegment(word: String,
      vocab: Map[String, Double], maxPieceLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (best(i) != Double.NegativeInfinity) {
          vocab.get(word.substring(i, j)).foreach { lp =>
            val sc = round6(best(i) + lp)
            if (sc > best(j)) { best(j) = sc; back(j) = i }
          }
        }
        i += 1
      }
      j += 1
    }
    if (back(n) < 0) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { out += word.substring(back(p), p); p = back(p) }
    out.reverse.toSeq
  }

  /** ONE EM round of unigram-LM (SentencePiece-style) vocabulary
    * estimation — the third tokenizer family beside BPE
    * ([[trainMerges]]) and WordPiece greedy encoding:
    *
    *  1. candidate pieces = every substring (length ≤ `maxPieceLen`) of
    *     the ≤ `maxWordLen`-truncated word table, weighted by word
    *     count — keep the top `k` (count desc, piece asc) PLUS every
    *     single character (the alphabet closure that keeps all words
    *     segmentable);
    *  2. initial piece log-probs from the candidate counts
    *     (`round(ln c − ln Σc, 6)`);
    *  3. E-step: Viterbi best segmentation per DISTINCT word (words are
    *     the unit of work — the corpus weight rides along), per-stage
    *     1e-6 grid so the trajectory replays in SQL;
    *  4. M-step: corpus-weighted piece-use counts from the chosen
    *     segmentations, re-normalized log-probs.
    *
    * Emits the top `topOut` pieces of the re-estimated vocabulary:
    * `(piece, cnt, n_uses, logp_next)`. The vocabulary table is a
    * config-bounded driver fact (k + alphabet rows — the k-means
    * centroid contract); everything corpus-sized stays distributed.
    */
  def unigramEmRound(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 60, maxPieceLen: Int = 4, maxWordLen: Int = 12,
      topOut: Int = 30, tokensCol: Option[String] = None): DataFrame = {
    require(k >= 1 && maxPieceLen >= 1 && maxWordLen >= maxPieceLen &&
      topOut >= 1, s"bad parameters k=$k len=$maxPieceLen/$maxWordLen")
    val words = graft.CacheScope.register(corpus
      .select(explode(tokensCol.map(col)
        .getOrElse(TF.tokens(col(textCol)))).as("__w0"))
      .select(substring(col("__w0"), 1, maxWordLen).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))
      .persist())
    // candidate substrings with multiplicity, corpus-weighted
    val cands = words
      .select(col("word"), col("wcnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)),
           |  i -> transform(sequence(1, least($maxPieceLen,
           |      length(word) - i + 1)),
           |    l -> substring(word, i, l))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wcnt")).as("cnt"))
    // top-k by (cnt DESC, piece) via TakeOrdered — piece is unique
    // (post-groupBy), so the order is total and limit(k) selects
    // exactly the rank-window's rk <= k set; single-char pieces are
    // rescued by anti-join, no global rank window anywhere
    val topK = cands.orderBy(col("cnt").desc, col("piece")).limit(k)
    val ranked = topK
      .unionByName(cands.filter(length(col("piece")) === 1)
        .join(topK, Seq("piece"), "left_anti"))
      .select(col("piece"), col("cnt"))
    val vocabRows = ranked.collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val total = vocabRows.map(_._2).sum.toDouble
    val vocabMap = vocabRows.map { case (p, c) =>
      p -> round6(math.log(c.toDouble) - math.log(total))
    }.toMap
    val mpl = maxPieceLen
    val segUdf = udf { w: String => viterbiSegment(w, vocabMap, mpl) }
    val uses = words
      .select(col("wcnt"), explode(segUdf(col("word"))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wcnt")).as("n_uses"))
    val cntDf = ranked // piece -> initial candidate count
    uses.join(cntDf, Seq("piece"))
      .crossJoin(broadcast(uses.agg(sum(col("n_uses")).as("__tu"))))
      .select(col("piece"), col("cnt"), col("n_uses"),
        round(log(col("n_uses").cast("double")) -
          log(col("__tu").cast("double")), 4).as("logp_next"))
      .orderBy(col("n_uses").desc, col("piece"))
      .limit(topOut)
  }

  /** Character-coverage audit — SentencePiece's `--character_coverage`
    * knob measured from the corpus (Kudo & Richardson 2018 default
    * 0.9995): for each coverage target, how many distinct characters a
    * tokenizer's base alphabet needs. Characters are the lowercased
    * codepoints of [[graft.functions.TextFunctions.charGrams]] (n = 1,
    * empty-string grams dropped), ranked by (count DESC, char ASC) — a
    * total order — and the answer is the shortest prefix whose count
    * sum reaches `target_bp` basis points of all character
    * occurrences, decided by the exact integer cross-multiplication
    * `cum·10000 ≥ target_bp·total`.
    *
    * One row per target: `(target_bp, n_chars, total_chars,
    * alphabet_size)`.
    *
    * Execution: ONE distributed char-count aggregation; the alphabet
    * is bounded BY CONTRACT (`maxAlphabet`, checked distributively
    * before the collect — the Markov maxStates discipline), so the
    * ranked prefix scan is a driver fold over ≤ `maxAlphabet` rows,
    * never a corpus-grain window. Magnitude audit (100 TB):
    * `total ~ 1e14` chars × `target_bp ≤ 1e4` = 1e18 — inside long
    * range; `cum·10000` likewise.
    */
  def charCoverage(docs: DataFrame, textCol: String,
      targetsBp: Seq[Int], maxAlphabet: Int = 65536): DataFrame = {
    require(targetsBp.nonEmpty && targetsBp.size <= 64 &&
      targetsBp.forall(t => t >= 1 && t <= 10000),
      s"targetsBp $targetsBp out of (0, 10000]")
    val spark = docs.sparkSession
    import spark.implicits._
    val cnt = docs
      .select(explode(graft.functions.TextFunctions
        .charGrams(col(textCol), 1)).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("ch")).agg(count(lit(1)).as("n"))
    val alphabet = cnt.count() // distributive bound check first
    require(alphabet <= maxAlphabet,
      s"$alphabet distinct chars exceed maxAlphabet $maxAlphabet")
    val ranked = cnt.collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (ch, n) => (-n, ch) }
    val total = ranked.map(_._2).sum
    val cums = ranked.scanLeft(0L)(_ + _._2).drop(1) // cum at pos k+1
    val rows = targetsBp.map { t =>
      val need = cums.indexWhere(c => c * 10000L >= t.toLong * total)
      val k = if (total == 0L) 0L
        else (need + 1).toLong // indexWhere always hits: cum_last=total
      (t, k, total, alphabet)
    }
    spark.createDataFrame(rows)
      .toDF("target_bp", "n_chars", "total_chars", "alphabet_size")
  }
}
