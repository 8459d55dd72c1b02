package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher repetition-and-shape signal suite (Rae et al. 2021,
  * appendix A1.1) — the published per-document statistics behind the
  * "remove excessively repetitive documents" filter every large-corpus
  * pipeline applies before training:
  *
  *   - `top_ngram_char_frac`: fraction of the document's token
  *     characters claimed by its single most frequent n-gram
  *     (count x gram-char-length / total token chars) — a page whose
  *     top bigram owns 20% of its characters is boilerplate.
  *   - `dup_ngram_char_frac`: fraction of token characters COVERED by
  *     n-grams that occur more than once in the document — coverage,
  *     not a count ratio: each token position is counted once no
  *     matter how many duplicated grams overlap it (the definition
  *     that makes "abab..." score ~1.0 instead of >1).
  *   - `mean_word_len`, `alpha_word_frac` (words containing a Latin
  *     letter), `symbol_word_ratio` (`#` and `...` occurrences per
  *     word) — the companion shape heuristics from the same table.
  *
  * 100 TB shape: one tokenize pass feeds every signal; the gram tables
  * shuffle on `(doc, gram)` and the coverage distinct on `(doc,
  * position)` — per-document keys, so the whole suite partitions by
  * document and no stage ever sees cross-document state. The top-gram
  * pick is an `agg(max(struct(...)))` (map-side partial), never a
  * window over the gram table.
  *
  * Determinism: the top gram ties on (count, char-length, gram) by
  * struct-max ordering — gram DESC on the final component — and the
  * fractions are exact integer ratios divided once at the end, so the
  * oracle replays them bit-identically.
  */
object Repetition {

  /** Gopher-style drop thresholds (defaults sized to the published
    * table where the corpus makes the rule live). Rule order — first
    * failure names the reason — matches the declaration order in
    * [[annotateGopher]].
    */
  final case class Thresholds(
      minWords: Int = 20,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 2.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      minAlphaWordFrac: Double = 0.8,
      maxTopNgramCharFrac: Double = 0.20,
      maxDupNgramCharFrac: Double = 0.20)

  /** Per-document signal table: `(idCol, n_words, tot_chars,
    * mean_word_len, alpha_word_frac, symbol_word_ratio,
    * top_ngram_char_frac, dup_ngram_char_frac)`. Documents shorter
    * than `nTop` (resp. `nDup`) tokens have no grams of that order and
    * score 0.0 on the corresponding fraction. `tokensCol` joins the
    * tokenize-once contract ([[CorpusPipeline.prepare]]).
    */
  def gopherSignals(docs: DataFrame, idCol: String, textCol: String,
      nTop: Int = 2, nDup: Int = 2,
      tokensCol: Option[String] = None): DataFrame = {
    require(nTop >= 1 && nDup >= 1, s"bad gram orders ($nTop, $nDup)")
    val base = graft.CacheScope.register(docs
      .withColumn("__rp_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(
        col(idCol),
        col("__rp_toks").as("t"),
        size(col("__rp_toks")).cast("long").as("n_words"),
        aggregate(transform(col("__rp_toks"), x => length(x).cast("long")),
          lit(0L), (a, x) => a + x).as("tot_chars"),
        size(filter(col("__rp_toks"), x => x.rlike("[a-z]")))
          .cast("long").as("n_alpha"),
        ((length(col(textCol))
            - length(regexp_replace(col(textCol), "#", "")))
          + (length(col(textCol))
            - length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3)
          .cast("long").as("n_symbols"))
      .persist())

    // (doc, start-position, gram) rows of order n — the only
    // corpus-scale explode; reused for both orders when they agree
    def grams(n: Int): DataFrame = base
      .filter(col("n_words") >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(0), (col("n_words") - n).cast("int")),
        i => struct(i.as("i"),
          concat_ws(" ", slice(col("t"), i + 1, lit(n))).as("gram"))))
        .as("g"))
      .select(col(idCol), col("g.i").as("i"), col("g.gram").as("gram"))

    val gTop = grams(nTop)
    val gDup =
      if (nDup == nTop) graft.CacheScope.register(gTop.persist())
      else grams(nDup)
    val gTopShared = if (nDup == nTop) gDup else gTop

    // joined with single spaces, a gram's character mass is its string
    // length minus the (n-1) separators
    val top = gTopShared
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"),
        first(length(col("gram")) - (nTop - 1)).cast("long").as("charlen"))
      .groupBy(col(idCol))
      .agg(max(struct(col("cnt"), col("charlen"), col("gram"))).as("m"))
      .select(col(idCol),
        (col("m.cnt") * col("m.charlen")).cast("long").as("top_chars"))

    val dupGrams = gDup
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(col(idCol), col("gram"))
    val covered = gDup
      .join(dupGrams, Seq(idCol, "gram"))
      .select(col(idCol),
        explode(sequence(col("i"), col("i") + (nDup - 1))).as("idx"))
      .distinct()
    val tokLens = base.select(col(idCol),
      posexplode(col("t")).as(Seq("idx", "tok")))
      .select(col(idCol), col("idx"), length(col("tok")).cast("long").as("len"))
    val covChars = covered.join(tokLens, Seq(idCol, "idx"))
      .groupBy(col(idCol))
      .agg(sum(col("len")).as("cov_chars"))

    // zero-token / zero-char documents carry null ratios (never NaN or
    // Infinity from a 0/0) — the min_words rule names them anyway
    def overWords(c: Column) =
      when(col("n_words") > 0, c.cast("double") / col("n_words"))
    def overChars(c: Column) =
      when(col("tot_chars") > 0,
        coalesce(c, lit(0L)).cast("double") / col("tot_chars"))
    base
      .join(top, Seq(idCol), "left")
      .join(covChars, Seq(idCol), "left")
      .select(col(idCol), col("n_words"), col("tot_chars"),
        overWords(col("tot_chars")).as("mean_word_len"),
        overWords(col("n_alpha")).as("alpha_word_frac"),
        overWords(col("n_symbols")).as("symbol_word_ratio"),
        overChars(col("top_chars")).as("top_ngram_char_frac"),
        overChars(col("cov_chars")).as("dup_ngram_char_frac"))
  }

  /** [[gopherSignals]] plus the Gopher keep/drop verdict: a
    * `drop_reason` column naming the FIRST failing rule (null = keep),
    * the [[QualityFilters]] audit convention, so dropped volume is
    * attributable per rule.
    */
  def annotateGopher(docs: DataFrame, idCol: String, textCol: String,
      t: Thresholds = Thresholds(), nTop: Int = 2, nDup: Int = 2,
      tokensCol: Option[String] = None): DataFrame = {
    import QualityFilters.Rule
    QualityFilters.annotateWith(
      gopherSignals(docs, idCol, textCol, nTop, nDup, tokensCol),
      Seq(
        Rule("min_words", col("n_words") < t.minWords),
        Rule("max_words", col("n_words") > t.maxWords),
        Rule("mean_word_len",
          col("mean_word_len") < t.minMeanWordLen ||
            col("mean_word_len") > t.maxMeanWordLen),
        Rule("symbol_ratio", col("symbol_word_ratio") > t.maxSymbolWordRatio),
        Rule("alpha_frac", col("alpha_word_frac") < t.minAlphaWordFrac),
        Rule("top_ngram", col("top_ngram_char_frac") > t.maxTopNgramCharFrac),
        Rule("dup_ngram", col("dup_ngram_char_frac") > t.maxDupNgramCharFrac)))
  }
}
