package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Cross-lingual deduplication — finding the SAME content carried under
  * different language labels (mirrored sites, machine-translated spam,
  * boilerplate replicated per-locale). A multilingual training corpus
  * that near-dups only within a language keeps every translated copy;
  * these operators block ACROSS languages on representations that
  * survive translation artifacts: diacritic folding, token-order
  * collapse, and token-set similarity.
  *
  * 100 TB shape: both entry points are equi-join blocked — the exact
  * path groups on one folded fingerprint (a plain hash aggregation),
  * the near-dup path reuses [[Dedup]]'s MinHash band join (candidates
  * are an equi-join on band keys, never all-pairs) with the language
  * filter applied to the sparse candidate set. No window, no
  * cross join, no driver collect.
  */
object CrossLingual {

  /** 1:1 Latin diacritic fold map — `translate` semantics, codepoint →
    * codepoint, so the SAME map runs codegen'd in Spark and verbatim in
    * a DuckDB `translate` mirror. Deliberately bounded to the common
    * Latin-1/Latin-Extended accents; multi-char expansions (ß→ss, œ→oe)
    * are out of contract (1:1 maps can't express them). Documents in
    * scripts beyond Latin lose their non-[a-z0-9] characters in the
    * fold; when NOTHING survives (a fully non-Latin document), the
    * fingerprint is NULL and the document is excluded from dedup
    * entirely — the safe failure mode (never a false merge, never a
    * shared empty-string hash).
    */
  val AccentFrom = "àáâãäåèéêëìíîïòóôõöùúûüçñýÿ"
  val AccentTo = "aaaaaaeeeeiiiiooooouuuucnyy"

  /** Fold text for cross-lingual blocking: lowercase, strip the mapped
    * diacritics, collapse every non-alphanumeric run to one space. Pure
    * built-in Column program (lower → translate → regexp_replace), so
    * the fold stays inside whole-stage codegen and the DuckDB oracle
    * runs the textually identical function chain.
    */
  def foldText(text: Column): Column =
    regexp_replace(translate(lower(text), AccentFrom, AccentTo),
      "[^a-z0-9]+", " ")

  /** Order-insensitive folded fingerprint: md5 of the sorted distinct
    * folded tokens (the [[TF.fingerprint]] key-collision device over
    * [[foldText]] output). Two documents that differ only in diacritics,
    * token order, duplication, punctuation, or whitespace collide.
    * NULL when the folded token set is EMPTY (a document with no
    * Latin/digit content — zh/ru/ar text, pure punctuation): hashing
    * the empty set would make every such document collide on md5(''),
    * falsely merging unrelated content across languages. Null keys
    * never match an equi-join and are filtered from the cluster /
    * index aggregations, so empty-fold documents simply opt out.
    */
  def foldedFingerprint(text: Column): Column = {
    val toks = array_distinct(TF.tokens(foldText(text)))
    when(size(toks) > 0, md5(array_join(array_sort(toks), " ")))
  }

  /** Unsegmented-script codepoint ranges folded at CHARACTER grain by
    * [[foldTextScripted]]: Han (URO + Extension A), Hiragana,
    * Katakana. `\x{...}` range syntax parses identically in Java
    * regex and RE2, so the class is textually mirrorable. Codepoint
    * grain is discriminative here because the script alphabets are
    * HUGE (thousands of distinct characters) — a codepoint set
    * rarely collides by accident.
    */
  val UnsegmentedClass: String =
    "\\x{3040}-\\x{30ff}\\x{3400}-\\x{4dbf}\\x{4e00}-\\x{9fff}"

  /** Space-less SMALL-alphabet script ranges folded at BIGRAM grain
    * by [[foldTextScripted]]: Thai, Lao, Khmer. These scripts rarely
    * write spaces (like CJK) but carry only a few dozen distinct
    * letters — at codepoint grain nearly every document of the same
    * language would share the same character SET and false-merge, so
    * each unbroken run explodes into its overlapping character
    * bigrams instead (the character-shingle device at n=2: local
    * order survives, anagram-level false merges don't happen, and a
    * re-crawl that only changes surrounding punctuation/whitespace
    * still collides because the runs themselves are untouched). True
    * dictionary segmentation stays out of contract — a run SPLIT
    * differently (a space inserted mid-word) changes the boundary
    * bigrams and under-merges, never false-merges.
    */
  val ShingledClass: String =
    "\\x{0e00}-\\x{0e7f}\\x{0e80}-\\x{0eff}\\x{1780}-\\x{17ff}"

  /** Script-aware fold (the round-15 answer to "non-Latin corpora get
    * ZERO exact dedup"): where [[foldText]] deletes everything outside
    * `[a-z0-9]`, this keeps letters and digits of EVERY script
    * (`\p{L}\p{Nd}` — one Unicode class swap), then isolates each
    * unsegmented-script character as its own token so zh/ja text — no
    * whitespace to split on — still folds order-insensitively at
    * codepoint grain (the CJK character-shingle convention), and
    * explodes each Thai/Lao/Khmer run into its character BIGRAMS
    * ([[ShingledClass]] — small alphabets need n-gram grain). Space-
    * segmented non-Latin scripts (Cyrillic, Greek, Arabic, Hebrew,
    * Hangul words) keep whitespace token grain. The chain is
    * lower → translate → two regexps, plus one split → transform →
    * rejoin HOF pass for the bigram explosion — still all Column
    * built-ins, no UDF, mirrored list-function-for-list-function by
    * the DuckDB oracles.
    *
    * Out of contract: locale special casing (İ→i̇, ß→ss — both
    * engines must agree on lower(), which holds for the 1:1 default
    * mappings), and dictionary segmentation (above).
    */
  def foldTextScripted(text: Column): Column = {
    val base = regexp_replace(
      regexp_replace(translate(lower(text), AccentFrom, AccentTo),
        "[^\\p{L}\\p{Nd}]+", " "),
      s"([$UnsegmentedClass])", " $1 ")
    val toksArr = filter(split(base, " "), t => length(t) > 0)
    val expanded = transform(toksArr, t =>
      when(t.rlike(s"^[$ShingledClass]{2,}$$"),
        array_join(transform(sequence(lit(1), length(t) - 1),
          i => t.substr(i, lit(2))), " "))
        .otherwise(t))
    array_join(expanded, " ")
  }

  /** Order-insensitive SCRIPT-AWARE fingerprint — [[foldedFingerprint]]
    * over [[foldTextScripted]]: same-script duplicates (a zh doc and
    * its re-crawled permutation) collide, while cross-script content
    * can never merge — tokens keep their native characters, so two
    * token SETS are equal only when the underlying characters are,
    * and the empty fold still yields NULL (pure-punctuation docs opt
    * out loudly, the [[foldedFingerprint]] contract).
    */
  def foldedFingerprintScripted(text: Column): Column = {
    val toks = array_distinct(TF.tokens(foldTextScripted(text)))
    when(size(toks) > 0, md5(array_join(array_sort(toks), " ")))
  }

  /** Fullwidth → ASCII width-fold map: U+FF01–FF5E is the fullwidth
    * twin of ASCII `!`–`~` (CJK input methods and copy flows emit it
    * for Latin letters, digits and punctuation embedded in zh/ja
    * text), plus the ideographic space U+3000 → space. Strictly 1:1
    * codepoint → codepoint, so the SAME literal pair runs codegen'd
    * in Spark `translate` and verbatim in the DuckDB mirror (the
    * [[AccentFrom]] contract). Generated, not typed: the blocks are
    * offset-parallel (U+FF01 + i ↔ 0x21 + i), so the map cannot drift
    * from the standard.
    *
    * Out of contract (documented, same reason ß→ss is): half-width
    * katakana U+FF61–FF9F — its fold to full-width katakana is not
    * 1:1 (voicing marks combine two codepoints into one), which a
    * `translate` map cannot express.
    */
  val WidthFrom: String =
    ((0xFF01 to 0xFF5E).map(_.toChar) :+ '　').mkString
  val WidthTo: String = ((0x21 to 0x7E).map(_.toChar) :+ ' ').mkString

  /** Width fold for dedup keys: fullwidth ASCII twins and the
    * ideographic space fold to their ASCII originals BEFORE the script
    * folds run. Without it `ＧＰＵ２０２４` and `gpu2024` never meet:
    * fullwidth Latin is still `\p{L}` and fullwidth digits are still
    * `\p{Nd}`, so [[foldTextScripted]] keeps them as a DISTINCT token
    * rather than deleting them — width-variant re-crawls (the classic
    * zh/ja mixed-script duplicate class) silently under-merge. One
    * `translate`, stays inside whole-stage codegen.
    */
  def foldWidth(text: Column): Column =
    translate(text, WidthFrom, WidthTo)

  /** [[foldedFingerprintScripted]] over [[foldWidth]] — the key that
    * merges width-variant spellings on top of everything the scripted
    * fingerprint already folds. Kept as its own fingerprint (rather
    * than folding width INTO the scripted key) so existing persisted
    * scripted indexes stay valid: a key function change invalidates
    * every at-rest fingerprint built with it.
    */
  def foldedFingerprintWide(text: Column): Column =
    foldedFingerprintScripted(foldWidth(text))

  /** The INVISIBLE characters that smuggle duplicate content past
    * every token-shaped key: zero-width space/non-joiner/joiner
    * (U+200B–200D), the soft hyphen (U+00AD), and the zero-width
    * no-break space / stray BOM (U+FEFF). All are `Cf`/format
    * characters, so the script folds turn each one into a token
    * BOUNDARY — `data​base` (ZWSP inside) fingerprints as two tokens
    * against `database`'s one, and the re-crawl that dropped the
    * invisible silently under-merges. The class is spelled in
    * `\x{...}` so the SAME text parses in Java regex and RE2 (the
    * [[UnsegmentedClass]] convention).
    */
  val InvisibleClass: String =
    "\\x{200b}\\x{200c}\\x{200d}\\x{00ad}\\x{feff}"

  /** Delete invisible characters (not replace-with-space: they sit
    * INSIDE words — soft hyphen at a break point, ZWSP from copy
    * flows — so deletion rejoins the word the writer meant). One
    * regexp_replace, codegen'd, textually mirrorable.
    */
  def stripInvisible(text: Column): Column =
    regexp_replace(text, s"[$InvisibleClass]", "")

  /** The full canonical fingerprint stack — invisible strip → width
    * fold → script-aware fingerprint: the key a production crawl
    * dedup would block on, folding (in one pass) diacritics, token
    * order, every script's duplicates at its right grain, fullwidth
    * spellings, and invisible-character re-crawl variants. Same
    * NULL-on-empty opt-out as every fingerprint here.
    */
  def foldedFingerprintCanonical(text: Column): Column =
    foldedFingerprintScripted(foldWidth(stripInvisible(text)))

  /** Additional script ranges for [[scriptProfile]] (the dedup folds
    * above only need the unsegmented/shingled classes; the AUDIT
    * wants the big space-segmented scripts named too).
    */
  val CyrillicClass: String = "\\x{0400}-\\x{04ff}"
  val ArabicClass: String = "\\x{0600}-\\x{06ff}"

  /** Per-document script profile + the LABEL-vs-SCRIPT audit's raw
    * material: character counts per script class (Han/kana, Latin
    * letters, Cyrillic, Thai/Lao/Khmer, Arabic) via the removal
    * device (`length − length(after-delete)` — one regexp per class,
    * no explode, whole-stage codegen), Han/Latin shares on the 1e-6
    * grid, and the dominant script (most characters; ties resolve in
    * the fixed han > latin > cyrillic > thai > arabic order, `none`
    * when no class hits). A corpus whose `lang` column says zh over a
    * Latin-dominant profile is mislabeled routing — the audit that
    * catches locale tags assigned by URL patterns instead of content
    * (every multilingual pipeline's q26/q340 language-ID stages
    * assume the label is at least script-consistent).
    *
    * 100 TB shape: map-only — six regexp counts and a CASE per row,
    * no shuffle at all until whatever aggregation the caller adds.
    */
  def scriptProfile(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(cls: String): Column =
      (length(t) - length(regexp_replace(t, s"[$cls]", ""))).cast("long")
    def share(c: Column): Column =
      when(col("n_chars") > 0, graft.functions.Grid.snap(
        c.cast("double") / col("n_chars").cast("double"), 6))
    docs
      .withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_han", cnt(UnsegmentedClass))
      .withColumn("n_latin", cnt("a-zA-Z"))
      .withColumn("n_cyrillic", cnt(CyrillicClass))
      .withColumn("n_thai_family", cnt(ShingledClass))
      .withColumn("n_arabic", cnt(ArabicClass))
      .withColumn("han_share", share(col("n_han")))
      .withColumn("latin_share", share(col("n_latin")))
      .withColumn("dominant_script",
        when(col("n_han") >= col("n_latin") &&
          col("n_han") >= col("n_cyrillic") &&
          col("n_han") >= col("n_thai_family") &&
          col("n_han") >= col("n_arabic") && col("n_han") > 0, "han")
          .when(col("n_latin") >= col("n_cyrillic") &&
            col("n_latin") >= col("n_thai_family") &&
            col("n_latin") >= col("n_arabic") &&
            col("n_latin") > 0, "latin")
          .when(col("n_cyrillic") >= col("n_thai_family") &&
            col("n_cyrillic") >= col("n_arabic") &&
            col("n_cyrillic") > 0, "cyrillic")
          .when(col("n_thai_family") >= col("n_arabic") &&
            col("n_thai_family") > 0, "thai")
          .when(col("n_arabic") > 0, "arabic")
          .otherwise("none"))
  }

  /** Per-chunk language votes → per-document code-switch audit (the
    * multilingual-corpus QC step that document-grain language ID
    * cannot see: a document that OPENS in English and drifts into
    * German scores "en" as a whole, yet poisons both monolingual
    * pools it could feed). Documents split into non-overlapping
    * `chunkTokens`-token chunks ([[TF.chunksOf]] — the q118 tiling
    * grain); each chunk votes via the stopword-profile heuristic
    * ([[TF.langIdOf]]: en/de/fr/und, deterministic tie order); the
    * audit reports chunk totals per language, the majority language
    * (most chunk votes, ties in the en > de > fr > und profile
    * order), and `is_mixed` — ≥ 2 DISTINCT non-und languages each
    * holding at least one chunk.
    *
    * 100 TB shape: ZERO shuffles — the chunk loop is a per-row
    * `transform` over the token array (chunks never explode to rows),
    * the votes fold into four bounded counters per document, and
    * every stage is built-in Column algebra inside one projection.
    * The trained-model sibling ([[TrainedLangId]]) stays at document
    * grain; this heuristic form is the cheap whole-corpus sweep that
    * decides which documents to re-score there.
    */
  def codeSwitchAudit(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"bad chunkTokens $chunkTokens")
    val tk = TF.tokens(col(textCol))
    val votes = transform(
      TF.chunksOf(tk, chunkTokens, overlap = 0),
      c => TF.langIdOf(TF.tokens(c)))
    def votesFor(lang: String)(v: Column): Column =
      size(filter(v, x => x === lang)).cast("long")
    docs
      .withColumn("__cs_votes", votes)
      .withColumn("n_chunks", size(col("__cs_votes")).cast("long"))
      .withColumn("n_en", votesFor("en")(col("__cs_votes")))
      .withColumn("n_de", votesFor("de")(col("__cs_votes")))
      .withColumn("n_fr", votesFor("fr")(col("__cs_votes")))
      .withColumn("n_und", votesFor("und")(col("__cs_votes")))
      .withColumn("primary_lang",
        when(col("n_en") >= col("n_de") && col("n_en") >= col("n_fr") &&
          col("n_en") >= col("n_und"), "en")
          .when(col("n_de") >= col("n_fr") && col("n_de") >= col("n_und"),
            "de")
          .when(col("n_fr") >= col("n_und"), "fr")
          .otherwise("und"))
      .withColumn("n_langs",
        ((col("n_en") > 0).cast("int") + (col("n_de") > 0).cast("int") +
          (col("n_fr") > 0).cast("int")).cast("long"))
      .withColumn("is_mixed", col("n_langs") >= 2)
      .drop("__cs_votes")
  }

  /** One hash aggregation from a fingerprint column to the cluster
    * table — shared by the Latin-fold and script-aware entry points.
    */
  private def clustersBy(docs: DataFrame, idCol: String,
      langCol: String, fp: Column): DataFrame =
    docs
      .select(col(idCol).as("__id"), col(langCol).as("__lang"),
        fp.as("fp"))
      .filter(col("fp").isNotNull) // empty-fold docs never cluster
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__lang")).as("n_langs"),
        min(col("__id")).as("canonical_id"),
        array_join(array_sort(collect_set(col("__lang"))), ",")
          .as("langs"))
      .filter(col("n_docs") >= 2 && col("n_langs") >= 2)

  /** Exact cross-lingual duplicate clusters: group documents by
    * [[foldedFingerprint]] and keep clusters that span ≥ 2 documents AND
    * ≥ 2 distinct languages. One hash aggregation — the exact-dedup
    * plan shape, linear at any corpus size. Canonical doc = min id
    * (deterministic election).
    *
    * Output: (fp, n_docs, n_langs, canonical_id, langs) — langs the
    * sorted comma-joined distinct language set, one row per cluster.
    */
  def crossLingualClusters(docs: DataFrame, idCol: String,
      textCol: String, langCol: String): DataFrame =
    clustersBy(docs, idCol, langCol, foldedFingerprint(col(textCol)))

  /** [[crossLingualClusters]] under the script-aware fold: non-Latin
    * corpora dedup WITHIN their script (zh mirrored under zh-tw, ru
    * under a mislabeled locale) instead of opting out wholesale —
    * same plan shape, same ≥2-docs ≥2-langs cluster contract.
    */
  def scriptAwareClusters(docs: DataFrame, idCol: String,
      textCol: String, langCol: String): DataFrame =
    clustersBy(docs, idCol, langCol,
      foldedFingerprintScripted(col(textCol)))

  /** Incremental form — the [[Dedup.incrementalDedupExact]] shape for
    * the folded fingerprint: flag each DELTA document whose
    * order-insensitive folded fingerprint already exists in the CORPUS,
    * with the matched canonical (min corpus id), the matched cluster's
    * language set, and whether the hit is CROSS-lingual (the new doc's
    * language is absent from the matched cluster — the "translated
    * re-crawl" signal). One fingerprint aggregation on the corpus side
    * + one equi-join; the corpus fingerprint table is what a streaming
    * ingest would hold as its dedup index.
    *
    * Output: one row per delta doc — (idCol, langCol, is_dup,
    * matched_id, matched_langs, is_cross_lingual).
    */
  /** The corpus-side fingerprint index `(fp, matched_id, lang_set)` —
    * what [[flagIncremental]] probes in batch and
    * [[graft.streaming.CrossLingualStream.collisions]] joins as the
    * STATIC side of a stream-static join: one row per distinct folded
    * fingerprint, canonical = min id, languages sorted.
    */
  private def indexBy(corpus: DataFrame, idCol: String,
      langCol: String, fp: Column): DataFrame =
    corpus
      .select(fp.as("fp"),
        col(idCol).as("__cid"), col(langCol).as("__clang"))
      .filter(col("fp").isNotNull) // empty-fold docs never index
      .groupBy(col("fp"))
      .agg(min(col("__cid")).as("matched_id"),
        array_sort(collect_set(col("__clang"))).as("__langs"))

  def fingerprintIndex(corpus: DataFrame, idCol: String,
      textCol: String, langCol: String): DataFrame =
    indexBy(corpus, idCol, langCol, foldedFingerprint(col(textCol)))

  /** [[fingerprintIndex]] under the script-aware fold — what a
    * multilingual ingest holds so zh/ja/ru deltas probe a REAL index
    * instead of opting out (the [[foldedFingerprintScripted]]
    * contract).
    */
  def fingerprintIndexScripted(corpus: DataFrame, idCol: String,
      textCol: String, langCol: String): DataFrame =
    indexBy(corpus, idCol, langCol,
      foldedFingerprintScripted(col(textCol)))

  /** [[fingerprintIndex]] under the full canonical stack
    * ([[foldedFingerprintCanonical]]) — what the ingest edge holds
    * when width-variant and invisible-char re-crawls must hit the
    * index too.
    */
  def fingerprintIndexCanonical(corpus: DataFrame, idCol: String,
      textCol: String, langCol: String): DataFrame =
    indexBy(corpus, idCol, langCol,
      foldedFingerprintCanonical(col(textCol)))

  private def flagBy(delta: DataFrame, corpFp0: DataFrame,
      idCol: String, langCol: String, fp: Column): DataFrame = {
    val corpFp = corpFp0.withColumnRenamed("fp", "__fp")
    delta
      .select(col(idCol), col(langCol), fp.as("__fp"))
      .join(corpFp, Seq("__fp"), "left")
      .select(col(idCol), col(langCol),
        col("matched_id").isNotNull.as("is_dup"),
        col("matched_id"),
        when(col("matched_id").isNotNull,
          array_join(col("__langs"), ",")).as("matched_langs"),
        (col("matched_id").isNotNull &&
          !array_contains(col("__langs"), col(langCol)))
          .as("is_cross_lingual"))
  }

  def flagIncremental(delta: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, langCol: String): DataFrame =
    flagBy(delta,
      fingerprintIndex(corpus, idCol, textCol, langCol),
      idCol, langCol, foldedFingerprint(col(textCol)))

  /** [[flagIncremental]] under the script-aware fold: a zh delta doc
    * now MATCHES the corpus copy of its content (same-script
    * permutation, re-crawl under another locale label) where the
    * Latin fold gave it a NULL key and waved it through. Same one
    * index aggregation + one left equi-join; the stream form joins
    * [[fingerprintIndexScripted]] stream-static unchanged.
    */
  def flagIncrementalScripted(delta: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, langCol: String): DataFrame =
    flagBy(delta,
      fingerprintIndexScripted(corpus, idCol, textCol, langCol),
      idCol, langCol, foldedFingerprintScripted(col(textCol)))

  /** [[flagIncremental]] under the full canonical stack: a delta doc
    * that re-spells corpus content through fullwidth twins or smuggles
    * ZWSP/soft-hyphens past the token keys still matches. Same one
    * index aggregation + one left equi-join; stream-static unchanged.
    */
  def flagIncrementalCanonical(delta: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, langCol: String): DataFrame =
    flagBy(delta,
      fingerprintIndexCanonical(corpus, idCol, textCol, langCol),
      idCol, langCol, foldedFingerprintCanonical(col(textCol)))

  /** [[crossLingualClusters]] with QUALITY-aware canonical election —
    * the keep-best form ([[Dedup]]'s q127 device at cross-lingual
    * grain): instead of the min-id convention, each cluster keeps the
    * document with the HIGHEST `scoreCol` (tie → smaller id), so a
    * multilingual dedup stage retains the best-quality copy of
    * replicated content rather than whichever crawled first. The
    * election is one keyed window over cluster members — same shuffle
    * class as the cluster aggregation itself.
    *
    * Output: (fp, n_docs, n_langs, canonical_id, canonical_score,
    * langs).
    */
  def crossLingualClustersKeepBest(docs: DataFrame, idCol: String,
      textCol: String, langCol: String, scoreCol: String): DataFrame =
    keepBestBy(docs, idCol, langCol, scoreCol,
      foldedFingerprint(col(textCol)))

  /** [[crossLingualClustersKeepBest]] under the script-aware fold —
    * the quality-aware election for multilingual corpora where the
    * Latin fold would have NULLed every non-Latin cluster away.
    */
  def scriptAwareClustersKeepBest(docs: DataFrame, idCol: String,
      textCol: String, langCol: String, scoreCol: String): DataFrame =
    keepBestBy(docs, idCol, langCol, scoreCol,
      foldedFingerprintScripted(col(textCol)))

  private def keepBestBy(docs: DataFrame, idCol: String,
      langCol: String, scoreCol: String, fp: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs
      .select(col(idCol).as("__id"), col(langCol).as("__lang"),
        col(scoreCol).as("__score"),
        fp.as("fp"))
      .filter(col("fp").isNotNull)
    val clusters = base.groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__lang")).as("n_langs"),
        array_join(array_sort(collect_set(col("__lang"))), ",")
          .as("langs"))
      .filter(col("n_docs") >= 2 && col("n_langs") >= 2)
    val w = Window.partitionBy(col("fp"))
      .orderBy(col("__score").desc, col("__id"))
    val best = base
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("fp"), col("__id").as("canonical_id"),
        col("__score").as("canonical_score"))
    clusters.join(best, Seq("fp"))
      .select(col("fp"), col("n_docs"), col("n_langs"),
        col("canonical_id"), col("canonical_score"), col("langs"))
  }

  /** Cross-lingual SEMANTIC near-dup pairs — LASER-style embedding
    * blocking: where [[crossLingualNearDupPairs]] needs surviving
    * LEXICAL overlap after the fold (same tokens, different dressing),
    * this blocks on a multilingual EMBEDDING space, so genuinely
    * translated content (zero token overlap) can still pair. Candidates
    * come from [[Similarity.semanticDupPairsTrained]]'s trained-list
    * equi-join (the SemDeDup recipe — never all-pairs), verified at
    * cosine ≥ `threshold`, kept only when the sides carry DIFFERENT
    * language labels — the filter prunes the sparse verified set.
    *
    * Output: (a_id, b_id, lang_a, lang_b, cos), a_id < b_id.
    */
  def embeddingDupPairs(vectors: DataFrame, idCol: String,
      vecCol: String, langCol: String, threshold: Double,
      centroids: Seq[Seq[Double]], nAssign: Int = 2): DataFrame = {
    val pairs = Similarity.semanticDupPairsTrained(vectors, idCol,
      vecCol, threshold, centroids, nAssign)
    val langs = vectors.select(col(idCol).as("__lid"),
      col(langCol).as("__llang"))
    pairs
      .join(langs.withColumnRenamed("__lid", "a_id")
        .withColumnRenamed("__llang", "lang_a"), "a_id")
      .join(langs.withColumnRenamed("__lid", "b_id")
        .withColumnRenamed("__llang", "lang_b"), "b_id")
      .filter(col("lang_a") =!= col("lang_b"))
      .select(col("a_id"), col("b_id"), col("lang_a"), col("lang_b"),
        col("cos"))
  }

  /** Cross-lingual NEAR-duplicate pairs: MinHash-banded candidates over
    * the FOLDED text (so accent/punctuation variants band together),
    * verified by exact token-set Jaccard ≥ `threshold`, kept only when
    * the two sides carry DIFFERENT language labels. Candidates come
    * from [[Dedup.minhashNearDupPairs]]'s band equi-join — the language
    * filter prunes the sparse verified set, never the pair space.
    *
    * Output: (a_id, b_id, lang_a, lang_b, jaccard).
    */
  def crossLingualNearDupPairs(docs: DataFrame, idCol: String,
      textCol: String, langCol: String, threshold: Double,
      k: Int = 16, shingleLen: Int = 3, bands: Int = 4): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"bad threshold $threshold")
    val folded = docs.select(col(idCol),
      foldText(col(textCol)).as("__folded"))
    val pairs = Dedup.minhashNearDupPairs(folded, idCol, "__folded",
      threshold, k, shingleLen, bands)
    val langs = docs.select(col(idCol).as("__lid"),
      col(langCol).as("__llang"))
    pairs
      .join(langs.withColumnRenamed("__lid", "a_id")
        .withColumnRenamed("__llang", "lang_a"), "a_id")
      .join(langs.withColumnRenamed("__lid", "b_id")
        .withColumnRenamed("__llang", "lang_b"), "b_id")
      .filter(col("lang_a") =!= col("lang_b"))
      .select(col("a_id"), col("b_id"), col("lang_a"), col("lang_b"),
        col("jaccard"))
  }
}
