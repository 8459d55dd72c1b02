package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact span-level duplication — the "no training document should repeat
  * a long verbatim passage of another" criterion (the k-token exact
  * substring dedup popularized for LLM corpora; span ≈ 50 tokens in the
  * published recipes, configurable here).
  *
  * 100 TB shape: each document explodes to its distinct k-token spans
  * ONCE; span identity travels as the 8-byte `xxhash64` of the span text
  * (a 50-token span is ~300 bytes — hashing cuts the shuffle ~40×; a
  * cross-span hash collision inventing a false shared span is ~2⁻⁶⁴ per
  * bucket, the same accepted divergence as the LSH band keys). Pair
  * generation is an equi-join on the span hash, NEVER all-pairs, and the
  * `maxDf` hub cap keeps template spans (present in hundreds of
  * documents — [[Boilerplate]]'s territory, not dedup's) from exploding
  * the join quadratically: a span in more than `maxDf` documents is
  * boilerplate evidence, not a copying edge.
  */
object SpanDedup {

  /** Distinct (id, span-hash) rows: the exploded inverted-index side.
    * Map-only: `shinglesOf` is per-doc distinct already (array_distinct),
    * so no dedup shuffle is needed — (id, h) rows are distinct by
    * construction (up to the accepted 2⁻⁶⁴ within-doc hash collision).
    */
  private def spanRows(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, tokensCol: Option[String]): DataFrame =
    // tokens materialized in their own projection BEFORE the shingle
    // lambda — inlining tokens(text) re-runs the regexp split per
    // shingle element (the HOF re-evaluation trap; q82 4.3 s -> 0.6 s
    // at sf0.1, the same measured fix as Contamination's)
    df.withColumn("__sp_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol).as("id"),
        explode(TF.shinglesOf(col("__sp_toks"), spanTokens)).as("span"))
      .select(col("id"), xxhash64(col("span")).as("h"))

  /** Duplicate-passage REMOVAL — the rewrite form of span dedup (the
    * "deduplicating training data" recipe: delete every repeated
    * verbatim passage beyond its first occurrence, keep the rest of the
    * document). Documents tile into NON-OVERLAPPING `tileTokens`-token
    * windows (last partial tile kept); a tile occurrence survives iff it
    * is the globally FIRST occurrence of that tile text — first by
    * `(id, tile_idx)`, so the keeper is deterministic and repeats
    * WITHIN a document collapse too. Returns all columns of `df` plus
    * `n_tiles`, `n_removed`, and `clean_text` (surviving tiles in
    * original order; `""` when everything was removed or the doc was
    * empty).
    *
    * Tiling (not the sliding shingles of [[sharedSpanPairs]]) is what
    * makes REMOVAL well-defined: overlapping duplicate spans would
    * delete intersecting token ranges. The alignment cost is the
    * honest trade — a copied passage not aligned to a tile boundary
    * in both documents is detected by the sliding-window flaggers but
    * only removed here when tiles line up; suffix-automaton removal
    * (the published exact algorithm) does not decompose into dataframe
    * algebra.
    *
    * 100 TB shape: one tile explode (map-only), one partial-agg shuffle
    * to the per-tile (first-occurrence, count) table, one UN-hinted
    * equi-join back on tile text (corpus-cardinality — the [[Keywords]]
    * df-join rule), and one doc-grain reassembly shuffle. Tile identity
    * travels as the tile STRING (tiles are disjoint, so the total join
    * payload is ≈ corpus size — unlike the sliding-window case there is
    * no ×k blowup for a hash to claw back, and the string key keeps the
    * operator exactly engine-replayable).
    */
  def removeDuplicateTiles(df: DataFrame, idCol: String, textCol: String,
      tileTokens: Int, tokensCol: Option[String] = None): DataFrame = {
    require(tileTokens >= 1, s"bad tileTokens $tileTokens")
    val tiles = graft.CacheScope.register(df
      .withColumn("__sp_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol).as("__sp_id"),
        posexplode(filter(
          TF.chunksOf(col("__sp_toks"), tileTokens, overlap = 0),
          t => length(t) > 0)))
      .toDF("__sp_id", "tile_idx", "tile")
      .persist())
    val firsts = tiles.groupBy(col("tile"))
      .agg(min(struct(col("__sp_id"), col("tile_idx"))).as("first"))
    val kept = tiles
      .join(firsts, Seq("tile")) // un-hinted: see Scaladoc
      .filter(col("__sp_id") === col("first.__sp_id") &&
        col("tile_idx") === col("first.tile_idx"))
    val cleaned = kept.groupBy(col("__sp_id"))
      .agg(count(lit(1)).as("__sp_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("tile_idx"), col("tile")))),
          x => x.getField("tile")), " ").as("clean_text"))
    val totals = tiles.groupBy(col("__sp_id"))
      .agg(count(lit(1)).as("n_tiles"))
    df.join(totals.withColumnRenamed("__sp_id", idCol), Seq(idCol), "left")
      .join(cleaned.withColumnRenamed("__sp_id", idCol), Seq(idCol), "left")
      .na.fill(0L, Seq("n_tiles", "__sp_kept"))
      .withColumn("n_removed", col("n_tiles") - col("__sp_kept"))
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
      .drop("__sp_kept")
  }

  /** Document pairs sharing ≥1 exact `spanTokens`-token span, with the
    * count of distinct shared spans per pair. Spans present in more than
    * `maxDf` documents are excluded (hub cap, see object doc); spans in
    * fewer than 2 trivially pair with nobody and are dropped before the
    * self-join, so the join's input is exactly the duplicated-span
    * inverted index.
    */
  def sharedSpanPairs(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, maxDf: Int = 50,
      tokensCol: Option[String] = None): DataFrame = {
    // the explode feeds the df aggregation AND both sides of the pair
    // join — cached for the duration of the call (CacheScope contract,
    // same as Boilerplate/Novelty); uncached, the tokenize+shingle pass
    // re-ran up to 4x and the bench showed it (q82 8.9 s -> 1.3 s)
    val rows = graft.CacheScope.register(
      spanRows(df, idCol, textCol, spanTokens, tokensCol).persist())
    // span df (documents per span) is one partial-agg shuffle; the
    // 2..maxDf filter bounds each span's contribution to ≤ maxDf²/2
    // pairs BEFORE the self-join. Cached too: the self-join reads it
    // twice, and recomputing it costs the df shuffle each time.
    val eligible = graft.CacheScope.register(
      rows.join(
        rows.groupBy(col("h")).agg(count(lit(1)).as("__df"))
          .filter(col("__df").between(2, maxDf))
          .select(col("h")),
        Seq("h")).persist())
    eligible.as("a").join(eligible.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(count(lit(1)).as("n_shared_spans"))
  }

  /** Per-document verdict: does any of the document's spans also occur
    * in another document (within the `maxDf` cap)? Returns `df` plus
    * `n_dup_spans` (distinct spans of this doc shared with ≥1 other) and
    * `has_dup_span`. The doc-level reduction of [[sharedSpanPairs]] —
    * same inverted index, no pair join at all (the df table already
    * knows which spans are shared), so it scales past the pair form.
    */
  def flagSpanDuplicated(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, maxDf: Int = 50,
      tokensCol: Option[String] = None): DataFrame = {
    // same double-use (agg + join back) -> same scoped cache
    val rows = graft.CacheScope.register(
      spanRows(df, idCol, textCol, spanTokens, tokensCol).persist())
    val shared = rows.groupBy(col("h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df").between(2, maxDf))
      .select(col("h"))
    val perDoc = rows.join(shared, Seq("h"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_dup_spans"))
    df.join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_dup_spans"))
      .withColumn("has_dup_span", col("n_dup_spans") > 0)
  }

  /** Production containment dedup: span CANDIDATES → containment VERIFY —
    * the scale path for the capped-quadratic q89 baseline. Candidate
    * pairs come from [[sharedSpanPairs]] (documents sharing ≥1 exact
    * `spanTokens`-token span — excerpt/wrapper duplication implies long
    * verbatim spans, so shared spans are precisely the asymmetric-dup
    * evidence); each candidate is then verified in BOTH orientations
    * (containment is asymmetric) with
    * [[graft.functions.DedupFunctions.containment]] over the documents'
    * distinct-token sets, keeping pairs at ≥ `tau`.
    *
    * 100 TB shape: candidates are the span-hash equi-join (hub-capped,
    * never all-pairs); the verify step joins the BOUNDED candidate set
    * back to the token arrays by id — two plain equi-joins — and scores
    * one codegen'd intersection per candidate. Total cost is
    * O(candidates), not O(n²): the quadratic form exists only as the
    * oracle baseline (q89). Recall bound, by construction: a pair with
    * containment ≥ tau but NO shared `spanTokens`-token span is missed —
    * tokens-in-common without a long verbatim run is [[Dedup]]'s
    * MinHash territory, not span evidence; lower `spanTokens` to trade
    * cost for span-level recall.
    */
  def containmentVerifiedPairs(df: DataFrame, idCol: String,
      textCol: String, tau: Double, spanTokens: Int = 12, maxDf: Int = 50,
      tokensCol: Option[String] = None): DataFrame = {
    import graft.functions.{DedupFunctions => DF}
    val cands = sharedSpanPairs(df, idCol, textCol, spanTokens, maxDf,
        tokensCol)
      .select(col("a_id"), col("b_id"))
    // distinct-token sets read by two id-joins — cached so the tokenize
    // pass runs once, not twice
    val toks = graft.CacheScope.register(
      df.select(col(idCol).as("__cv_id"),
          array_distinct(tokensCol.map(col)
            .getOrElse(TF.tokens(col(textCol)))).as("__cv_toks"))
        .persist())
    // fetch both documents' token sets ONCE per unordered candidate,
    // then produce the two orientations locally (containment is
    // asymmetric) — joining a pre-flipped 2× candidate table instead
    // would push twice the rows through both corpus-side joins for the
    // same answer. Cached: fwd and bwd both read it
    val paired = graft.CacheScope.register(cands
      .join(toks.select(col("__cv_id").as("a_id"),
        col("__cv_toks").as("__a_toks")), Seq("a_id"))
      .join(toks.select(col("__cv_id").as("b_id"),
        col("__cv_toks").as("__b_toks")), Seq("b_id"))
      .persist())
    val fwd = paired.select(col("a_id"), col("b_id"),
      DF.containment(col("__a_toks"), col("__b_toks")).as("cont"))
    val bwd = paired.select(col("b_id").as("a_id"), col("a_id").as("b_id"),
      DF.containment(col("__b_toks"), col("__a_toks")).as("cont"))
    fwd.unionByName(bwd)
      .filter(col("cont") >= tau)
      .select(col("a_id"), col("b_id"), round(col("cont"), 4).as("cont"))
  }

  /** [[containmentVerifiedPairs]] with IDF-WEIGHTED containment as the
    * verify metric: `cont_w(a→b) = Σ_{t ∈ a∩b} ln(N/df_t) / Σ_{t ∈ a}
    * ln(N/df_t)` over distinct tokens — overlap on corpus-ubiquitous
    * words stops counting as duplication evidence. This is the standard
    * fix for the measured honesty note on q89: on a small-vocabulary
    * corpus PLAIN containment is near-vacuous (common words alone push
    * pairs over τ), while the idf weight sends a token present in every
    * document to ln(1) = 0 — only distinctive overlap survives.
    *
    * 100 TB shape: candidates are the hub-capped span equi-join (as the
    * unweighted path); the verify explodes each candidate's BOTH token
    * sets once (bounded: 2 × candidate pairs × doc vocab), joins token
    * weights UN-hinted (df is corpus-vocabulary cardinality — the
    * [[Keywords]] df-join rule), and reduces per (pair, orientation).
    * N (corpus doc count) is the one driver fact, same class as the LM
    * vocab size. Σ over ≤ doc-vocab doubles per pair then round(4) —
    * the cross-engine determinism class every avg in this library uses.
    */
  def weightedContainmentVerifiedPairs(df: DataFrame, idCol: String,
      textCol: String, tau: Double, spanTokens: Int = 12, maxDf: Int = 50,
      tokensCol: Option[String] = None): DataFrame = {
    val cands = sharedSpanPairs(df, idCol, textCol, spanTokens, maxDf,
        tokensCol)
      .select(col("a_id"), col("b_id"))
    val toks = graft.CacheScope.register(
      df.select(col(idCol).as("__cv_id"),
          array_distinct(tokensCol.map(col)
            .getOrElse(TF.tokens(col(textCol)))).as("__cv_toks"))
        .persist())
    val nDocs = toks.count() // driver fact: corpus document count
    // idf over per-doc DISTINCT tokens (document frequency, not term
    // frequency) — one partial-agg shuffle over the vocabulary
    val idf = toks
      .select(explode(col("__cv_toks")).as("token"))
      .groupBy(col("token"))
      .agg(log(lit(nDocs.toDouble) / count(lit(1))).as("__w"))
    val paired = graft.CacheScope.register(cands
      .join(toks.select(col("__cv_id").as("a_id"),
        col("__cv_toks").as("__a_toks")), Seq("a_id"))
      .join(toks.select(col("__cv_id").as("b_id"),
        col("__cv_toks").as("__b_toks")), Seq("b_id"))
      .persist())
    // each orientation: explode the NUMERATOR side's tokens, flag
    // membership in the other side, weight, reduce — two bounded
    // explodes of the candidate table, one un-hinted weight join
    val fwd = paired.select(col("a_id"), col("b_id"),
      explode(col("__a_toks")).as("token"),
      array_contains(col("__b_toks"), col("token")).as("__in"))
    val bwd = paired.select(col("b_id").as("a_id"), col("a_id").as("b_id"),
      explode(col("__b_toks")).as("token"),
      array_contains(col("__a_toks"), col("token")).as("__in"))
    fwd.unionByName(bwd)
      .join(idf, Seq("token")) // un-hinted: vocabulary cardinality
      .groupBy(col("a_id"), col("b_id"))
      // zero total weight (every token corpus-ubiquitous) scores 0, not
      // NaN — NaN ordering diverges across engines, and "no distinctive
      // tokens at all" IS the no-evidence verdict
      .agg(when(sum(col("__w")) === 0.0, 0.0)
        .otherwise(sum(when(col("__in"), col("__w")).otherwise(0.0)) /
          sum(col("__w"))).as("__cw"))
      .filter(col("__cw") >= tau)
      .select(col("a_id"), col("b_id"), round(col("__cw"), 4).as("cont_w"))
  }

  /** Exposed for spec-level equivalence checks. */
  def spanHash(span: Column): Column = xxhash64(span)

  // ---- persisted span index -------------------------------------------

  /** Sidecar filename for the persisted span-index layout (underscore
    * prefix so parquet readers skip it as data).
    */
  val SpanMetaFile = "_graft_span_index.json"

  /** Layout parameters a persisted span index was written with. The span
    * length is part of the layout: a delta probing with a different
    * `spanTokens` would hash different strings and silently miss
    * everything, so the reader takes it from here, never from a caller
    * argument.
    */
  final case class SpanIndexMeta(spanTokens: Int, hashBuckets: Int)

  /** Persist the span inverted index — the at-rest form of [[spanRows]],
    * mirroring [[Dedup.writeIndex]]'s band layout: distinct
    * (index_id, h) rows directory-partitioned by `h_bucket`
    * (= splitmix64(h) mod `hashBuckets`), one file per leaf (each bucket
    * hash-partitions to one task), rows sorted by `h` within the file
    * (the sort leads with the partition column so the dynamic-partition
    * writer's required ordering is satisfied as a prefix and the `h`
    * order survives — same reasoning as `Dedup.writeIndex`). A delta
    * batch that derives the same bucket prunes to 1/`hashBuckets` of the
    * files; at 100 TB raise `hashBuckets`, never the file-per-dir count.
    */
  def writeSpanIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, spanTokens: Int, hashBuckets: Int = 64,
      tokensCol: Option[String] = None): Unit = {
    spanRows(df, idCol, textCol, spanTokens, tokensCol)
      .select(col("id").as("index_id"), col("h"))
      .withColumn("h_bucket", Dedup.keyBucketOf(col("h"), hashBuckets))
      .repartition(col("h_bucket"))
      .sortWithinPartitions(col("h_bucket"), col("h"))
      .write.mode("overwrite").partitionBy("h_bucket")
      .parquet(s"$path/spans")
    graft.sources.Sidecar.write(df.sparkSession, s"$path/$SpanMetaFile",
      s"""{"spanTokens":$spanTokens,"hashBuckets":$hashBuckets}""")
  }

  /** Fold a delta corpus INTO a persisted span index — the maintenance
    * half of the daily-delta story ([[Dedup.appendToIndex]]'s span
    * analogue): after [[incrementalSpanDedup]] flags today's batch,
    * append its (index_id, h) rows so tomorrow's delta probes
    * yesterday's corpus AND today's, no full rebuild. Span length and
    * bucket modulus come from the index's OWN sidecar (a caller-supplied
    * span length would hash different strings — a silent
    * everything-misses, not an error), so
    * `readSpanIndex(path)` afterwards ≡ the index built over the union
    * corpus, row-for-row, pruning unchanged. Each append lands one new
    * file per touched `h_bucket` leaf; compact when file counts matter
    * by rewriting ([[writeSpanIndex]] on the union — the same
    * append/merge trade as every log-structured index). Re-appending an
    * already-indexed id duplicates its rows — the caller's contract,
    * as with a duplicated corpus at build time.
    */
  def appendToSpanIndex(delta: DataFrame, idCol: String, textCol: String,
      path: String, tokensCol: Option[String] = None): Unit = {
    val meta = readSpanIndexMeta(delta.sparkSession, path)
    spanRows(delta, idCol, textCol, meta.spanTokens, tokensCol)
      .select(col("id").as("index_id"), col("h"))
      .withColumn("h_bucket", Dedup.keyBucketOf(col("h"), meta.hashBuckets))
      .repartition(col("h_bucket"))
      .sortWithinPartitions(col("h_bucket"), col("h"))
      .write.mode("append").partitionBy("h_bucket")
      .parquet(s"$path/spans")
  }

  /** Rewrite a persisted span index into the one-file-per-leaf layout
    * at `destPath` — the merge half of the append/merge trade
    * ([[appendToSpanIndex]]'s Scaladoc). Span length and modulus copy
    * from the source sidecar; rows are untouched.
    */
  def compactSpanIndex(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, destPath: String): Unit = {
    require(srcPath != destPath,
      "compactSpanIndex reads srcPath lazily while overwriting destPath; " +
        "in-place compaction would destroy the source leaves mid-read — " +
        "write to a fresh path and swap")
    val meta = readSpanIndexMeta(spark, srcPath)
    readSpanIndex(spark, srcPath)
      .select(col("index_id"), col("h"))
      .withColumn("h_bucket", Dedup.keyBucketOf(col("h"), meta.hashBuckets))
      .repartition(col("h_bucket"))
      .sortWithinPartitions(col("h_bucket"), col("h"))
      .write.mode("overwrite").partitionBy("h_bucket")
      .parquet(s"$destPath/spans")
    graft.sources.Sidecar.write(spark, s"$destPath/$SpanMetaFile",
      s"""{"spanTokens":${meta.spanTokens},"hashBuckets":${meta.hashBuckets}}""")
  }

  /** Read and validate the layout sidecar — the ONLY sound source of the
    * span length and bucket modulus for a delta-side derivation. Takes
    * the caller's session explicitly (never `SparkSession.active`: under
    * multiple sessions the sidecar would resolve through the wrong
    * Hadoop conf).
    */
  def readSpanIndexMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): SpanIndexMeta = {
    val text = graft.sources.Sidecar
      .read(spark, s"$path/$SpanMetaFile")
      .getOrElse(throw new IllegalArgumentException(
        s"no $SpanMetaFile under $path - not a graft span index"))
    def intField(name: String): Int =
      ("\"" + name + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(text)
        .map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(
          s"$SpanMetaFile under $path lacks integer field '$name': $text"))
    SpanIndexMeta(intField("spanTokens"), intField("hashBuckets"))
  }

  /** Re-open a persisted span index as (index_id, h, h_bucket). The
    * layout column stays on the frame so filters/joins on it reach the
    * directory partitioning.
    */
  def readSpanIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    readSpanIndexMeta(spark, path) // validate sidecar before touching data
    spark.read.parquet(s"$path/spans")
      .select(col("index_id"), col("h"),
        col("h_bucket").cast("int").as("h_bucket"))
  }

  /** Incremental span dedup: flag `delta` documents repeating a verbatim
    * `spanTokens`-token span of an INDEXED corpus
    * ([[writeSpanIndex]]) without re-reading the corpus text — the span
    * analogue of [[Dedup.incrementalDedup]]. Span length and bucket
    * modulus come from the index's own sidecar; the probe joins on
    * (h_bucket, h) so the bucket derivation reaches the directory
    * partitioning (statically for literal probes, via DPP for the join).
    *
    * The hub cap applies on the INDEX side: a span present in more than
    * `maxDf` corpus documents is boilerplate evidence, not copying — the
    * count runs over the MATCHED spans only (one partial-agg shuffle of
    * the join output, never an index-wide aggregation).
    *
    * Returns every `delta` row plus `n_dup_spans` (distinct spans of
    * this doc found in the corpus), `has_dup_span`, and `matched_id`
    * (the smallest matching corpus id, null when fresh).
    */
  def incrementalSpanDedup(delta: DataFrame, idCol: String,
      textCol: String, indexPath: String, maxDf: Int = 50,
      tokensCol: Option[String] = None): DataFrame = {
    val spark = delta.sparkSession
    val meta = readSpanIndexMeta(spark, indexPath)
    val idx = readSpanIndex(spark, indexPath)
    // delta spans feed the match join once; bucket derived from the
    // sidecar modulus so it can never drift from the on-disk layout
    val dRows = spanRows(delta, idCol, textCol, meta.spanTokens, tokensCol)
      .withColumn("h_bucket",
        Dedup.keyBucketOf(col("h"), meta.hashBuckets))
    // the join output is (delta span × matching corpus docs) — cached:
    // it feeds both the hub-cap count and the per-doc accounting
    val hits = graft.CacheScope.register(
      dRows.join(idx, Seq("h_bucket", "h")).persist())
    // corpus-side df = distinct index docs per span (NOT raw hit rows:
    // several delta docs sharing a span would inflate a plain count)
    val eligible = hits.groupBy(col("h_bucket"), col("h"))
      .agg(countDistinct(col("index_id")).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("h_bucket"), col("h"))
    val perDoc = hits.join(eligible, Seq("h_bucket", "h"))
      .groupBy(col("id").as(idCol))
      .agg(countDistinct(col("h")).as("n_dup_spans"),
        min(col("index_id")).as("matched_id"))
    delta.join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_dup_spans"))
      .withColumn("has_dup_span", col("n_dup_spans") > 0)
  }
}
