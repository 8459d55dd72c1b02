package graft.operators

import graft.functions.{DedupFunctions, TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene step that drops
  * (or flags) corpus documents overlapping an evaluation set, so test
  * questions never leak into training text. Standard practice for LLM
  * corpora: exact n-gram collision against the benchmark text (the
  * GPT-3/PaLM-style "13-gram overlap" rule, here with configurable n).
  *
  * 100 TB shape: benchmarks are megabytes while the corpus is the 100 TB
  * side, so the benchmark n-gram set is built once, deduplicated, and
  * BROADCAST; the corpus side is a shingle-explode followed by a
  * broadcast LEFT SEMI join (no shuffle of the corpus, no state beyond
  * the broadcast map) and a single aggregation back to document grain.
  */
object Contamination {

  /** Distinct non-empty `n`-grams of a token array. [[TF.shinglesOf]]'s
    * whole-doc fallback emits `""` for an empty token list; that gram is
    * vacuous for contamination (an empty benchmark row would otherwise
    * mark EVERY empty corpus doc contaminated, and vice versa), so every
    * gram pipeline in this object drops it on both sides. Consequently
    * an empty/whitespace doc has zero grams here.
    */
  private def gramsOf(toks: Column, n: Int): Column =
    filter(TF.shinglesOf(toks, n), g => length(g) > 0)

  /** Corpus rows tagged `is_contaminated` = shares at least one `n`-gram
    * with any benchmark row. All columns of `corpus` are preserved.
    *
    * `tokensCol`: name of an already-materialized corpus token-array
    * column to shingle from (the tokenize-once contract — see
    * [[CorpusPipeline.prepare]]); the benchmark side always tokenizes
    * itself (it is megabytes).
    */
  def flagContaminated(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 8,
      tokensCol: Option[String] = None): DataFrame = {
    // tokens are materialized in their own projection BEFORE the shingle
    // explode: inlining tokens(text) into the shingle lambda re-runs the
    // regexp split per shingle element (higher-order functions re-evaluate
    // argument subtrees) — measured 4.5 s vs 0.2 s on the sf0.1 corpus
    val benchGrams = benchmark
      .withColumn("__ct_toks", TF.tokens(col(benchTextCol)))
      .select(explode(gramsOf(col("__ct_toks"), n)).as("gram"))
      .distinct()
    val hits = corpus
      .withColumn("__ct_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol), explode(gramsOf(col("__ct_toks"), n)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .select(col(idCol)).distinct()
      .withColumn("is_contaminated", lit(true))
    // the flagged-id set is NOT bounded by the benchmark: every corpus
    // doc sharing one n-gram with it lands here, so a high contamination
    // rate makes it corpus-cardinality — the join-back stays un-hinted
    // and AQE broadcasts only when the runtime size fits (the same rule
    // as flagContaminatedByEmbedding below, round-6 ADVICE)
    corpus.join(hits, Seq(idCol), "left")
      .withColumn("is_contaminated",
        coalesce(col("is_contaminated"), lit(false)))
  }

  /** The filter form: corpus minus contaminated docs (broadcast anti-join
    * against the flagged id set).
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 8,
      tokensCol: Option[String] = None): DataFrame =
    flagContaminated(corpus, idCol, textCol, benchmark, benchTextCol, n,
        tokensCol)
      .filter(!col("is_contaminated"))
      .drop("is_contaminated")

  /** The GRADED form of [[flagContaminated]]: per document, the share of
    * its distinct `n`-grams found in the benchmark set — the published
    * refinement of the binary rule ("drop documents with more than X%
    * n-gram overlap with the eval suite" rather than any-hit), which
    * keeps long documents that merely quote one test item while still
    * dropping wholesale copies. Returns `corpus` plus `n_grams`
    * (distinct NON-EMPTY n-grams in the doc: the whole-doc fallback
    * below `n` tokens per [[TF.shinglesOf]], minus the empty gram an
    * empty token list produces — see [[gramsOf]]), `n_overlap`, and
    * `contamination_frac` (rounded to 4; empty/whitespace docs have
    * `n_grams` = 0 and score 0.0).
    * Same 100 TB shape as the flag: benchmark grams broadcast, corpus
    * explode + broadcast semi-join + one doc-grain aggregation back.
    */
  def contaminationFraction(corpus: DataFrame, idCol: String,
      textCol: String, benchmark: DataFrame, benchTextCol: String,
      n: Int = 8, tokensCol: Option[String] = None): DataFrame = {
    val benchGrams = benchmark
      .withColumn("__ct_toks", TF.tokens(col(benchTextCol)))
      .select(explode(gramsOf(col("__ct_toks"), n)).as("gram"))
      .distinct()
    // one tokenize + shingle pass feeds BOTH the per-doc gram count and
    // the overlap explode (scoped cache — the CacheScope contract)
    val shingled = graft.CacheScope.register(corpus
      .withColumn("__ct_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .withColumn("__ct_grams", gramsOf(col("__ct_toks"), n))
      .persist())
    val overlap = shingled
      .select(col(idCol), explode(col("__ct_grams")).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
    shingled
      .withColumn("n_grams", size(col("__ct_grams")))
      .drop("__ct_toks", "__ct_grams")
      .join(overlap, Seq(idCol), "left")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("contamination_frac",
        when(col("n_grams") === 0, 0.0)
          .otherwise(round(col("n_overlap").cast("double") /
            col("n_grams"), 4)))
  }

  /** The actionable form of [[contaminationFraction]]: keep documents at
    * or below `maxFrac` overlap (the published "drop at > X%" rule).
    * `maxFrac = 0.0` degenerates to [[decontaminate]]'s any-hit drop.
    */
  def decontaminateAtThreshold(corpus: DataFrame, idCol: String,
      textCol: String, benchmark: DataFrame, benchTextCol: String,
      maxFrac: Double, n: Int = 8,
      tokensCol: Option[String] = None): DataFrame = {
    require(maxFrac >= 0 && maxFrac <= 1, s"bad maxFrac $maxFrac")
    contaminationFraction(corpus, idCol, textCol, benchmark,
        benchTextCol, n, tokensCol)
      .filter(col("contamination_frac") <= maxFrac)
      .drop("n_grams", "n_overlap", "contamination_frac")
  }

  /** The benchmark-side view: for each benchmark row, how many corpus
    * documents share at least one `n`-gram with IT specifically — the
    * leakage report that tells an eval owner WHICH test items are
    * compromised (the doc-side flag only says the corpus is dirty).
    * Returns one row per benchmark id: (benchIdCol, n_leaking_docs),
    * zero-filled for clean items.
    *
    * 100 TB shape: the join carries (bench_id, gram) on the broadcast
    * side — benchmark-bounded — and the corpus explodes once; the
    * distinct collapses (bench item × doc) repeats before the count, at
    * worst corpus × items-hit cardinality, shuffle-keyed on the pair.
    */
  def benchmarkLeakage(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 8, tokensCol: Option[String] = None): DataFrame = {
    val benchGrams = benchmark
      .withColumn("__ct_toks", TF.tokens(col(benchTextCol)))
      .select(col(benchIdCol),
        explode(gramsOf(col("__ct_toks"), n)).as("gram"))
      .distinct()
    val hits = corpus
      .withColumn("__ct_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol).as("__ct_doc"),
        explode(gramsOf(col("__ct_toks"), n)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .select(col(benchIdCol), col("__ct_doc")).distinct()
      .groupBy(col(benchIdCol))
      .agg(count(lit(1)).as("n_leaking_docs"))
    benchmark.select(col(benchIdCol)).distinct()
      .join(hits, Seq(benchIdCol), "left")
      .na.fill(0L, Seq("n_leaking_docs"))
  }

  // ---- Bloom-filter variant (compact benchmark representation) --------

  /** Deterministic Bloom bitmap of the benchmark's n-gram set — the scale
    * path when the benchmark SUITE is itself large (a full eval harness is
    * millions of grams; the string set broadcasts at ~50 B/gram, the
    * bitmap at ~1-2 BITS/gram for the same job). One-sided error: a set
    * bit pattern may flag a clean doc (false positive — over-removal,
    * acceptable for hygiene), never the reverse.
    *
    * Everything is engine-independent by construction: bit `j` of gram
    * `g` lives at `splitmix64(fnv1a64(g) XOR j) & (numBits - 1)`, so an
    * oracle (or a second engine) rebuilds the exact bitmap and replays
    * membership INCLUDING the false positives. Built with one
    * `treeAggregate` (per-partition bitmaps OR-merged up a tree — no
    * driver bottleneck beyond the final `numBits/8`-byte array).
    */
  def benchmarkBloom(benchmark: DataFrame, benchTextCol: String, n: Int,
      numBits: Int = 1 << 16, kHashes: Int = 4): Array[Long] = {
    require(numBits > 0 && (numBits & (numBits - 1)) == 0,
      s"numBits $numBits must be a power of two")
    val grams = benchmark
      .withColumn("__bl_toks", TF.tokens(col(benchTextCol)))
      .select(explode(TF.shinglesOf(col("__bl_toks"), n)).as("gram"))
      .distinct()
    val bits = numBits
    val k = kHashes
    grams.select(col("gram")).na.drop()
      .rdd.map(_.getString(0))
      .treeAggregate(new Array[Long](bits / 64))(
        seqOp = (bm, g) => { setBits(bm, g, bits, k); bm },
        combOp = (a, b) => {
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        })
  }

  private def setBits(bm: Array[Long], gram: String, numBits: Int,
      kHashes: Int): Unit = {
    val h = DedupFunctions.fnv1a64(gram)
    var j = 0
    while (j < kHashes) {
      val pos = (DedupFunctions.splitmix64(h ^ j) & (numBits - 1)).toInt
      bm(pos >>> 6) |= 1L << (pos & 63)
      j += 1
    }
  }

  /** [[flagContaminated]] against a [[benchmarkBloom]] bitmap instead of
    * the broadcast gram set: the corpus side probes `kHashes` bits per
    * gram — no shuffle, no join, one UDF call per document (a bitmap
    * probe has no Column-combinator form; the UDF is the documented
    * exception, and the per-row work is a few cache-resident AND/SHIFTs).
    */
  def flagContaminatedBloom(corpus: DataFrame, idCol: String,
      textCol: String, bloom: Array[Long], n: Int = 8,
      numBits: Int = 1 << 16, kHashes: Int = 4,
      tokensCol: Option[String] = None): DataFrame = {
    require(bloom.length == numBits / 64,
      s"bitmap length ${bloom.length} != numBits/64 (${numBits / 64})")
    val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val bits = numBits
    val k = kHashes
    val anyGramHits = udf { grams: Seq[String] =>
      grams != null && grams.exists { g =>
        val h = DedupFunctions.fnv1a64(g)
        var j = 0
        var all = true
        while (all && j < k) {
          val pos = (DedupFunctions.splitmix64(h ^ j) & (bits - 1)).toInt
          all = (bc.value(pos >>> 6) & (1L << (pos & 63))) != 0
          j += 1
        }
        all
      }
    }
    corpus
      .withColumn("__bl_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .withColumn("is_contaminated",
        anyGramHits(TF.shinglesOf(col("__bl_toks"), n)))
      .drop("__bl_toks")
  }

  /** Embedding-space decontamination: flag corpus vectors whose cosine to
    * ANY benchmark vector reaches `threshold` — the semantic complement
    * of the n-gram rules above, catching paraphrased or translated
    * benchmark leakage that shares no verbatim n-gram (the
    * phi-series-style "semantic decontamination" step).
    *
    * Scale shape mirrors [[flagContaminated]]: the benchmark embedding
    * table is eval-suite-sized (thousands of rows, bounded by
    * construction — NOT corpus-derived), so broadcasting it is correct,
    * and the corpus side streams through one codegen'd dot-product loop
    * per (row × benchmark vector) with norms precomputed per row. No
    * corpus shuffle. The flagged-id set is NOT bounded — every corpus
    * row within threshold of any benchmark vector lands in it, so a
    * high contamination rate makes it corpus-cardinality — hence the
    * join-back is un-hinted: AQE broadcasts it only when the runtime
    * size fits (same rule as the q83/q92 corpus joins).
    */
  def flagContaminatedByEmbedding(corpus: DataFrame, idCol: String,
      vecCol: String, benchmark: DataFrame, benchVecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    val corpusPrepped = VF.prepForPairs(corpus, idCol, vecCol)
    val benchPrepped = VF.prepForPairs(
      benchmark.select(col(benchVecCol).as("__b_vec"),
        monotonically_increasing_id().as("__b_id")),
      "__b_id", "__b_vec")
      .select(col("vd").as("b_vd"), col("nrm").as("b_nrm"))
    val hits = corpusPrepped.crossJoin(broadcast(benchPrepped))
      .withColumn("cos",
        when(col("nrm") * col("b_nrm") === 0.0, lit(0.0))
          .otherwise(VF.fastDot(col("vd"), col("b_vd")) /
            (col("nrm") * col("b_nrm"))))
      .filter(col("cos") >= threshold)
      .select(col("id").as(idCol)).distinct()
      .withColumn("is_contaminated", lit(true))
    // un-hinted join-back: `hits` is corpus-derived and unbounded in the
    // worst case (see Scaladoc), so forcing a broadcast here could OOM the
    // driver at scale — let AQE broadcast only when the runtime size fits
    corpus.join(hits, Seq(idCol), "left")
      .withColumn("is_contaminated",
        coalesce(col("is_contaminated"), lit(false)))
  }
}
