package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus preparation recipe, composed from the
  * library's individually-verified stages in the canonical order:
  *
  *  1. [[QualityFilters.keep]] — drop low-quality docs (length,
  *     repetition, punctuation);
  *  2. [[Contamination.decontaminate]] — drop docs overlapping the
  *     evaluation benchmark (broadcast n-gram collision);
  *  3. [[Dedup.dedupCorpus]] — MinHash-LSH near-dup clustering, keep one
  *     canonical doc per cluster;
  *  4. [[Sampling.sample]] — deterministic down-sample to the target
  *     fraction.
  *
  * Order matters and is the standard one: quality first (cheapest, cuts
  * volume before the expensive stages), decontamination before dedup (a
  * contaminated canonical must not suppress a clean near-copy that would
  * then vanish with it), sampling last (sampling first would weaken dedup
  * by splitting clusters). Every stage is a narrow filter or an equi-join
  * candidate pipeline — nothing all-pairs, nothing driver-side — so the
  * composition inherits each stage's 100 TB shape.
  */
object CorpusPipeline {

  final case class Config(
      quality: QualityFilters.Thresholds = QualityFilters.Thresholds(),
      benchNgram: Int = 8,
      dedupThreshold: Double = 0.9,
      sampleFraction: Double = 1.0)

  /** The prepared corpus: quality-kept, decontaminated, near-dup
    * canonical, sampled. Keeps `docs`'s columns.
    *
    * Cache ownership: the result references [[Dedup.dedupCorpus]]'s
    * persisted output (which must outlive the caller's action — the
    * sampling filter reads it), and that cache is NOT reachable from the
    * returned (derived) frame — `unpersist()` on the result will not
    * release it. Callers MUST run their action inside
    * `CacheScope.scoped { ... }`; without a scope the cache is stranded
    * for the session's lifetime (the exact q64 regression round 3's
    * bench measured), and prepare logs a warning to that effect.
    */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      cfg: Config = Config()): DataFrame = {
    // TOKENIZE ONCE: the corpus token array is materialized here and
    // threaded through every stage (quality rules, decontamination
    // shingles, dedup signatures + verify) via each operator's
    // `tokensCol` parameter — without it each stage re-runs the regexp
    // split over the full corpus, which at 100 TB is two extra
    // whole-corpus passes. The column rides inside the quality-kept
    // cache (tokens ≈ text volume: the cache roughly doubles, a
    // deliberate space-for-passes trade; both caches here are
    // spill-aware MEMORY_AND_DISK).
    if (!graft.CacheScope.isActive)
      System.err.println("[graft] CorpusPipeline.prepare called without " +
        "an active CacheScope: the internal dedup cache cannot be " +
        "released by the caller and will be stranded for the session " +
        "- wrap the action in CacheScope.scoped { ... }")
    val toksCol = "__cp_toks"
    val withToks = docs.withColumn(toksCol, TF.tokens(col(textCol)))
    // cache the quality-kept set: decontamination references it twice
    // (gram-collision subtree + main join) and dedup materializes right
    // after, so the cache pays for itself within this call and can be
    // released as soon as dedup's own persisted output exists
    val kept = QualityFilters
      .keep(withToks, textCol, cfg.quality, tokensCol = Some(toksCol))
      .persist()
    val clean = Contamination.decontaminate(kept, idCol, textCol,
      benchmark, benchTextCol, cfg.benchNgram, tokensCol = Some(toksCol))
    val canonical = Dedup
      .dedupCorpus(clean, idCol, textCol, cfg.dedupThreshold,
        tokensCol = Some(toksCol))
      .filter(col("is_canonical"))
      .drop("component", "is_canonical", toksCol)
    kept.unpersist() // dedupCorpus's output is materialized + persisted
    Sampling.sample(canonical, idCol, cfg.sampleFraction)
  }
}
