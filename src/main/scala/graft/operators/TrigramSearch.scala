package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trigram-accelerated substring search — the `pg_trgm` device: a
  * `LIKE '%pattern%'` scan over a corpus is a full-text pass, but
  * every document CONTAINING the pattern must contain every one of
  * the pattern's character trigrams, so an inverted (trigram →
  * doc) index turns the scan into a posting-list intersection
  * (candidates = docs matching ALL pattern trigrams) followed by an
  * exact `contains` verify on the few survivors. False candidates
  * possible (trigrams present, order scrambled), false drops not —
  * the same candidate-then-verify contract as the MinHash bands.
  *
  * Canonicalization is the [[Winnow]] rule (lowercase alnum), so
  * patterns match case- and punctuation-insensitively. Patterns
  * shorter than 3 canonical chars have no trigrams — an error, not a
  * silent full scan.
  *
  * Scale shape: the index build is one explode + distinct; a query
  * touches ONLY its ≤ |pattern| posting lists (gram equi-join),
  * intersects by count, and verifies at candidate grain. The
  * persisted form would bucket by gram like the winnow index; here
  * the in-memory build is the gate and the layout story is shared.
  */
object TrigramSearch {

  private def canon(c: org.apache.spark.sql.Column) =
    regexp_replace(lower(c), "[^a-z0-9]", "")

  private def canonStr(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9]", "")

  /** Distinct (id, gram) postings of the canonical text. */
  def trigramIndex(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = docs
    .select(col(idCol), canon(col(textCol)).as("__c"))
    .filter(length(col("__c")) >= 3)
    .select(col(idCol), explode(expr(
      "transform(sequence(1, length(__c) - 2), " +
        "i -> substring(__c, i, 3))")).as("gram"))
    .distinct()

  /** Documents containing `pattern` (canonicalized), found via the
    * index: intersection candidates + exact verify. Output:
    * `(id, n_grams_matched, verified)` for candidates, verified rows
    * only.
    */
  def search(docs: DataFrame, idCol: String, textCol: String,
      pattern: String): DataFrame = {
    val p = canonStr(pattern)
    require(p.length >= 3,
      s"pattern '$pattern' has < 3 canonical chars — no trigrams")
    val grams = (0 to p.length - 3).map(i => p.substring(i, i + 3))
      .distinct
    val spark = docs.sparkSession
    import spark.implicits._
    val qg = grams.toDF("gram")
    val idx = trigramIndex(docs, idCol, textCol)
    val cands = idx.join(broadcast(qg), Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams_matched"))
      .filter(col("n_grams_matched") === grams.size)
    cands.join(docs.select(col(idCol), canon(col(textCol)).as("__c")),
        Seq(idCol))
      .filter(col("__c").contains(p))
      .select(col(idCol), col("n_grams_matched"))
  }

  /** The audit row the planner wants: candidate count vs verified
    * count (the index's precision on this pattern) plus the corpus
    * size — one row.
    */
  def searchProfile(docs: DataFrame, idCol: String, textCol: String,
      pattern: String): DataFrame = {
    val p = canonStr(pattern)
    require(p.length >= 3,
      s"pattern '$pattern' has < 3 canonical chars — no trigrams")
    val grams = (0 to p.length - 3).map(i => p.substring(i, i + 3))
      .distinct
    val spark = docs.sparkSession
    import spark.implicits._
    val qg = grams.toDF("gram")
    val idx = trigramIndex(docs, idCol, textCol)
    val cands = idx.join(broadcast(qg), Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__m"))
      .filter(col("__m") === grams.size)
    val verified = cands
      .join(docs.select(col(idCol), canon(col(textCol)).as("__c")),
        Seq(idCol))
      .filter(col("__c").contains(p))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    nDocs
      .crossJoin(broadcast(cands.agg(count(lit(1)).as("n_candidates"))))
      .crossJoin(broadcast(verified.agg(count(lit(1)).as("n_verified"))))
      .select(lit(pattern).as("pattern"), lit(grams.size)
        .as("n_query_grams"), col("n_docs"), col("n_candidates"),
        col("n_verified"),
        round(col("n_verified") /
          greatest(col("n_candidates"), lit(1L)).cast("double"), 6)
          .as("index_precision"))
  }
}
