package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Trigram search: no false drops vs the naive contains scan, exact
  * verify kills scrambled-gram candidates, canonicalization, guards.
  */
class TrigramSearchSpec extends SparkSpec {

  test("search == naive contains on the corpus (no false drops), " +
      "scrambled grams are candidates but never verified") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the hash join operator wins"),
      (2L, "HASH-JOIN!! (case and punctuation fold away)"),
      (3L, "join hash — right grams, wrong order, close enough " +
        "shjoi ashjo"),  // contains all grams of "hashjoin"? no
      (4L, "nothing related here"),
      (5L, "hashjoin verbatim")
    ).toDF("doc_id", "text")
    val hits = TrigramSearch.search(docs, "doc_id", "text",
        "hash join")
      .collect().map(_.getLong(0)).sorted
    val naive = docs
      .filter(regexp_replace(lower(col("text")), "[^a-z0-9]", "")
        .contains("hashjoin"))
      .collect().map(_.getLong(0)).sorted
    assert(hits.toSeq === naive.toSeq)
    assert(hits.contains(1L) && hits.contains(2L) && hits.contains(5L))
    assert(!hits.contains(3L), "verify must kill scrambled grams")
  }

  test("searchProfile: precision accounts candidates vs verified; " +
      "short patterns fail fast") {
    val s = spark
    import s.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val prof = TrigramSearch.searchProfile(docs, "doc_id", "text",
      "hash join").head()
    assert(prof.getAs[Long]("n_docs") === 500L)
    assert(prof.getAs[Long]("n_verified") <=
      prof.getAs[Long]("n_candidates"))
    // candidates genuinely prune: far fewer than the corpus
    assert(prof.getAs[Long]("n_candidates") < 500L)
    val err = intercept[IllegalArgumentException] {
      TrigramSearch.search(docs, "doc_id", "text", "a!")
    }
    assert(err.getMessage.contains("trigrams"))
  }
}
