package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-filter decontamination: agrees with the exact gram-set join at
  * low bitmap load, errs only one-sided (over-flagging) under saturation,
  * and the bitmap is a pure function of the benchmark.
  */
class BloomContaminationSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val bench = docs.filter(col("doc_id") < 10)
  private lazy val corpus = docs.filter(col("doc_id") >= 10)

  test("at low load the bloom flags exactly the exact-join set") {
    val bloom = Contamination.benchmarkBloom(bench, "text", n = 5)
    val approx = Contamination
      .flagContaminatedBloom(corpus, "doc_id", "text", bloom, n = 5)
      .filter(col("is_contaminated"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = Contamination
      .flagContaminated(corpus, "doc_id", "text", bench, "text", n = 5)
      .filter(col("is_contaminated"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(approx), "bloom must NEVER miss a true hit " +
      s"(one-sided error): missing ${exact -- approx}")
    // 64 Kbits over a few hundred grams: false positives ~0
    assert(approx === exact,
      s"unexpected false positives at low load: ${approx -- exact}")
  }

  test("a saturated bitmap over-flags but never under-flags") {
    // 64 bits, k=4: guaranteed-saturated, everything collides
    val tiny = Contamination.benchmarkBloom(bench, "text", n = 5,
      numBits = 64, kHashes = 4)
    val flagged = Contamination
      .flagContaminatedBloom(corpus, "doc_id", "text", tiny, n = 5,
        numBits = 64, kHashes = 4)
      .filter(col("is_contaminated")).count()
    val exact = Contamination
      .flagContaminated(corpus, "doc_id", "text", bench, "text", n = 5)
      .filter(col("is_contaminated")).count()
    assert(flagged >= exact, "one-sided error violated")
  }

  test("the bitmap is deterministic in the benchmark") {
    val a = Contamination.benchmarkBloom(bench, "text", n = 5)
    val b = Contamination.benchmarkBloom(bench.repartition(7), "text", n = 5)
    assert(a.toSeq === b.toSeq)
  }
}
