package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Prefix-filtered exact set-similarity join: EXACTNESS is the whole
  * point — jaccardJoin must equal the quadratic baseline pair-for-pair
  * (no false negatives is the prefix-filter theorem; no false positives
  * is the verify stage), and the plan must contain no cartesian product.
  */
class SetSimJoinSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))

  test("jaccardJoin ≡ brute force pair-for-pair at several thresholds") {
    for (tau <- Seq(500000L, 800000L, 950000L)) {
      val fast = SetSimJoin.jaccardJoin(docs, "doc_id", "text", tau)
        .select("a_id", "b_id", "n_intersect", "n_union")
        .collect().map(key).toSet
      val slow = SetSimJoin.bruteForceJaccard(docs, "doc_id", "text", tau)
        .select("a_id", "b_id", "n_intersect", "n_union")
        .collect().map(key).toSet
      assert(fast === slow, s"mismatch at tau=$tau")
      assert(fast.nonEmpty, s"vacuous fixture at tau=$tau")
    }
  }

  test("hand fixture: prefix length and boundary pairs") {
    import spark.implicits._
    // unigram shingles (n=1) so the sets are the word sets themselves;
    // a/b share 4 of 5 distinct tokens (jac 4/6 = 0.667), a/c share 5/5
    val df = Seq(
      (1L, "p q r s t"),
      (2L, "p q r s u v"), // ∩=4 ∪=7 → 0.571
      (3L, "t s r q p")    // same set as 1 → 1.0
    ).toDF("doc_id", "text")
    val at1 = SetSimJoin.jaccardJoin(df, "doc_id", "text", 1000000L, n = 1)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(at1.toSet === Set((1L, 3L)))
    // τ = 0.571428 keeps (1,2): 4·1e6 ≥ 571428·7 (3999996 ≥ 4000000 is
    // false) — so boundary must EXCLUDE at 571429 and include at 571428
    val incl = SetSimJoin.jaccardJoin(df, "doc_id", "text", 571428L, n = 1)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incl.contains((1L, 2L)))
    val excl = SetSimJoin.jaccardJoin(df, "doc_id", "text", 571429L, n = 1)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!excl.contains((1L, 2L)))
  }

  test("plan: no cartesian product, no broadcast of the corpus-derived " +
      "df table") {
    val plan = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 800000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "prefix join must be an equi-join")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("candidate count is bounded well below the all-pairs square") {
    val n = docs.count()
    val allPairs = n * (n - 1) / 2
    val cands = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 800000L)
      .count()
    // at τ=0.8 over 5-gram shingles, survivors are the near-replica
    // pairs — orders of magnitude below n²/2
    assert(cands < allPairs / 100, s"$cands vs $allPairs")
  }
}
