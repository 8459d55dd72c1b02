package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Secret-Sharer canary exposure ([[Memorization]]): exact ranks on a
  * hand-built corpus, the zero-insertion tie contract, exposure growth
  * with planting, and the loud bounds.
  */
class MemorizationSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta alpha beta gamma"),
    (2L, "beta gamma alpha beta beta"),
    (3L, "gamma alpha beta gamma alpha"))
    .toDF("doc_id", "text")

  test("r = 0: every candidate scores identical OOV grams and the " +
      "secret (alphabetically last) ranks last — exposure exactly 0") {
    val out = Memorization.canaryExposure(corpus, "doc_id", "text",
        prefix = Seq("pp", "qq"), secret = "zzz", suffix = Seq("rr", "ss"),
        nDecoys = 3, insertCounts = Seq(0))
      .collect().head
    // 3 distinct corpus tokens -> 3 decoys + secret = 4 candidates;
    // all four candidate texts share every gram except the slot ones,
    // and ALL slot grams are unseen -> exact nanonat ties; the secret
    // sorts after alpha/beta/gamma -> rank 4, exposure log2(4/4) = 0
    assert(out.getAs[Int]("rank") === 4)
    assert(out.getAs[Double]("exposure") === 0.0)
  }

  test("planting the canary drives rank to 1 and exposure to log2(N)") {
    val out = Memorization.canaryExposure(corpus, "doc_id", "text",
        prefix = Seq("pp", "qq"), secret = "zzz", suffix = Seq("rr", "ss"),
        nDecoys = 3, insertCounts = Seq(0, 4))
      .orderBy(col("n_insert"))
      .collect().map(r => (r.getAs[Int]("n_insert"),
        r.getAs[Int]("rank"), r.getAs[Double]("exposure")))
    assert(out(0)._2 === 4 && out(0)._3 === 0.0)
    assert(out(1)._2 === 1)
    assert(out(1)._3 === 2.0) // log2(4/1)
    // planting also strictly raises the secret's own score
    val scores = Memorization.canaryExposure(corpus, "doc_id", "text",
        Seq("pp", "qq"), "zzz", Seq("rr", "ss"), 3, Seq(0, 4))
      .orderBy(col("n_insert"))
      .collect().map(_.getAs[Long]("score_sc"))
    assert(scores(1) > scores(0))
  }

  test("bounds are loud: decoy count, insertion range, token shape") {
    intercept[IllegalArgumentException] {
      Memorization.canaryExposure(corpus, "doc_id", "text",
        Seq("pp", "qq"), "zzz", Seq("rr", "ss"), 0, Seq(1))
    }
    intercept[IllegalArgumentException] {
      Memorization.canaryExposure(corpus, "doc_id", "text",
        Seq("pp", "qq"), "zzz", Seq("rr", "ss"), 3, Seq(65))
    }
    intercept[IllegalArgumentException] { // uppercase secret
      Memorization.canaryExposure(corpus, "doc_id", "text",
        Seq("pp", "qq"), "ZZZ", Seq("rr", "ss"), 3, Seq(1))
    }
    intercept[IllegalArgumentException] { // slot needs trigram context
      Memorization.canaryExposure(corpus, "doc_id", "text",
        Seq("pp"), "zzz", Seq("rr", "ss"), 3, Seq(1))
    }
  }
}
