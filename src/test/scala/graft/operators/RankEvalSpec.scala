package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Ranking metrics: hand-computed recall/MRR/NDCG, the k cut, the
  * perfect-ranking identity, and the zero-hit verdicts.
  */
class RankEvalSpec extends SparkSpec {

  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._

  test("hand fixture: recall 2/3, MRR 1/2, NDCG from sorted-rank " +
      "folds") {
    val ranked = Seq((5L, 1), (2L, 2), (1L, 3), (9L, 4))
      .toDF("item", "rank")
    val truth = Seq(1L, 2L, 3L).toDF("item")
    val r = RankEval.vsTruth(ranked, truth, "item", "rank", k = 4)
      .head()
    assert(r.getAs[Long]("n_truth") === 3L)
    assert(r.getAs[Long]("n_hit") === 2L)
    assert(r.getAs[Double]("recall_at_k") === 0.6667)
    assert(r.getAs[Double]("mrr") === 0.5)
    // dcg = 1/log2(3) + 1/log2(4); idcg = 1 + 1/log2(3) + 1/log2(4)
    assert(r.getAs[Double]("ndcg_at_k") === 0.5307)
  }

  test("vsTruthBy: one row per query, zero-hit queries kept with " +
      "recall 0 / null MRR / NDCG 0") {
    val ranked = Seq(("a", 1L, 1), ("a", 9L, 2), ("b", 8L, 1))
      .toDF("q", "item", "rank")
    val truth = Seq(("a", 1L), ("a", 2L), ("b", 3L))
      .toDF("q", "item")
    val rows = RankEval.vsTruthBy(ranked, truth, "q", "item", "rank", 2)
      .orderBy("q").collect()
    assert(rows.length === 2)
    val a = rows(0); val b = rows(1)
    assert(a.getAs[Long]("n_hit") === 1L)
    assert(a.getAs[Double]("recall_at_k") === 0.5)
    assert(a.getAs[Double]("mrr") === 1.0)
    // dcg = 1/log2(2) = 1; idcg = 1 + 1/log2(3)
    assert(a.getAs[Double]("ndcg_at_k") ===
      math.rint(1.0 / (1.0 + 1.0 / (math.log(3) / math.log(2))) * 1e4)
        / 1e4)
    assert(b.getAs[Long]("n_hit") === 0L)
    assert(b.getAs[Double]("recall_at_k") === 0.0)
    assert(b.isNullAt(b.fieldIndex("mrr")))
    assert(b.getAs[Double]("ndcg_at_k") === 0.0)
  }

  test("the k cut applies; a perfect prefix scores 1.0 everywhere; " +
      "zero hits give recall 0, null MRR, NDCG 0") {
    val ranked = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4))
      .toDF("item", "rank")
    val truth = Seq(1L, 2L, 3L).toDF("item")
    // k=3: the prefix IS the truth set
    val perfect = RankEval.vsTruth(ranked, truth, "item", "rank", 3)
      .head()
    assert(perfect.getAs[Double]("recall_at_k") === 1.0)
    assert(perfect.getAs[Double]("mrr") === 1.0)
    assert(perfect.getAs[Double]("ndcg_at_k") === 1.0)
    // k=1 cuts to the first row only
    val cut = RankEval.vsTruth(ranked, truth, "item", "rank", 1).head()
    assert(cut.getAs[Long]("n_hit") === 1L)
    assert(cut.getAs[Double]("recall_at_k") === 0.3333)

    val miss = RankEval.vsTruth(ranked,
      Seq(77L).toDF("item"), "item", "rank", 4).head()
    assert(miss.getAs[Long]("n_hit") === 0L)
    assert(miss.getAs[Double]("recall_at_k") === 0.0)
    assert(miss.isNullAt(miss.fieldIndex("mrr")))
    assert(miss.getAs[Double]("ndcg_at_k") === 0.0)
  }
}
