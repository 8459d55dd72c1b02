package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance weighting: target-like docs score above target-unlike
  * docs, weights replay deterministically, the llr join broadcasts, and
  * selection is a bounded TakeOrdered.
  */
class DsirSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    val target = Seq(
      (0L, "physics energy momentum quantum field theory"),
      (1L, "quantum mechanics wave function energy levels")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // target-like: shares the physics vocabulary
      (10L, "lecture notes on quantum field theory and energy"),
      // target-unlike: disjoint vocabulary
      (11L, "chocolate cake recipe with butter sugar and flour"),
      (12L, "football match report goals penalties and fans")
    ).toDF("doc_id", "text")
    (target, corpus)
  }

  test("a doc sharing the target vocabulary outweighs disjoint docs, " +
      "zero-feature docs score 0, and the weight is deterministic") {
    val (target, corpus) = fixture
    val s = spark
    import s.implicits._
    val withEmpty = corpus.union(Seq((13L, "")).toDF("doc_id", "text"))
    val w = Dsir.importanceWeights(withEmpty, "doc_id", "text",
        target, "text", numBuckets = 512)
      .select(col("doc_id"), col("n_feats"), col("log_w"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(w(10L)._2 > w(11L)._2 && w(10L)._2 > w(12L)._2,
      s"physics doc must outweigh recipe/football: $w")
    assert(w(13L) === ((0L, 0.0)), "empty doc: no features, weight 0")
    // unigrams + bigrams: 8 tokens -> 8 + 7 features
    assert(w(10L)._1 === 15L)

    val again = Dsir.importanceWeights(withEmpty, "doc_id", "text",
        target, "text", numBuckets = 512)
      .select(col("doc_id"), col("log_w")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.view.mapValues(_._2).toMap === again, "not deterministic")
  }

  test("selectTopK takes the k most target-like docs as a TakeOrdered " +
      "(no global sort materialization); the llr join broadcasts") {
    val (target, corpus) = fixture
    val top = Dsir.selectTopK(corpus, "doc_id", "text", target, "text",
      k = 1, numBuckets = 512)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(top.collect().map(_.getAs[Long]("doc_id")).toSeq === Seq(10L))

    val wplan = Dsir.importanceWeights(corpus, "doc_id", "text",
      target, "text", numBuckets = 512)
      .queryExecution.executedPlan.toString
    assert(wplan.contains("BroadcastHashJoin"), wplan)
    assert(!wplan.contains("CartesianProduct"), wplan)
  }
}
