package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form Naive-Bayes quality classifier: hand-computed scores,
  * separable held-out prediction, the no-token prior path, the
  * single-class refusal, and the filter form.
  */
class QualityClassifierSpec extends SparkSpec {

  private def trainSet = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "physics energy quantum field", true),
      (1L, "quantum theory energy waves", true),
      (2L, "cake butter sugar flour", false),
      (3L, "goals match penalty fans", false)
    ).toDF("doc_id", "text", "is_pos")
  }

  test("hand-computed score replays; separable held-out docs classify " +
      "correctly; a no-token doc scores the bare prior") {
    val s = spark
    import s.implicits._
    val model = QualityClassifier.train(trainSet, "doc_id", "text",
      "is_pos", alpha = 1.0)
    // vocab = 14 distinct train tokens ("energy"/"quantum" repeat);
    // totals 8/8; priors 2/2 -> prior llr = 0
    assert(model.vocab === 14L)
    assert(model.priorLlr === 0.0)

    val held = Seq(
      (10L, "quantum energy physics"), // all positive-class tokens
      (11L, "butter sugar goals"),     // all negative-class tokens
      (12L, "")                        // no tokens
    ).toDF("doc_id", "text")
    val got = QualityClassifier.score(held, "doc_id", "text", model)
      .select(col("doc_id"), col("n_tokens"), col("score"),
        col("predicted"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap

    // by hand: llr(w) = ln((c+1)/(8+14)) - ln((c'+1)/(8+14)) = ln((c+1)/(c'+1))
    // quantum c+=2,c-=0 -> ln 3; energy ln 3; physics ln 2
    val expect10 = math.log(3) + math.log(3) + math.log(2)
    assert(math.abs(got(10L)._2 - expect10) < 1e-9, s"${got(10L)}")
    assert(got(10L)._3 === true)
    assert(got(11L)._2 < 0 && got(11L)._3 === false)
    assert(got(12L) === ((0L, 0.0, false)), "no tokens -> bare prior")

    val kept = QualityClassifier.keepAccepted(held, "doc_id", "text", model)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(10L))
  }

  test("a single-class training split is refused loudly") {
    val err = intercept[IllegalArgumentException] {
      QualityClassifier.train(trainSet.filter(col("is_pos")),
        "doc_id", "text", "is_pos")
    }
    assert(err.getMessage.contains("both classes"))
  }

  test("the scoring join is un-hinted equi (no cartesian, no forced " +
      "broadcast of the corpus-derived llr table)") {
    val model = QualityClassifier.train(trainSet, "doc_id", "text",
      "is_pos")
    val plan = QualityClassifier.score(trainSet, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
