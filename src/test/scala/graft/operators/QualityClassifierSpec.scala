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

  test("calibration: sigmoid bins, edge folding, hand-checked gaps") {
    val s = spark
    import s.implicits._
    // log-odds 0.0 -> p=0.5 (bin 5); huge -> p~1 folds into bin 9;
    // -huge -> p~0 bin 0
    val scored = Seq(
      (0.0, true), (0.0, false),       // bin 5: avg_pred 0.5, frac 0.5
      (100.0, true), (100.0, true),    // bin 9 (p=1 folds down)
      (-100.0, false)                  // bin 0
    ).toDF("score", "y")
    val out = QualityClassifier.calibration(scored, "score", "y", 10)
      .orderBy(col("bin")).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet === Set(0, 5, 9))
    assert(out(5) === ((2L, 0.5, 0.5, 0.0)))
    assert(out(9) === ((2L, 1.0, 1.0, 0.0)))
    assert(out(0) === ((1L, 0.0, 0.0, 0.0)))
    // ECE from the bin rows: sum(n/N * gap) = 0 here
    val ece = out.values.map { case (n, _, _, g) => n * g }.sum / 5
    assert(ece === 0.0)
  }

  private def logloss(scored: Seq[(Double, Boolean)]): Double =
    -scored.map { case (p, y) =>
      val q = math.min(math.max(p, 1e-12), 1 - 1e-12)
      if (y) math.log(q) else math.log(1 - q)
    }.sum / scored.size

  test("logistic GD: separable classes learn, logloss falls with epochs") {
    val s = spark
    import s.implicits._
    val rows = (0L until 80L).map { i =>
      val pos = i % 2 == 0
      val text = if (pos) "quantum energy flux quantum energy"
      else "pasta basil oven pasta basil"
      (i, text, pos)
    }
    val df = rows.toDF("doc_id", "text", "is_pos")
    def scoresAt(epochs: Int) = {
      val m = QualityClassifier.trainLogistic(df, "doc_id", "text",
        "is_pos", numBuckets = 64, epochs = epochs, lr = 2.0)
      QualityClassifier.scoreLogistic(df, "doc_id", "text", m)
        .select(col("score"), col("is_pos")).collect()
        .map(r => (r.getDouble(0), r.getBoolean(1))).toSeq
    }
    val at2 = scoresAt(2)
    val at10 = scoresAt(10)
    assert(logloss(at10) < logloss(at2),
      s"more epochs must reduce logloss: ${logloss(at10)} vs ${logloss(at2)}")
    // after 10 epochs the separable problem is solved
    assert(at10.forall { case (p, y) => (p > 0.5) == y })
  }

  test("logistic: no-feature doc scores the bare bias; model is dense") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "alpha beta", true), (2L, "gamma delta", false))
      .toDF("doc_id", "text", "is_pos")
    val m = QualityClassifier.trainLogistic(df, "doc_id", "text",
      "is_pos", numBuckets = 64, epochs = 1, lr = 1.0)
    assert(m.weights.length === 64)
    val empty = Seq((9L, "", false)).toDF("doc_id", "text", "is_pos")
    val r = QualityClassifier.scoreLogistic(empty, "doc_id", "text", m)
      .select(col("n_feats"), col("score")).head()
    assert(r.getLong(0) === 0L)
    assert(math.abs(r.getDouble(1) -
      1.0 / (1.0 + math.exp(-m.bias))) < 1e-12)
  }

  test("isotonicCalibrate: the classic PAV merges, weighted pooling, " +
      "monotone output") {
    val s = spark
    import s.implicits._
    // bin rates [0.3, 0.1, 0.6, 0.4, 0.8] at 10 rows each ->
    // PAV pools to [0.2, 0.2, 0.5, 0.5, 0.8]
    def mk(bin: Int, nPos: Int, n: Int = 10) = (0 until n).map(i =>
      ((bin + 0.5) / 5.0, i < nPos))
    val rows = (mk(0, 3) ++ mk(1, 1) ++ mk(2, 6) ++ mk(3, 4) ++
      mk(4, 8)).toDF("p", "y")
    val out = QualityClassifier.isotonicCalibrate(rows, "p", "y",
        bins = 5)
      .collect().map(r => (r.getInt(0), r.getAs[Double]("iso_rate")))
    assert(out.toSeq === Seq(0 -> 0.2, 1 -> 0.2, 2 -> 0.5, 3 -> 0.5,
      4 -> 0.8))
    // weighted: bin1 grows to 30 rows at rate 0.1 -> pooled
    // (3 + 3)/(10 + 30) = 0.15
    val rows2 = (mk(0, 3) ++ mk(1, 3, 30) ++ mk(2, 6) ++ mk(3, 4) ++
      mk(4, 8)).toDF("p", "y")
    val out2 = QualityClassifier.isotonicCalibrate(rows2, "p", "y", 5)
      .collect().map(r => (r.getInt(0), r.getAs[Double]("iso_rate")))
    assert(out2.toSeq === Seq(0 -> 0.15, 1 -> 0.15, 2 -> 0.5,
      3 -> 0.5, 4 -> 0.8))
    // already-monotone input is a fixed point
    val rows3 = (mk(0, 1) ++ mk(1, 3) ++ mk(2, 6)).toDF("p", "y")
    val out3 = QualityClassifier.isotonicCalibrate(rows3, "p", "y", 5)
      .collect().map(r => (r.getAs[Double]("raw_rate"),
        r.getAs[Double]("iso_rate")))
    out3.foreach { case (raw, iso) => assert(raw === iso) }
  }

  test("crossValidateNb: each fold's subtraction model matches a " +
      "fresh train on the complement") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(3)
    val posWords = Seq("apple", "banana", "cherry", "date")
    val negWords = Seq("xray", "zulu", "quark", "vortex")
    val labeled = (1 to 60).map { i =>
      val pos = i % 2 == 0
      val base = if (pos) posWords else negWords
      val text = (0 until 8).map(_ =>
        base(rng.nextInt(base.length))).mkString(" ") +
        " common filler"
      (i.toLong, text, pos)
    }.toDF("doc_id", "text", "y")
    val k = 3
    val cv = QualityClassifier.crossValidateNb(labeled, "doc_id",
        "text", "y", kFolds = k)
      .collect().map(r => r.getAs[Int]("fold") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"),
          r.getAs[Double]("accuracy")))).toMap
    assert(cv.keySet === (0 until k).toSet)
    assert(cv.values.map(_._1).sum === 60L)
    // reference: per fold, an actual retrain on the complement
    val withFold = labeled.withColumn("fold",
      pmod(graft.expressions.HashExpressions.splitmix64(col("doc_id")),
        lit(k.toLong)).cast("int"))
    (0 until k).foreach { f =>
      val trainDf = withFold.filter(col("fold") =!= f)
      val testDf = withFold.filter(col("fold") === f)
      val m = QualityClassifier.train(trainDf, "doc_id", "text", "y")
      val scored = QualityClassifier.score(testDf, "doc_id", "text", m)
        .select(col("y"), col("predicted")).collect()
      val acc = scored.count(r => r.getBoolean(0) == r.getBoolean(1))
        .toDouble / scored.length
      assert(cv(f)._1 === scored.length.toLong, s"fold $f size")
      assert(math.abs(cv(f)._3 - acc) < 1e-9,
        s"fold $f acc ${cv(f)._3} vs retrain $acc")
    }
    // the separable fixture should actually classify well
    assert(cv.values.forall(_._3 > 0.9), cv)
  }
}
