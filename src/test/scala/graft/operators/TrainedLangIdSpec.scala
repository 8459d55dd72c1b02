package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Trained char-n-gram language ID: correct argmax on separable
  * classes, deterministic integer scoring, and the smoothing floor
  * contract for unseen grams.
  */
class TrainedLangIdSpec extends SparkSpec {

  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._

  private def corpus(n: Int, text: String, lang: String,
      from: Long): Seq[(Long, String, String)] =
    (0 until n).map(i => (from + i, text, lang))

  test("separable classes: predictions match the training language; " +
      "an unseen-gram doc falls back to the prior-favored class") {
    val train = (corpus(6, "der die das und ist nicht", "de", 0L) ++
      corpus(6, "the quick brown fox jumps", "en", 100L) ++
      corpus(6, "le chat noir mange bien", "fr", 200L))
      .toDF("doc_id", "text", "lang")
    val model = TrainedLangId.train(train, "text", "lang")
    assert(model.classes.map(_._1) === Seq("de", "en", "fr"))
    val holdout = Seq(
      (1000L, "die der und nicht das", "de"),
      (1001L, "quick fox the brown", "en"),
      (1002L, "noir le chat bien", "fr"),
      (1003L, "zzz qqq xxx", "xx")) // every gram unseen -> prior only
      .toDF("doc_id", "text", "lang")
    val out = TrainedLangId.predict(holdout, "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("lang_pred")).toMap
    assert(out(1000L) === "de")
    assert(out(1001L) === "en")
    assert(out(1002L) === "fr")
    // all-OOV doc: score_c = prior_c + G*oov_c; equal 6-doc priors,
    // so the argmax is decided by oov_c = -ln(T_c + V) — the class
    // with the SMALLEST gram total wins; with equal-length training
    // texts the tie breaks by class name ascending
    assert(Set("de", "en", "fr").contains(out(1003L)))
    assert(out.size === 4)
  }

  test("prediction is invariant to row order/partitioning, and the " +
      "scoring grid is integer: rerun gives identical predictions") {
    val train = (corpus(4, "aaa bbb ccc", "xx", 0L) ++
      corpus(4, "ddd eee fff", "yy", 100L))
      .toDF("doc_id", "text", "lang")
    val model = TrainedLangId.train(train, "text", "lang")
    val hold = Seq((1L, "aaa ccc", "?"), (2L, "fff ddd", "?"),
      (3L, "aaa fff", "?")).toDF("doc_id", "text", "lang")
    val a = TrainedLangId.predict(hold, "doc_id", "text", model)
      .select("doc_id", "lang_pred").collect().map(_.toString).sorted
    val b = TrainedLangId.predict(hold.repartition(7), "doc_id",
        "text", model)
      .select("doc_id", "lang_pred").collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
    val m = a.mkString
    assert(m.contains("[1,xx]") && m.contains("[2,yy]"))
  }

  test("persisted model round trip: classes, vocab, and predictions " +
      "survive the disk hop bit-for-bit; a junk path fails loudly") {
    val train = (corpus(4, "der die das und", "de", 0L) ++
      corpus(4, "the quick brown fox", "en", 100L))
      .toDF("doc_id", "text", "lang")
    val model = TrainedLangId.train(train, "text", "lang")
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_langid_model_spec").getAbsolutePath
    TrainedLangId.writeModel(model, path)
    val back = TrainedLangId.readModel(spark, path)
    assert(back.classes === model.classes)
    assert(back.vocab === model.vocab)
    val hold = Seq((1L, "die das der", "?"), (2L, "fox the quick", "?"))
      .toDF("doc_id", "text", "lang")
    val a = TrainedLangId.predict(hold, "doc_id", "text", model)
      .select("doc_id", "lang_pred").collect().map(_.toString).sorted
    val b = TrainedLangId.predict(hold, "doc_id", "text", back)
      .select("doc_id", "lang_pred").collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
    val e = intercept[IllegalArgumentException] {
      TrainedLangId.readModel(spark, "/tmp/graft_no_such_model_dir")
    }
    assert(e.getMessage.contains("not a graft langid model"))
  }

  test("train rejects a single-class corpus") {
    val one = corpus(5, "only one class here", "en", 0L)
      .toDF("doc_id", "text", "lang")
    val e = intercept[IllegalArgumentException] {
      TrainedLangId.train(one, "text", "lang")
    }
    assert(e.getMessage.contains("classes"))
  }
}
