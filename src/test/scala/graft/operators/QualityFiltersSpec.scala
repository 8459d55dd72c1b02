package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Quality filtering: first-failing-rule attribution, keep/annotate
  * consistency, and full volume accounting.
  */
class QualityFiltersSpec extends SparkSpec {

  test("first failing rule names the drop reason; passing docs keep null") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "too short"),                                   // min_tokens
      (2L, ("spam phrase " * 30).trim),                    // repetition
      (3L, "a perfectly reasonable document with exactly enough distinct " +
        "words to pass every configured quality rule in this small test")
    ).toDF("doc_id", "text")
    val t = QualityFilters.Thresholds(
      minTokens = 5, maxTokens = 1000, maxDupNgramFraction = 0.5)
    val tagged = QualityFilters.annotate(docs, "text", t)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(tagged === Map(1L -> "min_tokens", 2L -> "repetition", 3L -> null))

    val kept = QualityFilters.keep(docs, "text", t)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(3L))
    assert(kept.columns.toSeq === docs.columns.toSeq)

    // custom-rule form over caller-supplied predicates
    val custom = QualityFilters.annotateWith(docs,
      Seq(QualityFilters.Rule("has_spam", col("text").contains("spam"))))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(custom === Map(1L -> null, 2L -> "has_spam", 3L -> null))
  }

  test("audit accounts for every row exactly once") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val audit = QualityFilters.audit(docs, "text",
        QualityFilters.Thresholds(minTokens = 30))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(audit.values.sum === docs.count())
    assert(audit.contains(None), "no kept rows — thresholds ate the corpus")
  }
}
