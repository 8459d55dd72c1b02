package graft.operators

import graft.functions.{TextFunctions => TF}
import graft.ingest.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The tokenize-once contract, asserted for the round-4 analysis
  * operators (Keywords, Boilerplate): passing `tokensCol` must (a) leave
  * results identical to the self-tokenizing path, and (b) actually skip
  * the whole-corpus regexp pass — the operator's plan reads the cached
  * token column instead of re-deriving it from text. At 100 TB each
  * re-tokenization is an extra full-corpus `split(lower(text))`; a
  * pipeline composing quality → boilerplate → keywords must pay it once.
  */
class TokenizeOnceSpec extends SparkSpec {

  // round-tripped through parquet: over a LocalRelation the optimizer
  // constant-folds split(lower(text)) away at plan time, which would
  // blind the re-tokenization assertions below — a scan keeps the
  // expression in the plan exactly as it is over real tables
  private lazy val docsPath: String = {
    val s = spark
    import s.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-tokonce").resolve("docs").toString
    Seq(
      (1L, "the shared template header alpha beta gamma unique one"),
      (2L, "the shared template header alpha beta gamma unique two"),
      (3L, "entirely different content with its own words here now"),
      (4L, "the shared template header alpha beta gamma unique four")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(p)
    p
  }

  private def docs: DataFrame = spark.read.parquet(docsPath)

  private def collectSorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  // the tokens column MATERIALIZED (parquet round-trip, as a real
  // pipeline checkpoint would): a persisted frame also works, but its
  // InMemoryRelation prints the tokenizing child plan, which would
  // confuse the string-level plan assertions below
  private lazy val preppedPath: String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft-tokonce").resolve("prepped").toString
    docs.withColumn("__toks", TF.tokens(col("text")))
      .write.mode("overwrite").parquet(p)
    p
  }

  private def prepped: DataFrame = spark.read.parquet(preppedPath)

  test("Keywords + Boilerplate: tokensCol path is result-identical and " +
      "skips the regexp pass") {
    {
      // (a) result identity, both operators
      val kwSelf = Keywords.tfIdfTopTerms(docs, "doc_id", "text", k = 3)
      val kwPre = Keywords.tfIdfTopTerms(prepped, "doc_id", "text", k = 3,
        tokensCol = Some("__toks")).drop("__toks")
      assert(collectSorted(kwPre.select(kwSelf.columns.map(col).toSeq: _*))
        === collectSorted(kwSelf))

      val bpSelf = Boilerplate.flagBoilerplate(docs, "doc_id", "text",
        n = 3, minDf = 2, maxFraction = 0.5)
        .select("doc_id", "n_grams", "n_frequent", "is_boilerplate")
      val bpPre = Boilerplate.flagBoilerplate(prepped, "doc_id", "text",
        n = 3, minDf = 2, maxFraction = 0.5,
        tokensCol = Some("__toks"))
        .select("doc_id", "n_grams", "n_frequent", "is_boilerplate")
      assert(collectSorted(bpPre) === collectSorted(bpSelf))
      // ... and the fixture actually discriminates
      assert(bpSelf.filter(col("is_boilerplate")).count() > 0)

      // (b) the pre-tokenized plans carry NO re-tokenization: the token
      // expression is split(lower(text)) — it must appear in the
      // self-tokenizing plan and be ABSENT from the tokensCol plan
      // (which reads the persisted token column instead)
      def tokenizations(df: DataFrame): Int =
        "split\\(lower\\(".r
          .findAllIn(df.queryExecution.optimizedPlan.toString).size
      assert(tokenizations(kwSelf) > 0, "fixture lost the token expression")
      assert(tokenizations(kwPre) === 0,
        "tfIdfTopTerms re-tokenized despite tokensCol:\n" +
          kwPre.queryExecution.optimizedPlan)
      assert(tokenizations(bpPre) === 0,
        "flagBoilerplate re-tokenized despite tokensCol:\n" +
          bpPre.queryExecution.optimizedPlan)

      // composition: boilerplate filter feeding keywords, one corpus,
      // one tokenization end-to-end
      val kept = Boilerplate.flagBoilerplate(prepped, "doc_id", "text",
          n = 3, minDf = 2, maxFraction = 0.9, tokensCol = Some("__toks"))
        .filter(!col("is_boilerplate"))
        .drop("n_grams", "n_frequent", "is_boilerplate")
      val composed = Keywords.tfIdfTopTerms(kept, "doc_id", "text", k = 2,
        tokensCol = Some("__toks"))
      assert(tokenizations(composed) === 0,
        "composed pipeline re-tokenized:\n" +
          composed.queryExecution.optimizedPlan)
      assert(composed.count() > 0)
    }
  }

  test("oovAgainstVocab honors tokensCol the same way") {
    {
      val s = spark
      import s.implicits._
      val vocab = Seq("the", "shared", "template", "header").toDF("token")
      val self = Keywords.oovAgainstVocab(docs, "doc_id", "text", vocab)
        .select("doc_id", "n_tokens", "n_oov", "oov_per_1000")
      val pre = Keywords.oovAgainstVocab(prepped, "doc_id", "text", vocab,
        tokensCol = Some("__toks"))
        .select("doc_id", "n_tokens", "n_oov", "oov_per_1000")
      assert(collectSorted(pre) === collectSorted(self))
      val nTok = "split\\(lower\\(".r
        .findAllIn(pre.queryExecution.optimizedPlan.toString).size
      assert(nTok === 0, "oovAgainstVocab re-tokenized despite tokensCol")
    }
  }
}
