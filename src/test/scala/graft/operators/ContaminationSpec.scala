package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Benchmark decontamination: exact n-gram collision flags exactly the
  * overlapping documents, and the filter form drops them.
  */
class ContaminationSpec extends SparkSpec {

  test("documents sharing an n-gram with the benchmark are flagged; others survive") {
    val s = spark
    import s.implicits._
    val bench = Seq(
      (1L, "what is the capital of france"),
      (2L, "name the largest planet in our solar system")
    ).toDF("q_id", "q_text")
    val corpus = Seq(
      // contains benchmark 5-gram "what is the capital of"
      (10L, "trivia dump what is the capital of france answer paris"),
      // clean
      (11L, "completely unrelated text about cooking pasta at home"),
      // contains "the largest planet in our"
      (12L, "quiz answers the largest planet in our solar system is jupiter"),
      // shares words but no 5-gram run
      (13L, "france is a country the capital has cafes")
    ).toDF("doc_id", "text")

    val flagged = Contamination.flagContaminated(
      corpus, "doc_id", "text", bench, "q_text", n = 5)
    val flags = flagged.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_contaminated"))
      .toMap
    assert(flags === Map(10L -> true, 11L -> false, 12L -> true, 13L -> false))

    val clean = Contamination.decontaminate(
      corpus, "doc_id", "text", bench, "q_text", n = 5)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).sorted
      === Array(11L, 13L))
    // all original columns survive, no flag column leaks
    assert(clean.columns.toSeq === corpus.columns.toSeq)
  }

  test("contaminationFraction grades overlap: a wholesale copy scores " +
      "near 1, a one-quote doc scores low, clean scores 0; " +
      "benchmarkLeakage names the compromised items") {
    val s = spark
    import s.implicits._
    val bench = Seq(
      (1L, "what is the capital of france answer paris"),
      (2L, "name the largest planet in our solar system")
    ).toDF("q_id", "q_text")
    val corpus = Seq(
      // wholesale copy of bench item 1 (all its 5-grams)
      (10L, "what is the capital of france answer paris"),
      // long doc QUOTING one 5-gram of item 1 among much original text
      (11L, "an original essay that happens to ask what is the capital " +
        "of something before wandering through many other topics and " +
        "closing with original thoughts entirely its own"),
      (12L, "completely unrelated text about cooking pasta at home " +
        "with plenty of words")
    ).toDF("doc_id", "text")
    val graded = Contamination.contaminationFraction(
        corpus, "doc_id", "text", bench, "q_text", n = 5)
      .select("doc_id", "n_grams", "n_overlap", "contamination_frac")
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // the copy: every one of its 4 distinct 5-grams is benchmark text
    assert(graded(10L) === ((4, 4L, 1.0)))
    // the quoting doc: exactly one overlapping gram, small fraction
    assert(graded(11L)._2 === 1L && graded(11L)._3 < 0.1,
      s"quote doc graded ${graded(11L)}")
    assert(graded(12L) === ((graded(12L)._1, 0L, 0.0)))

    // the binary rule cannot make that distinction: both 10 and 11 flag
    val binary = Contamination.flagContaminated(
        corpus, "doc_id", "text", bench, "q_text", n = 5)
      .filter(col("is_contaminated"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(binary === Set(10L, 11L))

    // leakage: item 1 leaks into docs 10 and 11; item 2 is clean
    val leak = Contamination.benchmarkLeakage(
        corpus, "doc_id", "text", bench, "q_id", "q_text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(leak === Map(1L -> 2L, 2L -> 0L))

    // the threshold filter keeps the quote (0.04 <= 0.1), drops the
    // copy; at 0.0 it degenerates to the any-hit drop
    val kept = Contamination.decontaminateAtThreshold(
        corpus, "doc_id", "text", bench, "q_text", maxFrac = 0.1, n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L, 12L))
    val strict = Contamination.decontaminateAtThreshold(
        corpus, "doc_id", "text", bench, "q_text", maxFrac = 0.0, n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(strict === Set(12L))
  }

  test("empty/whitespace docs carry zero grams: an empty benchmark row " +
      "never contaminates empty corpus docs, n_grams = 0, frac = 0.0") {
    val s = spark
    import s.implicits._
    // benchmark contains an empty row and a whitespace-only row — the
    // shinglesOf whole-doc fallback would emit "" for both; gramsOf
    // must drop it so the vacuous empty-gram never joins
    val bench = Seq((1L, ""), (2L, "   "), (3L, "what is the capital of"))
      .toDF("q_id", "q_text")
    val corpus = Seq(
      (10L, ""),                                     // empty doc
      (11L, "  \t "),                                // whitespace doc
      (12L, "ask what is the capital of france")     // real hit
    ).toDF("doc_id", "text")

    val flags = Contamination.flagContaminated(
        corpus, "doc_id", "text", bench, "q_text", n = 5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_contaminated"))
      .toMap
    assert(flags === Map(10L -> false, 11L -> false, 12L -> true))

    val frac = Contamination.contaminationFraction(
        corpus, "doc_id", "text", bench, "q_text", n = 5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_grams"), r.getAs[Long]("n_overlap"),
          r.getAs[Double]("contamination_frac"))))
      .toMap
    assert(frac(10L) === ((0, 0L, 0.0)))
    assert(frac(11L) === ((0, 0L, 0.0)))
    assert(frac(12L)._2 >= 1L)

    // leakage: the empty bench items leak into NOTHING, not everything
    val leak = Contamination.benchmarkLeakage(
        corpus, "doc_id", "text", bench, "q_id", "q_text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(leak === Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("the benchmark n-gram side is broadcast (corpus never shuffles)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Contamination.flagContaminated(
      docs.filter(col("doc_id") >= 10), "doc_id", "text",
      docs.filter(col("doc_id") < 10), "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
