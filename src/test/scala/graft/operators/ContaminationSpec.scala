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
