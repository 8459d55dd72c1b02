package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Token-budget selection: budget respected, higher quality always wins,
  * boundary tie-break deterministic, degenerate budgets safe.
  */
class CorpusSelectionSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    // score 3: 3 docs x 10 tokens; score 2: 3 x 10; score 1: 3 x 10
    Seq.tabulate(9)(i => (i.toLong, i / 3 + 1, 10L))
      .toDF("doc_id", "score", "n_tokens")
  }

  test("full buckets first, boundary ranked by hash within the budget") {
    // budget 50: score-3 bucket (30) fits whole, score-2 boundary gets
    // 20 of 30 tokens -> exactly 2 of its 3 docs, score-1 none
    val sel = CorpusSelection
      .selectByTokenBudget(docs, "doc_id", "score", "n_tokens", 50L)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(sel.length === 5)
    assert(sel.count(_._2 == 3) === 3, "best bucket taken whole")
    assert(sel.count(_._2 == 2) === 2, "boundary fills the remainder")
    assert(sel.count(_._2 == 1) === 0, "worse buckets never selected")
    // deterministic under repartitioning
    val again = CorpusSelection
      .selectByTokenBudget(docs.repartition(7), "doc_id", "score",
        "n_tokens", 50L)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(sel.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("degenerate budgets: everything fits / nothing fits") {
    val all = CorpusSelection
      .selectByTokenBudget(docs, "doc_id", "score", "n_tokens", 1000L)
    assert(all.count() === 9)
    val none = CorpusSelection
      .selectByTokenBudget(docs, "doc_id", "score", "n_tokens", 5L)
    assert(none.count() === 0, "no partial documents: a doc that " +
      "doesn't fit the remainder is dropped")
  }
}
