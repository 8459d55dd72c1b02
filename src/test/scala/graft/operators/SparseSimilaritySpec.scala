package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

class SparseSimilaritySpec extends SparkSpec {

  private def corpus() = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (3L, "alpha beta gamma zeta eta"),      // shares a prefix with 1/2
      (4L, "one two three four five")         // disjoint
    ).toDF("doc_id", "text")
  }

  test("tfidfVectors: weights are tf * ln(N/df)") {
    val v = SparseSimilarity.tfidfVectors(corpus(), "doc_id", "text", n = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("gram")) ->
        (r.getAs[Long]("df"), r.getAs[Double]("w"))).toMap
    // "alpha beta gamma" appears once in docs 1, 2, 3 -> df 3
    val (df, w) = v((1L, "alpha beta gamma"))
    assert(df === 3L)
    assert(math.abs(w - 1.0 * math.log(4.0 / 3.0)) < 1e-12)
    // disjoint doc's grams have df 1 -> weight ln(4)
    val (_, w4) = v((4L, "one two three"))
    assert(math.abs(w4 - math.log(4.0)) < 1e-12)
  }

  test("cosineTopK: exact duplicates rank first with cosine 1") {
    graft.CacheScope.scoped {
      val top = SparseSimilarity.cosineTopK(corpus(), "doc_id", "text",
        n = 3, dfCap = 10, k = 3).collect()
      assert(top.head.getAs[Long]("a") === 1L)
      assert(top.head.getAs[Long]("b") === 2L)
      assert(top.head.getAs[Double]("cosine") === 1.0)
      // (1,3) and (2,3) follow, symmetric by construction
      assert(top.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
        === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    }
  }

  test("bm25TopK: hand-computed Okapi scores, no-hit docs absent, " +
      "tie-break and validation") {
    val s = spark
    import s.implicits._
    // N=3, avgdl=11/3; q={join, hash}: df(join)=2, df(hash)=1
    val docs = Seq(
      (1L, "join join hash"),
      (2L, "join column column filter"),
      (3L, "filter scan scan scan")).toDF("doc_id", "text")
    val out = SparseSimilarity.bm25TopK(docs, "doc_id", "text",
      Seq("join", "hash"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // idf_join=ln(1+1.5/2.5), idf_hash=ln(1+2.5/1.5), k1=1.2 b=0.75
    assert(out.toSeq === Seq((1L, 3L, 2L, 1.7407),
      (2L, 4L, 1L, 0.4532)))
    intercept[IllegalArgumentException] {
      SparseSimilarity.bm25TopK(docs, "doc_id", "text", Seq.empty, 5)
    }
  }

  test("dfCap: pairs sharing only over-cap grams generate no candidates") {
    graft.CacheScope.scoped {
      // every gram of docs 1-3 is shared by all three -> df 3 > cap 2;
      // with cap 2 only df<=2 grams (none here) block, so no pairs
      val s = spark
      import s.implicits._
      val uniform = Seq(
        (1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d"))
        .toDF("doc_id", "text")
      val none = SparseSimilarity.cosineTopK(uniform, "doc_id", "text",
        n = 3, dfCap = 2, k = 10).count()
      assert(none === 0L)
    }
  }
}
