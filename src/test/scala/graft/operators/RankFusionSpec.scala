package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Rank fusion: competition-rank semantics (ties share, next rank
  * skips), the RRF arithmetic, partial-membership handling, and the
  * consensus property the ensemble exists for.
  */
class RankFusionSpec extends SparkSpec {

  test("competition rank: ties share, following rank counts them") {
    val s = spark
    import s.implicits._
    val scored = Seq((1L, 9.0), (2L, 7.0), (3L, 7.0), (4L, 1.0))
      .toDF("id", "score")
    val r = RankFusion.competitionRank(scored, "score", "r")
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("r")).toMap
    assert(r === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 4L))
  }

  test("RRF arithmetic and partial membership") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("id", "score")
    val b = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "score") // 3 absent
    val out = RankFusion.reciprocalRankFusion(
        Seq("a" -> a, "b" -> b), "id", k = 60)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    def rr(rs: Int*) = BigDecimal(rs.map(x => 1.0 / (60 + x)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // a-ranks: 1->1, 2->2, 3->3; b-ranks: 2->1, 1->2
    assert(out(1L).getAs[Double]("rrf") === rr(1, 2))
    assert(out(2L).getAs[Double]("rrf") === rr(2, 1))
    assert(out(3L).getAs[Double]("rrf") === rr(3))
    assert(out(3L).isNullAt(out(3L).fieldIndex("rank_b")))
    assert(out(1L).getAs[Long]("rank_a") === 1L)
    assert(out(1L).getAs[Long]("rank_b") === 2L)
  }

  test("consensus beats a single dissenting signal") {
    val s = spark
    import s.implicits._
    // doc 1: rank 1 in three rankings; doc 2: rank 1 in one, last in
    // the other two -> doc 1 must fuse higher
    val x = Seq((1L, 10.0), (2L, 1.0), (3L, 5.0)).toDF("id", "score")
    val y = Seq((1L, 10.0), (2L, 1.0), (3L, 5.0)).toDF("id", "score")
    val z = Seq((1L, 5.0), (2L, 10.0), (3L, 1.0)).toDF("id", "score")
    val out = RankFusion.reciprocalRankFusion(
        Seq("x" -> x, "y" -> y, "z" -> z), "id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("rrf"))
      .toMap
    assert(out(1L) > out(2L) && out(1L) > out(3L))
  }

  test("corpus fusion: ranks bounded by corpus size, no duplicate ids") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val heur = docs.select(col("doc_id"), graft.functions.TextFunctions
      .qualityScore(col("text"), col("n_chars")).as("score"))
    val len = docs.select(col("doc_id"),
      col("n_chars").cast("double").as("score"))
    val fused = RankFusion.reciprocalRankFusion(
      Seq("h" -> heur, "l" -> len), "doc_id")
    assert(fused.count() === n)
    assert(fused.select("doc_id").distinct().count() === n)
    val maxRank = fused.agg(greatest(max(col("rank_h")),
      max(col("rank_l")))).head().getLong(0)
    assert(maxRank <= n)
  }
}
