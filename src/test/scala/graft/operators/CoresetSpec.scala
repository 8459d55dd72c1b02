package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** k-center greedy coreset selection ([[Coreset]]): known-answer
  * farthest-first trajectory, tie determinism, bound contract, and the
  * stateless assignment column.
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("farthest-first picks the known trajectory on a line") {
    // points at x = 0, 1, 10, 25: seed = min id (x=0); farthest is 25
    // (d²=625); then 10 (min dist to {0,25} = 100); then 1 (d²=1)
    val df = vecs(1L -> Seq(0f), 2L -> Seq(1f), 3L -> Seq(10f),
      4L -> Seq(25f))
    val t = Coreset.kCenterGreedy(df, "vec_id", "embedding", k = 4)
      .orderBy("k_idx").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(t === Seq((0, 1L, 0.0), (1, 4L, 625.0), (2, 3L, 100.0),
      (3, 2L, 1.0)))
  }

  test("exact-duplicate tie resolves to the smaller id") {
    // two coincident far points: both at max distance, min id wins
    val df = vecs(1L -> Seq(0f), 5L -> Seq(9f), 4L -> Seq(9f))
    val t = Coreset.kCenterGreedy(df, "vec_id", "embedding", k = 2)
      .orderBy("k_idx").collect()
    assert(t(1).getLong(1) === 4L)
  }

  test("trajectory radii are non-increasing after the seed") {
    val df = vecs((1L to 20L).map(i =>
      i -> Seq((i * 7 % 13).toFloat, (i * 5 % 11).toFloat)): _*)
    val r = Coreset.kCenterGreedy(df, "vec_id", "embedding", k = 6)
      .orderBy("k_idx").collect().map(_.getDouble(2)).drop(1)
    assert(r.zip(r.tail).forall { case (a, b) => a >= b }, r.toSeq)
  }

  test("partitioning does not change the selection") {
    val df = vecs((1L to 30L).map(i =>
      i -> Seq((i * 3 % 17).toFloat, (i % 7).toFloat)): _*)
    val a = Coreset.kCenterGreedy(df.repartition(1), "vec_id",
      "embedding", k = 5).orderBy("k_idx").collect().toSeq
    val b = Coreset.kCenterGreedy(df.repartition(7), "vec_id",
      "embedding", k = 5).orderBy("k_idx").collect().toSeq
    assert(a === b)
  }

  test("bounds are loud: k outside [1, maxK] and empty input throw") {
    val df = vecs(1L -> Seq(0f))
    intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(df, "vec_id", "embedding", k = 0)
    }
    intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(df, "vec_id", "embedding", k = 65)
    }
    intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(vecs(), "vec_id", "embedding", k = 1)
    }
  }

  test("grouped k-center == one ungrouped run per group, advanced " +
      "jointly; group bound is loud") {
    val s = spark
    import s.implicits._
    val rows = (1L to 24L).map(i =>
      (i % 3, i, Seq((i * 7 % 13).toFloat, (i * 5 % 11).toFloat)))
    val df = rows.toDF("label", "vec_id", "embedding")
    val grouped = Coreset.kCenterGreedyGrouped(df, "vec_id",
        "embedding", "label", k = 3)
      .select("label", "k_idx", "vec_id", "dist_sq")
      .as[(Long, Int, Long, Double)].collect().toSet
    val perGroup = (0L to 2L).flatMap { g =>
      Coreset.kCenterGreedy(
          rows.filter(_._1 == g).map(t => (t._2, t._3))
            .toDF("vec_id", "embedding"), "vec_id", "embedding", k = 3)
        .collect().map(r => (g, r.getInt(0), r.getLong(1),
          r.getDouble(2)))
    }.toSet
    assert(grouped === perGroup)
    intercept[IllegalArgumentException] {
      Coreset.kCenterGreedyGrouped(df, "vec_id", "embedding", "label",
        k = 3, maxGroups = 2)
    }
  }

  test("centers returns vectors in selection order; assignToCenters " +
      "covers selected points at distance 0") {
    val df = vecs(1L -> Seq(0f, 0f), 2L -> Seq(3f, 4f), 3L -> Seq(6f, 8f))
    val cs = Coreset.centers(df, "vec_id", "embedding", k = 2)
    assert(cs === Seq(Seq(0.0, 0.0), Seq(6.0, 8.0)))
    val cov = Coreset.assignToCenters(df, "embedding", cs)
      .select("vec_id", "cover_dist_sq").as[(Long, Double)]
      .collect().toMap
    assert(cov(1L) === 0.0 && cov(3L) === 0.0)
    assert(cov(2L) === 25.0) // equidistant from both centers
  }
}
