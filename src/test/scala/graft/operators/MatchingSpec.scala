package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Rank-matching laws: rank i pairs with rank i within (stratum, arm)
  * score order, unmatched tails drop, the ATT is the exact paired
  * mean, and a one-armed stratum reports its counts with a null att.
  */
class MatchingSpec extends SparkSpec {

  test("hand fixture: 2 treated x 3 controls -> 2 pairs, att = 50; " +
      "a control-only stratum reads n_pairs 0, att null") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("s1", true, 10.0, 1L, 100.0), ("s1", true, 9.0, 2L, 90.0),
      ("s1", false, 8.0, 3L, 50.0), ("s1", false, 7.0, 4L, 40.0),
      ("s1", false, 6.0, 5L, 30.0),
      ("s2", false, 5.0, 6L, 10.0))
      .toDF("st", "tr", "score", "id", "y")
    val out = Matching.rankMatchAtt(rows, "st", "tr", "score", "id",
        "y", scale = 2)
      .orderBy("st").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n_treated") === 2L)
    assert(out(0).getAs[Long]("n_control") === 3L)
    assert(out(0).getAs[Long]("n_pairs") === 2L)
    assert(out(0).getAs[Double]("att") === 50.0)
    assert(out(1).getAs[Long]("n_pairs") === 0L)
    assert(out(1).isNullAt(out(1).fieldIndex("att")))
  }

  test("score ties break by id: the pairing is a total order, so " +
      "re-running permuted input reproduces it") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("s", true, 5.0, 2L, 20.0), ("s", true, 5.0, 1L, 10.0),
      ("s", false, 5.0, 4L, 2.0), ("s", false, 5.0, 3L, 1.0))
    val a = Matching.rankMatchAtt(rows.toDF("st", "tr", "score", "id",
      "y"), "st", "tr", "score", "id", "y").head()
    val b = Matching.rankMatchAtt(rows.reverse.toDF("st", "tr",
      "score", "id", "y"), "st", "tr", "score", "id", "y").head()
    // pairs: (id1, id3) and (id2, id4): att = ((10-1)+(20-2))/2
    assert(a.getAs[Double]("att") === 13.5)
    assert(b.getAs[Double]("att") === 13.5)
  }
}
