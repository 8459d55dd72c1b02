package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Misra–Gries: the estimate band, the unconditional superset
  * guarantee under adversarial order, merge behavior, and the
  * two-pass exact readout against a plain GROUP BY.
  */
class HeavyHittersSpec extends SparkSpec {

  // 3 hitters on a long tail: a×300, b×200, c×120, tail 500 uniques
  private def fixture: Seq[String] =
    Seq.fill(300)("a") ++ Seq.fill(200)("b") ++ Seq.fill(120)("c") ++
      (1 to 500).map(i => s"t$i")

  test("MG invariants: est in [true - n/(k+1), true], every item " +
      "with count > n/(k+1) survives, state stays <= k — " +
      "worst-case arrival orders included") {
    val agg = new HeavyHitters.MisraGriesAgg(9)
    val n = fixture.size
    val truth = fixture.groupBy(identity).view.mapValues(_.size.toLong)
      .toMap
    val bound = n.toDouble / 10
    for (order <- Seq(fixture, fixture.reverse,
        fixture.sortBy(_.hashCode))) {
      var b = agg.zero
      order.foreach(x => b = agg.reduce(b, x))
      assert(b.n === n.toLong)
      assert(b.counts.size <= 9)
      val est = agg.finish(b)
      est.foreach { case (item, e) =>
        assert(e <= truth(item), s"overcount on $item")
        assert(e >= truth(item) - bound, s"under band on $item")
      }
      truth.filter(_._2 > bound).keys.foreach { hitter =>
        assert(est.contains(hitter), s"lost hitter $hitter")
      }
    }
  }

  test("shard merge keeps the band and the superset guarantee; n is " +
      "conserved") {
    val agg = new HeavyHitters.MisraGriesAgg(9)
    val n = fixture.size
    val shards = fixture.grouped(n / 7 + 1).toSeq
    val bufs = shards.map { sh =>
      var b = agg.zero; sh.foreach(x => b = agg.reduce(b, x)); b
    }
    val merged = bufs.reduce(agg.merge)
    assert(merged.n === n.toLong)
    assert(merged.counts.size <= 9)
    val truth = fixture.groupBy(identity).view.mapValues(_.size.toLong)
      .toMap
    val est = agg.finish(merged)
    est.foreach { case (item, e) => assert(e <= truth(item)) }
    truth.filter(_._2 > n.toDouble / 10).keys.foreach { h =>
      assert(est.contains(h), s"merge lost hitter $h")
    }
  }

  test("frequentItemsBy: per-group thresholds, groups independent, " +
      "equals the grouped GROUP BY answer") {
    val s = spark
    import s.implicits._
    // g1: n=40, >= 1/4 -> threshold 10: a(20), b(12) qualify, not c(8)
    // g2: n=12, threshold 3: x(9) and y(3) qualify
    val df = (Seq.fill(20)(("g1", "a")) ++ Seq.fill(12)(("g1", "b")) ++
      Seq.fill(8)(("g1", "c")) ++ Seq.fill(9)(("g2", "x")) ++
      Seq.fill(3)(("g2", "y"))).toDF("key", "item")
    val out = HeavyHitters.frequentItemsBy(df, "key", "item",
        k = 8, share = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(("g1", "a") -> 20L, ("g1", "b") -> 12L,
      ("g2", "x") -> 9L, ("g2", "y") -> 3L))
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItemsBy(df, "key", "item", k = 3, share = 4)
    }
  }

  test("two-pass exact readout equals the plain GROUP BY answer; the " +
      "completeness precondition raises loudly") {
    val s = spark
    import s.implicits._
    val df = fixture.toDF("item")
    val out = HeavyHitters.exactHeavyHitters(df, "item", k = 9,
        minCount = 150)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 300L, "b" -> 200L))
    val rel = HeavyHitters.frequentItems(df, "item", k = 20, share = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n = 1120, ceil(n/10) = 112 -> a, b, c
    assert(rel === Map("a" -> 300L, "b" -> 200L, "c" -> 120L))
    intercept[IllegalArgumentException] {
      // minCount 100 <= n/(k+1) = 1120/10 = 112: cannot guarantee
      HeavyHitters.exactHeavyHitters(df, "item", k = 9, minCount = 100)
    }
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(df, "item", k = 5, share = 10)
    }
  }
}
