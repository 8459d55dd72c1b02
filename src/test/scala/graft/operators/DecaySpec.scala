package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class DecaySpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("decayWeight: bucketed halving, boundary-exact, future-clamped") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("now", ts("2024-01-10 00:00:00")),
      ("justInside", ts("2024-01-09 00:00:01")),   // age < 1d -> 1.0
      ("boundary", ts("2024-01-09 00:00:00")),     // exactly 1d -> 0.5
      ("twoDays", ts("2024-01-08 00:00:00")),      // 0.25
      ("future", ts("2024-01-11 00:00:00"))        // clamps to 1.0
    ).toDF("k", "t")
    val w = df.select(col("k"), Decay.decayWeight(col("t"),
        lit(ts("2024-01-10 00:00:00")), "1 day").as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("now") === 1.0)
    assert(w("justInside") === 1.0)
    assert(w("boundary") === 0.5)
    assert(w("twoDays") === 0.25)
    assert(w("future") === 1.0)
  }

  test("decayedProfile: weighted sums against the stream max") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", ts("2024-01-10 00:00:00"), 10.0), // ref row, w=1
      ("a", ts("2024-01-09 00:00:00"), 10.0), // w=0.5
      ("b", ts("2024-01-08 00:00:00"), 8.0)   // w=0.25
    ).toDF("g", "t", "v")
    val p = Decay.decayedProfile(df, "g", "t", "v", "1 day")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("decayed_count"),
          r.getAs[Double]("decayed_value"))).toMap
    assert(p("a") === ((2L, 1.5, 15.0)))
    assert(p("b") === ((1L, 0.25, 2.0)))
  }

  test("half-life must be positive and fixed-length") {
    val s = spark
    import s.implicits._
    val c = lit(ts("2024-01-10 00:00:00"))
    intercept[IllegalArgumentException](Decay.decayWeight(c, c, "1 month"))
    intercept[IllegalArgumentException](Decay.decayWeight(c, c, "0 days"))
  }
}
