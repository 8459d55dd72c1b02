package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

class MarkovSpec extends SparkSpec {

  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._

  private val log = Seq(
    // user 1: a b a b a   user 2: a a b
    (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
    (1L, 5L, "a"), (2L, 1L, "a"), (2L, 2L, "a"), (2L, 3L, "b")
  ).toDF("user_id", "seq", "state")

  test("transitionMatrix: within-key adjacent counts, exact ratios, " +
      "no cross-user transition") {
    val tm = Markov.transitionMatrix(log, "user_id", "seq", "seq", "state")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // transitions: u1 a→b, b→a, a→b, b→a ; u2 a→a, a→b
    assert(tm(("a", "b")) === ((3L, 0.75)))
    assert(tm(("a", "a")) === ((1L, 0.25)))
    assert(tm(("b", "a")) === ((2L, 1.0)))
    assert(tm.size === 3) // never b→b, never a cross-user a→a from u1→u2
  }

  test("stationary distribution: hand-computed trajectory on the grid") {
    val tm = Markov.transitionMatrix(log, "user_id", "seq", "seq", "state")
    // π0 = (0.5, 0.5); step: πa' = 0.25πa + 1.0πb, πb' = 0.75πa
    // step1: a = 0.625, b = 0.375 ; step2: a = 0.53125, b = 0.46875
    val pi2 = Markov.stationaryDistribution(tm, 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pi2("a") === 0.53125)
    assert(pi2("b") === 0.46875)
    // mass conserved (every state has out-edges here)
    val pi8 = Markov.stationaryDistribution(tm, 8)
      .collect().map(_.getDouble(1)).sum
    assert(math.abs(pi8 - 1.0) < 1e-4)
    // fixed point of this chain: πa = 4/7, πb = 3/7
    val piLong = Markov.stationaryDistribution(tm, 30)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(piLong("a") - 4.0 / 7) < 1e-3)
    assert(math.abs(piLong("b") - 3.0 / 7) < 1e-3)
  }

  test("string-state contract: non-string states fail loudly instead " +
      "of a silent output-type rewrite") {
    val tm = Seq((1L, 2L, 3L, 1.0), (2L, 1L, 3L, 1.0))
      .toDF("from_state", "to_state", "n", "p")
    val e = intercept[IllegalArgumentException] {
      Markov.stationaryDistribution(tm, 2)
    }
    assert(e.getMessage.contains("from_state"))
    assert(e.getMessage.contains("string states"))
  }

  test("deterministic under repartitioning") {
    val tm = Markov.transitionMatrix(log.repartition(7), "user_id",
      "seq", "seq", "state")
    val a = Markov.stationaryDistribution(tm, 5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq
    val tm2 = Markov.transitionMatrix(log, "user_id", "seq", "seq",
      "state")
    val b = Markov.stationaryDistribution(tm2, 5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq
    assert(a === b)
  }

  test("real events: transition rows bounded by |types|², stationary " +
      "sums to ~1") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
    val ev = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
    val tm = Markov.transitionMatrix(ev, "user_id", "ts", "event_id",
      "event_type")
    val nTypes = ev.select("event_type").distinct().count()
    assert(tm.count() <= nTypes * nTypes)
    val pi = Markov.stationaryDistribution(tm, 8)
      .collect().map(_.getDouble(1)).sum
    assert(math.abs(pi - 1.0) < 1e-3)
  }
}
