package graft.operators

import java.sql.Timestamp

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Range join: boundary semantics ([start, end)), granule-straddling
  * intervals, the counting left form, key equality, and the
  * no-nested-loop plan shape.
  */
class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private val W = 600L * 1000000 // 10-minute granules

  test("containment is [start, end) exactly, across granule boundaries") {
    val s = spark
    import s.implicits._
    val points = Seq(
      (1L, ts("2026-01-01 10:00:00")), // == start: in
      (2L, ts("2026-01-01 10:29:59")), // just inside
      (3L, ts("2026-01-01 10:30:00")), // == end: out
      (4L, ts("2026-01-01 09:59:59"))  // before: out
    ).toDF("pid", "t")
    // one 30-minute interval spanning 4 granules
    val iv = Seq((7L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:30:00")))
      .toDF("iid", "s", "e")
    val out = RangeJoin.intervalJoin(points, "t", iv, "s", "e", W)
      .select("pid").collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(1L, 2L))
    // each matching point pairs the interval exactly once
    assert(RangeJoin.intervalJoin(points, "t", iv, "s", "e", W)
      .groupBy("pid").count().collect().forall(_.getLong(1) === 1L))
  }

  test("counting form keeps zero-match points; overlapping intervals " +
      "count individually") {
    val s = spark
    import s.implicits._
    val points = Seq(
      (1L, ts("2026-01-01 10:05:00")),
      (2L, ts("2026-01-01 23:00:00"))
    ).toDF("pid", "t")
    val iv = Seq(
      (100L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:10:00")),
      (101L, ts("2026-01-01 10:04:00"), ts("2026-01-01 10:06:00")),
      (102L, ts("2026-01-01 10:05:00"), ts("2026-01-01 10:05:00")) // empty
    ).toDF("iid", "s", "e")
    val out = RangeJoin.countingIntervalJoin(points, "pid", "t",
        iv, "s", "e", W)
      .collect().map(r => r.getAs[Long]("pid") -> r.getAs[Long]("n_matches"))
      .toMap
    assert(out === Map(1L -> 2L, 2L -> 0L))
  }

  test("key columns restrict matches to the same key") {
    val s = spark
    import s.implicits._
    val points = Seq(
      (1L, "a", ts("2026-01-01 10:05:00")),
      (2L, "b", ts("2026-01-01 10:05:00"))
    ).toDF("pid", "k", "t")
    val iv = Seq((9L, "a", ts("2026-01-01 10:00:00"),
      ts("2026-01-01 10:10:00"))).toDF("iid", "k", "s", "e")
    val out = RangeJoin.intervalJoin(points, "t", iv, "s", "e", W,
        keyCols = Seq("k"))
      .select("pid").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L))
  }

  test("plan: granule equi-join, never a nested-loop/cartesian") {
    val s = spark
    import s.implicits._
    val points = (1L to 200L).map(i =>
      (i, ts("2026-01-01 10:00:00"))).toDF("pid", "t")
    val iv = (1L to 50L).map(i => (i + 1000,
      ts("2026-01-01 09:00:00"), ts("2026-01-01 11:00:00")))
      .toDF("iid", "s", "e")
    val p = RangeJoin.intervalJoin(points, "t", iv, "s", "e", W)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "range join must bucket into an equi-join:\n" + p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), p)
    // the interval-interval form must hold the same shape
    val p2 = RangeJoin.overlapJoin(iv, "s", "e",
        iv.select(col("iid").as("jid"), col("s").as("s2"),
          col("e").as("e2")), "s2", "e2", W)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("BroadcastNestedLoopJoin") &&
      !p2.contains("CartesianProduct"),
      "overlap join must bucket into an equi-join:\n" + p2)
  }

  test("agrees with the naive inequality join on the events corpus") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("ts"))
    val iv = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("iid"), col("ts").as("s"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("e"))
    val fast = RangeJoin.countingIntervalJoin(clicks, "event_id", "ts",
        iv, "s", "e", W)
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("n_matches")).toMap
    val naive = clicks.crossJoin(iv)
      .filter(col("ts") >= col("s") && col("ts") < col("e"))
      .groupBy("event_id").count()
      .collect().map(r => r.getAs[Long]("event_id") -> r.getLong(1)).toMap
    assert(fast.filter(_._2 > 0L) === naive)
    assert(fast.values.sum === naive.values.sum)
  }

  test("overlapJoin: half-open overlap semantics, exactly-once pairs " +
      "across shared granules, exact overlap length") {
    val s = spark
    import s.implicits._
    val a = Seq(
      (1L, ts("2026-01-01 10:00:00"), ts("2026-01-01 11:00:00")),
      (2L, ts("2026-01-01 12:00:00"), ts("2026-01-01 12:10:00")),
      (3L, ts("2026-01-01 13:00:00"), ts("2026-01-01 13:00:00")) // empty
    ).toDF("aid", "as", "ae")
    val b = Seq(
      // overlaps a1 for 30 min, sharing MANY 10-min granules
      (10L, ts("2026-01-01 10:30:00"), ts("2026-01-01 11:30:00")),
      // touches a1 only at the boundary instant: ae == bs -> NO overlap
      (11L, ts("2026-01-01 11:00:00"), ts("2026-01-01 11:20:00")),
      // strictly inside a1
      (12L, ts("2026-01-01 10:10:00"), ts("2026-01-01 10:20:00")),
      // overlaps nothing
      (13L, ts("2026-01-01 20:00:00"), ts("2026-01-01 21:00:00"))
    ).toDF("bid", "bs", "be")
    val out = RangeJoin.overlapJoin(a, "as", "ae", b, "bs", "be", W)
      .select(col("aid"), col("bid"), col("overlap_micros"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(p => (p._1, p._2))
    assert(out.toSeq === Seq(
      (1L, 10L, 30L * 60 * 1000000),
      (1L, 12L, 10L * 60 * 1000000)))
    // exactly-once despite a1 and b10 sharing granules 10:30..11:00
    assert(out.map(p => (p._1, p._2)).distinct.length === out.length)
  }

  test("overlapJoin agrees with the naive inequality join on the " +
      "events corpus") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val a = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("aid"), col("ts").as("as"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("ae"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("bid"),
        (col("ts") - expr("INTERVAL 5 MINUTES")).as("bs"),
        (col("ts") + expr("INTERVAL 5 MINUTES")).as("be"))
    val fast = RangeJoin.overlapJoin(a, "as", "ae", b, "bs", "be", W)
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = a.crossJoin(b)
      .filter(col("as") < col("be") && col("bs") < col("ae"))
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === naive)
    assert(fast.nonEmpty)
  }
}
