package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** ANALYZE stats: hand-checked per-type stats, one-pass plan, approx
  * NDV error bound.
  */
class AnalyzeSpec extends SparkSpec {

  test("tableStats: nulls, ndv, typed min/max, avg string length") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(2.5), Some("bb"), Some(java.sql.Date.valueOf("2020-01-02"))),
      (2L, Some(7.5), Some("a"), Option.empty[java.sql.Date]),
      (2L, Option.empty[Double], Some("ccc"), Some(java.sql.Date.valueOf("2021-06-30"))),
      (3L, Some(2.5), Option.empty[String], Some(java.sql.Date.valueOf("2020-01-02")))
    ).toDF("k", "v", "t", "d")
    val st = Analyze.tableStats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(st.keySet === Set("k", "v", "t", "d"))
    val k = st("k")
    assert(k.getAs[Long]("n_rows") === 4L)
    assert(k.getAs[Long]("n_nulls") === 0L)
    assert(k.getAs[Long]("ndv") === 3L)
    assert(k.getAs[Double]("min_num") === 1.0)
    assert(k.getAs[Double]("max_num") === 3.0)
    assert(k.isNullAt(k.fieldIndex("min_str")))
    val v = st("v")
    assert(v.getAs[Long]("n_nulls") === 1L)
    assert(v.getAs[Long]("ndv") === 2L)
    assert(v.getAs[Double]("max_num") === 7.5)
    val t = st("t")
    assert(t.getAs[String]("min_str") === "a")
    assert(t.getAs[String]("max_str") === "ccc")
    assert(t.getAs[Double]("avg_len") === 2.0) // (2+1+3)/3
    assert(t.isNullAt(t.fieldIndex("min_num")))
    val d = st("d")
    assert(d.getAs[String]("min_str") === "2020-01-02")
    assert(d.getAs[String]("max_str") === "2021-06-30")
    assert(d.getAs[Long]("ndv") === 2L)
  }

  test("approx NDV lands within 5% on a 50k-distinct column") {
    val s = spark
    import s.implicits._
    val df = (1 to 50000).map(i => i.toLong).toDF("x")
    val r = Analyze.tableStats(df, approxNdv = true).head()
    val ndv = r.getAs[Long]("ndv").toDouble
    assert(math.abs(ndv - 50000) / 50000 < 0.05, s"ndv=$ndv")
  }

  test("vOptimalHistogram: exact DP on a hand case, perfect split at " +
      "buckets == cells, sse monotone in buckets") {
    val s = spark
    import s.implicits._
    // 0,0 land in cell 0; 10,10 in cell 1 (width 5.5)
    val df = Seq(0L, 0L, 10L, 10L).toDF("v")
    val one = Analyze.vOptimalHistogram(df, "v", inputCells = 2,
      buckets = 1).collect()
    assert(one.length === 1)
    assert(one.head.getAs[Long]("cnt") === 4L)
    // pooled: ss=200, s=20, c=4 -> sse = 200 - 100 = 100
    assert(one.head.getAs[Double]("sse") === 100.0)
    val two = Analyze.vOptimalHistogram(df, "v", inputCells = 2,
      buckets = 2).collect()
    assert(two.length === 2)
    assert(two.map(_.getAs[Double]("sse")).toSeq === Seq(0.0, 0.0))
    assert(two.map(_.getAs[Double]("mean")).toSeq === Seq(0.0, 10.0))
    // a clear outlier cluster gets its own bucket
    val sk = (Seq.fill(50)(5L) ++ Seq.fill(50)(6L) ++
      Seq.fill(10)(95L)).toDF("v")
    val h = Analyze.vOptimalHistogram(sk, "v", inputCells = 8,
      buckets = 2).collect()
    assert(h.length === 2)
    assert(h.last.getAs[Long]("cnt") === 10L)
    assert(h.last.getAs[Double]("mean") === 95.0)
    // monotone improvement
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val sses = Seq(1, 2, 4, 8).map { b =>
      Analyze.vOptimalHistogram(corpus, "n_chars", 16, b)
        .agg(sum(col("sse"))).head().getDouble(0)
    }
    assert(sses === sses.sorted.reverse, sses)
  }

  test("one aggregation pass: a single Aggregate pair in the plan, " +
      "no per-column scans") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "t")
    val plan = Analyze.tableStats(df).queryExecution.executedPlan
      .toString
    // exactly one scan of the input however many columns
    assert("LocalTableScan|Scan ExistingRDD|RowDataSourceScan".r
      .findAllIn(plan).size <= 1 ||
      !plan.contains("Union"), plan)
  }
}
