package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sampling: reproducible under re-execution and
  * repartitioning, rate-accurate, and stratification applies per-group
  * rates. (df.sample() guarantees none of these across repartitions.)
  */
class SamplingSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("sample is a pure function of the id: same rows every run, " +
      "any partitioning") {
    val a = Sampling.sample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.sample(docs.repartition(13), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("temperature rates: T=1 is the natural mix, T<1 flattens, " +
      "smallest stratum pins at 1.0") {
    val counts = Map("big" -> 900L, "mid" -> 100L, "small" -> 25L)
    val t1 = Sampling.temperatureRates(counts, 1.0)
    assert(t1.values.forall(_ === 1.0)) // natural mix: keep everything
    val t05 = Sampling.temperatureRates(counts, 0.5)
    assert(t05("small") === 1.0) // most-upweighted stratum keeps all
    assert(t05("mid") === math.sqrt(25.0 / 100.0))
    assert(t05("big") === math.sqrt(25.0 / 900.0))
    // flattening: expected kept counts move closer together than raw
    val kept = counts.map { case (k, c) => k -> c * t05(k) }
    assert(kept("big") / kept("small") < 900.0 / 25.0)
  }

  test("temperature sample keeps rare strata whole and is deterministic") {
    val counts = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = counts.minBy(_._2)._1
    val out = Sampling.temperatureSample(docs, "doc_id", "lang", counts, 0.5)
    val keptByLang = out.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptByLang(minLang) === counts(minLang), "rate-1.0 stratum " +
      "must keep every row")
    // deterministic: same rows under a different partitioning
    val a = out.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling
      .temperatureSample(docs.repartition(7), "doc_id", "lang", counts, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a === b)
  }

  test("epoch key: stable within an epoch, a different permutation " +
      "across epochs") {
    val e3a = docs.select(col("doc_id"),
        Sampling.epochKey(col("doc_id"), 3).as("k"))
      .orderBy(col("k"), col("doc_id"))
      .collect().map(_.getLong(0))
    val e3b = docs.repartition(11).select(col("doc_id"),
        Sampling.epochKey(col("doc_id"), 3).as("k"))
      .orderBy(col("k"), col("doc_id"))
      .collect().map(_.getLong(0))
    val e4 = docs.select(col("doc_id"),
        Sampling.epochKey(col("doc_id"), 4).as("k"))
      .orderBy(col("k"), col("doc_id"))
      .collect().map(_.getLong(0))
    assert(e3a.toSeq === e3b.toSeq, "epoch order must not depend on " +
      "partitioning")
    assert(e3a.toSeq !== e4.toSeq, "different epochs must permute " +
      "differently")
    assert(e3a.sorted.toSeq === e4.sorted.toSeq, "every epoch covers the " +
      "same rows")
  }

  test("fixedPerStratum: exact counts, partition-stable, monotone in n") {
    val five = Sampling.fixedPerStratum(docs, "doc_id", "lang", 5)
    val byLang = five.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.values.forall(_ === 5L), s"expected 5 per lang: $byLang")
    val a = five.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.fixedPerStratum(docs.repartition(13), "doc_id", "lang", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b, "membership must not depend on partitioning")
    val ten = Sampling.fixedPerStratum(docs, "doc_id", "lang", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(ten), "growing n must only ADD rows")
  }

  test("sampled fraction lands near the requested rate") {
    val n = docs.count().toDouble
    val k = Sampling.sample(docs, "doc_id", 0.3).count().toDouble
    assert(math.abs(k / n - 0.3) < 0.08, s"got ${k / n}, wanted ~0.3")
  }

  test("stratified rates apply per stratum; unlisted strata get the default") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0), defaultFraction = 0.2)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") === totals("en")) // rate 1.0 keeps everything
    assert(!byLang.contains("de")) // rate 0.0 keeps nothing
    val others = totals.keySet -- Set("en", "de")
    others.foreach { l =>
      val rate = byLang.getOrElse(l, 0L).toDouble / totals(l)
      assert(rate > 0.02 && rate < 0.5, s"stratum $l rate $rate not ~0.2")
    }
  }

  test("hash buckets split disjointly and cover everything (train/val/test)") {
    val b = Sampling.hashBucket(col("doc_id"))
    val train = docs.filter(b < 8000).count()
    val valid = docs.filter(b >= 8000 && b < 9000).count()
    val test = docs.filter(b >= 9000).count()
    assert(train + valid + test === docs.count())
  }

  test("weighted sample without replacement: weight dominance, nested " +
      "samples, bad-weight exclusion, and a TakeOrdered plan") {
    val s = spark
    import s.implicits._
    // one row carries 10^6x the weight of 199 peers: its exponential
    // key is ~10^6 smaller — it must be in any reasonable sample
    val rows = (0L until 200L).map(i =>
      (i, if (i == 77L) 1000000.0 else 1.0)) :+
      ((200L, -3.0)) :+ ((201L, 0.0))
    val df = rows.toDF("id", "w")
    val top10 = Sampling.weightedSampleWithoutReplacement(df, "id", "w", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(top10.contains(77L), s"heavy row missing from $top10")
    assert(!top10.contains(200L) && !top10.contains(201L),
      "non-positive weights must never be sampled")

    // E-S keys are independent of k: sample(10) is a subset of
    // sample(20), and re-running is bit-identical
    val top20 = Sampling.weightedSampleWithoutReplacement(df, "id", "w", 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(top10.subsetOf(top20))
    val again = Sampling.weightedSampleWithoutReplacement(df, "id", "w", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === top10)

    val plan = Sampling.weightedSampleWithoutReplacement(df, "id", "w", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)

    // null weights are excluded, not NPE'd or sampled
    val withNull = Seq((1L, Some(2.0)), (2L, None)).toDF("id", "w")
    val nn = Sampling.weightedSampleWithoutReplacement(
      withNull, "id", "w", 5).select("id").collect().map(_.getLong(0))
    assert(nn.toSeq === Seq(1L))
  }

  test("assignSplit: stable, exhaustive, consistent with hashBucket thresholds") {
    val s = spark
    import s.implicits._
    val df = (0L until 500L).toDF("id")
    val splits = Seq("train" -> 8000, "val" -> 1000, "test" -> 1000)
    val out = Sampling.assignSplit(df, "id", splits)
      .withColumn("b", Sampling.hashBucket(col("id")))
      .collect()
    out.foreach { r =>
      val b = r.getAs[Int]("b")
      val want = if (b < 8000) "train" else if (b < 9000) "val" else "test"
      assert(r.getAs[String]("split") === want, s"bucket $b")
    }
    // every row labeled; re-run is bit-identical
    assert(out.length === 500)
    val again = Sampling.assignSplit(df, "id", splits)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach(r => assert(again(r.getAs[Long]("id")) === r.getAs[String]("split")))
    // weights must sum to the grid
    intercept[IllegalArgumentException](
      Sampling.assignSplit(df, "id", Seq("a" -> 5000, "b" -> 4000)))
  }

  test("cluster-safe split: no cluster straddles; singletons follow " +
      "the plain hash split; a doc-keyed split WOULD leak") {
    val s = spark
    import s.implicits._
    val docs = (0L until 400L).toDF("doc_id")
    // clusters of 4 consecutive ids over the first 200 docs
    val pairs = (0L until 200L).grouped(4).flatMap(g =>
      g.sliding(2).map(p => (p(0), p(1)))).toSeq
      .toDF("a_id", "b_id")
    val comps = Dedup.connectedComponents(pairs, "a_id", "b_id")
    val splits = Seq("train" -> 8000, "val" -> 1000, "test" -> 1000)
    val out = Sampling.assignClusterSafeSplit(docs, "doc_id", comps, splits)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("split_key"), r.getAs[String]("split")))
    assert(out.length === 400)
    // every member of a 4-cluster shares its cluster's split
    out.filter(_._1 < 200).groupBy(_._1 / 4).foreach { case (_, g) =>
      assert(g.map(_._3).distinct.length === 1, s"straddled: $g")
      assert(g.map(_._2).distinct.length === 1)
    }
    // unclustered docs: exactly the plain per-doc assignment
    val plain = Sampling.assignSplit(docs.filter(col("doc_id") >= 200),
        "doc_id", splits)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split")).toMap
    out.filter(_._1 >= 200).foreach { case (id, key, sp) =>
      assert(key === id && sp === plain(id))
    }
    // the doc-keyed split leaks on this fixture (some cluster split
    // across assignments) — the hazard this operator removes
    val docKeyed = Sampling.assignSplit(docs.filter(col("doc_id") < 200),
        "doc_id", splits)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split"))
    val straddled = docKeyed.groupBy(_._1 / 4)
      .exists(_._2.map(_._2).distinct.length > 1)
    assert(straddled, "fixture should demonstrate doc-keyed leakage")
  }

  test("matchedControls: nearest by value within stratum, ties to the " +
      "smaller side, strata isolated, controls reusable") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // stratum A: controls at 10 and 20; treated at 14 (closer to 10),
      // 15 (tie -> 10, the smaller side), 19 (closer to 20)
      ("A", 1L, 10L, false), ("A", 2L, 20L, false),
      ("A", 3L, 14L, true), ("A", 4L, 15L, true), ("A", 5L, 19L, true),
      // stratum B: single control far away — must match B's control,
      // never A's closer ones
      ("B", 6L, 100L, false), ("B", 7L, 11L, true),
      // stratum C: no control -> treated row dropped
      ("C", 8L, 50L, true)
    ).toDF("src", "id", "v", "treated")
    val out = Sampling.matchedControls(df, "id", "treated", "v", "src")
      .collect().map(r => r.getAs[Long]("treated_id") ->
        (r.getAs[Long]("control_id"), r.getAs[Long]("match_distance")))
      .toMap
    assert(out(3L) === ((1L, 4L)))
    assert(out(4L) === ((1L, 5L)), "tie must break to the smaller side")
    assert(out(5L) === ((2L, 1L)))
    assert(out(7L) === ((6L, 89L)), "match must stay inside the stratum")
    assert(!out.contains(8L), "a stratum without controls matches nothing")
    // controls reused: control 1 matched twice
    assert(out.values.count(_._1 == 1L) === 2)
  }
}
