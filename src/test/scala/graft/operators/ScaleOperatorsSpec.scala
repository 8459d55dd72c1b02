package graft.operators

import java.nio.file.Files

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-path behaviors that sf-small correctness alone can't show:
  * salted joins must be row-identical to plain joins, and bucketed tables
  * must co-locate their join (no Exchange on either side).
  */
class ScaleOperatorsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("saltedJoin returns exactly the plain join's rows") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val sup = spark.read.parquet(s"$dir/supplier.parquet")
    val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val salted = SkewJoins.saltedJoin(li, sup, "l_suppkey", "s_suppkey",
        Seq(col("l_orderkey"), col("l_linenumber")), saltFactor = 5)
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("bucketed tables join without a shuffle on either side") {
    val wh = Files.createTempDirectory("graft-warehouse")
    val s = spark
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    val ords = s.read.parquet(s"$dir/orders.parquet")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$wh/li_b")
      .saveAsTable("li_bucketed")
    ords.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$wh/ord_b")
      .saveAsTable("ord_bucketed")

    // disable broadcast so the co-location is what avoids the shuffle
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table("li_bucketed")
        .join(s.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      joined.collect()
      val full = joined.queryExecution.executedPlan.toString
      // AQE prints Final Plan then Initial Plan; judge only the final one
      val plan = full.split("== Initial Plan ==").head
      // the join itself must not be preceded by a shuffle exchange;
      // only the final groupBy may shuffle
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("bloomPrunedSemiJoin: result == plain semi-join; the bitmap " +
      "actually prunes before the exact join") {
    val s = spark
    import s.implicits._
    val probe = (0L until 5000L).map(i => (i, s"p$i")).toDF("k", "payload")
    val build = (0L until 5000L by 100L).toDF("k") // 50 keys
    val got = SkewJoins.bloomPrunedSemiJoin(probe, "k", build, "k",
        numBits = 1 << 14)
      .select(col("k")).collect().map(_.getLong(0)).toSet
    val want = probe.join(build, Seq("k"), "left_semi")
      .select(col("k")).collect().map(_.getLong(0)).toSet
    assert(got === want)
    // the pre-join filter itself passes few rows: 50 true keys + the
    // FP tail, far below the 5000 input (fpp at m/n = 327 is tiny)
    val bitmap = SkewJoins.buildLongBloom(build, "k", 1 << 14, 4)
    val survivors = SkewJoins.filterByBloom(probe, "k", bitmap,
      1 << 14, 4).count()
    assert(survivors >= 50L && survivors < 200L,
      s"bloom should prune the probe side, passed $survivors of 5000")
    // no false negatives, ever
    val trueKeys = build.collect().map(_.getLong(0)).toSet
    val passed = SkewJoins.filterByBloom(probe, "k", bitmap, 1 << 14, 4)
      .select(col("k")).collect().map(_.getLong(0)).toSet
    assert(trueKeys.subsetOf(passed))
  }

  test("image near-dup banding: candidate pairs track the planted " +
      "structure, never the n^2 pair space") {
    val s = spark
    import s.implicits._
    def corpus(n: Int): org.apache.spark.sql.DataFrame = {
      val rnd = new scala.util.Random(n) // distinct corpora per size
      val rows = Seq.tabulate(n) { i =>
        (i.toLong, Seq.fill(64)(rnd.nextInt(256).toDouble))
      }
      // 10 planted near-copies regardless of corpus size
      val copies = rows.take(10).map { case (id, px) =>
        (id + 1000000L, px.zipWithIndex.map { case (p, j) =>
          if (j % 16 == 0) math.min(255.0, p + 3) else p })
      }
      Multimodal.encodePng((rows ++ copies).toDF("id", "pixels"),
        "id", "pixels", side = 8)
    }
    def candidates(n: Int): Long = {
      val hashes = MediaDedup.averageHash(
        Multimodal.asMedia(corpus(n), "media_id", "media"))
      // the banded join BEFORE the Hamming filter — the work the
      // cluster actually does
      val banded = hashes.select(col("media_id"),
        explode(array(
          struct(lit(0).as("tbl"), col("b0").as("key")),
          struct(lit(1).as("tbl"), col("b1").as("key")),
          struct(lit(2).as("tbl"), col("b2").as("key")),
          struct(lit(3).as("tbl"), col("b3").as("key"))))
          .as("blk"))
        .select(col("media_id"), col("blk.tbl").as("tbl"),
          col("blk.key").as("key"))
      banded.as("a").join(banded.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.key") === col("b.key") &&
            col("a.media_id") < col("b.media_id"))
        .count()
    }
    val c400 = candidates(400)
    val c1600 = candidates(1600)
    // n grew 4x => n^2 grew 16x; candidates are planted pairs (~40
    // block hits) + the accidental 16-bit collision tail (~4n^2/2^16)
    // — both far under the pair space, and the growth must stay far
    // under quadratic blowup's 16x headroom over the planted floor
    assert(c400 < 400L * 400 / 100, s"c400=$c400")
    assert(c1600 < 1600L * 1600 / 100, s"c1600=$c1600")
    assert(c1600 < c400 * 16, s"growth must be sub-n^2: $c400 -> $c1600")
  }

  test("skipping manifest stays shard-grain as the corpus multiplies") {
    val s = spark
    val orders = s.read.parquet(s"$dir/orders.parquet")
      .withColumn("shard", pmod(col("o_orderkey"), lit(16)).cast("int"))
    val x4 = orders.union(orders).union(orders).union(orders)
    val m1 = graft.sources.SkippingManifest.build(orders, "shard",
      Seq("o_orderdate", "o_totalprice"))
    val m4 = graft.sources.SkippingManifest.build(x4, "shard",
      Seq("o_orderdate", "o_totalprice"))
    assert(m1.count() === 16L && m4.count() === 16L)
    // pruning decisions are identical: stats are mergeable aggregates
    val lo = lit(java.sql.Date.valueOf("1995-01-01"))
    val hi = lit(java.sql.Date.valueOf("1995-03-31"))
    val s1 = graft.sources.SkippingManifest.survivors(m1, "o_orderdate",
      lo, hi).select("shard").collect().map(_.getInt(0)).toSet
    val s4 = graft.sources.SkippingManifest.survivors(m4, "o_orderdate",
      lo, hi).select("shard").collect().map(_.getInt(0)).toSet
    assert(s1 === s4)
  }

  test("scale probes, round-10 waves: z-order profile rows constant, " +
      "winnow pair cost tracks maxDf not n², session state linear") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    // z-order: 4x the rows, SAME 16-row profile (the stats store is
    // layout-bounded, not data-bounded)
    def zdata(n: Int) = (1 to n).map(_ =>
      (rng.nextInt(100000).toLong, rng.nextInt(3650).toLong))
      .toDF("x", "y")
    val p1 = ZOrder.skippingProfile(zdata(2000), Seq("x", "y"), 8, 16)
      .count()
    val p4 = ZOrder.skippingProfile(zdata(8000), Seq("x", "y"), 8, 16)
      .count()
    assert(p1 <= 16L && p4 <= 16L)
    // winnow matching: with the df cap, quadrupling a corpus of
    // REPEATED docs grows pairs at the capped rate, not (4n)²/n² = 16x
    val base = (1 to 40).map(i =>
      (i.toLong, "shared common text body " + (i % 4) +
        " with enough characters to fingerprint"))
    val big = (0 until 4).flatMap(r => base.map { case (id, t) =>
      (id + r * 1000L, t) })
    val c1 = Winnow.matchPairs(base.toDF("doc_id", "text"), "doc_id",
      "text", minShared = 1, maxDf = 12).count()
    val c4 = Winnow.matchPairs(big.toDF("doc_id", "text"), "doc_id",
      "text", minShared = 1, maxDf = 12).count()
    assert(c4 < c1 * 16,
      s"df cap must break the quadratic: $c1 -> $c4")
    // sessionization: output rows grow linearly with events
    def ev(n: Int) = (1 to n).map(i => (i.toLong % 50, i.toLong,
      new java.sql.Timestamp(1700000000000L + i * 60000L)))
      .toDF("user_id", "event_id", "ts")
    val s1n = Sessionize.assignSessions(ev(2000), "user_id", "ts",
      "event_id").count()
    val s4n = Sessionize.assignSessions(ev(8000), "user_id", "ts",
      "event_id").count()
    assert(s1n === 2000L && s4n === 8000L)
  }
}
