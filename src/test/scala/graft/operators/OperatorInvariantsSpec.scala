package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded property-style invariants over the round-4 operators — the
  * contracts that must hold for ANY input, checked across several
  * deterministic random corpora (no scalacheck in the offline cache;
  * seeded loops per repo convention).
  */
class OperatorInvariantsSpec extends SparkSpec {

  private def corpus(seed: Long, n: Int) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    Seq.tabulate(n) { i =>
      val len = 5 + rnd.nextInt(40)
      (i.toLong, Seq.fill(len)(words(rnd.nextInt(words.length)))
        .mkString(" "),
        Seq("en", "de", "fr")(rnd.nextInt(3)))
    }.toDF("doc_id", "text", "lang")
  }

  test("dedupCorpus: exactly one canonical per component, all rows kept") {
    Seq(7L, 21L).foreach { seed =>
      val docs = corpus(seed, 120)
      graft.CacheScope.scoped {
        val out = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.8)
        assert(out.count() === docs.count(), s"seed $seed dropped rows")
        val perComp = out.groupBy("component")
          .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("n"))
          .select("n").collect().map(_.getLong(0))
        assert(perComp.forall(_ === 1L),
          s"seed $seed: a component without exactly one canonical")
        // the canonical is the component id itself (min-id contract)
        val bad = out.filter(col("is_canonical") &&
          col("component") =!= col("doc_id")).count()
        assert(bad === 0, s"seed $seed: canonical != component id")
      }
    }
  }

  test("temperature rates: always in (0, 1], monotone in stratum size " +
      "for T<1") {
    Seq(3L, 13L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val counts = (1 to 6)
        .map(i => s"s$i" -> (1L + rnd.nextInt(100000))).toMap
      val r = Sampling.temperatureRates(counts, 0.5)
      assert(r.values.forall(v => v > 0.0 && v <= 1.0), s"$r")
      // bigger stratum -> smaller (or equal) keep rate
      val byCount = counts.toSeq.sortBy(_._2).map { case (k, _) => r(k) }
      assert(byCount.zip(byCount.tail).forall { case (a, b) => a >= b },
        s"rates not monotone: $byCount")
    }
  }

  test("fixedPerStratum: n >= stratum size keeps the whole stratum") {
    val docs = corpus(5L, 60)
    val out = Sampling.fixedPerStratum(docs, "doc_id", "lang", 1000)
    assert(out.count() === docs.count())
  }

  test("selectByTokenBudget: never exceeds the budget, never selects " +
      "below-cutoff quality over above-cutoff") {
    Seq(11L, 29L).foreach { seed =>
      val docs = corpus(seed, 150)
        .withColumn("score",
          graft.functions.TextFunctions
            .qualityScore(col("text"), length(col("text"))))
        .withColumn("n_tokens",
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("long"))
      graft.CacheScope.scoped {
        val budget = 1500L
        val sel = CorpusSelection
          .selectByTokenBudget(docs, "doc_id", "score", "n_tokens", budget)
        val rows = sel.select("doc_id", "score", "n_tokens").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        assert(rows.map(_._3).sum <= budget, s"seed $seed busted budget")
        if (rows.nonEmpty) {
          val minSel = rows.map(_._2).min
          // no unselected doc with score STRICTLY above every selected
          // score may exist (quality-first contract)
          val selectedIds = rows.map(_._1).toSet
          val skippedBetter = docs
            .filter(col("score") > minSel + 1)
            .collect()
            .map(_.getAs[Long]("doc_id"))
            .filterNot(selectedIds)
          assert(skippedBetter.isEmpty,
            s"seed $seed skipped higher-quality docs: $skippedBetter")
        }
      }
    }
  }

  test("bloom decontamination: never misses an exact-join hit (any seed)") {
    Seq(17L, 41L).foreach { seed =>
      val docs = corpus(seed, 80)
      val bench = docs.filter(col("doc_id") < 8)
      val rest = docs.filter(col("doc_id") >= 8)
      val bloom = Contamination.benchmarkBloom(bench, "text", n = 3)
      val approx = Contamination
        .flagContaminatedBloom(rest, "doc_id", "text", bloom, n = 3)
        .filter(col("is_contaminated"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val exact = Contamination
        .flagContaminated(rest, "doc_id", "text", bench, "text", n = 3)
        .filter(col("is_contaminated"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(exact.subsetOf(approx), s"seed $seed: one-sided error " +
        s"violated, missing ${exact -- approx}")
    }
  }

  test("gramNovelty: every distinct corpus gram is novel exactly once, " +
      "so sum(n_novel) == |distinct grams| and novelty <= grams per doc") {
    Seq(13L, 37L).foreach { seed =>
      val docs = corpus(seed, 90)
      val out = graft.CacheScope.scoped {
        Novelty.gramNovelty(docs, "doc_id", "text", n = 3).collect()
      }
      assert(out.forall(r =>
        r.getAs[Long]("n_novel") <= r.getAs[Long]("n_grams")),
        s"seed $seed: novelty exceeded gram count")
      val sumNovel = out.map(_.getAs[Long]("n_novel")).sum
      val distinctGrams = docs
        .select(explode(graft.functions.TextFunctions.shingles(
          col("text"), 3)).as("g"))
        .distinct().count()
      assert(sumNovel === distinctGrams,
        s"seed $seed: $sumNovel novel vs $distinctGrams distinct grams — " +
          "a gram must be novel exactly at its first doc")
    }
  }

  test("waterfill: allocations sum to min(budget, total capacity), " +
      "never exceed capacity, and unsaturated sources split by weight") {
    val s = spark
    import s.implicits._
    Seq(5L, 23L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val strata = Seq.tabulate(12) { i =>
        (s"src$i", 100L + rnd.nextInt(2000).toLong,
          0.5 + rnd.nextInt(5).toDouble)
      }.toDF("source", "cap", "w")
      val totalCap = strata.select(sum(col("cap")))
        .collect().head.getLong(0).toDouble
      // b = 0 pins the negative-level clamp: allocations are never < 0
      Seq(0.0, totalCap * 0.4, totalCap * 0.9, totalCap * 2.0).foreach { b =>
        val out = Mixture.waterfill(strata, "source", "cap", "w", b)
          .collect()
          .map(r => (r.getAs[String]("source"), r.getAs[Long]("cap"),
            r.getAs[Double]("w"), r.getAs[Double]("alloc")))
        assert(out.forall { case (_, c, _, a) => a >= 0.0 && a <= c + 1e-6 },
          s"seed $seed b=$b: allocation negative or over capacity")
        val total = out.map(_._4).sum
        assert(math.abs(total - math.min(b, totalCap)) < 1e-6,
          s"seed $seed b=$b: allocations sum $total != " +
            s"${math.min(b, totalCap)}")
        // unsaturated sources allocate proportionally to weight: the
        // implied level alloc/w is one shared constant across them
        val levels = out.filter { case (_, c, _, a) => a < c - 1e-6 }
          .map { case (_, _, w, a) => a / w }
        if (levels.nonEmpty)
          assert(levels.max - levels.min < 1e-6,
            s"seed $seed b=$b: unsaturated levels diverge: $levels")
      }
    }
  }

  test("selectByAllocations: per-stratum token mass fits floor(alloc), " +
      "the boundary prefix is maximal, and absent strata select nothing") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val docs = Seq.tabulate(400) { i =>
      (i.toLong, s"src${i % 5}", 5L + rnd.nextInt(50).toLong)
    }.toDF("doc_id", "source", "n_tok")
    val caps = docs.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("cap"))
      .withColumn("w", lit(1.0))
    val totalCap = caps.select(sum(col("cap"))).collect().head.getLong(0)
    Seq(totalCap * 0.3, totalCap * 0.8).foreach { b =>
      val alloc = Mixture.waterfill(caps, "source", "cap", "w", b)
      val budget = alloc.collect()
        .map(r => r.getAs[String]("source") ->
          math.floor(r.getAs[Double]("alloc")).toLong).toMap
      val sel = Mixture.selectByAllocations(docs, "doc_id", "source",
        "n_tok", alloc, hashBuckets = 8)
      val perSource = sel.groupBy(col("source"))
        .agg(sum(col("n_tok")).as("m")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // never over-allocate
      perSource.foreach { case (k, m) =>
        assert(m <= budget(k), s"b=$b: $k selected $m > ${budget(k)}")
      }
      // determinism: the same inputs pick the same documents
      val again = Mixture.selectByAllocations(docs, "doc_id", "source",
          "n_tok", alloc, hashBuckets = 8)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(again === sel.select("doc_id").collect()
        .map(_.getLong(0)).toSet)
      // full replay of the two-phase rule: per stratum, buckets
      // cumulate ascending; the first overflowing bucket is the
      // boundary, ranked by (splitmix64(id), id) under the remainder;
      // later buckets drop whole. The operator's pick must equal it.
      val selected = sel.select("doc_id").collect().map(_.getLong(0)).toSet
      val rows = docs.collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2)))
        .map { case (id, k, n) =>
          val h = graft.functions.DedupFunctions.splitmix64(id)
          (id, k, n, ((h % 8) + 8) % 8, h)
        }
      val expected = rows.groupBy(_._2).toSeq.flatMap { case (k, inStratum) =>
        val byBucket = inStratum.groupBy(_._4).toSeq.sortBy(_._1)
        var acc = 0L
        var cut = 8L
        var rem = 0L
        var found = false
        byBucket.foreach { case (bkt, ds) =>
          val t = ds.map(_._3).sum
          if (!found) {
            if (acc + t <= budget(k)) acc += t
            else { cut = bkt; rem = budget(k) - acc; found = true }
          }
        }
        val full = inStratum.filter(_._4 < cut).map(_._1)
        var cum = 0L
        val bnd = inStratum.filter(_._4 == cut)
          .sortBy(t => (t._5, t._1))
          .takeWhile { t => cum += t._3; cum <= rem }
          .map(_._1)
        full ++ bnd
      }.toSet
      assert(selected === expected,
        s"b=$b: pick diverged from the two-phase replay " +
          s"(extra=${selected.diff(expected)}, " +
          s"missing=${expected.diff(selected)})")
    }
    // strata missing from the allocation table select nothing
    val none = Mixture.selectByAllocations(docs, "doc_id", "source",
      "n_tok", Seq(("srcX", 1e9)).toDF("source", "alloc"),
      hashBuckets = 8)
    assert(none.count() === 0L)
  }

  test("selectByAllocationsEpochs: repeats bounded by maxEpochs, mass " +
      "fits floor(alloc), epoch-1 slice == selectByAllocations") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val docs = Seq.tabulate(300) { i =>
      (i.toLong, s"src${i % 4}", 5L + rnd.nextInt(40).toLong)
    }.toDF("doc_id", "source", "n_tok")
    val caps = docs.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("cap"))
      // src0 upweighted so its fair share forces repetition
      .withColumn("w", when(col("source") === "src0", 8.0).otherwise(1.0))
    val totalCap = caps.select(sum(col("cap"))).collect().head.getLong(0)
    val maxEpochs = 3
    val alloc = Mixture.waterfill(caps, "source", "cap", "w",
      budget = totalCap * 0.9, maxEpochs = maxEpochs)
    val budget = alloc.collect()
      .map(r => r.getAs[String]("source") ->
        math.floor(r.getAs[Double]("alloc")).toLong).toMap
    val capMap = caps.collect()
      .map(r => r.getString(0) -> r.getAs[Long]("cap")).toMap
    // the fixture must actually exercise repetition
    assert(budget("src0") > capMap("src0"),
      s"fixture failed to force repetition: $budget vs $capMap")

    val sel = Mixture.selectByAllocationsEpochs(docs, "doc_id", "source",
      "n_tok", alloc, maxEpochs = maxEpochs, hashBuckets = 8)
    val rows = sel.select("doc_id", "source", "n_tok", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))

    // (doc, epoch) rows are unique and epochs stay in [1, maxEpochs]
    assert(rows.map(t => (t._1, t._4)).distinct.length === rows.length)
    assert(rows.forall(t => t._4 >= 1 && t._4 <= maxEpochs))
    // no doc repeats more than maxEpochs times
    val perDoc = rows.groupBy(_._1).map(_._2.length)
    assert(perDoc.forall(_ <= maxEpochs))
    // per-stratum selected mass (repeats counted) fits floor(alloc)
    rows.groupBy(_._2).foreach { case (k, rs) =>
      val m = rs.map(_._3).sum
      assert(m <= budget(k), s"$k selected mass $m > ${budget(k)}")
    }
    // complete epochs really are complete: every doc of the stratum
    // appears in each epoch 1..fe, fe = budget / capacity
    val srcDocs = docs.filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fe = (budget("src0") / capMap("src0")).toInt
    assert(fe >= 1)
    (1 to fe).foreach { e =>
      val inEpoch = rows.filter(t => t._2 == "src0" && t._4 == e)
        .map(_._1).toSet
      assert(inEpoch === srcDocs, s"epoch $e of src0 is not complete")
    }
    // and the partial epoch fe+1 holds a strict subset
    val partial = rows.filter(t => t._2 == "src0" && t._4 == fe + 1)
      .map(_._1).toSet
    assert(partial.subsetOf(srcDocs) && partial.size < srcDocs.size)

    // maxEpochs = 1 reproduces selectByAllocations exactly (same docs,
    // all at epoch 1) under the SAME allocation table
    val allocFlat = Mixture.waterfill(caps, "source", "cap", "w",
      budget = totalCap * 0.5)
    val flat = Mixture.selectByAllocationsEpochs(docs, "doc_id", "source",
      "n_tok", allocFlat, maxEpochs = 1, hashBuckets = 8)
    val flatRows = flat.select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(flatRows.forall(_._2 == 1))
    val plain = Mixture.selectByAllocations(docs, "doc_id", "source",
      "n_tok", allocFlat, hashBuckets = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flatRows.map(_._1).toSet === plain,
      "epoch-1 slice must equal the un-epoched operator")
  }

  test("semanticDedup: keep set plus distinct pair b-sides partitions " +
      "the vector set (nothing lost, nothing double-counted)") {
    val vectors =
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    Seq(0.25, 0.35).foreach { tau =>
      val pairs = Similarity.semanticDupPairs(vectors, "vec_id",
        "embedding", threshold = tau, nLists = 8)
        .select("b_id").distinct().count()
      val kept = Similarity.semanticDedup(vectors, "vec_id", "embedding",
        threshold = tau, nLists = 8).count()
      assert(kept + pairs === vectors.count(),
        s"tau=$tau: kept $kept + dropped $pairs != total")
    }
  }

  test("second-continuation families: range/shape invariants on real " +
      "sf0.001 data") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // funnel counts are monotone non-increasing down the steps
    graft.CacheScope.scoped {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      val ev = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.expr(
              "timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
      val counts = Funnel.funnelSummary(ev, "user_id", "event_type",
          "ts", Seq("view", "click", "purchase"), "24 hours")
        .orderBy(col("step")).collect().map(_.getAs[Long]("n_users"))
      assert(counts.sliding(2).forall(p => p(0) >= p(1)), counts.toSeq)

      // entropy in [0, ln n_cats]; normalized in [0, 1]
      Robust.entropyProfile(ev, "user_id", "event_type").collect()
        .foreach { r =>
          val e = r.getAs[Double]("entropy")
          val en = r.getAs[Double]("entropy_norm")
          val k = r.getAs[Long]("n_cats")
          assert(e >= 0 && e <= math.log(k.toDouble) + 1e-9, s"$e k=$k")
          assert(en >= 0 && en <= 1.0 + 1e-9)
        }

      // dispersion is non-negative
      Robust.dispersionProfile(ev, "user_id", "ts").collect()
        .foreach(r => assert(r.getAs[Double]("dispersion") >= -1e-9))

      // CUSUM statistic is non-negative everywhere
      val hourly = ev.groupBy(col("event_type"),
          org.apache.spark.sql.functions.window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("c"))
        .select(col("event_type"), col("window.start").as("h"), col("c"))
      Robust.cusumDrift(hourly, "event_type", "h", "c").collect()
        .foreach(r => assert(r.getAs[Double]("cusum") >= 0.0))
    }

    // gini in [0, 1); quantile normalization preserves per-group order
    graft.CacheScope.scoped {
      Robust.giniProfile(docs.select(col("source"), col("doc_id"),
          col("n_chars")), "source", "doc_id", "n_chars").collect()
        .foreach { r =>
          val g = r.getAs[Double]("gini")
          assert(g >= -1e-9 && g < 1.0, s"gini $g")
        }
      val qn = Normalize.quantileNormalize(docs, "source", "doc_id",
          "n_chars").collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("normalized")))
      qn.groupBy(_._1).values.foreach { rows =>
        val sorted = rows.sortBy(r => (r._2, r._3))
        assert(sorted.map(_._3).sliding(2).forall(p =>
          p.length < 2 || p(0) <= p(1)),
          "normalization must preserve within-group order")
      }
    }

    // bootstrap CI brackets; AUC-style ratios in range
    graft.CacheScope.scoped {
      Bootstrap.poissonCiOfMean(docs, "source", "doc_id", "n_chars",
          reps = 30).collect().foreach { r =>
        assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("ci_hi"))
      }
    }
  }
}
