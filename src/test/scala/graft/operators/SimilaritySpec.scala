package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** ANN behavior at the operator level: exactness of the brute-force path,
  * and recall/cost characteristics of the IVF and LSH approximations
  * against it on the real embeddings table.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val vectors =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("brute-force top-k is exact and deterministic") {
    val a = Similarity.neighborsOf(vectors, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    val b = Similarity.neighborsOf(vectors, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(a === b)
    assert(a.size === 10)
  }

  test("margin mining: IVF-bounded path recall vs the exact baseline") {
    val exact = Similarity
      .marginTopMatches(vectors, "vec_id", "embedding", k = 8)
      .select(col("x"), col("best_match"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Clustering.kmeansCentroids(vectors, "vec_id",
      "embedding", k = 64, iters = 2)
    val via = Similarity
      .marginTopMatchesVia(vectors, "vec_id", "embedding", k = 8,
        cents, nAssign = 6)
      .select(col("x"), col("best_match"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every vector must still get a best match (6-assignment lists
    // always contain at least one partner on this corpus)
    assert(via.map(_._1) === exact.map(_._1),
      "IVF path lost vectors entirely")
    val r = exact.count(via.contains).toDouble / exact.size
    info(f"margin best-match recall (IVF 64x6 vs exact): $r%.2f")
    assert(r >= 0.85, f"margin-mining recall $r%.2f fell under 0.85")
    // boundedness: the candidate space must be a strict fraction of
    // the n² pair table even on this unclustered synthetic corpus
    val n = vectors.count()
    val prepped = graft.functions.VectorFunctions
      .prepForPairs(vectors, "vec_id", "embedding")
    val asg = prepped.withColumn("l",
      explode(Clustering.nearestLists(col("vd"), cents, 6)))
    val nPairs = asg.as("a")
      .join(asg.as("b"), col("a.l") === col("b.l") &&
        col("a.id") =!= col("b.id"))
      .select(col("a.id"), col("b.id")).distinct().count()
    val frac = nPairs.toDouble / (n * (n - 1))
    info(f"candidate fraction of all-pairs: $frac%.2f")
    assert(frac <= 0.7, f"candidate space $frac%.2f not bounded")
  }

  test("bitext mining: IVF-bounded path recall vs the exact " +
      "cross-group baseline; every best match crosses groups") {
    val grouped = vectors.withColumn("grp",
      pmod(col("vec_id"), lit(5L)).cast("string"))
    val exact = Similarity
      .bitextTopMatches(grouped, "vec_id", "embedding", "grp", k = 8)
      .select(col("x"), col("best_match"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Clustering.kmeansCentroids(vectors, "vec_id",
      "embedding", k = 64, iters = 2)
    val via = Similarity
      .bitextTopMatchesVia(grouped, "vec_id", "embedding", "grp",
        k = 8, cents, nAssign = 6)
      .select(col("x"), col("best_match"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(via.map(_._1) === exact.map(_._1),
      "IVF bitext path lost vectors entirely")
    val r = exact.count(via.contains).toDouble / exact.size
    info(f"bitext best-match recall (IVF 64x6 vs exact): $r%.2f")
    assert(r >= 0.85, f"bitext-mining recall $r%.2f fell under 0.85")
    // the bitext constraint: NO best match may share its vector's group
    via.foreach { case (x, m) =>
      assert(x % 5 !== m % 5, s"same-group best match $x -> $m")
    }
  }

  test("quantized top-k: measured recall vs the float path") {
    val query = vectors.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_emb"))
    val rest = vectors.filter(col("vec_id") =!= 0L)
    val exact = Similarity
      .bruteForceTopK(rest, "vec_id", "embedding", query, 10)
    val quant = Similarity
      .quantizedTopK(rest, "vec_id", "embedding", query, 10)
    val r = Similarity.recall(quant, exact, Seq("vec_id"))
    info(f"int8-quantized recall@10: $r%.2f")
    // int8 over 64 dims loses little: observed 0.90 on this table; the
    // 0.8 floor guards the property, not the exact figure
    assert(r >= 0.8, f"quantized recall@10 $r%.2f fell under 0.8")
    // scores are cosine-scale dots: bounded by |a||q| ~ same grid
    assert(quant.collect().length === 10)
  }

  test("IVF full probe is exact; partial probe answers come from probed lists only") {
    val query = vectors.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_emb"))
    val exact = Similarity.bruteForceTopK(vectors, "vec_id", "embedding",
      query, 10).collect().map(_.getLong(0)).toSet

    // probing every list degenerates to exact search
    val full = Similarity.ivfTopK(vectors, "vec_id", "embedding",
      query, 10, nLists = 16, nProbe = 16)
      .collect().map(_.getLong(0)).toSet
    assert(full === exact)

    // partial probe: answers must be confined to ≤ nProbe assigned lists
    // — the pruning contract that distinguishes IVF from a scan — and
    // the query's own best list must be among them (the query vector IS
    // vec_id 0, so id 0 always survives probing)
    val approx2 = Similarity.ivfTopK(vectors, "vec_id", "embedding",
      query, 10, nLists = 16, nProbe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(approx2.nonEmpty)
    assert(approx2.contains(0L))
    val assignments = Similarity.assignLists(vectors, "embedding", 16)
      .select(col("vec_id"), col("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val answerLists = approx2.map(assignments)
    assert(answerLists.size <= 2,
      s"answers spanned lists $answerLists — pruning is not happening")
  }

  test("LSH recall: multi-probe strictly widens the candidate set and " +
      "lifts top-k recall to a measured floor") {
    val qids = Seq(0L, 7L, 23L, 42L, 99L)
    val k = 10
    val recalls = qids.map { qid =>
      val query = vectors.filter(col("vec_id") === qid)
        .select(col("embedding").as("q_emb"))
      val exact = Similarity.bruteForceTopK(vectors, "vec_id", "embedding",
        query, k)
      def lsh(p: Int) = Similarity.lshTopK(vectors, "vec_id", "embedding",
        query, k, nProbes = p)
      val rs = Seq(1, 8, 32, 64).map(p =>
        Similarity.recall(lsh(p), exact, Seq("vec_id")))
      // the full 2^8-probe sweep scans every bucket: recall 1 by identity
      val rAll = Similarity.recall(lsh(256), exact, Seq("vec_id"))
      assert(rAll === 1.0, s"query $qid: full probe sweep must be exact")
      rs
    }
    val avgs = recalls.transpose.map(c => c.sum / c.size)
    info(f"LSH top-$k recall over ${recalls.size} queries: " +
      Seq(1, 8, 32, 64).zip(avgs).map { case (p, r) => f"$p probes=$r%.2f" }
        .mkString(", "))
    assert(avgs.head > 0.0, "single-probe recall 0 — LSH found nothing")
    // probing more buckets must not lose recall (small slack for the
    // top-k tie-break at equal cosine)
    avgs.sliding(2).foreach { case Seq(lo, hi) =>
      assert(hi >= lo - 0.05, s"recall fell from $lo to $hi as probes grew")
    }
    // measured floors on this corpus (500 near-random vectors, 8 planes:
    // top-10 neighbors are weak, so they cross many hyperplanes —
    // documented recall profile 0.12/0.18/0.42/0.60 at 1/8/32/64 probes)
    assert(avgs(2) >= 0.3, f"32-probe average recall ${avgs(2)}%.2f < 0.3")
    assert(avgs(3) >= 0.5, f"64-probe average recall ${avgs(3)}%.2f < 0.5")
  }

  test("IVF recall rises with nProbe to a measured floor") {
    val qids = Seq(0L, 7L, 23L, 42L, 99L)
    val k = 10
    val recalls = qids.map { qid =>
      val query = vectors.filter(col("vec_id") === qid)
        .select(col("embedding").as("q_emb"))
      val exact = Similarity.bruteForceTopK(vectors, "vec_id", "embedding",
        query, k)
      def ivf(p: Int) = Similarity.ivfTopK(vectors, "vec_id", "embedding",
        query, k, nLists = 16, nProbe = p)
      (Similarity.recall(ivf(1), exact, Seq("vec_id")),
        Similarity.recall(ivf(4), exact, Seq("vec_id")))
    }
    val avg1 = recalls.map(_._1).sum / recalls.size
    val avg4 = recalls.map(_._2).sum / recalls.size
    assert(avg4 >= avg1, s"probing 4/16 lists ($avg4) lost recall vs 1 ($avg1)")
    assert(avg4 >= 0.5, s"nProbe=4 average recall $avg4 under the 0.5 floor")
    info(f"IVF top-$k recall over ${recalls.size} queries: " +
      f"nProbe=1: $avg1%.2f, nProbe=4: $avg4%.2f")
  }

  test("trained (k-means) IVF beats untrained hash centroids at the " +
      "same probe budget — measured top-k recall") {
    val cents = Clustering.kmeansCentroids(vectors, "vec_id", "embedding",
      k = 16, iters = 2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-cmp").toString
    Similarity.writeIvfIndex(vectors, "vec_id", "embedding", dir, cents)
    val qids = Seq(0L, 7L, 23L, 42L, 99L)
    val rs = qids.map { qid =>
      val q = vectors.filter(col("vec_id") === qid)
        .select(col("embedding").as("q_emb"))
      val qv = vectors.filter(col("vec_id") === qid)
        .select(transform(col("embedding"), x => x.cast("double")).as("q"))
        .collect().head.getSeq[Double](0).toSeq
      val exact = Similarity.bruteForceTopK(vectors, "vec_id", "embedding",
        q, 10)
      val untrained = Similarity.ivfTopK(vectors, "vec_id", "embedding",
        q, 10, nLists = 16, nProbe = 4)
      val trained = Similarity.ivfTopKIndexed(spark, dir, qv, 10, nProbe = 4)
        .withColumnRenamed("id", "vec_id")
      (Similarity.recall(untrained, exact, Seq("vec_id")),
        Similarity.recall(trained, exact, Seq("vec_id")))
    }
    val (ru, rt) = (rs.map(_._1).sum / rs.size, rs.map(_._2).sum / rs.size)
    info(f"IVF top-10 recall @ nProbe=4/16 lists: untrained $ru%.2f, " +
      f"trained (k-means) $rt%.2f")
    // measured 0.54 vs 0.78 on this table; the floors guard the
    // property (trained centroids fit the data, hash planes don't)
    assert(rt > ru, f"training did not lift recall ($rt%.2f <= $ru%.2f)")
    assert(rt >= 0.6, f"trained recall $rt%.2f under the 0.6 floor")
  }

  test("IVF list assignment is total and deterministic") {
    val counts = Similarity.assignLists(vectors, "embedding", nLists = 16)
      .groupBy("list_id").count().collect()
    assert(counts.map(_.getLong(1)).sum === vectors.count())
    val again = Similarity.assignLists(vectors, "embedding", nLists = 16)
      .groupBy("list_id").count().collect()
    assert(counts.map(r => r.getInt(0) -> r.getLong(1)).toMap ===
      again.map(r => r.getInt(0) -> r.getLong(1)).toMap)
  }

  test("semantic dedup: pairs are within-list and a subset of the " +
      "brute-force pairs at the same threshold; dedup drops b-sides") {
    val tau = 0.3
    val pairs = Similarity.semanticDupPairs(vectors, "vec_id", "embedding",
      threshold = tau, nLists = 8).collect()
    // every pair really is same-list (join key) and above threshold
    assert(pairs.forall(_.getAs[Double]("cos") >= tau))
    // subset of the exact all-pairs result (the recall trade is cross-
    // list misses, never false admissions)
    val exact = Dedup.embeddingNearDupPairs(vectors, "vec_id", "embedding",
        threshold = tau - 1e-12)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = pairs.map(r =>
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(approx.subsetOf(exact),
      s"semantic pairs not a subset: ${approx.diff(exact)}")
    // the recall lever: fewer, larger lists recover cross-list misses
    val approx4 = Similarity.semanticDupPairs(vectors, "vec_id",
        "embedding", threshold = tau, nLists = 4)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r8 = approx.size.toDouble / exact.size
    val r4 = approx4.size.toDouble / exact.size
    info(f"SemDeDup pair recall vs brute force @tau=$tau: " +
      f"nLists=8 $r8%.2f, nLists=4 $r4%.2f (${exact.size} true pairs)")
    assert(r4 >= r8 - 1e-9,
      "fewer lists must not lose recall (bigger lists, fewer cross-list misses)")
    val kept = Similarity.semanticDedup(vectors, "vec_id", "embedding",
      threshold = tau, nLists = 8)
    val dropped = approx.map(_._2)
    assert(kept.count() === vectors.count() - dropped.size)
    val keptIds = kept.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(dropped.forall(!keptIds.contains(_)))
  }

  test("trained SemDeDup: k-means centroids and multi-assignment lift " +
      "pair recall above the untrained baseline") {
    val tau = 0.3
    val exact = Dedup.embeddingNearDupPairs(vectors, "vec_id", "embedding",
        threshold = tau - 1e-12)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val untrained = pairSet(Similarity.semanticDupPairs(
      vectors, "vec_id", "embedding", threshold = tau, nLists = 8))
    val cents = Clustering.kmeansCentroids(vectors, "vec_id", "embedding",
      k = 8, iters = 2)
    val trained = pairSet(Similarity.semanticDupPairsTrained(
      vectors, "vec_id", "embedding", tau, cents, nAssign = 1))
    val multi = pairSet(Similarity.semanticDupPairsTrained(
      vectors, "vec_id", "embedding", tau, cents, nAssign = 2))
    // never false admissions, on any path
    assert(trained.subsetOf(exact), s"not a subset: ${trained.diff(exact)}")
    assert(multi.subsetOf(exact), s"not a subset: ${multi.diff(exact)}")
    // multi-assignment only ADDS comparisons: single-assign pairs share
    // their best list, which top-2 assignment still includes
    assert(trained.subsetOf(multi),
      s"nAssign=2 lost pairs: ${trained.diff(multi)}")
    val r0 = untrained.size.toDouble / exact.size
    val r1 = trained.size.toDouble / exact.size
    val r2 = multi.size.toDouble / exact.size
    info(f"SemDeDup pair recall @tau=$tau (${exact.size} true pairs): " +
      f"untrained nLists=8 $r0%.2f, trained k=8 $r1%.2f, " +
      f"trained+top2 $r2%.2f")
    // the round-6 verdict's Done criterion: both trained paths strictly
    // above the measured untrained 0.27 baseline on this fixture
    assert(r1 > r0, f"trained recall $r1%.2f not above untrained $r0%.2f")
    assert(r2 >= r1, f"multi-assign recall $r2%.2f under trained $r1%.2f")
    assert(r2 > r0, f"trained+top2 recall $r2%.2f not above $r0%.2f")
    // the dedup form drops exactly the distinct b-sides of the pair form
    val kept = Similarity.semanticDedupTrained(vectors, "vec_id",
      "embedding", tau, cents, nAssign = 2)
    assert(kept.count() === vectors.count() - multi.map(_._2).size)
    val keptIds = kept.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(multi.map(_._2).forall(!keptIds.contains(_)))
  }

  test("PQ: a self-codebook fixture reproduces exact dot ranking; " +
      "codes are total and bounded; measured ADC recall on the real " +
      "embeddings") {
    val s = spark
    import s.implicits._
    // 8 spread-out 8-dim vectors with k = 8: training seeds every
    // cluster with its own vector, assignment keeps it there (dist 0),
    // so the codebook IS the vector set and ADC = exact dot
    val tiny = (0L until 8L).map { i =>
      (i, (0 until 8).map(j =>
        if (j == (i % 8).toInt) 10.0f else (i + j).toFloat % 3))
    }.toDF("vec_id", "embedding")
    val model = Similarity.trainPq(tiny, "vec_id", "embedding",
      m = 2, k = 8, iters = 2, dim = 8)
    val enc = Similarity.pqEncode(tiny, "vec_id", "embedding", model)
    val codes = enc.select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size === 8)
    assert(codes.values.forall(c => c.length === 2 &&
      c.forall(x => x >= 0 && x < 8)))
    // a corpus smaller than k refuses loudly instead of crashing in
    // the update loop
    val tooFew = intercept[IllegalArgumentException] {
      Similarity.trainPq(tiny, "vec_id", "embedding",
        m = 2, k = 16, iters = 1, dim = 8)
    }
    assert(tooFew.getMessage.contains("only 8 vectors"))

    val qv = (0 until 8).map(j => if (j == 3) 10.0 else 1.0)
    val adc = Similarity.pqAdcTopK(enc, "vec_id", qv, model, k = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val exact = tiny.collect().map { r =>
      val v = r.getSeq[Float](1)
      r.getLong(0) -> math.rint(v.zip(qv).map { case (a, b) =>
        a.toDouble * b
      }.sum * 1e4) / 1e4
    }.toMap
    adc.foreach { case (id, sc) =>
      assert(math.abs(sc - exact(id)) < 1e-9,
        s"self-codebook ADC must be the exact dot: $id $sc ${exact(id)}")
    }

    // real embeddings: ADC approximates the DOT-product ranking —
    // measure top-10 overlap vs the exact dot order. m=16, k=16 (a
    // 16-byte code, 16x smaller than the float vector) is the
    // saturation point of the recall sweep on this near-random
    // fixture: 0.2 at (4,8), 0.3 at (8,16), 0.6 at (16,16) and
    // (32,16) — random-ish data bounds PQ recall; structured
    // embeddings do far better
    val emb = vectors
    val rm = Similarity.trainPq(emb, "vec_id", "embedding",
      m = 16, k = 16, iters = 2)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(transform(col("embedding"), x => x.cast("double")))
      .head().getSeq[Double](0).toSeq
    val adcTop = Similarity.pqAdcTopK(
        Similarity.pqEncode(emb, "vec_id", "embedding", rm),
        "vec_id", qvec, rm, k = 10)
      .collect().map(_.getLong(0)).toSet
    val exactTop = emb
      .select(col("vec_id"),
        graft.functions.VectorFunctions.dot(col("embedding"),
          typedLit(qvec)).as("d"))
      .orderBy(col("d").desc, col("vec_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    val recall = adcTop.intersect(exactTop).size / 10.0
    info(s"PQ ADC recall@10 vs exact dot: $recall")
    assert(recall >= 0.5,
      s"ADC recall collapsed: $recall (overlap ${adcTop.intersect(exactTop)})")

    // IVF-PQ composition: probing every list degenerates to the plain
    // ADC scan; a partial probe's answers are confined to probed lists
    val ivfEnc = Similarity.pqEncode(
      Similarity.assignLists(emb, "embedding", nLists = 16),
      "vec_id", "embedding", rm)
    val full = Similarity.ivfPqTopK(ivfEnc, "vec_id", qvec, rm,
        k = 10, nLists = 16, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val plain = Similarity.pqAdcTopK(ivfEnc, "vec_id", qvec, rm, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === plain, "full probe must equal the plain ADC scan")
    val partial = Similarity.ivfPqTopK(ivfEnc, "vec_id", qvec, rm,
        k = 10, nLists = 16, nProbe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(partial.nonEmpty && partial.contains(0L),
      "the query's own vector must survive probing")
    val lists = ivfEnc.select(col("vec_id"), col("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(partial.map(lists).size <= 2,
      s"answers spanned lists ${partial.map(lists)} — no pruning")
  }

  test("embedding decontamination flags exactly the corpus vectors with " +
      "a benchmark neighbor at the threshold") {
    val tau = 0.3
    val bench = vectors.filter(col("label") === 0)
    val corpus = vectors.filter(col("label") =!= 0)
    val flagged = Contamination.flagContaminatedByEmbedding(
        corpus, "vec_id", "embedding",
        bench.select(col("embedding")), "embedding", tau)
      .filter(col("is_contaminated"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // brute-force reference: any bench vector at cos >= tau
    val b = bench.select(col("vec_id").as("b_id"),
      col("embedding").as("b_emb"))
    val expected = corpus.crossJoin(b)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cosine(
          col("embedding"), col("b_emb")).as("cos"))
      .filter(col("cos") >= tau)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(flagged === expected)
    assert(flagged.nonEmpty, "fixture threshold should catch something")
  }

  test("marginTopMatches: exact duplicates pick each other with margin > 1") {
    graft.CacheScope.scoped {
      val s = spark
      import s.implicits._
      val rng = new scala.util.Random(11)
      def vec(): Seq[Float] = Seq.fill(16)(rng.nextFloat() * 2 - 1)
      val dup = vec()
      val vecs = ((0L, dup) +: (1L, dup) +: (2L until 30L).map(i => (i, vec())))
        .toDF("vec_id", "embedding")
      val best = Similarity.marginTopMatches(vecs, "vec_id", "embedding", k = 4)
        .collect().map(r => r.getAs[Long]("x") ->
          (r.getAs[Long]("best_match"), r.getAs[Double]("margin"))).toMap
      assert(best(0L)._1 === 1L)
      assert(best(1L)._1 === 0L)
      assert(best(0L)._2 > 1.0)
      // every vector gets exactly one best row
      assert(best.size === 30)
    }
  }

  test("mmrSelect: relevance wins round 1, redundancy is penalized " +
      "after — the near-duplicate of the first pick loses to the " +
      "orthogonal candidate") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),     // query
      (1L, Array(0.9f, 0.1f)),     // most relevant
      (2L, Array(1.8f, 0.2f)),     // exact scaled copy of 1 (cos = 1)
      (3L, Array(0.0f, 1.0f))      // orthogonal, rel 0
    ).toDF("vec_id", "embedding")
    // rel ties between 1 and 2 (same direction) -> id tie-break picks 1;
    // at λ = 0.2 the duplicate's full penalty (cos = 1) outweighs its
    // relevance edge over the orthogonal candidate
    val out = Similarity.mmrSelect(vecs, "vec_id", "embedding",
        queryId = 0L, k = 3, lambda = 0.2)
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id")))
    assert(out.toSeq === Seq((1, 1L), (2, 3L), (3, 2L)))
    // determinism: a rerun yields the identical trajectory
    val again = Similarity.mmrSelect(vecs, "vec_id", "embedding", 0L, 3,
        0.2).orderBy(col("rank")).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id")))
    assert(again.toSeq === out.toSeq)
  }

  test("two-stage rerank: results come from the ADC candidate set, the " +
      "final ordering is the exact dot's, and widening the candidate " +
      "cut recovers exact-top-k membership the codes alone miss") {
    val model = Similarity.trainPq(vectors, "vec_id", "embedding",
      m = 16, k = 16, iters = 2)
    val qv = vectors.filter(col("vec_id") === 0L)
      .select(transform(col("embedding"), x => x.cast("double")))
      .head().getSeq[Double](0).toSeq
    val enc = Similarity.pqEncode(
      Similarity.assignLists(vectors, "embedding", nLists = 16),
      "vec_id", "embedding", model)
    val cands = Similarity.ivfPqTopK(enc, "vec_id", qv, model, k = 50,
        nLists = 16, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    val rer = Similarity.ivfPqTopKReranked(enc, vectors, "vec_id",
        "embedding", qv, model, k = 10, nCandidates = 50,
        nLists = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(rer.map(_._1).forall(cands.contains))
    // exact-score ordering: descending with id tie-break
    assert(rer.map(_._2).toSeq === rer.map(_._2).sorted(
      Ordering[Double].reverse).toSeq)
    // rerank@C recall vs brute force on the probed-list restriction:
    // at C = 50 the exact rerank must match the exact top-10 RESTRICTED
    // to its candidate pool — i.e. ordering error from quantization is
    // gone, only probe/candidate misses remain
    val pool = vectors.filter(col("vec_id").isin(cands.toSeq: _*))
    val exactPool = Similarity.bruteForceTopK(
        pool.filter(col("vec_id") =!= 0L), "vec_id", "embedding",
        vectors.filter(col("vec_id") === 0L)
          .select(col("embedding").as("q_emb")), 10)
      .collect().map(_.getLong(0)).toSet
    val rerNoQ = rer.map(_._1).filter(_ != 0L).toSet
    // same pool minus the query row; allow the one slot the query took
    assert((exactPool -- rerNoQ).size <= 1)
  }

  test("knnLabelAccuracy == brute-force LOO majority vote per label") {
    val vectors = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.knnLabelAccuracy(vectors, "vec_id",
        "embedding", "label", k = 8, nLists = 8)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    val rows = Similarity.assignLists(vectors, "embedding", 8)
      .collect().map { r =>
        (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
          r.getAs[Int]("list_id"),
          r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
      }
    def r6(x: Double) = graft.functions.Grid.snapD(x)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val nn = math.sqrt(na) * math.sqrt(nb)
      r6(if (nn == 0.0) 0.0 else d / nn)
    }
    val brute = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    rows.groupBy(_._3).values.foreach { grp =>
      grp.foreach { case (id, lbl, _, v) =>
        val nb = grp.filter(_._1 != id)
          .map(o => (cos(v, o._4), o._1, o._2))
          .sortBy { case (c, i, _) => (-c, i) }.take(8)
        if (nb.nonEmpty) {
          val pred = nb.groupBy(_._3).toSeq
            .map { case (l, vs) => (l, vs.size) }
            .sortBy { case (l, n) => (-n, l) }.head._1
          val (n0, c0) = brute.getOrElse(lbl, (0L, 0L))
          brute(lbl) = (n0 + 1,
            c0 + (if (pred == lbl) 1L else 0L))
        }
      }
    }
    assert(out === brute.toMap)
  }

  test("embeddingOutliers == brute-force kNN similarity for every " +
      "vector, including sub-k and isolated cases") {
    val vectors = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.embeddingOutliers(vectors, "vec_id",
        "embedding", k = 8, nLists = 8, bottomN = 500)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    // brute reference with identical arithmetic
    val rows = Similarity.assignLists(vectors, "embedding", 8)
      .collect().map { r =>
        (r.getAs[Long]("vec_id"), r.getAs[Int]("list_id"),
          r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
      }
    def r6(x: Double) = graft.functions.Grid.snapD(x)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val nn = math.sqrt(na) * math.sqrt(nb)
      r6(if (nn == 0.0) 0.0 else d / nn)
    }
    rows.groupBy(_._2).values.foreach { grp =>
      grp.foreach { case (id, _, v) =>
        val top = grp.filter(_._1 != id)
          .map(o => (cos(v, o._3), o._1))
          .sortBy { case (c, i) => (-c, i) }.take(8).map(_._1)
        val want =
          if (top.isEmpty) (0L, -1.0)
          else (top.size.toLong,
            r6(top.foldLeft(0.0)((a, c) => r6(a + c)) / top.size))
        assert(out(id) === want, s"anchor $id")
      }
    }
  }

  test("mineTriplets == brute-force FaceNet picks on the corpus: " +
      "hardest positive, semi-hard-else-hardest negative") {
    val vectors = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.mineTriplets(vectors, "vec_id", "embedding",
        "label", nLists = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    // brute reference with the operator's exact arithmetic order
    val rows = Similarity.assignLists(vectors, "embedding", 8)
      .collect().map { r =>
        val v = r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray
        (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
          r.getAs[Int]("list_id"), v)
      }
    def r6(x: Double) = graft.functions.Grid.snapD(x)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val nn = math.sqrt(na) * math.sqrt(nb)
      r6(if (nn == 0.0) 0.0 else d / nn)
    }
    var checked = 0
    rows.groupBy(_._3).values.foreach { grp =>
      grp.foreach { case (id, lbl, _, v) =>
        val others = grp.filter(_._1 != id)
        val pos = others.filter(_._2 == lbl)
          .map(o => (cos(v, o._4), o._1)).sorted.headOption
        val negAll = others.filter(_._2 != lbl)
          .map(o => (cos(v, o._4), o._1))
        (pos, negAll.nonEmpty) match {
          case (Some((pc, pid)), true) =>
            val semi = negAll.filter(_._1 < pc)
            val chosenPool = if (semi.nonEmpty) semi else negAll
            val (nc, nid) = chosenPool
              .sortBy { case (c, i) => (-c, i) }.head
            val got = out(id)
            assert(got === ((pid, pc, nid, nc, semi.nonEmpty)),
              s"anchor $id")
            checked += 1
          case _ =>
            assert(!out.contains(id), s"anchor $id should drop")
        }
      }
    }
    assert(checked > 100, s"only $checked anchors exercised")
    assert(out.values.exists(_._5) && out.values.exists(!_._5),
      "fixture should exercise both the semi-hard and fallback arms")
  }

  test("matryoshkaRecall: max width anchors at recall 1; a planted " +
      "truncation-only neighbor costs exactly its share") {
    val s = spark
    import s.implicits._
    // query [1,0,0,0]; full-space top-2 = {a, c}; in the first-2-dims
    // space b ties a at cos 1 (its tail lives in dim 3) and pushes c
    // out → recall(2) = 1/2
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // a: cos4 = 1,    cos2 = 1
      (2L, Array(0.5f, 0.0f, 1.0f, 0.0f)),   // b: cos4 ≈ .447, cos2 = 1
      (3L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // c: cos4 ≈ .994, cos2 ≈ .994
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f)))   // d: cos4 = 0
      .toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("qid", "q_emb")
    val out = Similarity.matryoshkaRecall(vecs, "vec_id", "embedding",
        q, Seq(2, 4), k = 2)
      .collect().map(r => r.getAs[Int]("d") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Double]("mean_recall"))))
      .toMap
    assert(out(4) === ((1L, 1.0)))
    assert(out(2) === ((1L, 0.5)))
  }

  test("matryoshkaRecall: a corpus shorter than k anchors the max " +
      "width at 1 (per-query ground-truth denominator, not k)") {
    val s = spark
    import s.implicits._
    // only TWO candidates but k=5: gtn=2, so full-width recall must
    // be 2/2=1 (the old constant-k denominator said 2/5)
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val q = Seq((100L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("qid", "q_emb")
    val out = Similarity.matryoshkaRecall(vecs, "vec_id", "embedding",
        q, Seq(2, 4), k = 5)
      .collect().map(r => r.getAs[Int]("d") ->
        r.getAs[Double]("mean_recall")).toMap
    assert(out.keySet === Set(2, 4))
    assert(out(4) === 1.0, s"short corpus must anchor at 1: $out")
  }

  test("matryoshkaRecall: a width with ZERO hits reports its row at " +
      "recall 0 instead of vanishing from the output") {
    val s = spark
    import s.implicits._
    // query leans on dim 3 with a whisper in dim 1; truncated to 2
    // dims the impostors (3, 4) own the whole top-2, so the true
    // neighbors (1, 2) score zero hits there
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f, 1.0f, 0.0f)),  // cos4 ≈ .995, cos2 = 0
      (2L, Array(0.0f, 0.0f, 0.9f, 0.1f)),  // cos4 ≈ .989, cos2 = 0
      (3L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // cos4 ≈ .100, cos2 = 1
      (4L, Array(0.9f, 0.1f, 0.0f, 0.0f)))  // cos4 ≈ .099, cos2 ≈ .994
      .toDF("vec_id", "embedding")
    val q = Seq((100L, Array(0.1f, 0.0f, 1.0f, 0.0f)))
      .toDF("qid", "q_emb")
    val out = Similarity.matryoshkaRecall(vecs, "vec_id", "embedding",
        q, Seq(2, 4), k = 2)
      .collect().map(r => r.getAs[Int]("d") ->
        r.getAs[Double]("mean_recall")).toMap
    assert(out(2) === 0.0, s"zero-hit width must report 0: $out")
    assert(out(4) === 1.0)
  }
}
