package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantifies the incremental-dedup verify step. [[Dedup.incrementalDedup]]
  * verifies candidates with the k-slot MinHash ESTIMATE of shingle-set
  * Jaccard (slot-equality fraction), not exact Jaccard — by design, so the
  * corpus text is never re-read. k = 16 quantizes estimates to 1/16 steps
  * and carries the estimator's sampling error (sd = sqrt(J(1-J)/k), about
  * 0.11 at the J = 0.7 boundary), so pairs NEAR the threshold can flip.
  *
  * This spec measures that error band on a deterministic 252-pair fixture
  * whose exact shingle Jaccard sweeps 0.3 → 1.0 (constructed, then
  * re-measured driver-side with the same shingling the signatures use):
  *
  *  - estimator-in-isolation: mean |est − exact|, and precision/recall of
  *    `est ≥ 0.7` against `exact ≥ 0.7` — overall AND outside the ±2 sd
  *    boundary band (outside the band the estimator should essentially
  *    never flip a pair);
  *  - end-to-end [[Dedup.incrementalDedup]] recall, which ALSO pays the
  *    LSH candidate-miss (P[candidate] = 1−(1−J^r)^b ≈ 0.67 at J = 0.7
  *    with b = 4, r = 4) — documented so the two loss sources aren't
  *    conflated;
  *  - [[Dedup.incrementalDedupExact]] as the zero-estimator-error
  *    alternative: same candidates, exact token-Jaccard verify, asserted
  *    to agree pairwise with the batch path's definition of a duplicate.
  *
  * The fixture is seed-free and fully deterministic (MinHash is a pure
  * function of the text), so the measured numbers are stable; assertion
  * bounds sit just under the measured values and COVERAGE.md quotes them.
  */
class IncrementalDedupEstimatorSpec extends SparkSpec {

  private val nTok = 40
  private val shingleLen = 3
  private val k = 16
  private val threshold = 0.7

  /** corpus doc i: nTok unique tokens; delta doc 1000+i keeps the first
    * `m` tokens and replaces the tail, m cycling 20..40 → exact shingle
    * Jaccard (m−2)/(2(nTok−2)−(m−2)) sweeping ≈0.31..1.0.
    */
  private def fixture: (Seq[(Long, String)], Seq[(Long, String)]) = {
    val pairs = (0 until 252).map { i =>
      val m = 20 + (i % 21)
      val corpusToks = (0 until nTok).map(j => s"d${i}t$j")
      val deltaToks = corpusToks.take(m) ++
        (m until nTok).map(j => s"x${i}t$j")
      ((i.toLong, corpusToks.mkString(" ")),
        (1000L + i, deltaToks.mkString(" ")))
    }
    (pairs.map(_._1), pairs.map(_._2))
  }

  private def shingles(text: String): Set[String] =
    text.split(" ").toSeq.sliding(shingleLen).map(_.mkString(" ")).toSet

  private def exactJ(a: String, b: String): Double = {
    val (sa, sb) = (shingles(a), shingles(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  private def toDF(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("MinHash slot-equality estimator: error band at the threshold") {
    val (corpus, delta) = fixture
    val sigOf = (df: DataFrame) =>
      Dedup.minhashSignatures(df, "doc_id", "text", k, shingleLen)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val cSig = sigOf(toDF(corpus))
    val dSig = sigOf(toDF(delta))

    val measured = corpus.zip(delta).map { case ((ci, ct), (di, dt)) =>
      val est = cSig(ci).zip(dSig(di)).count { case (a, b) => a == b }
        .toDouble / k
      (exactJ(ct, dt), est)
    }

    val meanAbsErr = measured.map { case (j, e) => math.abs(j - e) }
      .sum / measured.size
    def pr(rows: Seq[(Double, Double)]): (Double, Double) = {
      val tp = rows.count { case (j, e) => j >= threshold && e >= threshold }
      val fp = rows.count { case (j, e) => j < threshold && e >= threshold }
      val fn = rows.count { case (j, e) => j >= threshold && e < threshold }
      (tp.toDouble / math.max(tp + fp, 1), tp.toDouble / math.max(tp + fn, 1))
    }
    val (pAll, rAll) = pr(measured)
    // ±2 sd of the estimator at the boundary: 2*sqrt(0.7*0.3/16) ≈ 0.23
    val band = 0.23
    val outside = measured.filter { case (j, _) =>
      math.abs(j - threshold) > band }
    val (pOut, rOut) = pr(outside)

    info(f"pairs=${measured.size} meanAbsErr=$meanAbsErr%.4f " +
      f"precision=$pAll%.3f recall=$rAll%.3f " +
      f"outside±$band%.2f: n=${outside.size} precision=$pOut%.3f " +
      f"recall=$rOut%.3f")

    // deterministic fixture → stable numbers; bounds just under measured
    // (measured: meanAbsErr 0.085, P/R 0.778/0.833 overall,
    //  0.960/1.000 outside the ±2 sd band — the residual outside-band
    //  flips come from the shared-base-hash slot derivation, whose tails
    //  are slightly heavier than the iid-permutation binomial)
    assert(meanAbsErr <= 0.10,
      f"estimator mean abs error $meanAbsErr%.4f above documented band")
    assert(pAll >= 0.75 && rAll >= 0.80,
      f"boundary precision/recall ($pAll%.3f/$rAll%.3f) degraded")
    assert(outside.size >= 100, "fixture must populate the outside band")
    assert(pOut >= 0.95 && rOut >= 0.98,
      f"outside ±2sd the estimator should rarely flip ($pOut%.3f/$rOut%.3f)")
  }

  test("end-to-end incrementalDedup: estimator + LSH candidate loss") {
    val (corpus, delta) = fixture
    val idx = Dedup.buildDedupIndex(toDF(corpus), "doc_id", "text",
      k, shingleLen)
    val flagged = Dedup.incrementalDedup(toDF(delta), "doc_id", "text",
        idx, threshold, k, shingleLen)
      .filter(col("is_dup")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val truth = corpus.zip(delta).collect {
      case ((_, ct), (di, dt)) if exactJ(ct, dt) >= threshold => di
    }.toSet
    val tp = (flagged & truth).size.toDouble
    val precision = tp / math.max(flagged.size, 1)
    val recall = tp / math.max(truth.size, 1)
    info(f"end-to-end: flagged=${flagged.size} truth=${truth.size} " +
      f"precision=$precision%.3f recall=$recall%.3f")
    // recall here includes the LSH candidate miss (≈0.67 P[candidate]
    // right AT J=0.7, →1 quickly above) — it is NOT the estimator alone
    assert(precision >= 0.75 && recall >= 0.70,
      f"end-to-end precision/recall ($precision%.3f/$recall%.3f) degraded")
  }

  test("incrementalDedupExact agrees with the batch near-dup definition") {
    val (corpus, delta) = fixture
    val corpusDF = toDF(corpus)
    val deltaDF = toDF(delta)
    val idx = Dedup.buildDedupIndex(corpusDF, "doc_id", "text",
      k, shingleLen)
    val exact = Dedup.incrementalDedupExact(deltaDF, "doc_id", "text",
        idx, corpusDF, "doc_id", "text", threshold, k, shingleLen)
      .filter(col("is_dup"))
      .select("doc_id", "matched_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // batch path over corpus ∪ delta, restricted to cross pairs: the two
    // must agree on WHICH delta docs are duplicates and against whom
    val batch = Dedup.minhashNearDupPairs(corpusDF.union(deltaDF),
        "doc_id", "text", threshold, k, shingleLen)
      .filter(col("a_id") < 1000L && col("b_id") >= 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val batchByDelta = batch.groupBy(_._2).map { case (d, ps) =>
      d -> ps.map(_._1).min }
    assert(exact === batchByDelta,
      "incremental-exact and batch must agree pairwise")
    assert(exact.nonEmpty, "fixture must produce duplicates")
  }
}
