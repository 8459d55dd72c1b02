package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns, built
  * from Spark's higher-order array functions (`zip_with` / `aggregate`) —
  * no UDF, no serialization, runs inside the expression interpreter.
  *
  * Elements are cast to double before multiplying so accumulation is
  * double-precision end-to-end (portable against the DuckDB oracle).
  */
object VectorFunctions {

  private def asDouble(v: Column): Column =
    transform(v, x => x.cast("double"))

  /** Sequential double-precision dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero norms. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** Dot product over pre-cast double arrays via the native codegen'd
    * [[graft.expressions.DotProduct]] expression. Same left-fold
    * accumulation order as [[dot]] (bit-identical result), but a primitive
    * double[] loop inside whole-stage codegen — the choice for pair joins
    * where the expression runs O(pairs) times.
    */
  def fastDot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotProduct(a, b)

  /** Projection for pair joins: id, double-cast vector, precomputed norm.
    * Norm accumulation order matches [[l2Norm]]. Computing this ONCE per
    * row (not per pair) turns an O(pairs·dim·3) cosine into O(pairs·dim).
    */
  def prepForPairs(df: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("vd"))
      .withColumn("nrm",
        sqrt(aggregate(col("vd"), lit(0.0), (acc, x) => acc + x * x)))

  /** Squared Euclidean distance. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Per-vector int8 scalar quantization scale: `max|x| / 127` — the 4×
    * memory cut that makes a 100 TB ANN index fit. MATERIALIZE this to
    * its own column before passing it to [[quantizeWith]]: referencing
    * the scale EXPRESSION inside the quantize lambda would re-evaluate
    * the max-abs scan per element (the higher-order-function
    * re-evaluation trap — O(dim²) per vector at 1k dims).
    */
  def quantScale(v: Column): Column =
    array_max(transform(asDouble(v), x => abs(x))) / lit(127.0)

  /** Quantized int8 codes for `v` at a precomputed [[quantScale]] column:
    * `q_i = round(x_i / scale)` (zero vectors → all-zero at scale 0).
    * IEEE double division + round-half-away-from-zero, identical in the
    * JVM and DuckDB, so codes replay exactly in an oracle. Dequantize
    * with `q_i * scale` for the rescored refine step of a quantized ANN.
    */
  def quantizeWith(v: Column, scale: Column): Column =
    transform(asDouble(v), x =>
      when(scale === 0.0, lit(0))
        .otherwise(round(x / scale).cast("int")))

  /** Random-hyperplane LSH signature: `planes` is a literal matrix (rows =
    * hyperplanes); the signature packs sign bits into a long. Used to bucket
    * vectors so approximate-NN joins become equi-joins on the signature
    * (scale path: the self-join never goes quadratic).
    */
  def hyperplaneSignature(v: Column, planes: Seq[Seq[Double]]): Column = {
    planes.zipWithIndex.map { case (p, i) =>
      val proj = aggregate(
        zip_with(asDouble(v), typedLit(p), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Multi-probe LSH probe sequence for one query vector: the base bucket
    * first, then buckets reached by flipping the sign bits whose
    * projections have the smallest magnitudes — a near-zero projection
    * means the vector sits close to that hyperplane, so its true
    * neighbors plausibly landed on the other side. Probing `nProbes`
    * buckets is the standard recall lever for hyperplane LSH (recall
    * rises with nProbes; nProbes = 2^nPlanes degenerates to a full scan).
    *
    * Perturbation masks are ranked by the summed |projection| of their
    * flipped bits (the likelihood the neighbor crossed exactly those
    * planes), enumerated exhaustively — nPlanes is small by construction
    * (a 64-bucket..64K-bucket index), so 2^nPlanes enumeration on the
    * QUERY side is negligible next to one bucket scan.
    */
  def multiProbeBuckets(v: Seq[Double], planes: Seq[Seq[Double]],
      nProbes: Int): Seq[Long] = {
    require(planes.size <= 20,
      s"multi-probe enumeration supports <= 20 planes, got ${planes.size}")
    // same left-fold accumulation order as [[hyperplaneSignature]]
    val projs = planes.map(_.zip(v).foldLeft(0.0) {
      case (acc, (p, x)) => acc + x * p
    })
    val base = projs.zipWithIndex.foldLeft(0L) { case (b, (pr, i)) =>
      if (pr >= 0.0) b | (1L << i) else b
    }
    if (nProbes <= 1) Seq(base)
    else {
      val flips = (1 until (1 << planes.size)).map { m =>
        val score = projs.zipWithIndex.collect {
          case (pr, i) if (m & (1 << i)) != 0 => math.abs(pr)
        }.sum
        (score, m)
      }.sorted.take(nProbes - 1)
      base +: flips.map { case (_, m) => base ^ m.toLong }
    }
  }

  /** Deterministic pseudo-random hyperplanes (hash-seeded, no RNG state —
    * reproducible across runs and engines). The hash is splitmix64 — the
    * same engine-independent 64-bit permutation the MinHash family uses —
    * so an external oracle (e.g. DuckDB, see [[graft.HashOracles]]) can
    * reproduce the exact plane matrix with integer arithmetic alone.
    */
  def deterministicPlanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        val h = DedupFunctions.splitmix64(p.toLong * 1000003L + d)
        h.toDouble / Long.MaxValue
      }
    }
}
