package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; one pass, no shuffle beyond
  * the final top-k, which Spark plans as TakeOrderedAndProject — per
  * partition heaps, never a full sort). Scale path: hyperplane-LSH
  * bucketing so each query only scores its bucket (IVF-style coarse
  * quantization via deterministic hyperplanes).
  */
object Similarity {

  /** Exact top-k by cosine for one query vector (given as a 1-row DF with
    * column `q_emb`). The query side is broadcast; the big side streams.
    */
  def bruteForceTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, k: Int): DataFrame =
    vectors.crossJoin(broadcast(query))
      .select(col(idCol), VF.cosine(col(vecCol), col("q_emb")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** Top-k neighbors of an in-table vector id (excluded from results). */
  def neighborsOf(vectors: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = vectors.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_emb"))
    bruteForceTopK(vectors.filter(col(idCol) =!= queryId),
      idCol, vecCol, q, k)
  }

  /** LSH-bucketed ANN: per-bucket brute force. Vectors and queries are
    * signed with the same deterministic hyperplanes; the join is an
    * equi-join on the signature, so work is O(probed bucket sizes), not
    * O(n). Recall < 1 by construction (a neighbor in another bucket is
    * missed); `nProbes > 1` probes the buckets across the query's
    * nearest hyperplanes too ([[VF.multiProbeBuckets]]) — the standard
    * recall lever, measured in SimilaritySpec. The probe expansion runs
    * on the tiny QUERY side only; the vector side still computes exactly
    * one signature per row.
    */
  def lshTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, k: Int, nPlanes: Int = 8,
      dim: Int = 64, nProbes: Int = 1): DataFrame = {
    val planes = VF.deterministicPlanes(nPlanes, dim)
    val signed = vectors.withColumn("bucket",
      VF.hyperplaneSignature(col(vecCol), planes))
    val probes = udf((v: Seq[Double]) =>
      VF.multiProbeBuckets(v, planes, nProbes))
    val q = query.withColumn("bucket",
      explode(probes(transform(col("q_emb"), _.cast("double")))))
    // no dedup needed: probe buckets are distinct (base ^ distinct masks)
    // and each vector carries exactly one bucket, so it matches <= 1 probe
    signed.join(broadcast(q), "bucket")
      .select(col(idCol), VF.cosine(col(vecCol), col("q_emb")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Fraction of `exact`'s rows found by `approx`, matched on `keyCols` —
    * the recall measure the approximate paths (LSH, IVF, SimHash buckets)
    * are graded by in the specs.
    */
  def recall(approx: DataFrame, exact: DataFrame,
      keyCols: Seq[String]): Double = {
    val total = exact.count()
    if (total == 0) 1.0
    else {
      val keys = keyCols.map(col)
      val hit = exact.select(keys: _*)
        .join(approx.select(keys: _*), keyCols, "left_semi").count()
      hit.toDouble / total
    }
  }

  /** IVF-style ANN: coarse-quantize vectors to `nLists` deterministic
    * centroids (hash-seeded pseudo-random directions — reproducible, no
    * RNG state, no training pass), then answer queries by probing the
    * `nProbe` nearest lists only. The assignment join is an equi-join on
    * `list_id`, so query cost is O(nProbe/nLists · n) instead of O(n);
    * recall rises with nProbe (nProbe = nLists degenerates to exact).
    *
    * At 100 TB the inverted lists would be written partitioned by
    * `list_id` (`assignLists(...).write.partitionBy("list_id")`) so a
    * probe reads only its lists' files — the same pruning this operator
    * exercises in-memory.
    */
  /** The `take` best-aligned centroid list ids for a vector — the ONE
    * scoring definition shared by the index write path ([[assignLists]])
    * and the query probe path ([[ivfTopK]]); a divergence between the
    * two would silently destroy probe recall.
    */
  private[graft] def bestLists(v: org.apache.spark.sql.Column,
      centroids: Seq[Seq[Double]], take: Int) = {
    // ONE native node instead of the k-way array(struct(dot(v, lit)))
    // fold — bit-identical scores and null rows (see
    // [[graft.expressions.ScoredByMatrix]]); the elementwise double
    // cast mirrors VF.dot's asDouble
    val scored = graft.expressions.MatrixDistances.dotScoredByMatrix(
      v.cast("array<double>"), centroids)
    transform(slice(reverse(array_sort(scored)), 1, take),
      s => s.getField("list_id"))
  }

  /** @param query one-row DataFrame whose embedding column is named
    *              `q_emb` (same contract as [[bruteForceTopK]] /
    *              [[lshTopK]]: `df.select(col(vecCol).as("q_emb"))`)
    */
  def ivfTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, k: Int, nLists: Int = 16, nProbe: Int = 4,
      dim: Int = 64): DataFrame = {
    val centroids = VF.deterministicPlanes(nLists, dim)
    val assigned = assignLists(vectors, vecCol, nLists, dim)
    val probes = query.select(col("q_emb"),
      explode(bestLists(col("q_emb"), centroids, nProbe)).as("list_id"))
    assigned.join(broadcast(probes), "list_id")
      .select(col(idCol), VF.cosine(col(vecCol), col("q_emb")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Inverted-list assignment alone (the write-side of an IVF index). */
  def assignLists(vectors: DataFrame, vecCol: String, nLists: Int = 16,
      dim: Int = 64): DataFrame = {
    val centroids = VF.deterministicPlanes(nLists, dim)
    vectors.withColumn("list_id",
      bestLists(col(vecCol), centroids, 1).getItem(0))
  }

  /** Quantized brute-force top-k over int8 codes
    * ([[VF.quantScale]]/[[VF.quantizeWith]]): the score is the INTEGER
    * dot of the codes rescaled by both scales — `qdot · s_a · s_q` — so
    * the hot loop is int8×int8 multiply-adds over 4× less memory (the
    * point of a quantized index; at 100 TB the code table is what fits).
    * Exact arithmetic up to the final two double multiplies, so scores
    * replay exactly in an oracle; ranking ties break by id. Recall vs
    * the float path is measured in SimilaritySpec.
    *
    * `query` contract matches the other ANN entries: one row, columns
    * `q_emb`. Codes are computed on the fly here; an indexed deployment
    * writes (id, scale, q) once and scans only that.
    */
  def quantizedTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, k: Int): DataFrame = {
    val qv = query
      .withColumn("q_scale", VF.quantScale(col("q_emb")))
      .withColumn("q_q", VF.quantizeWith(col("q_emb"), col("q_scale")))
      .select(col("q_scale"), col("q_q"))
    vectors
      .withColumn("v_scale", VF.quantScale(col(vecCol)))
      .withColumn("v_q", VF.quantizeWith(col(vecCol), col("v_scale")))
      .crossJoin(broadcast(qv))
      .withColumn("qdot",
        aggregate(zip_with(col("v_q"), col("q_q"), (x, y) => x * y),
          lit(0L), (a, x) => a + x))
      .select(col(idCol),
        round(col("qdot") * col("v_scale") * col("q_scale"), 4)
          .as("qscore"))
      .orderBy(col("qscore").desc, col(idCol))
      .limit(k)
  }

  // ---- product quantization (Jégou et al. 2011) ---------------------

  /** PQ codebooks: `codebooks(s)(c)` is centroid `c` of subspace `s` —
    * `m` sub-codebooks of `k` centroids over `subDim`-dim subvectors,
    * each trained with [[Clustering.kmeansCentroids]] (deterministic
    * init, centroids on the 1e-6 grid — what lets an oracle replay the
    * whole train→encode→query chain). The model is `m·k·subDim`
    * doubles — a driver/broadcast fact like an IVF centroid matrix.
    */
  final case class PqModel(subDim: Int, codebooks: Seq[Seq[Seq[Double]]])

  /** Train PQ codebooks: split each vector into `m` contiguous
    * `dim/m`-dim subvectors and run Lloyd's independently per subspace.
    * `m` small (4–16) and `k` ≤ 256 is the published regime — codes
    * compress a vector to `m` small ints, the representation that makes
    * a 100 TB ANN scan touch bytes per vector instead of `dim` floats.
    *
    * ALL `m` subspaces train in ONE aggregation pass per iteration —
    * each row explodes to its m (subspace, assigned-cluster, subvector)
    * structs and one partial-agg shuffle updates every codebook — not m
    * independent k-means jobs (that shape measured 16 × 2 sequential
    * tiny jobs ≈ 5 s of pure job overhead at sf0.1; this one is 2
    * corpus passes). Semantics are EXACTLY per-subspace Lloyd's: init
    * = the k smallest ids' subvectors, (dist, cid) assignment ties,
    * per-position averages on the 1e-6 grid, empty clusters keep their
    * previous centroid — the q128/q129/q130 oracles replay it.
    */
  def trainPq(vectors: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, k: Int = 16, iters: Int = 2,
      dim: Int = 64): PqModel = {
    require(m >= 1 && dim % m == 0, s"m $m must divide dim $dim")
    require(k >= 1 && iters >= 0, "k and iters must be positive")
    val subDim = dim / m
    val init = vectors.orderBy(col(idCol)).limit(k)
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    require(init.size >= k,
      s"trainPq: k = $k clusters but the corpus has only " +
        s"${init.size} vectors")
    var books: Seq[Seq[Seq[Double]]] = (0 until m).map(s =>
      init.map(_.slice(s * subDim, (s + 1) * subDim)))
    for (_ <- 0 until iters) {
      val updated = vectors
        .select(transform(col(vecCol), x => x.cast("double"))
          .as("__pq_v"))
        .withColumn("__pq_codes",
          codesUdf(PqModel(subDim, books))(col("__pq_v")))
        .select(col("__pq_v"),
          posexplode(col("__pq_codes")).as(Seq("s", "cid")))
        .select(col("s"), col("cid"),
          posexplode(slice(col("__pq_v"), col("s") * lit(subDim) + 1,
            lit(subDim))).as(Seq("pos", "x")))
        .groupBy(col("s"), col("cid"), col("pos"))
        .agg(round(avg(col("x")), 6).as("mv"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
        }
      books = (0 until m).map(s => (0 until k).map(c =>
        updated.getOrElse((s, c), books(s)(c))))
    }
    PqModel(subDim, books)
  }

  /** The per-row PQ assignment as ONE linear UDF scan (codebooks in
    * the closure — a few KB): per subspace, argmin squared-L2 with
    * strict `<` so ties keep the SMALLER cid, distances accumulated in
    * ascending position order — bit-for-bit the
    * [[Clustering.nearestLists]]/[[graft.functions.VectorFunctions
    * .l2DistanceSq]] semantics, which is what keeps the SQL oracles
    * replaying. A UDF deliberately (the [[TokenizerTraining
    * .applyMerge]] rule): the Column spelling is m sorted k-struct
    * arrays whose generated code dwarfs the arithmetic — measured
    * ~8 s/query at (m=16, k=16) against sub-second for this loop.
    */
  private def codesUdf(model: PqModel) = {
    val books = model.codebooks.map(_.map(_.toArray).toArray).toArray
    val sub = model.subDim
    udf { (v: Seq[Double]) =>
      if (v == null) null
      else {
        val arr = v.toArray
        Array.tabulate(books.length) { s =>
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < books(s).length) {
            val cent = books(s)(c)
            var d = 0.0
            var j = 0
            while (j < sub) {
              val t = arr(s * sub + j) - cent(j)
              d += t * t
              j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          best
        }
      }
    }
  }

  /** Every row plus `codes` (array of `m` sub-centroid ids): per
    * subspace, the L2-nearest codebook entry with the
    * [[Clustering.nearestLists]] (dist, cid) tie-break, computed by the
    * one-scan [[codesUdf]]. Map-only — the codebooks travel in the
    * closure; nothing shuffles.
    */
  def pqEncode(vectors: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame =
    vectors.withColumn("codes",
      codesUdf(model)(transform(col(vecCol), x => x.cast("double"))))

  /** Asymmetric-distance (ADC) top-`k` over PQ codes: the query's
    * partial dot with EVERY codebook entry is precomputed driver-side
    * into an `m × k` table (m·k doubles — bounded by config), and each
    * encoded vector scores as the sum of `m` literal-table lookups —
    * the scan never reads a float vector, only the code array (the PQ
    * promise at 100 TB: the code table is what fits in memory/cache).
    * Scores round to the 1e-4 grid, ties break by id, and the pick
    * plans as a TakeOrdered heap. Partial-dot and cross-subspace sums
    * are LEFT FOLDS in ascending position/subspace order, so an oracle
    * replays the IEEE arithmetic exactly.
    */
  def pqAdcTopK(encoded: DataFrame, idCol: String,
      queryVec: Seq[Double], model: PqModel, k: Int): DataFrame = {
    val m = model.codebooks.size
    require(queryVec.length == m * model.subDim,
      s"query dim ${queryVec.length} != ${m * model.subDim}")
    val table: Seq[Seq[Double]] = model.codebooks.zipWithIndex.map {
      case (cb, s) =>
        val qs = queryVec.slice(s * model.subDim, (s + 1) * model.subDim)
        cb.map(c => c.zip(qs).foldLeft(0.0) { case (a, (x, q)) =>
          a + x * q
        })
    }
    val score = (0 until m).map(s =>
      get(typedLit(table(s)), col("codes").getItem(s))).reduce(_ + _)
    encoded
      .select(col(idCol), round(score, 4).as("adc_score"))
      .orderBy(col("adc_score").desc, col(idCol))
      .limit(k)
  }

  /** IVF-PQ — the FAISS composition of the two approximations: coarse
    * inverted-list probe (the IVF candidate cut) + ADC rerank over PQ
    * codes (the [[pqAdcTopK]] scan that never reads a float vector).
    * `encoded` carries `list_id` ([[assignLists]]) and `codes`
    * ([[pqEncode]]); the probe choice is driver-side arithmetic over
    * the deterministic plane matrix — same left-fold dot as the
    * assignment side, ties to the larger list id exactly like
    * [[bestLists]] — so the probe set is a LITERAL `isin` filter
    * (static partition pruning when the codes are at rest partitioned
    * by list). At 100 TB this is the standard shape: the probe cuts
    * candidates by ~nProbe/nLists, and each candidate costs m byte
    * lookups instead of dim float multiplies.
    */
  def ivfPqTopK(encoded: DataFrame, idCol: String,
      queryVec: Seq[Double], model: PqModel, k: Int, nLists: Int = 16,
      nProbe: Int = 4, dim: Int = 64): DataFrame =
    pqAdcTopK(encoded.filter(col("list_id")
        .isin(pqProbeLists(queryVec, nLists, dim, nProbe): _*)),
      idCol, queryVec, model, k)

  /** Two-stage retrieval — the production RAG/search shape: IVF-PQ cuts
    * the corpus to `nCandidates` cheap ADC-scored survivors (codes
    * only, never a float vector), then ONLY those candidates pay an
    * exact full-precision dot against the float vectors (equi-join on
    * the id — at 100 TB the float table is touched for k·C rows, not
    * the corpus). Re-ranking recovers the precision PQ quantization
    * gives up: ADC ordering picks the candidate SET, the exact dot
    * picks the final top-k ordering. The exact dot is the same
    * ascending left fold as [[VF.dot]] (IEEE-exact cross-engine).
    */
  def ivfPqTopKReranked(encoded: DataFrame, vectors: DataFrame,
      idCol: String, vecCol: String, queryVec: Seq[Double],
      model: PqModel, k: Int, nCandidates: Int, nLists: Int = 16,
      nProbe: Int = 4, dim: Int = 64): DataFrame = {
    require(nCandidates >= k, s"nCandidates $nCandidates < k $k")
    val cand = ivfPqTopK(encoded, idCol, queryVec, model, nCandidates,
      nLists, nProbe, dim)
    cand.join(vectors.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol), col("adc_score"),
        round(VF.dot(col(vecCol), typedLit(queryVec)), 4)
          .as("exact_score"))
      .orderBy(col("exact_score").desc, col(idCol))
      .limit(k)
  }

  /** The query's `nProbe` best coarse lists: driver-side left-fold dots
    * against the deterministic plane matrix, ranked (dot desc, id desc)
    * — the [[bestLists]] tie, and the fold order the oracle replays.
    */
  private def pqProbeLists(queryVec: Seq[Double], nLists: Int, dim: Int,
      nProbe: Int): Seq[Int] =
    VF.deterministicPlanes(nLists, dim).zipWithIndex
      .map { case (c, i) =>
        (c.zip(queryVec).foldLeft(0.0) { case (a, (x, q)) =>
          a + x * q
        }, i)
      }
      .sortBy { case (d, i) => (-d, -i) }
      .take(nProbe).map(_._2)

  val PqMetaFile = "_graft_pq.json"

  /** Persist an IVF-PQ index: CODES-ONLY lists `(id, codes)`
    * partitioned by coarse list, plus a sidecar carrying the PQ
    * codebooks and coarse config — the at-rest ANN artifact where each
    * vector costs `m` small ints instead of `dim` floats (a 64-dim
    * float row is 256 B; the m=16 code row is ~16 B — the 100 TB form).
    * Codebooks are stored FLAT (m·k rows of subDim doubles,
    * subspace-major) so the reader reuses the 2-level matrix parse;
    * `Double.toString` round-trips bit-exactly (the [[writeIvfIndex]]
    * device — an out-of-band codebook would be silent recall collapse).
    */
  def writeIvfPqIndex(vectors: DataFrame, idCol: String, vecCol: String,
      path: String, model: PqModel, nLists: Int = 16,
      dim: Int = 64): Unit = {
    val m = model.codebooks.size
    val kCent = model.codebooks.head.size
    require(model.codebooks.forall(_.size == kCent), "ragged codebooks")
    pqEncode(assignLists(vectors, vecCol, nLists, dim), idCol, vecCol,
        model)
      .select(col(idCol).as("id"), col("codes"), col("list_id"))
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$path/lists")
    val body = model.codebooks.flatten
      .map(_.map(d => java.lang.Double.toString(d))
        .mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    graft.sources.Sidecar.write(vectors.sparkSession,
      s"$path/$PqMetaFile",
      s"""{"m":$m,"k":$kCent,"subDim":${model.subDim},""" +
        s""""nLists":$nLists,"dim":$dim,"books":$body}""")
  }

  /** The PQ model and coarse config a persisted index was written with:
    * `(model, nLists, dim)`.
    */
  def readIvfPqMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): (PqModel, Int, Int) = {
    val text = graft.sources.Sidecar
      .read(spark, s"$path/$PqMetaFile")
      .getOrElse(throw new IllegalArgumentException(
        s"no $PqMetaFile under $path - not a graft IVF-PQ index"))
    def intField(name: String): Int = {
      val m = ("\"" + name + "\":(\\d+)").r.findFirstMatchIn(text)
      require(m.isDefined, s"$PqMetaFile under $path lacks $name: $text")
      m.get.group(1).toInt
    }
    val kCent = intField("k")
    val start = text.indexOf("\"books\":[[")
    require(start >= 0, s"$PqMetaFile under $path lacks books: $text")
    val flat = text.substring(start + 10, text.lastIndexOf("]]"))
      .split("\\],\\[").toSeq
      .map(_.split(",").toSeq.map(java.lang.Double.parseDouble))
    (PqModel(intField("subDim"), flat.grouped(kCent).toSeq),
      intField("nLists"), intField("dim"))
  }

  /** ADC top-k against a persisted IVF-PQ index: probe lists chosen
    * driver-side from the sidecar's OWN config (a literal `isin` —
    * static partition pruning at file-listing time), each probed row
    * scored by `m` code-table lookups. The scan reads codes only; no
    * float vector exists anywhere in the index.
    */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, query: Seq[Double], k: Int,
      nProbe: Int): DataFrame = {
    val (model, nLists, dim) = readIvfPqMeta(spark, path)
    pqAdcTopK(spark.read.parquet(s"$path/lists")
        .filter(col("list_id")
          .isin(pqProbeLists(query, nLists, dim, nProbe): _*)),
      "id", query, model, k)
  }

  /** SemDeDup-style semantic near-dup pairs: coarse-cluster every vector
    * to its best IVF list ([[assignLists]] — deterministic centroids, no
    * training pass), then score pairwise cosine WITHIN each list only.
    * The published recipe (Abbas et al., SemDeDup): embeddings that land
    * in the same semantic cluster and exceed the cosine threshold are
    * re-phrasings, translations-of-each-other, or templated variants that
    * token-level MinHash misses.
    *
    * 100 TB shape: candidate generation is the `list_id` equi-join, so
    * pair cost is Σ(per-list sizes²), not n² — the same bound the IVF
    * query path exploits; norms are precomputed per ROW (not per pair)
    * and the pair loop is the codegen'd [[VF.fastDot]]. Cross-list near
    * dups are missed by construction (recall rises with fewer, larger
    * lists — `nLists` is the recall/cost dial, same trade the paper
    * makes with its k-means k).
    */
  def semanticDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nLists: Int = 8, dim: Int = 64): DataFrame = {
    // prepForPairs shape (id, vd, nrm) + the list assignment: norms are
    // computed once per row with the same accumulation order as l2Norm.
    // Scope-cached: the self-join reads it twice, and recomputing means
    // paying the nLists-dot assignment and the norm per side
    val prepped = graft.CacheScope.register(
      assignLists(vectors, vecCol, nLists, dim)
        .select(col(idCol).as("id"), col("list_id"),
          transform(col(vecCol), x => x.cast("double")).as("vd"))
        .withColumn("nrm",
          sqrt(aggregate(col("vd"), lit(0.0), (acc, x) => acc + x * x)))
        .persist())
    withinListPairs(prepped, threshold)
  }

  /** The within-list pair scoring shared by the untrained and trained
    * SemDeDup paths: self-equi-join on `list_id`, cosine from the
    * precomputed (vd, nrm) columns, `a.id < b.id` canonical orientation.
    */
  private def withinListPairs(prepped: DataFrame,
      threshold: Double): DataFrame =
    prepped.as("a").join(prepped.as("b"),
        col("a.list_id") === col("b.list_id") && col("a.id") < col("b.id"))
      .withColumn("cos",
        when(col("a.nrm") * col("b.nrm") === 0.0, lit(0.0))
          .otherwise(VF.fastDot(col("a.vd"), col("b.vd")) /
            (col("a.nrm") * col("b.nrm"))))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.list_id").as("list_id"), col("cos"))

  /** SemDeDup with TRAINED centroids — the published recipe proper
    * (Abbas et al. cluster with k-means, then compare within clusters):
    * assignment is L2-nearest over the given matrix (the [[Clustering]]
    * convention — pass [[Clustering.kmeansCentroids]] output), and
    * `nAssign > 1` assigns each vector to its top-`nAssign` nearest
    * lists, so near-boundary pairs split across adjacent clusters are
    * still compared. Both are recall dials over the untrained
    * [[semanticDupPairs]] baseline, MEASURED in SimilaritySpec on the
    * same true-pair fixture.
    *
    * 100 TB shape is unchanged: candidates are the `list_id` equi-join
    * (cost Σ size², never n²); multi-assignment is a bounded nAssign×
    * row duplication of the prepped table, and the final pair dedup
    * (a multi-assigned pair can meet in up to nAssign shared lists)
    * groups on the pair key — same shuffle class as the join itself.
    * Output matches [[semanticDupPairs]]: (a_id, b_id, list_id, cos),
    * one row per pair, `list_id` = the smallest shared list.
    */
  def semanticDupPairsTrained(vectors: DataFrame, idCol: String,
      vecCol: String, threshold: Double, centroids: Seq[Seq[Double]],
      nAssign: Int = 1): DataFrame = {
    require(nAssign >= 1 && nAssign <= centroids.size,
      s"nAssign $nAssign out of range [1, ${centroids.size}]")
    val prepped = graft.CacheScope.register(
      vectors
        .select(col(idCol).as("id"),
          transform(col(vecCol), x => x.cast("double")).as("vd"),
          explode(Clustering.nearestLists(col(vecCol), centroids, nAssign))
            .as("list_id"))
        .withColumn("nrm",
          sqrt(aggregate(col("vd"), lit(0.0), (acc, x) => acc + x * x)))
        .persist())
    val pairs = withinListPairs(prepped, threshold)
    if (nAssign == 1) pairs
    // min over identical cos values — pure dedup, deterministic list pick
    else pairs.groupBy(col("a_id"), col("b_id"))
      .agg(min(col("list_id")).as("list_id"), min(col("cos")).as("cos"))
  }

  /** [[semanticDedup]] over the trained path: drop the higher id of every
    * [[semanticDupPairsTrained]] pair.
    */
  def semanticDedupTrained(vectors: DataFrame, idCol: String,
      vecCol: String, threshold: Double, centroids: Seq[Seq[Double]],
      nAssign: Int = 1): DataFrame = {
    val drops = semanticDupPairsTrained(vectors, idCol, vecCol, threshold,
      centroids, nAssign).select(col("b_id"))
    vectors.join(drops.distinct(), col(idCol) === col("b_id"), "left_anti")
  }

  /** The keep set under semantic dedup: drop every vector that is the
    * HIGHER id of some [[semanticDupPairs]] pair (keeps the lowest id of
    * each within-list chain — deterministic, engine-independent). Planned
    * as a left-anti join on the pair table's b-side.
    */
  def semanticDedup(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nLists: Int = 8, dim: Int = 64): DataFrame = {
    val drops = semanticDupPairs(vectors, idCol, vecCol, threshold,
      nLists, dim).select(col("b_id"))
    vectors.join(drops.distinct(), col(idCol) === col("b_id"), "left_anti")
  }

  // ---- persisted IVF index --------------------------------------------

  /** Sidecar filename for the persisted IVF layout (underscore prefix so
    * parquet readers skip it as data).
    */
  val IvfMetaFile = "_graft_ivf.json"

  /** Persist an IVF-ANN index: every vector assigned to its nearest
    * centroid by squared L2 ([[Clustering.assign]] — the trained-
    * quantizer convention; pass [[Clustering.kmeansCentroids]] output
    * for a trained index or any fixed matrix for an untrained one) and
    * written `partitionBy(list_id)`, so a probe reads ONLY its lists'
    * files — the pruning the in-memory operator's Scaladoc promises,
    * made real (asserted in IvfIndexSpec).
    *
    * The centroid matrix rides WITH the index in [[IvfMetaFile]]: the
    * query side must rank lists with the exact matrix used at write
    * time — an out-of-band mismatch would probe the wrong lists, a
    * silent recall collapse rather than an error. `Double.toString` /
    * `parseDouble` round-trip is exact, so the re-read matrix is
    * bit-identical.
    */
  def writeIvfIndex(vectors: DataFrame, idCol: String, vecCol: String,
      path: String, centroids: Seq[Seq[Double]]): Unit = {
    Clustering.assign(vectors, idCol, vecCol, centroids)
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        col("cluster").as("list_id"))
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$path/lists")
    val body = centroids
      .map(_.map(d => java.lang.Double.toString(d)).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    // Hadoop FS API, not java.nio: the sidecar must land on the index
    // path's own filesystem (hdfs/s3) or the reader rejects the index
    graft.sources.Sidecar.write(vectors.sparkSession, s"$path/$IvfMetaFile",
      s"""{"nLists":${centroids.size},"dim":${centroids.head.size},""" +
        s""""centroids":$body}""")
  }

  /** The raw sidecar text of a persisted IVF index (validated present). */
  private def ivfMetaText(spark: org.apache.spark.sql.SparkSession,
      path: String): String =
    graft.sources.Sidecar
      .read(spark, s"$path/$IvfMetaFile")
      .getOrElse(throw new IllegalArgumentException(
        s"no $IvfMetaFile under $path - not a graft IVF index"))

  /** Whether the index at `path` stores int8 codes
    * ([[writeIvfIndexQuantized]]) rather than float vectors.
    */
  def ivfIndexIsQuantized(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean =
    ivfMetaText(spark, path).contains("\"quantized\":true")

  /** The centroid matrix a persisted index was written with. Takes the
    * caller's session explicitly (never `SparkSession.active`: under
    * multiple sessions the sidecar would resolve through the wrong
    * Hadoop conf).
    */
  def readIvfCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Seq[Double]] = {
    val text = ivfMetaText(spark, path)
    val start = text.indexOf("\"centroids\":[[")
    require(start >= 0, s"$IvfMetaFile under $path lacks centroids: $text")
    text.substring(start + 14, text.lastIndexOf("]]"))
      .split("\\],\\[").toSeq
      .map(_.split(",").toSeq.map(java.lang.Double.parseDouble))
  }

  /** Fold a delta of vectors INTO a persisted IVF index — the
    * maintenance half of the daily-embedding story, completing the
    * fold family ([[Dedup.appendToIndex]], [[SpanDedup
    * .appendToSpanIndex]]) for the vector index: new vectors assign to
    * the index's OWN sidecar centroids (re-deriving them from a caller
    * argument could silently shear assignment from probe choice) and
    * append under their `list_id` directories — float or int8 rows to
    * match what the sidecar declares, so the reader never sees a mixed
    * list. One new file per touched list per append; compact with
    * [[compactIvfIndex]] when per-list file counts matter. NOTE the
    * trade a real deployment tunes: folded vectors join EXISTING lists
    * — centroids do not move — so after heavy drift the index wants a
    * re-train + rewrite, exactly like any IVF index.
    */
  def appendToIvfIndex(delta: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val spark = delta.sparkSession
    val cents = readIvfCentroids(spark, path)
    val assigned = Clustering.assign(delta, idCol, vecCol, cents)
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        col("cluster").as("list_id"))
    val rows =
      if (!ivfIndexIsQuantized(spark, path)) assigned
      else assigned
        .withColumn("scale", VF.quantScale(col("vec")))
        .withColumn("q", VF.quantizeWith(col("vec"), col("scale")))
        .select(col("id"), col("q"), col("scale"), col("list_id"))
    rows.repartition(col("list_id"))
      .write.mode("append").partitionBy("list_id")
      .parquet(s"$path/lists")
  }

  /** Rewrite a persisted IVF index (float or quantized) into the
    * one-file-per-list layout at `destPath` — the merge half of the
    * append/merge trade: after a week of [[appendToIvfIndex]] folds,
    * each probed list reads 1 + #appends files; compaction restores
    * one. The sidecar copies VERBATIM (same centroids, same
    * quantization flag), so probe choice is bit-identical before and
    * after; rows are untouched (spec'd row-for-row).
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, destPath: String): Unit = {
    require(srcPath != destPath,
      "compactIvfIndex reads srcPath lazily while overwriting destPath; " +
        "in-place compaction would destroy the source lists mid-read — " +
        "write to a fresh path and swap")
    val text = ivfMetaText(spark, srcPath)
    spark.read.parquet(s"$srcPath/lists")
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$destPath/lists")
    graft.sources.Sidecar.write(spark, s"$destPath/$IvfMetaFile", text)
  }

  /** Execute the `retrain` action of [[ivfMaintenancePlan]] — the
    * other half of the append/maintain lifecycle ([[compactIvfIndex]]
    * handles `compact`): re-train k-means centroids on the index's
    * CURRENT contents (base build ∪ every appended fold, drift baked
    * in as written) and rewrite to `destPath` with the new matrix in
    * the sidecar — after which the appended population assigns to
    * centroids that actually fit it and the [[ivfListProfile]] drift
    * alarm clears (spec'd, and gated end-to-end by the q402 replay).
    * Same never-in-place contract as compaction: the source reads
    * lazily while the destination writes.
    */
  def retrainIvfIndex(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, destPath: String, k: Int, iters: Int): Unit = {
    require(srcPath != destPath,
      "retrainIvfIndex reads srcPath lazily while writing destPath; " +
        "an in-place retrain would destroy the source lists mid-read")
    require(!ivfIndexIsQuantized(spark, srcPath),
      s"retrainIvfIndex reads float vectors at $srcPath")
    val rows = spark.read.parquet(s"$srcPath/lists")
      .select(col("id"), col("vec"))
    val cents = Clustering.kmeansCentroids(rows, "id", "vec", k, iters)
    writeIvfIndex(rows, "id", "vec", destPath, cents)
  }

  /** Top-k by cosine against a persisted index, probing the `nProbe`
    * lists whose centroids are L2-nearest to the query vector. List
    * choice is driver-side arithmetic over the sidecar matrix (k×dim —
    * a bounded fact, same rule as the stratum counts), which makes the
    * probe set a LITERAL `isin` filter — static partition pruning at
    * file-listing time, no join needed. `nProbe = nLists` is exact.
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      query: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val cents = readIvfCentroids(spark, path)
    val probes = cents.zipWithIndex
      .map { case (c, i) =>
        (c.zip(query).map { case (x, y) => (x - y) * (x - y) }.sum, i)
      }
      .sortBy { case (d, i) => (d, i) }
      .take(nProbe).map(_._2)
    spark.read.parquet(s"$path/lists")
      .filter(col("list_id").isin(probes: _*))
      .select(col("id"),
        VF.cosine(col("vec"), typedLit(query)).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Index-health profile of a persisted float IVF index: every
    * indexed vector with its list and its squared L2 distance to its
    * OWN list centroid (from the sidecar — the same matrix probe
    * choice uses). This is the RETRAIN SIGNAL the [[appendToIvfIndex]]
    * Scaladoc warns about: folded vectors join existing lists while
    * centroids stand still, so after drift the appended population
    * sits measurably farther from its centroids than the base build —
    * per-list means of this frame are what a maintenance job alarms
    * on. One scan + a map-only distance against the bounded literal
    * centroid matrix; no shuffle at all.
    */
  def ivfListProfile(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    require(!ivfIndexIsQuantized(spark, path),
      s"ivfListProfile reads float vectors at $path")
    val cents = readIvfCentroids(spark, path)
    val centLit = array(cents.map(c =>
      array(c.map(lit): _*)): _*)
    spark.read.parquet(s"$path/lists")
      .select(col("id"), col("list_id"),
        VF.l2DistanceSq(col("vec"),
          element_at(centLit, col("list_id") + 1)).as("dist"))
  }

  /** The MAINTENANCE DECISION layer over the drift audit — what a
    * nightly index-keeper job actually runs (the round-15 q395 family
    * completed into a policy): given the per-list audit frame
    * `(list_id, n_base, n_appended, mean_dist_base,
    * mean_dist_appended)` (the [[ivfListProfile]] aggregation — the
    * caller decides what "base" vs "appended" means, e.g. id parity,
    * a write-date column, or a recorded baseline), emit per list the
    * REAL on-disk file count and the action:
    *
    *  - `retrain` when the appended population sits more than
    *    `retrainRatio`× farther (mean squared L2 to the standing
    *    centroid) than the base build — the drift alarm
    *    [[appendToIvfIndex]]'s Scaladoc warns about, now a decision;
    *    a list with no base or no appended rows cannot evidence
    *    drift and never retrains (NULL-safe by construction).
    *  - `compact` when the list directory holds more than
    *    `maxFilesPerList` files — the [[compactIvfIndex]] trigger
    *    (each append adds one file per touched list).
    *  - `ok` otherwise.
    *
    * The file count is a driver-side FS listing of the ≤ nLists
    * partition directories (a bounded fact, the stratum-count
    * discipline) joined back as a literal frame — never a
    * Spark-side recursive file scan. Ratio compares happen on the
    * audit's own 1e-6-grid means, so the decision replays
    * cross-engine.
    */
  def ivfMaintenancePlan(spark: org.apache.spark.sql.SparkSession,
      path: String, audit: DataFrame, retrainRatio: Double,
      maxFilesPerList: Int): DataFrame = {
    require(retrainRatio > 0, s"bad retrainRatio $retrainRatio")
    require(maxFilesPerList >= 1, s"bad maxFilesPerList $maxFilesPerList")
    val lists = new org.apache.hadoop.fs.Path(s"$path/lists")
    val fs = lists.getFileSystem(spark.sessionState.newHadoopConf())
    val counts: Seq[(Int, Long)] = fs.listStatus(lists).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("list_id="))
      .map { d =>
        (d.getPath.getName.stripPrefix("list_id=").toInt,
          fs.listStatus(d.getPath)
            .count(f => f.isFile &&
              f.getPath.getName.endsWith(".parquet")).toLong)
      }
    import spark.implicits._
    val files = counts.toDF("list_id", "n_files")
    audit.join(broadcast(files), Seq("list_id"), "left")
      .withColumn("n_files", coalesce(col("n_files"), lit(0L)))
      .withColumn("action",
        when(col("n_appended") > 0 && col("n_base") > 0 &&
          col("mean_dist_appended") >
            lit(retrainRatio) * col("mean_dist_base"), lit("retrain"))
        .when(col("n_files") > maxFilesPerList, lit("compact"))
        .otherwise(lit("ok")))
  }

  /** [[writeIvfIndex]] with int8 codes at rest — the 4× smaller index
    * the memory-cut Scaladoc of [[VF.quantScale]] promises, composed
    * with the IVF layout: each vector stores (id, q int8-codes, scale)
    * under its `partitionBy(list_id)` directory, so a probe reads only
    * its lists' CODE files and the hot loop is integer multiply-adds.
    * The sidecar carries the centroid matrix plus `"quantized":true` so
    * a float reader fails loudly rather than scoring codes as floats.
    * Query with [[ivfTopKIndexedQuantized]]; recall@10 vs the float
    * index is MEASURED in IvfIndexSpec (the q76 ≥ 0.85 precedent).
    */
  def writeIvfIndexQuantized(vectors: DataFrame, idCol: String,
      vecCol: String, path: String, centroids: Seq[Seq[Double]]): Unit = {
    // scale materialized to its own column BEFORE the quantize lambda
    // (HOF re-evaluation trap — quantScale's own Scaladoc)
    Clustering.assign(vectors, idCol, vecCol, centroids)
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        col("cluster").as("list_id"))
      .withColumn("scale", VF.quantScale(col("vec")))
      .withColumn("q", VF.quantizeWith(col("vec"), col("scale")))
      .select(col("id"), col("q"), col("scale"), col("list_id"))
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$path/lists")
    val body = centroids
      .map(_.map(d => java.lang.Double.toString(d)).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    graft.sources.Sidecar.write(vectors.sparkSession, s"$path/$IvfMetaFile",
      s"""{"nLists":${centroids.size},"dim":${centroids.head.size},""" +
        s""""quantized":true,"centroids":$body}""")
  }

  /** Top-k against a QUANTIZED persisted index
    * ([[writeIvfIndexQuantized]]): probe lists chosen exactly as
    * [[ivfTopKIndexed]] (driver arithmetic over the sidecar matrix →
    * literal isin → static partition pruning), then the [[quantizedTopK]]
    * score — integer code dot rescaled by both scales — over the probed
    * lists only. The query quantizes DRIVER-side with BigDecimal
    * HALF_UP, the exact rounding `round()` applies in Spark and DuckDB
    * (`math.round` would differ at negative .5 boundaries). Ranking is
    * (qscore DESC, id) — the q76 convention.
    */
  def ivfTopKIndexedQuantized(spark: org.apache.spark.sql.SparkSession,
      path: String, query: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val cents = readIvfCentroids(spark, path)
    val probes = cents.zipWithIndex
      .map { case (c, i) =>
        (c.zip(query).map { case (x, y) => (x - y) * (x - y) }.sum, i)
      }
      .sortBy { case (d, i) => (d, i) }
      .take(nProbe).map(_._2)
    val qScale = if (query.isEmpty) 0.0 else query.map(math.abs).max / 127.0
    val qCodes: Seq[Int] = query.map { x =>
      if (qScale == 0.0) 0
      else BigDecimal(x / qScale)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt
    }
    spark.read.parquet(s"$path/lists")
      .filter(col("list_id").isin(probes: _*))
      .withColumn("qdot",
        aggregate(zip_with(col("q"), typedLit(qCodes), (x, y) => x * y),
          lit(0L), (a, x) => a + x))
      .select(col("id"),
        round(col("qdot") * col("scale") * lit(qScale), 4).as("qscore"))
      .orderBy(col("qscore").desc, col("id"))
      .limit(k)
  }

  /** Bucket histogram of the LSH index (diagnostics / balance check). */
  def lshBucketStats(vectors: DataFrame, vecCol: String, nPlanes: Int = 8,
      dim: Int = 64): DataFrame = {
    val planes = VF.deterministicPlanes(nPlanes, dim)
    vectors
      .groupBy(VF.hyperplaneSignature(col(vecCol), planes).as("bucket"))
      .agg(count(lit(1)).as("n_vectors"))
  }

  /** Margin-based nearest-neighbor mining (the published ratio-margin
    * criterion for mining parallel / duplicated content):
    * `margin(x, y) = cos(x, y) / ((avgK(x) + avgK(y)) / 2)` where
    * `avgK(v)` is the mean cosine of `v`'s `k` nearest neighbors.
    * Dividing by the neighborhood density normalizes away hubness —
    * a raw-cosine threshold over-fires in dense regions and misses
    * genuine pairs in sparse ones; margin > 1 means "closer than your
    * usual neighborhood", comparable ACROSS regions.
    *
    * Returns each vector's best partner by margin (rounded-grid argmax,
    * partner-id tie-break). This is the exact brute-force form — one
    * all-pairs cosine pass feeding both the avgK aggregation and the
    * margin scoring; at billion-vector scale compose the same scoring
    * with [[assignLists]]' IVF buckets to bound the pair space, exactly
    * as [[semanticDupPairs]] does for raw cosine.
    *
    * INPUT-SIZE CONTRACT: `vectors` must be broadcast-sized (it is
    * broadcast as the pair join's build side — Spark hard-caps a
    * broadcast relation at 8 GB / 512 M rows, and driver/executor
    * memory binds well before that). This brute form is for bounded
    * eval corpora only; for anything larger use
    * [[marginTopMatchesVia]], the same scoring over trained-IVF
    * candidate lists.
    */
  def marginTopMatches(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    // prepForPairs (id, vd, nrm): norms once per ROW, codegen'd dot once
    // per PAIR. The pair table feeds both avgK and the margin scoring —
    // scope-cached so the all-pairs cosine runs once.
    val prepped = VF.prepForPairs(vectors, idCol, vecCol)
    // broadcast the b-side: this brute form is the bounded-eval
    // contract (never production — the scaled path is the trained-list
    // equi-join), so the right side is broadcast-sized BY CONTRACT.
    // Un-hinted, Spark plans the non-equi self-join as a
    // CartesianProduct whose partition count is |a|×|b| partitions
    // (32×32 = 1024 tasks per downstream stage at local[32] — measured
    // 6.3k tasks for q325's one action); the hint makes it the BNLJ
    // the bounded-eval shape intends, with stream-side partitioning.
    val pairs = prepped.as("a")
      .join(broadcast(prepped.as("b")), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("x"), col("b.id").as("y"),
        when(col("a.nrm") * col("b.nrm") === 0.0, lit(0.0))
          .otherwise(VF.fastDot(col("a.vd"), col("b.vd")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
    marginFromPairs(pairs, k)
  }

  /** The production form of [[marginTopMatches]]: the SAME margin
    * scoring over the IVF-BOUNDED candidate space instead of the n²
    * pair table. Each vector takes its `nAssign` L2-NEAREST lists of a
    * TRAINED centroid matrix (pass [[Clustering.kmeansCentroids]]
    * output — trained lists co-locate near neighbors, which random
    * hyperplane "centroids" do not: measured recall 0.46 untrained vs
    * ≥ 0.9 trained at the same fan-out); candidate pairs meet in any
    * shared list, dedup to one row per ordered pair, and avgK / margin
    * / best-match run over THAT table only. Per-list populations bound
    * the join (`nAssign²/L · n²` expected pairs, never n²); at the
    * billion-vector grain the lists ARE the shuffle partitions. avgK
    * over the candidate neighborhood is the published approximation
    * (the mined neighbors come from the same index); recall vs the
    * exact baseline is measured in SimilaritySpec on the fixture
    * corpus.
    */
  def marginTopMatchesVia(vectors: DataFrame, idCol: String,
      vecCol: String, k: Int, centroids: Seq[Seq[Double]],
      nAssign: Int = 2): DataFrame = {
    require(nAssign >= 1 && nAssign <= centroids.size,
      s"nAssign $nAssign out of range [1, ${centroids.size}]")
    val prepped = VF.prepForPairs(vectors, idCol, vecCol)
    val asg = prepped.withColumn("__sm_list",
      explode(Clustering.nearestLists(col("vd"), centroids, nAssign)))
    // same-list meet, both directions (margins are per-x); a pair
    // sharing several lists collapses to one row — cos is the same
    // deterministic expression on both sides of the distinct
    val pairs = asg.as("a")
      .join(asg.as("b"),
        col("a.__sm_list") === col("b.__sm_list") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("x"), col("b.id").as("y"),
        when(col("a.nrm") * col("b.nrm") === 0.0, lit(0.0))
          .otherwise(VF.fastDot(col("a.vd"), col("b.vd")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
      .distinct()
    marginFromPairs(pairs, k)
  }

  /** Cross-lingual bitext mining — the ratio-margin criterion
    * (Artetxe & Schwenk 2019's margin-based alignment, the LASER/
    * CCMatrix device) restricted to CROSS-GROUP pairs: each vector's
    * best match must carry a DIFFERENT `groupCol` label (language),
    * and the normalizing avg-k neighborhoods are likewise cross-group
    * (the mined pool IS the candidate pool — the published
    * approximation). This is what turns a multilingual embedding
    * space into translation-pair candidates for parallel-corpus
    * construction.
    *
    * Brute n² baseline form (the q150 contract — a non-equi self-join,
    * fine for bounded eval corpora, NEVER for production); the scale
    * path is [[bitextTopMatchesVia]], the same scoring over trained-
    * IVF candidate lists.
    *
    * INPUT-SIZE CONTRACT: `vectors` must be broadcast-sized (it is
    * broadcast as the pair join's build side — 8 GB / 512 M-row hard
    * cap, memory binds earlier). Bounded eval corpora only.
    */
  def bitextTopMatches(vectors: DataFrame, idCol: String,
      vecCol: String, groupCol: String, k: Int): DataFrame = {
    val prepped = VF.prepForPairs(vectors, idCol, vecCol)
      .join(vectors.select(col(idCol).as("id"),
        col(groupCol).as("__bt_grp")), Seq("id"))
    // broadcast the b-side — the [[marginTopMatches]] bounded-eval
    // rationale: BNLJ with stream-side partitioning, not a 1024-task
    // CartesianProduct
    val pairs = prepped.as("a")
      .join(broadcast(prepped.as("b")),
        col("a.id") =!= col("b.id") &&
          col("a.__bt_grp") =!= col("b.__bt_grp"))
      .select(col("a.id").as("x"), col("b.id").as("y"),
        when(col("a.nrm") * col("b.nrm") === 0.0, lit(0.0))
          .otherwise(VF.fastDot(col("a.vd"), col("b.vd")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
    marginFromPairs(pairs, k)
  }

  /** The PRODUCTION form of [[bitextTopMatches]] — the cross-group
    * margin scoring over [[marginTopMatchesVia]]'s TRAINED-list
    * candidate space instead of the n² pair table: each vector takes
    * its `nAssign` L2-nearest lists of a trained centroid matrix
    * (pass [[Clustering.kmeansCentroids]] output), candidate pairs
    * meet in any shared list AND must carry different `groupCol`
    * labels (the bitext constraint prunes the candidate table BEFORE
    * the distinct — same-language neighbors never materialize), and
    * avgK / margin / best-match are [[marginFromPairs]] unchanged.
    * Per-list populations bound the join (`nAssign²/L · n²` expected
    * pairs, never n²); at the billion-embedding grain of a real
    * parallel-corpus build (CCMatrix mines tens of billions of pairs
    * from LASER embeddings) the lists ARE the shuffle partitions.
    * avgK over the surviving cross-group candidates is the published
    * approximation — the mined neighborhood IS the normalizing pool,
    * exactly as the brute form's cross-group pools; recall vs the
    * exact baseline is measured in SimilaritySpec.
    */
  /** The trained-list, cross-group candidate pair table (x, y, cos)
    * shared by [[bitextTopMatchesVia]] and [[bitextMinedPairsVia]].
    */
  private def bitextCandidatePairs(vectors: DataFrame, idCol: String,
      vecCol: String, groupCol: String,
      centroids: Seq[Seq[Double]], nAssign: Int): DataFrame = {
    require(nAssign >= 1 && nAssign <= centroids.size,
      s"nAssign $nAssign out of range [1, ${centroids.size}]")
    val prepped = VF.prepForPairs(vectors, idCol, vecCol)
      .join(vectors.select(col(idCol).as("id"),
        col(groupCol).as("__bt_grp")), Seq("id"))
    val asg = prepped.withColumn("__sm_list",
      explode(Clustering.nearestLists(col("vd"), centroids, nAssign)))
    asg.as("a")
      .join(asg.as("b"),
        col("a.__sm_list") === col("b.__sm_list") &&
          col("a.id") =!= col("b.id") &&
          col("a.__bt_grp") =!= col("b.__bt_grp"))
      .select(col("a.id").as("x"), col("b.id").as("y"),
        when(col("a.nrm") * col("b.nrm") === 0.0, lit(0.0))
          .otherwise(VF.fastDot(col("a.vd"), col("b.vd")) /
            (col("a.nrm") * col("b.nrm"))).as("cos"))
      .distinct()
  }

  def bitextTopMatchesVia(vectors: DataFrame, idCol: String,
      vecCol: String, groupCol: String, k: Int,
      centroids: Seq[Seq[Double]], nAssign: Int = 2): DataFrame =
    marginFromPairs(
      bitextCandidatePairs(vectors, idCol, vecCol, groupCol, centroids,
        nAssign), k)

  /** ALL mined cross-group candidates with their ratio margins — the
    * CCMatrix mining table proper: [[bitextTopMatchesVia]] keeps each
    * vector's single best partner, but a parallel-corpus build mines
    * EVERY pair above a margin threshold and sweeps the threshold to
    * pick its operating point. One row per DIRECTED candidate (x, y,
    * cos, margin — margins are per-x because avgK(x) ≠ avgK(y));
    * filter `margin >= θ` downstream. Same plan class as the top-match
    * form: trained-list equi-join candidates, never n².
    */
  def bitextMinedPairsVia(vectors: DataFrame, idCol: String,
      vecCol: String, groupCol: String, k: Int,
      centroids: Seq[Seq[Double]], nAssign: Int = 2): DataFrame =
    marginScores(
      bitextCandidatePairs(vectors, idCol, vecCol, groupCol, centroids,
        nAssign), k)
      .select(col("x"), col("y"),
        graft.functions.Grid.snap(col("cos"), 4).as("cos"),
        col("margin"))

  /** ONE-SIDED (forward) margin scoring — the index-probe variant of
    * [[marginScores]]: when candidates come from probing a PERSISTED
    * index, the indexed side never probes back, so the Artetxe &
    * Schwenk ratio's backward term `avgK(y)` does not exist; the
    * forward margin `cos / avgK(x)` is the published fallback
    * (forward scoring, Artetxe & Schwenk 2019 §3.1). Same grid
    * discipline: top-k SET on the 4-decimal snapped cosine, margin
    * snapped at 4.
    */
  private[graft] def marginScoresForward(rawPairs: DataFrame,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = graft.CacheScope.register(rawPairs.persist())
    val w = Window.partitionBy(col("x"))
      .orderBy(graft.functions.Grid.snap(col("cos"), 4).desc, col("y"))
    val avgK = pairs
      .withColumn("__sm_rn", row_number().over(w))
      .filter(col("__sm_rn") <= k)
      .groupBy(col("x"))
      .agg(avg(col("cos")).as("avg_k"))
    pairs
      .join(avgK, Seq("x"))
      .withColumn("margin", graft.functions.Grid.snap(
        col("cos") / col("avg_k"), 4))
  }

  /** INCREMENTAL bitext mining against a persisted IVF index (the
    * round-15 composition of [[bitextTopMatchesVia]] with the
    * [[writeIvfIndex]]/[[appendToIvfIndex]] lifecycle): the indexed
    * side is the standing half of a parallel-corpus build (say, the
    * English web); each arriving batch of foreign documents probes
    * its `nAssign` nearest lists — a static `isin`-pruned scan of
    * ONLY those list directories at 100 TB — and mines its best
    * partner by FORWARD margin ([[marginScoresForward]]; the index
    * never probes back, so the two-sided ratio is undefined here).
    * No distinct needed: an indexed vector lives in exactly one list,
    * so (x, y) pairs are unique by construction — one join, no
    * dedup stage, strictly simpler than the in-memory candidate form.
    *
    * Output: one row per probe doc — (x, best_match, cos, margin).
    */
  /** The candidate stage shared by [[bitextProbeIndexed]] (batch,
    * `pruneLists = true`) and the STREAMING form
    * ([[graft.streaming.AnnStream.bitextCandidates]],
    * `pruneLists = false` — a streaming delta cannot be collected at
    * plan time, and a stream-static join re-resolves per batch
    * anyway): probe docs explode to their `nAssign` nearest lists
    * and equi-join the persisted lists scan. Emits
    * `(x, y, list_id, cos)`.
    */
  private[graft] def bitextCandidatePairsIndexed(
      spark: org.apache.spark.sql.SparkSession, path: String,
      delta: DataFrame, idCol: String, vecCol: String, nAssign: Int,
      pruneLists: Boolean): DataFrame = {
    require(!ivfIndexIsQuantized(spark, path),
      s"bitextProbeIndexed needs a float index at $path")
    val cents = readIvfCentroids(spark, path)
    require(nAssign >= 1 && nAssign <= cents.size,
      s"nAssign $nAssign out of range [1, ${cents.size}]")
    val probes = VF.prepForPairs(delta, idCol, vecCol)
      .withColumn("__list",
        explode(Clustering.nearestLists(col("vd"), cents, nAssign)))
    val raw = spark.read.parquet(s"$path/lists")
    // The union of probed lists is a BOUNDED fact (≤ nLists — the
    // sidecar's own k, the stratum-count discipline): collect it and
    // push a LITERAL isin on the partition column, so the lists scan
    // file-prunes to exactly the probed directories at listing time
    // (PartitionFilters, asserted in PlanQualitySpec) instead of
    // relying on runtime dynamic pruning to fire. One extra map +
    // ≤nLists-row distinct over the delta — batch-side, never
    // index-side — buys a probe cost that stays flat as the INDEX
    // grows (only the probed lists' files are ever listed or read).
    val scan = if (pruneLists) {
      val probedIds = probes.select(col("__list")).distinct()
        .collect().map(_.getInt(0)).sorted
      raw.filter(col("list_id").isin(probedIds.map(Int.box): _*))
    } else raw
    val lists = scan
      .select(col("id").as("y"),
        transform(col("vec"), x => x.cast("double")).as("__yv"),
        col("list_id"))
      .withColumn("__ynrm", sqrt(aggregate(col("__yv"), lit(0.0),
        (acc, x) => acc + x * x)))
    probes
      .join(lists, col("__list") === col("list_id"))
      .select(col("id").as("x"), col("y"), col("list_id"),
        when(col("nrm") * col("__ynrm") === 0.0, lit(0.0))
          .otherwise(VF.fastDot(col("vd"), col("__yv")) /
            (col("nrm") * col("__ynrm"))).as("cos"))
  }

  def bitextProbeIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, delta: DataFrame, idCol: String, vecCol: String,
      k: Int, nAssign: Int): DataFrame = {
    val pairs = bitextCandidatePairsIndexed(spark, path, delta, idCol,
        vecCol, nAssign, pruneLists = true)
      .select(col("x"), col("y"), col("cos"))
    import org.apache.spark.sql.expressions.Window
    val wBest = Window.partitionBy(col("x"))
      .orderBy(col("margin").desc, col("y"))
    marginScoresForward(pairs, k)
      .withColumn("__sm_rn", row_number().over(wBest))
      .filter(col("__sm_rn") === 1)
      .select(col("x"), col("y").as("best_match"),
        graft.functions.Grid.snap(col("cos"), 4).as("cos"),
        col("margin"))
  }

  /** Shared margin scoring over a (x, y, cos) candidate table: avgK
    * per x on the rounded-grid top-k, ratio margin, best partner per x.
    */
  /** The full margin-scored candidate table (x, y, cos, margin) over a
    * (x, y, cos) pair table — everything [[marginFromPairs]] computes
    * short of the best-row selection. This is the CCMatrix-style
    * MINING table: a margin threshold over it yields ALL pair
    * candidates above θ, not just each vector's best partner.
    */
  private[graft] def marginScores(rawPairs: DataFrame,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = graft.CacheScope.register(rawPairs.persist())
    // neighbor selection ranks on the SNAPPED cosine grid (partner-id
    // tie-break): the top-k SET is then a pure function of 4-decimal
    // grid values, immune to last-ulp accumulation differences between
    // engines — the house replay-grid device, on the engine-exact
    // [[graft.functions.Grid]] snap (round()'s tie handling diverges)
    val w = Window.partitionBy(col("x"))
      .orderBy(graft.functions.Grid.snap(col("cos"), 4).desc, col("y"))
    val avgK = pairs
      .withColumn("__sm_rn", row_number().over(w))
      .filter(col("__sm_rn") <= k)
      .groupBy(col("x"))
      .agg(avg(col("cos")).as("avg_k"))
    pairs
      .join(avgK.select(col("x"), col("avg_k").as("ax")), Seq("x"))
      .join(avgK.select(col("x").as("y"), col("avg_k").as("ay")), Seq("y"))
      .withColumn("margin", graft.functions.Grid.snap(
        col("cos") / ((col("ax") + col("ay")) / 2), 4))
  }

  private def marginFromPairs(rawPairs: DataFrame, k: Int): DataFrame = {
    val scored = marginScores(rawPairs, k)
    // Best partner per x as a max_by AGGREGATION instead of a
    // row_number window (guide §2: same Exchange on x, but the full
    // per-partition sort becomes a partially-aggregating hash agg —
    // the map side collapses each x's candidates to one row BEFORE
    // the shuffle, which at the brute n² grain shuffles n rows
    // instead of n²). Ordering semantics are the window sort's
    // exactly: max_by uses the same interpreted total order the sort
    // used (NaN greatest, -0.0 < 0.0), so `margin desc` ≡ max margin,
    // and the ascending-id tie-break is max of the NEGATED id — ids
    // are numeric by the prepForPairs pair-table contract, and (x, y)
    // is unique per pair so the two-field order is total.
    scored
      .groupBy(col("x"))
      .agg(max_by(
        struct(col("y"), col("cos"), col("margin")),
        struct(col("margin"), negate(col("y")))).as("__sm_best"))
      .select(col("x"), col("__sm_best.y").as("best_match"),
        graft.functions.Grid.snap(col("__sm_best.cos"), 4).as("cos"),
        col("__sm_best.margin").as("margin"))
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein): k
    * vectors greedily maximizing
    * `λ·cos(x, query) − (1−λ)·max_{s∈S} cos(x, s)` — the diverse-
    * exemplar picker (prompt few-shots, eval-set curation, dedup
    * canary selection) that trades query relevance against redundancy
    * with what is already picked.
    *
    * The greedy argmax is taken on the 1e-6-SNAPPED objective
    * ([[graft.functions.Grid]]) with an id tie-break (the k-means
    * deterministic-grid convention), so the discrete selection
    * trajectory is engine-replayable. Each of the k
    * rounds is one map-only pass over the cached candidate frame (the
    * selected set rides in the UDF closure — k·dim doubles, a bounded
    * driver fact) + a TakeOrdered(1); nothing quadratic in the
    * candidate count ever materializes.
    */
  def mmrSelect(vectors: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, lambda: Double): DataFrame = {
    require(k >= 1 && lambda >= 0 && lambda <= 1,
      s"bad MMR parameters k=$k lambda=$lambda")
    val spark = vectors.sparkSession
    import spark.implicits._
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val n = math.sqrt(na) * math.sqrt(nb)
      if (n == 0) 0.0 else d / n
    }
    val qRows = vectors.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).collect()
    require(qRows.nonEmpty, s"query id $queryId not found")
    val q = qRows.head.getSeq[Double](0).toArray
    val relUdf = udf { v: Seq[Double] => cos(v.toArray, q) }
    val cand = graft.CacheScope.register(vectors
      .filter(col(idCol) =!= queryId)
      .select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("__mm_v"))
      .withColumn("__mm_rel", relUdf(col("__mm_v")))
      .persist())
    val oneMinus = 1 - lambda
    var selected = Vector.empty[(Long, Array[Double], Double, Double)]
    for (r <- 1 to k) {
      val sel = selected.map(_._2)
      val pickedIds = selected.map(_._1).toSet
      val objUdf = udf { (v: Seq[Double], rel: Double) =>
        val x = v.toArray
        val ms = if (sel.isEmpty) 0.0 else sel.map(s => cos(x, s)).max
        graft.functions.Grid.snapD(lambda * rel - oneMinus * ms)
      }
      val pick = cand.filter(!col("vec_id").isin(pickedIds.toSeq: _*))
        .withColumn("__mm_obj", objUdf(col("__mm_v"), col("__mm_rel")))
        .orderBy(col("__mm_obj").desc, col("vec_id"))
        .limit(1).collect().head
      selected :+= ((pick.getAs[Long]("vec_id"),
        pick.getAs[Seq[Double]]("__mm_v").toArray,
        pick.getAs[Double]("__mm_rel"), pick.getAs[Double]("__mm_obj")))
    }
    selected.zipWithIndex.map { case ((id, _, rel, obj), i) =>
      (i + 1, id, graft.functions.Grid.snapD(rel, 4), obj)
    }.toDF("rank", "vec_id", "relevance", "mmr_score")
  }

  /** Embedding-space outlier detection — the curation triad's third
    * leg beside near-dup removal ([[semanticDupPairs]]) and diverse
    * selection (mmrSelect): a vector whose k nearest in-list
    * neighbors are all FAR is isolated in embedding space (mislabeled,
    * corrupt, or off-distribution — the SelfClean/SSL-prototype
    * signal). Candidates come only from the IVF list equi-join;
    * per-anchor top-k runs in a window over list-bounded candidate
    * sets; `knn_sim` is the ordered 1e-6-grid fold of the k cosines
    * (exact replay); the report is the bottom-`bottomN` heap.
    * Isolated-list vectors (no in-list neighbor at all) surface with
    * `n_neighbors = 0` and `knn_sim = -1` — maximally suspicious.
    */
  def embeddingOutliers(vectors: DataFrame, idCol: String,
      vecCol: String, k: Int = 8, nLists: Int = 8,
      bottomN: Int = 20, dim: Int = 64): DataFrame = {
    require(k >= 1 && bottomN >= 1, s"bad outliers($k, $bottomN)")
    val prepped = graft.CacheScope.register(
      assignLists(vectors, vecCol, nLists, dim)
        .select(col(idCol).as("id"), col("list_id"),
          transform(col(vecCol), x => x.cast("double")).as("vd"))
        .withColumn("nrm",
          sqrt(aggregate(col("vd"), lit(0.0), (acc, x) => acc + x * x)))
        .persist())
    val pairs = prepped.as("a").join(prepped.as("b"),
        col("a.list_id") === col("b.list_id") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("anchor"), col("b.id").as("b_id"),
        graft.functions.Grid.snap(
          when(col("a.nrm") * col("b.nrm") === 0.0, lit(0.0))
            .otherwise(VF.fastDot(col("a.vd"), col("b.vd")) /
              (col("a.nrm") * col("b.nrm")))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor"))
      .orderBy(col("cos").desc, col("b_id"))
    val topK = pairs
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col("anchor"))
      .agg(count(lit(1)).as("n_neighbors"),
        graft.functions.Grid.snap(
          aggregate(sort_array(collect_list(
            struct(col("__rn"), col("cos").as("c")))), lit(0.0),
            (acc, x) => graft.functions.Grid.snap(acc + x("c")))
            .cast("double") /
          count(lit(1)).cast("double")).as("knn_sim"))
    prepped.select(col("id").as("anchor"))
      .join(topK, Seq("anchor"), "left")
      .na.fill(0L, Seq("n_neighbors"))
      .na.fill(-1.0, Seq("knn_sim"))
      .orderBy(col("knn_sim"), col("anchor"))
      .limit(bottomN)
  }

  /** Leave-one-out kNN label accuracy — the embedding-QUALITY eval
    * (the linear-probe-lite): every labeled vector is classified by
    * the majority label of its k nearest in-list neighbors (ties →
    * smaller label id; the vector itself excluded by construction)
    * and scored against its own label. Per-label and pooled accuracy
    * tell you whether the embedding space actually separates the
    * classes BEFORE any training run spends on it. Same candidate
    * discipline as the rest of the family: IVF-list equi-join,
    * anchor-keyed windows over list-bounded sets.
    */
  def knnLabelAccuracy(vectors: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int = 8, nLists: Int = 8,
      dim: Int = 64): DataFrame = {
    require(k >= 1, s"bad k $k")
    val prepped = graft.CacheScope.register(
      assignLists(vectors, vecCol, nLists, dim)
        .select(col(idCol).as("id"), col(labelCol).as("lbl"),
          col("list_id"),
          transform(col(vecCol), x => x.cast("double")).as("vd"))
        .withColumn("nrm",
          sqrt(aggregate(col("vd"), lit(0.0), (acc, x) => acc + x * x)))
        .persist())
    val pairs = prepped.as("a").join(prepped.as("b"),
        col("a.list_id") === col("b.list_id") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("anchor"), col("a.lbl").as("true_lbl"),
        col("b.id").as("b_id"), col("b.lbl").as("nb_lbl"),
        graft.functions.Grid.snap(
          when(col("a.nrm") * col("b.nrm") === 0.0, lit(0.0))
            .otherwise(VF.fastDot(col("a.vd"), col("b.vd")) /
              (col("a.nrm") * col("b.nrm")))).as("cos"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor"))
      .orderBy(col("cos").desc, col("b_id"))
    val votes = pairs
      .withColumn("__rn", row_number().over(wTop))
      .filter(col("__rn") <= k)
      .groupBy(col("anchor"), col("true_lbl"), col("nb_lbl"))
      .agg(count(lit(1)).as("__v"))
    val wVote = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor"))
      .orderBy(col("__v").desc, col("nb_lbl"))
    val pred = votes
      .withColumn("__pk", row_number().over(wVote))
      .filter(col("__pk") === 1)
      .select(col("anchor"), col("true_lbl"),
        col("nb_lbl").as("pred_lbl"))
    pred.groupBy(col("true_lbl").as("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred_lbl") === col("true_lbl"), 1L)
          .otherwise(0L)).as("n_correct"))
      .withColumn("accuracy", graft.functions.Grid.snap(
        col("n_correct") / col("n").cast("double")))
      .orderBy(col("label"))
  }

  /** Contrastive triplet mining (FaceNet's semi-hard rule, Schroff et
    * al. 2015, composed on the SemDeDup candidate discipline): per
    * anchor, the HARDEST POSITIVE (the most dissimilar same-label
    * neighbor — the pair the embedding must pull together) and the
    * SEMI-HARD NEGATIVE (the most similar different-label neighbor
    * still farther than that positive, `cos_n < cos_p`; when no
    * negative qualifies, the hardest negative overall). The triplet
    * table is what a contrastive fine-tune consumes.
    *
    * Scale shape: candidates come ONLY from the IVF list equi-join
    * (the [[semanticDupPairs]] contract — never the n² cross);
    * per-anchor picks are windows partitioned by anchor over
    * list-bounded candidate sets. Cosines round at 1e-6 BEFORE
    * ranking so pick order (ties included) replays in the oracle.
    * Anchors lacking an in-list positive or negative drop — mining
    * more lists back in is the nAssign dial, as in SemDeDup.
    */
  def mineTriplets(vectors: DataFrame, idCol: String, vecCol: String,
      labelCol: String, nLists: Int = 8, dim: Int = 64): DataFrame = {
    val prepped = graft.CacheScope.register(
      assignLists(vectors, vecCol, nLists, dim)
        .select(col(idCol).as("id"), col(labelCol).as("lbl"),
          col("list_id"),
          transform(col(vecCol), x => x.cast("double")).as("vd"))
        .withColumn("nrm",
          sqrt(aggregate(col("vd"), lit(0.0), (acc, x) => acc + x * x)))
        .persist())
    val pairs = graft.CacheScope.register(prepped.as("a")
      .join(prepped.as("b"),
        col("a.list_id") === col("b.list_id") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.lbl").as("la"), col("b.lbl").as("lb"),
        graft.functions.Grid.snap(
          when(col("a.nrm") * col("b.nrm") === 0.0, lit(0.0))
            .otherwise(VF.fastDot(col("a.vd"), col("b.vd")) /
              (col("a.nrm") * col("b.nrm")))).as("cos"))
      .persist())
    val wPos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a_id")).orderBy(col("cos"), col("b_id"))
    val hardestPos = pairs.filter(col("la") === col("lb"))
      .withColumn("__rn", row_number().over(wPos))
      .filter(col("__rn") === 1)
      .select(col("a_id"), col("b_id").as("pos_id"),
        col("cos").as("pos_cos"))
    val negs = pairs.filter(col("la") =!= col("lb"))
      .select(col("a_id"), col("b_id").as("neg_id"),
        col("cos").as("neg_cos"))
    val wNeg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a_id"))
      .orderBy(col("semi_hard").desc, col("neg_cos").desc,
        col("neg_id"))
    hardestPos.join(negs, Seq("a_id"))
      .withColumn("semi_hard", col("neg_cos") < col("pos_cos"))
      .withColumn("__rn", row_number().over(wNeg))
      .filter(col("__rn") === 1)
      .select(col("a_id").as("anchor"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"), col("semi_hard"))
  }

  /** Matryoshka truncation recall (Kusupati et al. 2022, "Matryoshka
    * Representation Learning"): for each truncation width `d` in
    * `dims`, the top-`k` cosine neighbors computed in the FIRST-d-dims
    * space, graded against the max-width exact set — the measured
    * evidence for running first-stage retrieval at a fraction of the
    * dimension (the JL projection's learned-nesting sibling;
    * [[graft.operators.RandomProjection]] is the data-independent
    * one). Returns one row per width: `(d, n_queries, mean_recall)`
    * (the max width anchors at recall 1 by construction).
    *
    * Execution: corpus × bounded-QUERY-set cross (the q22 brute
    * baseline — the scale path is IVF in the truncated space), ONE
    * pass per pair computing all widths via a bounded `dims` explode;
    * truncated cosine = the [[graft.functions.VectorFunctions]] fold
    * over `slice(vec, 1, d)`, SNAPPED at 6 before ranking so the
    * boundary of the top-k replays on any engine (ties break by id).
    * Per-(query, width) ranks are keyed windows; recall is an exact
    * hit-count ratio.
    */
  def matryoshkaRecall(vectors: DataFrame, idCol: String,
      vecCol: String, queries: DataFrame, dims: Seq[Int],
      k: Int): DataFrame = {
    import graft.functions.Grid
    require(dims.nonEmpty && dims.size <= 8 && dims == dims.sorted,
      s"bad dims $dims")
    require(k >= 1 && k <= 1000, s"bad k $k")
    val full = dims.max
    val pairs = vectors
      .select(col(idCol).as("nid"), col(vecCol).as("__v"))
      .crossJoin(broadcast(queries.select(col("qid"), col("q_emb"))))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), col("__v"), col("q_emb"),
        explode(array(dims.map(d => lit(d)): _*)).as("d"))
    val sa = slice(col("__v").cast("array<double>"), lit(1), col("d"))
    val sb = slice(col("q_emb").cast("array<double>"), lit(1),
      col("d"))
    val dot = aggregate(zip_with(sa, sb, (x, y) => x * y), lit(0.0),
      (acc, v) => acc + v)
    val na = sqrt(aggregate(zip_with(sa, sa, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(zip_with(sb, sb, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v))
    val cos = when(na * nb === 0.0, lit(0.0))
      .otherwise(dot / (na * nb))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"), col("d"))
      .orderBy(col("__cos").desc, col("nid"))
    // PINNED: the ranked top-k feeds both the ground-truth slice and
    // the hit join
    val ranked = graft.CacheScope.register(pairs
      .withColumn("__cos", Grid.snap(cos, 6))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("qid"), col("nid"), col("d"))
      .persist())
    val gt = ranked.filter(col("d") === full)
      .select(col("qid"), col("nid"))
    // Per-query ground-truth size (≤ k when the corpus is short of
    // candidates) is the recall denominator, and every (query, width)
    // cell exists in the output even at zero hits: the base frame is
    // the bounded queries × dims grid LEFT-joined to the hit counts —
    // an inner join would silently drop a width that missed
    // everything, and a constant k denominator would understate
    // recall on short corpora (the max width must anchor at 1).
    // The per-query recalls cross the engines as exact 1e-6-grid
    // integers (floor(x·1e6 + .5) longs) so the mean is an
    // order-free integer sum, never a float reassociation.
    val gtc = gt.groupBy(col("qid")).agg(count(lit(1)).as("__gtn"))
    val hits = ranked.join(gt, Seq("qid", "nid"))
      .groupBy(col("qid"), col("d"))
      .agg(count(lit(1)).as("__hits"))
    val qd = queries.select(col("qid"),
      explode(array(dims.map(d => lit(d)): _*)).as("d"))
    val nq = queries.agg(count(lit(1)).as("__nq"))
    qd.join(hits, Seq("qid", "d"), "left")
      .join(gtc, Seq("qid"), "left")
      .withColumn("__nano", floor(lit(1e6) *
        coalesce(col("__hits"), lit(0L)).cast("double") /
        col("__gtn").cast("double") + lit(0.5)).cast("long"))
      .groupBy(col("d"))
      .agg(sum(col("__nano")).as("__sn"))
      .crossJoin(broadcast(nq))
      .select(col("d"), col("__nq").as("n_queries"),
        Grid.snap(col("__sn").cast("double") /
          (lit(1e6) * col("__nq").cast("double")), 6)
          .as("mean_recall"))
      .orderBy(col("d"))
  }
}
