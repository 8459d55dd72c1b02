package graft

/** DuckDB oracle SQL for the MinHash / SimHash / hyperplane-LSH family.
  *
  * The whole hash family was chosen to be engine-independent — splitmix64
  * ([[graft.functions.DedupFunctions.splitmix64]]) and FNV-1a
  * (`DedupFunctions.fnv1a64`) are pure 64-bit integer permutations — so
  * DuckDB can recompute the *exact* signatures with HUGEINT arithmetic
  * mod 2^64 and bitwise `xor`. Each generator below emits a single
  * statement (the driver executes one statement per oracle): a CTE chain
  * that tokenizes, shingles, hashes, and aggregates entirely in SQL.
  *
  * Arithmetic notes (all values held as HUGEINT in `[0, 2^64)`):
  *  - `x * C mod 2^64` for a 64-bit constant C is done by 32-bit split —
  *    every partial product stays under 2^65, inside HUGEINT range;
  *  - `>>> s` is `x // 2^s` (values are non-negative by representation);
  *  - signed results convert back via `x - 2^64` when `x >= 2^63`.
  */
object HashOracles {

  private val P64 = "18446744073709551616" // 2^64
  private val Gold = "11400714819323198485" // 0x9e3779b97f4a7c15
  private val M1 = java.lang.Long.parseUnsignedLong("bf58476d1ce4e5b9", 16)
  private val M2 = java.lang.Long.parseUnsignedLong("94d049bb133111eb", 16)
  private val FnvOffset = "14695981039346656037" // 0xcbf29ce484222325
  private val FnvPrime = "1099511628211" // 0x100000001b3
  private val SeedMult = java.lang.Long.parseUnsignedLong("ff51afd7ed558ccd", 16)

  /** The MinHash per-slot seed, computed on the JVM (same code path the
    * Spark UDF uses) and embedded as a literal — the oracle only needs to
    * replay the per-shingle mixing, not the seed derivation.
    */
  private def seed(i: Int): String = {
    val u = functions.DedupFunctions.splitmix64(i.toLong * SeedMult)
    if (u >= 0) u.toString else s"($u + $P64)" // as unsigned literal
  }

  /** SQL for `(a * b) mod 2^64`, `b` a compile-time 64-bit constant. */
  private def umul(a: String, b: Long): String = {
    val blo = b & 0xffffffffL
    val bhi = b >>> 32
    s"((($a) % 4294967296) * $blo" +
      s" + (((($a) % 4294967296) * $bhi" +
      s" + (($a) // 4294967296) * $blo) % 4294967296) * 4294967296) % $P64"
  }

  /** CTE stages applying splitmix64 in place to every column in `cols`
    * (seed-xor happens before these stages). Stepwise so each stage is a
    * readable projection instead of one thousand-char expression.
    */
  private def mixStages(cols: Seq[String], passthrough: Seq[String])
      : Seq[String] = {
    def stage(f: String => String): String = {
      val keep = if (passthrough.isEmpty) "" else passthrough.mkString("", ", ", ", ")
      s"SELECT $keep" + cols.map(c => s"${f(c)} AS $c").mkString(", ")
    }
    Seq(
      stage(c => s"($c + $Gold) % $P64"),
      stage(c => s"xor($c, $c // 1073741824)"), // >>> 30
      stage(c => umul(c, M1)),
      stage(c => s"xor($c, $c // 134217728)"), // >>> 27
      stage(c => umul(c, M2)),
      stage(c => s"xor($c, $c // 2147483648)") // >>> 31
    )
  }

  /** The canonical DuckDB tokenizer fragment — ONE definition shared with
    * `SparkEntry.oracleSql` (both must mirror `TextFunctions.tokens`).
    */
  val Toks: String =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

  /** FNV-1a 64 over a string column, one `list_reduce` fold per row.
    * `unicode()` yields the codepoint — identical to Java's
    * `charAt & 0xffff` for the BMP text this corpus carries.
    */
  private def fnv(s: String): String =
    s"list_reduce(list_prepend(CAST($FnvOffset AS HUGEINT), " +
      s"list_transform(range(1, length($s) + 1), " +
      s"i -> CAST(unicode(substring($s, i, 1)) AS HUGEINT))), " +
      s"(h, c) -> (xor(h, c) * $FnvPrime) % $P64)"

  private def toSigned(v: String): String =
    s"CAST(CASE WHEN $v >= 9223372036854775808 THEN $v - $P64 " +
      s"ELSE $v END AS BIGINT)"

  /** Length-prefixed field for the injective DP group key (`len:value`,
    * null as `n:`) — mirrors `Privacy.injectiveKey` exactly.
    */
  private def lpField(c: String): String =
    s"CASE WHEN CAST($c AS VARCHAR) IS NULL THEN 'n:' ELSE " +
      s"concat(CAST(length(CAST($c AS VARCHAR)) AS VARCHAR), ':', " +
      s"CAST($c AS VARCHAR)) END"

  /** CTE chain ending in `sigs(doc_id, s<i>...)`: signed MinHash slots
    * (k = 16, shingleLen = 3 — the [[operators.Dedup]] defaults). Docs with
    * zero tokens get Long.MaxValue slots, matching `minhashSigFast`.
    * `base` is the doc-set SQL (a table name or parenthesized subquery
    * with doc_id + text) so composed pipelines can band a filtered set.
    */
  private def minhashCtes(slots: Seq[Int], docFilter: String,
      base: String = "documents"): Seq[String] = {
    val cols = slots.map(i => s"s$i")
    val seedXors = slots
      .map(i => s"xor(hv, CAST(${seed(i)} AS HUGEINT)) AS s$i").mkString(", ")
    val head = Seq(
      s"tok AS (SELECT doc_id, $Toks AS t FROM $base$docFilter)",
      "shp AS (SELECT doc_id, len(t) AS n, t, " +
        "unnest(range(0, greatest(1, len(t) - 2))) AS i FROM tok " +
        "WHERE len(t) > 0)",
      "sh AS (SELECT doc_id, " +
        "array_to_string(t[i + 1 : least(n, i + 3)], ' ') AS sh FROM shp)",
      s"h0 AS (SELECT doc_id, ${fnv("sh")} AS hv FROM sh)",
      s"hx AS (SELECT doc_id, $seedXors FROM h0)"
    )
    val mixed = mixStages(cols, Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "hx" else s"mx${n - 1}"
        s"mx$n AS ($body FROM $prev)"
    }
    val mins = cols.map(c => s"min(${toSigned(c)}) AS $c").mkString(", ")
    val coal = cols
      .map(c => s"coalesce(s.$c, 9223372036854775807) AS $c").mkString(", ")
    head ++ mixed ++ Seq(
      s"sigs0 AS (SELECT doc_id, $mins FROM mx5 GROUP BY doc_id)",
      s"sigs AS (SELECT d.doc_id, $coal " +
        s"FROM (SELECT doc_id FROM $base$docFilter) d " +
        "LEFT JOIN sigs0 s USING (doc_id))"
    )
  }

  /** CTE chain ending in `cand(a_id, b_id)`: distinct LSH candidate pairs
    * (4 bands x 4 rows). Band-key equality in Spark is `xxhash64(slice)`
    * equality, which is slice equality (the oracle joins on the slice
    * itself; an xxhash64 collision across distinct slices is the only
    * divergence and is ~2^-64 per bucket).
    */
  private def bandedCtes(docFilter: String,
      base: String = "documents"): Seq[String] = {
    val sig = minhashCtes(0 until 16, docFilter, base)
    val bands = (0 until 4).map { b =>
      val key = (0 until 4)
        .map(r => s"CAST(s${4 * b + r} AS VARCHAR)").mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM sigs"
    }.mkString(" UNION ALL ")
    sig ++ Seq(
      s"banded AS ($bands)",
      "cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id " +
        "FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key " +
        "AND a.doc_id < b.doc_id)"
    )
  }

  /** CTE chain ending in `simh(doc_id, simhash, usim)` — signed SimHash
    * plus its unsigned form (for the `>>> 48` bucket).
    */
  private def simhashCtes(docFilter: String): Seq[String] = Seq(
    s"tok AS (SELECT doc_id, $Toks AS t FROM documents$docFilter)",
    "tw AS (SELECT doc_id, unnest(t) AS w FROM tok)",
    s"th AS (SELECT doc_id, ${fnv("w")} AS hv FROM tw)",
    "bits AS (SELECT doc_id, unnest(range(0, 64)) AS b, hv FROM th)",
    "bc AS (SELECT doc_id, b, sum(CASE WHEN " +
      "(hv // (CAST(1 AS HUGEINT) << CAST(b AS INTEGER))) % 2 = 1 " +
      "THEN 1 ELSE -1 END) AS cnt FROM bits GROUP BY doc_id, b)",
    "sig0 AS (SELECT doc_id, sum(CASE WHEN cnt > 0 " +
      "THEN CAST(1 AS HUGEINT) << CAST(b AS INTEGER) " +
      "ELSE CAST(0 AS HUGEINT) END) AS u FROM bc GROUP BY doc_id)",
    s"simh AS (SELECT d.doc_id, coalesce(${toSigned("u")}, 0) AS simhash, " +
      "coalesce(u, CAST(0 AS HUGEINT)) AS usim " +
      s"FROM (SELECT doc_id FROM documents$docFilter) d " +
      "LEFT JOIN sig0 s USING (doc_id))"
  )

  /** CTE chain ending in `pv(p, vec)`: the deterministic hyperplane matrix
    * of [[functions.VectorFunctions.deterministicPlanes]] (nPlanes = 8,
    * dim = 64), value = signed splitmix64(p*1000003 + d) / Long.MaxValue.
    */
  private def planesCtes(nPlanes: Int = 8, dim: Int = 64): Seq[String] = {
    val head = Seq(
      s"pd AS (SELECT p, unnest(range(0, $dim)) AS d " +
        s"FROM (SELECT unnest(range(0, $nPlanes)) AS p))",
      "pz AS (SELECT p, d, CAST(p * 1000003 + d AS HUGEINT) AS z FROM pd)"
    )
    val mixed = mixStages(Seq("z"), Seq("p", "d")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "pz" else s"pm${n - 1}"
        s"pm$n AS ($body FROM $prev)"
    }
    head ++ mixed ++ Seq(
      s"pv AS (SELECT p, list(CAST(${toSigned("z")} AS DOUBLE) " +
        "/ 9223372036854775807 ORDER BY d) AS vec FROM pm5 GROUP BY p)"
    )
  }

  /** Left-fold projection of a vector onto plane `pv.vec` — the same
    * accumulation order as `aggregate(zip_with(...))` on the Spark side,
    * so the IEEE sums are bit-identical and sign tests agree.
    */
  private def projection(vec: String): String =
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, 65), j -> CAST($vec[j] AS DOUBLE) * pv.vec[j])), " +
      "(a, x) -> a + x)"

  private def bucketCtes(extraCols: String = ""): Seq[String] =
    planesCtes() ++ Seq(
      s"proj AS (SELECT e.vec_id$extraCols, pv.p, " +
        s"${projection("e.embedding")} AS pr FROM embeddings e CROSS JOIN pv pv)",
      "sigs AS (SELECT vec_id" +
        (if (extraCols.nonEmpty) ", any_value(embedding) AS embedding" else "") +
        ", sum(CASE WHEN pr >= 0.0 " +
        "THEN CAST(1 AS BIGINT) << CAST(p AS INTEGER) ELSE 0 END) AS bucket " +
        "FROM proj GROUP BY vec_id)"
    )

  private def withClause(parts: Seq[String], select: String): String =
    parts.mkString("WITH ", ",\n", "\n") + select

  // ---- public: one oracle per rows-only gate entry ---------------------

  val q17MinhashSignatures: String = withClause(
    minhashCtes(Seq(0, 15), ""),
    "SELECT doc_id, s0 AS minhash0, s15 AS minhash15 FROM sigs ORDER BY doc_id")

  val q18MinhashCandidates: String = withClause(
    bandedCtes(""),
    "SELECT count(*) AS n_candidate_pairs FROM cand")

  val q19Simhash: String = withClause(
    simhashCtes(""),
    "SELECT count(*) AS n_docs, count(DISTINCT simhash) AS n_distinct_sigs FROM simh")

  val q52SimhashPairs: String = withClause(
    simhashCtes(" WHERE doc_id < 300") :+
      ("pairs AS (SELECT bit_count(xor(a.simhash, b.simhash)) AS hamming " +
        "FROM simh a JOIN simh b " +
        "ON a.usim // 281474976710656 = b.usim // 281474976710656 " + // >>> 48
        "AND a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.simhash, b.simhash)) <= 16)"),
    "SELECT count(*) AS n_pairs, " +
      "CAST(coalesce(min(hamming), -1) AS INTEGER) AS min_hamming FROM pairs")

  /** Jaccard-verify (>= 0.9 over distinct tokens) + recursive transitive
    * closure over `cand`, ending in `reach(node, component)`. `docSetSql`
    * restricts the doc universe (a WHERE or JOIN clause suffix on
    * `documents`). Shared by the q51 and q64 oracles.
    */
  private def closureCtes(docSetSql: String): Seq[String] = Seq(
    s"dt AS (SELECT doc_id, list_distinct($Toks) AS toks " +
      s"FROM documents $docSetSql)",
    // MATERIALIZED: ver sits under the recursive closure AND under
    // multiple scalar-subquery consumers (q279/q280's five-way
    // summaries) — without the pin DuckDB re-inlines the whole
    // minhash+verify chain per consumer (q280's oracle alone cost
    // 131 s of the round-14 compare pass; pinned it is ~2 s)
    "ver AS MATERIALIZED (SELECT c.a_id, c.b_id FROM cand c " +
      "JOIN dt a ON a.doc_id = c.a_id JOIN dt b ON b.doc_id = c.b_id " +
      "WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) " +
      "/ len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9)",
    "edges AS (SELECT a_id AS s, b_id AS d FROM ver " +
      "UNION SELECT b_id, a_id FROM ver)",
    "nodes AS (SELECT DISTINCT s AS node FROM edges)",
    "reach AS (WITH RECURSIVE r(node, lbl) AS (" +
      "SELECT node, node FROM nodes UNION " +
      "SELECT e.d, r.lbl FROM r JOIN edges e ON e.s = r.node) " +
      "SELECT node, min(lbl) AS component FROM r GROUP BY node)")

  val q51DedupCorpus: String = withClause(
    bandedCtes(" WHERE doc_id < 300") ++
      closureCtes("WHERE doc_id < 300") ++ Seq(
      "lab AS (SELECT d.doc_id, coalesce(r.component, d.doc_id) AS component " +
        "FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d " +
        "LEFT JOIN reach r ON r.node = d.doc_id)"),
    "SELECT count(*) AS n_docs, " +
      "CAST(sum(CASE WHEN component = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical, " +
      "count(DISTINCT component) AS n_clusters FROM lab")

  /** q51's cluster chain + per-cluster best-member re-election
    * ([[operators.Dedup.electCanonicalByScore]]): the rank-1 row by
    * (n_chars desc, doc_id) survives each multi-member cluster.
    */
  val q127KeepBestDedup: String = withClause(
    bandedCtes(" WHERE doc_id < 300") ++
      closureCtes("WHERE doc_id < 300") ++ Seq(
      "lab AS (SELECT d.doc_id, d.n_chars, " +
        "coalesce(r.component, d.doc_id) AS component " +
        "FROM (SELECT doc_id, n_chars FROM documents WHERE doc_id < 300) d " +
        "LEFT JOIN reach r ON r.node = d.doc_id)",
      "rk AS (SELECT doc_id, n_chars, component, row_number() OVER " +
        "(PARTITION BY component ORDER BY n_chars DESC, doc_id) AS rn " +
        "FROM lab)"),
    "SELECT component, count(*) AS n_members, " +
      "max(CASE WHEN rn = 1 THEN doc_id END) AS keep_id, " +
      "max(CASE WHEN rn = 1 THEN n_chars END) AS keep_chars " +
      "FROM rk GROUP BY component HAVING count(*) > 1 ORDER BY component")

  /** q51's cluster chain + soft-dedup weighting
    * ([[operators.Dedup.softDedupWeights]]): every member keeps weight
    * `1/|cluster|`; per-source raw vs effective token mass.
    */
  val q139SoftDedupMass: String = withClause(
    bandedCtes(" WHERE doc_id < 300") ++
      closureCtes("WHERE doc_id < 300") ++ Seq(
      "lab AS (SELECT d.doc_id, d.source, d.nt, " +
        "coalesce(r.component, d.doc_id) AS component " +
        s"FROM (SELECT doc_id, source, len($Toks) AS nt " +
        "FROM documents WHERE doc_id < 300) d " +
        "LEFT JOIN reach r ON r.node = d.doc_id)",
      "cs AS (SELECT component, count(*) AS k FROM lab GROUP BY 1)"),
    "SELECT source, count(*) AS n_docs, " +
      "CAST(sum(nt) AS BIGINT) AS raw_tokens, " +
      "round(sum(nt * 1.0 / k), 4) AS effective_tokens " +
      "FROM lab JOIN cs USING (component) " +
      "GROUP BY source ORDER BY source")

  val q23LshBuckets: String = withClause(
    bucketCtes() :+
      "bk AS (SELECT bucket, count(*) AS n_vectors FROM sigs GROUP BY bucket)",
    "SELECT count(*) AS n_buckets, max(n_vectors) AS max_bucket FROM bk")

  val q53LshTopK: String = withClause(
    bucketCtes(", e.embedding") ++ Seq(
      "qv AS (SELECT bucket, embedding AS q_emb FROM sigs WHERE vec_id = 0)",
      "res AS (SELECT s.vec_id, list_cosine_similarity(" +
        "CAST(s.embedding AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[])) AS cos " +
        "FROM sigs s JOIN qv q ON s.bucket = q.bucket " +
        "ORDER BY cos DESC, s.vec_id LIMIT 10)"),
    "SELECT count(*) AS n_results, round(max(cos), 4) AS best_cos FROM res")

  /** The block-rotation variant is pigeonhole-exact (4 tables > 3 max
    * differing bits), so its oracle is the brute-force all-pairs scan —
    * the strongest possible check that the banded join loses nothing.
    */
  val q54SimhashBlocked: String = withClause(
    simhashCtes(" WHERE doc_id < 300") :+
      ("pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, " +
        "bit_count(xor(a.simhash, b.simhash)) AS hamming " +
        "FROM simh a JOIN simh b ON a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)"),
    "SELECT a_id, b_id, CAST(hamming AS INTEGER) AS hamming " +
      "FROM pairs ORDER BY 1, 2")

  /** Multi-probe LSH replay: perturbation masks scored by the summed
    * |projection| of their flipped planes, folded in ascending-bit order
    * (the same left fold as `VectorFunctions.multiProbeBuckets` — adding
    * 0.0 for unset bits is IEEE-exact), ranked by (score, mask).
    */
  val q55LshMultiprobe: String = withClause(
    bucketCtes(", e.embedding") ++ Seq(
      "qp AS (SELECT list(pr ORDER BY p) AS prs FROM proj WHERE vec_id = 0)",
      "qb AS (SELECT bucket, embedding AS q_emb FROM sigs WHERE vec_id = 0)",
      "scored AS (SELECT m, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(range(0, 8), b -> CASE " +
        "WHEN (m // (1 << CAST(b AS INTEGER))) % 2 = 1 " +
        "THEN abs(prs[CAST(b AS INTEGER) + 1]) ELSE CAST(0.0 AS DOUBLE) END)), " +
        "(a, x) -> a + x) AS score " +
        "FROM (SELECT unnest(range(1, 256)) AS m), qp)",
      "probes AS (SELECT xor(qb.bucket, f.m) AS bucket FROM " +
        "(SELECT m FROM scored ORDER BY score, m LIMIT 7) f, qb " +
        "UNION SELECT bucket FROM qb)",
      "res AS (SELECT s.vec_id, list_cosine_similarity(" +
        "CAST(s.embedding AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[])) AS cos " +
        "FROM sigs s JOIN probes USING (bucket) CROSS JOIN qb q " +
        "ORDER BY cos DESC, s.vec_id LIMIT 10)"),
    "SELECT count(*) AS n_results, round(max(cos), 4) AS best_cos FROM res")

  /** Retrieval-eval replay (q231, [[operators.RankEval.vsTruth]]):
    * the q55 multi-probe candidate chain (query vector excluded),
    * ranked; the exact brute-force top-10 as truth; recall/MRR exact
    * rationals off the integer ranks, and both DCG folds over SORTED
    * rank lists (list_sort + left fold — the same ascending-order
    * float accumulation as the Spark side's array_sort + aggregate).
    */
  val q231RetrievalEval: String = withClause(
    bucketCtes(", e.embedding") ++ Seq(
      "qp AS (SELECT list(pr ORDER BY p) AS prs FROM proj WHERE vec_id = 0)",
      "qb AS (SELECT bucket, embedding AS q_emb FROM sigs WHERE vec_id = 0)",
      "scored AS (SELECT m, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(range(0, 8), b -> CASE " +
        "WHEN (m // (1 << CAST(b AS INTEGER))) % 2 = 1 " +
        "THEN abs(prs[CAST(b AS INTEGER) + 1]) ELSE CAST(0.0 AS DOUBLE) END)), " +
        "(a, x) -> a + x) AS score " +
        "FROM (SELECT unnest(range(1, 256)) AS m), qp)",
      "probes AS (SELECT xor(qb.bucket, f.m) AS bucket FROM " +
        "(SELECT m FROM scored ORDER BY score, m LIMIT 7) f, qb " +
        "UNION SELECT bucket FROM qb)",
      "res AS (SELECT vec_id, row_number() OVER (ORDER BY cos DESC, " +
        "vec_id) AS rank FROM (SELECT s.vec_id, " +
        "list_cosine_similarity(CAST(s.embedding AS DOUBLE[]), " +
        "CAST(q.q_emb AS DOUBLE[])) AS cos " +
        "FROM sigs s JOIN probes USING (bucket) CROSS JOIN qb q " +
        "WHERE s.vec_id <> 0) ORDER BY rank LIMIT 10)",
      "tr AS (SELECT b.vec_id FROM embeddings a, embeddings b " +
        "WHERE a.vec_id = 0 AND b.vec_id <> 0 " +
        "ORDER BY list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), " +
        "CAST(a.embedding AS DOUBLE[])) DESC, b.vec_id LIMIT 10)",
      "ht AS (SELECT r.rank FROM res r JOIN tr USING (vec_id))",
      "ag AS (SELECT CAST(count(*) AS BIGINT) AS n_hit, min(rank) AS r1, " +
        "coalesce(list_sort(list(rank)), CAST([] AS BIGINT[])) AS rs " +
        "FROM ht)"),
    "SELECT CAST(10 AS INTEGER) AS k, CAST(10 AS BIGINT) AS n_truth, " +
      "n_hit, round(CAST(n_hit AS DOUBLE) / 10, 4) AS recall_at_k, " +
      "round(1.0 / r1, 4) AS mrr, " +
      "round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      "list_transform(rs, r -> 1.0 / log2(r + 1.0))), (a, x) -> a + x) " +
      "/ list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      "list_transform(range(1, 11), i -> " +
      "1.0 / log2(CAST(i AS DOUBLE) + 1.0))), (a, x) -> a + x), 4) " +
      "AS ndcg_at_k FROM ag")

  /** Keyed retrieval-eval replay (q232,
    * [[operators.RankEval.vsTruthBy]]): the q85 argmax-assignment
    * chain shared by all vectors, per-query candidates = the query's
    * list (keyed equi-join), exact per-query top-10 truth, and the
    * per-query metric algebra — zero-hit queries kept through the
    * right join (coalesced counts, null MRR).
    */
  val q232RetrievalEvalBy: String = withClause(
    planesCtes(16) ++ Seq(
      "proj AS (SELECT e.vec_id, e.embedding, pv.p, " +
        s"${projection("e.embedding")} AS pr " +
        "FROM embeddings e CROSS JOIN pv pv)",
      "asg AS (SELECT vec_id, embedding, p AS list_id FROM " +
        "(SELECT vec_id, embedding, p, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY pr DESC, p DESC) AS rk FROM proj) " +
        "WHERE rk = 1)",
      "qs AS (SELECT vec_id AS qid, list_id, embedding AS q_emb " +
        "FROM asg WHERE vec_id IN (0, 1, 2))",
      "cd AS (SELECT qid, vec_id, rank FROM (SELECT q.qid, s.vec_id, " +
        "row_number() OVER (PARTITION BY q.qid ORDER BY " +
        "list_cosine_similarity(CAST(s.embedding AS DOUBLE[]), " +
        "CAST(q.q_emb AS DOUBLE[])) DESC, s.vec_id) AS rank " +
        "FROM asg s JOIN qs q ON s.list_id = q.list_id " +
        "AND s.vec_id <> q.qid) WHERE rank <= 10)",
      "tr AS (SELECT qid, vec_id FROM (SELECT q.qid, b.vec_id, " +
        "row_number() OVER (PARTITION BY q.qid ORDER BY " +
        "list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), " +
        "CAST(q.q_emb AS DOUBLE[])) DESC, b.vec_id) AS rk " +
        "FROM embeddings b, qs q WHERE b.vec_id <> q.qid) " +
        "WHERE rk <= 10)",
      "nt AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_truth FROM tr " +
        "GROUP BY qid)",
      "ht AS (SELECT cd.qid, cd.rank FROM cd JOIN tr " +
        "USING (qid, vec_id))",
      "ag AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_hit, " +
        "min(rank) AS r1, list_sort(list(rank)) AS rs FROM ht " +
        "GROUP BY qid)"),
    "SELECT nt.qid, nt.n_truth, coalesce(ag.n_hit, 0) AS n_hit, " +
      "round(CAST(coalesce(ag.n_hit, 0) AS DOUBLE) / nt.n_truth, 4) " +
      "AS recall_at_k, round(1.0 / ag.r1, 4) AS mrr, " +
      "round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      "list_transform(coalesce(ag.rs, CAST([] AS BIGINT[])), " +
      "r -> 1.0 / log2(r + 1.0))), (a, x) -> a + x) " +
      "/ list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      "list_transform(range(1, CAST(least(10, " +
      "greatest(nt.n_truth, 1)) AS BIGINT) + 1), i -> " +
      "1.0 / log2(CAST(i AS DOUBLE) + 1.0))), (a, x) -> a + x), 4) " +
      "AS ndcg_at_k " +
      "FROM nt LEFT JOIN ag USING (qid) ORDER BY qid")

  /** Incremental-dedup replay: band join restricted to new x existing,
    * verify = slot-equality count / 16 (the MinHash Jaccard estimator).
    */
  val q65IncrementalDedup: String = {
    val eq = (0 until 16)
      .map(i => s"CASE WHEN sa.s$i = sb.s$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    withClause(bandedCtes("") ++ Seq(
      "cands AS (SELECT a.doc_id AS new_id, b.doc_id AS index_id, " +
        s"($eq) / 16.0 AS est " +
        "FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key " +
        "AND a.doc_id >= 250 AND b.doc_id < 250 " +
        "JOIN sigs sa ON sa.doc_id = a.doc_id " +
        "JOIN sigs sb ON sb.doc_id = b.doc_id)",
      "m AS (SELECT new_id, min(index_id) AS matched FROM cands " +
        "WHERE est >= 0.5 GROUP BY new_id)"),
      "SELECT count(*) AS n_new, " +
        "CAST(sum(CASE WHEN m.matched IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup, " +
        "coalesce(min(m.matched), -1) AS first_match " +
        "FROM (SELECT doc_id FROM documents WHERE doc_id >= 250) d " +
        "LEFT JOIN m ON m.new_id = d.doc_id")
  }

  /** Rolling hash replay: per token FNV-1a (nested lambda), then the
    * base-31 left fold in HUGEINT mod 2^64 (JVM long wrap-around).
    */
  val q58RollingHash: String = withClause(
    Seq(
      s"tk AS (SELECT doc_id, $Toks AS t FROM documents)",
      s"hs AS (SELECT doc_id, list_transform(t, w -> ${fnv("w")}) AS hv FROM tk)",
      "acc AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS HUGEINT), hv), " +
        s"(a, h) -> (a * 31 + h) % $P64) AS r FROM hs)"),
    s"SELECT doc_id, ${toSigned("r")} AS rhash FROM acc ORDER BY doc_id")

  /** Stratified-sample replay: pmod(signed splitmix64(doc_id), 10000)
    * against the per-language thresholds (en 50%, de 25%, default 10%).
    */
  val q59StratifiedSample: String = {
    val head = Seq(
      "dz AS (SELECT doc_id, lang, CAST(doc_id AS HUGEINT) AS z FROM documents)")
    val mixed = mixStages(Seq("z"), Seq("doc_id", "lang")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
    }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    withClause(head ++ mixed ++ Seq(
      s"kept AS (SELECT doc_id, lang FROM dm5 WHERE $signedMod < " +
        "CASE WHEN lang = 'en' THEN 5000 WHEN lang = 'de' THEN 2500 " +
        "ELSE 1000 END)"),
      "SELECT lang, count(*) AS n_sampled FROM kept GROUP BY lang ORDER BY lang")
  }

  /** Temperature-mixing replay (T = 0.5 over lang strata): per-stratum
    * keep threshold = `sqrt(c_min / c_s) * 10000` in DOUBLE — sqrt and
    * division are IEEE-correctly-rounded, so DuckDB's doubles equal the
    * JVM's bit-for-bit and the bucket comparison replays exactly
    * ([[operators.Sampling.temperatureRates]]).
    */
  val q66TemperatureSample: String = {
    val head = Seq(
      "cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang)",
      "ref AS (SELECT min(c) AS cref FROM cnt)",
      "rates AS (SELECT lang, sqrt(CAST(cref AS DOUBLE) / CAST(c AS DOUBLE)) " +
        "* 10000 AS thr FROM cnt, ref)",
      "dz AS (SELECT doc_id, lang, CAST(doc_id AS HUGEINT) AS z FROM documents)")
    val mixed = mixStages(Seq("z"), Seq("doc_id", "lang")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
    }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    withClause(head ++ mixed ++ Seq(
      s"kept AS (SELECT d.doc_id, d.lang FROM dm5 d JOIN rates r " +
        s"USING (lang) WHERE $signedMod < r.thr)"),
      "SELECT lang, count(*) AS n_sampled FROM kept GROUP BY lang ORDER BY lang")
  }

  /** Epoch-order replay: key = splitmix64(splitmix64(doc_id) XOR epoch).
    * XOR acts on raw bits, so the unsigned HUGEINT replay and the JVM's
    * signed-long path agree; the 10-row prefix pins the full permutation
    * prefix (key AND id order).
    */
  def q67EpochOrder(epoch: Int): String = {
    val head = Seq(
      "dz AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS z FROM documents)")
    def rounds(tag: String, from: String): Seq[String] =
      mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map { case (body, n) =>
        val prev = if (n == 0) from else s"$tag${n - 1}"
        s"$tag$n AS ($body FROM $prev)"
      }
    val first = rounds("ma", "dz")
    val xorStage = Seq(
      s"mx AS (SELECT doc_id, xor(z, $epoch) AS z FROM ma5)")
    val second = rounds("mb", "mx")
    withClause(head ++ first ++ xorStage ++ second,
      s"SELECT doc_id, ${toSigned("z")} AS epoch_key FROM mb5 " +
        "ORDER BY epoch_key, doc_id LIMIT 10")
  }

  /** Curriculum-order replay: quality-score decile bands (integer grid,
    * `scoreSql` supplied by the caller — the same fragment the q25 oracle
    * uses), epoch-permuted within each band via the q67 double-mix.
    */
  def q73CurriculumOrder(scoreSql: String, epoch: Int): String = {
    val head = Seq(
      s"sc AS (SELECT doc_id, $scoreSql AS score FROM documents)",
      "dz AS (SELECT doc_id, score, CAST(doc_id AS HUGEINT) AS z FROM sc)")
    def rounds(tag: String, from: String): Seq[String] =
      mixStages(Seq("z"), Seq("doc_id", "score")).zipWithIndex.map {
        case (body, n) =>
          val prev = if (n == 0) from else s"$tag${n - 1}"
          s"$tag$n AS ($body FROM $prev)"
      }
    val first = rounds("ma", "dz")
    val xorStage = Seq(
      s"mx AS (SELECT doc_id, score, xor(z, $epoch) AS z FROM ma5)")
    val second = rounds("mb", "mx")
    withClause(head ++ first ++ xorStage ++ second,
      "SELECT doc_id, CAST(score AS INTEGER) AS score, " +
        "CAST(score // 10 AS BIGINT) AS bucket, " +
        s"${toSigned("z")} AS epoch_key FROM mb5 " +
        "ORDER BY bucket DESC, epoch_key, doc_id LIMIT 15")
  }

  /** Fixed-count-per-stratum replay: row_number within each stratum over
    * (signed splitmix64(doc_id), doc_id), keep rank ≤ n.
    */
  def q75FixedPerStratum(n: Int): String = {
    val head = Seq(
      "dz AS (SELECT doc_id, lang, CAST(doc_id AS HUGEINT) AS z FROM documents)")
    val mixed = mixStages(Seq("z"), Seq("doc_id", "lang")).zipWithIndex.map {
      case (body, i) =>
        val prev = if (i == 0) "dz" else s"dm${i - 1}"
        s"dm$i AS ($body FROM $prev)"
    }
    withClause(head ++ mixed :+
      ("rk AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang " +
        s"ORDER BY ${toSigned("z")}, doc_id) AS rk FROM dm5)"),
      s"SELECT lang, doc_id FROM rk WHERE rk <= $n ORDER BY lang, doc_id")
  }

  /** Cluster-size histogram over the verified near-dup closure: size →
    * number of clusters (singletons included — docs untouched by any
    * verified pair count as size-1 clusters).
    */
  val q81ClusterHistogram: String = withClause(
    bandedCtes(" WHERE doc_id < 300") ++
      closureCtes("WHERE doc_id < 300") ++ Seq(
      "lab AS (SELECT d.doc_id, coalesce(r.component, d.doc_id) " +
        "AS component FROM (SELECT doc_id FROM documents " +
        "WHERE doc_id < 300) d LEFT JOIN reach r ON r.node = d.doc_id)",
      "cs AS (SELECT component, count(*) AS sz FROM lab GROUP BY component)"),
    "SELECT sz AS cluster_size, count(*) AS n_clusters FROM cs " +
      "GROUP BY sz ORDER BY sz")

  /** Cross-source duplication matrix: LSH candidates → Jaccard ≥ 0.9
    * verify (the shared `ver` fragment), pair sources normalized with
    * least/greatest, counted. ASCII source names order identically under
    * UTF-8 (DuckDB) and UTF-16 (JVM).
    */
  val q80SourceDupMatrix: String = withClause(
    bandedCtes(" WHERE doc_id < 300") ++
      closureCtes("WHERE doc_id < 300").take(2) ++ Seq( // dt + ver only
      "sp AS (SELECT least(da.source, db.source) AS source_a, " +
        "greatest(da.source, db.source) AS source_b " +
        "FROM ver v JOIN documents da ON da.doc_id = v.a_id " +
        "JOIN documents db ON db.doc_id = v.b_id)"),
    "SELECT source_a, source_b, count(*) AS n_pairs FROM sp " +
      "GROUP BY source_a, source_b ORDER BY source_a, source_b")

  /** Token-budget selection replay (two-phase, mirroring
    * [[operators.CorpusSelection.selectByTokenBudget]]): per-score token
    * totals cumulated in descending score order; buckets with
    * cumulative ≤ budget taken whole; the single boundary bucket ranked
    * by (signed splitmix64(doc_id), doc_id) with a running token sum
    * against the remaining budget.
    */
  /** The token-budget selection chain, ending in
    * `sel(doc_id, score, n)` — shared by q79 (accounting tail) and
    * q131 (packing tail).
    */
  private def budgetSelCtes(scoreSql: String,
      budget: Long): Seq[String] = {
    val head = Seq(
      s"base AS (SELECT doc_id, $scoreSql AS score, " +
        s"len($Toks) AS n FROM documents)",
      "bt AS (SELECT score, CAST(sum(n) AS BIGINT) AS btok " +
        "FROM base GROUP BY score)",
      "cum AS (SELECT score, btok, CAST(sum(btok) OVER " +
        "(ORDER BY score DESC) AS BIGINT) AS cumtok FROM bt)",
      s"fullb AS (SELECT score FROM cum WHERE cumtok <= $budget)",
      s"co AS (SELECT score AS cscore, $budget - (cumtok - btok) " +
        s"AS remaining FROM cum WHERE cumtok > $budget " +
        "ORDER BY score DESC LIMIT 1)",
      "bd AS (SELECT b.doc_id, b.score, b.n, " +
        "CAST(b.doc_id AS HUGEINT) AS z FROM base b " +
        "JOIN co ON b.score = co.cscore)")
    val mixed = mixStages(Seq("z"), Seq("doc_id", "score", "n"))
      .zipWithIndex.map { case (body, i) =>
        val prev = if (i == 0) "bd" else s"bm${i - 1}"
        s"bm$i AS ($body FROM $prev)"
      }
    head ++ mixed ++ Seq(
      s"bsel AS (SELECT r.doc_id, r.score, r.n FROM " +
        s"(SELECT doc_id, score, n, sum(n) OVER (ORDER BY " +
        s"${toSigned("z")}, doc_id ROWS UNBOUNDED PRECEDING) AS cumn " +
        "FROM bm5) r, co WHERE r.cumn <= co.remaining)",
      "sel AS (SELECT b.doc_id, b.score, b.n FROM base b " +
        "JOIN fullb USING (score) " +
        "UNION ALL SELECT doc_id, score, n FROM bsel)")
  }

  def q79TokenBudget(scoreSql: String, budget: Long): String =
    withClause(budgetSelCtes(scoreSql, budget),
      "SELECT count(*) AS n_selected, " +
        "CAST(coalesce(sum(n), 0) AS BIGINT) AS total_tokens, " +
        "CAST(coalesce(min(score), -1) AS INTEGER) AS min_score FROM sel")

  /** Capstone #8 replay: the q79 budget selection chained into the
    * q125 concat-and-chunk packing of the SURVIVORS (id order, running
    * offset, integer floor-division spans), summarized per sequence —
    * every sequence must fill to `seqLen` except the last.
    */
  def q131SelectAndPack(scoreSql: String, budget: Long,
      seqLen: Int): String =
    withClause(budgetSelCtes(scoreSql, budget) ++ Seq(
      "soff AS (SELECT doc_id, n, CAST(coalesce(sum(n) OVER " +
        "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "1 PRECEDING), 0) AS BIGINT) AS o FROM sel WHERE n > 0)",
      s"sp AS (SELECT doc_id, n, o, unnest(range(o // $seqLen, " +
        s"(o + n - 1) // $seqLen + 1)) AS seq_id FROM soff)",
      s"spans AS (SELECT seq_id, doc_id, " +
        s"least(o + n, (seq_id + 1) * $seqLen) - " +
        s"greatest(o, seq_id * $seqLen) AS t FROM sp)"),
      "SELECT seq_id, count(*) AS n_docs, " +
        "CAST(sum(t) AS BIGINT) AS n_tokens FROM spans " +
        "GROUP BY seq_id ORDER BY seq_id")

  /** Bloom-decontamination replay: rebuilds the EXACT bitmap the Spark
    * side builds (bit j of gram g at `splitmix64(fnv1a64(g) XOR j) mod
    * 2^16`, k = 4) as a distinct-position set, then flags corpus docs
    * with any gram whose 4 positions are all present — INCLUDING any
    * deterministic false positives, which is the point: the one-sided
    * error is part of the operator's contract and both engines must
    * agree on it bit-for-bit.
    */
  val q71BloomDecontaminate: String = {
    val K = 4
    val M = 65536
    def grams5(src: String): String =
      s"CASE WHEN len($src) >= 5 THEN list_transform(range(0, len($src) - 4), " +
        s"i -> array_to_string($src[i + 1 : i + 5], ' ')) " +
        s"ELSE [array_to_string($src, ' ')] END"
    val head = Seq(
      s"btk AS (SELECT $Toks AS t FROM documents WHERE doc_id < 10)",
      s"bgr AS (SELECT DISTINCT unnest(${grams5("t")}) AS gram FROM btk)",
      s"bh AS (SELECT xor(${fnv("gram")}, CAST(j AS HUGEINT)) AS z " +
        s"FROM bgr, (SELECT unnest(range(0, $K)) AS j))")
    val bmix = mixStages(Seq("z"), Seq()).zipWithIndex.map { case (b, i) =>
      s"bm$i AS ($b FROM ${if (i == 0) "bh" else s"bm${i - 1}"})"
    }
    val bp = Seq(s"bp AS (SELECT DISTINCT z % $M AS pos FROM bm5)")
    val corp = Seq(
      s"ctk AS (SELECT doc_id, $Toks AS t FROM documents WHERE doc_id >= 10)",
      s"cgr AS (SELECT doc_id, unnest(list_distinct(${grams5("t")})) " +
        "AS gram FROM ctk)",
      s"ch AS (SELECT doc_id, gram, j, " +
        s"xor(${fnv("gram")}, CAST(j AS HUGEINT)) AS z " +
        s"FROM cgr, (SELECT unnest(range(0, $K)) AS j))")
    val cmix = mixStages(Seq("z"), Seq("doc_id", "gram", "j"))
      .zipWithIndex.map { case (b, i) =>
        s"cm$i AS ($b FROM ${if (i == 0) "ch" else s"cm${i - 1}"})"
      }
    val tail = Seq(
      s"cp AS (SELECT doc_id, gram, z % $M AS pos FROM cm5)",
      "hit AS (SELECT DISTINCT doc_id FROM (SELECT doc_id, gram " +
        s"FROM cp JOIN bp USING (pos) GROUP BY doc_id, gram " +
        s"HAVING count(*) = $K))")
    withClause(head ++ bmix ++ bp ++ corp ++ cmix ++ tail,
      "SELECT count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_flagged " +
        "FROM (SELECT doc_id FROM documents WHERE doc_id >= 10) d " +
        "LEFT JOIN hit h USING (doc_id)")
  }

  /** Capstone-2 replay — the round-4 stages chained: per-doc boilerplate
    * accounting → bloom-bitmap decontamination over the kept set →
    * temperature-0.5 mixing with rates computed from the CLEAN set.
    * Every fragment is the one its standalone oracle (q68/q71/q66)
    * already verifies; the chain pins that the COMPOSITION matches too.
    */
  val q78CorpusPipelineV2: String = {
    val K = 4
    val M = 65536
    def grams5(src: String): String =
      s"CASE WHEN len($src) >= 5 THEN list_transform(range(0, len($src) - 4), " +
        s"i -> array_to_string($src[i + 1 : i + 5], ' ')) " +
        s"ELSE [array_to_string($src, ' ')] END"
    val head = Seq(
      s"tk AS (SELECT doc_id, lang, $Toks AS t FROM documents " +
        "WHERE doc_id >= 10)",
      // boilerplate accounting over the corpus (q68 fragment)
      s"g AS (SELECT doc_id, unnest(list_distinct(${grams5("t")})) " +
        "AS gram FROM tk)",
      "dfq AS (SELECT gram, count(*) AS df FROM g GROUP BY gram)",
      "freq AS (SELECT gram FROM dfq WHERE df >= 3)",
      "per AS (SELECT g.doc_id, count(*) AS n_grams, " +
        "CAST(sum(CASE WHEN f.gram IS NOT NULL THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_frequent " +
        "FROM g LEFT JOIN freq f USING (gram) GROUP BY g.doc_id)",
      "bpk AS (SELECT doc_id FROM per WHERE NOT " +
        "(CAST(n_frequent AS DOUBLE) > CAST(n_grams AS DOUBLE) * 0.5))",
      // bench bloom bitmap (q71 fragment)
      s"btk AS (SELECT $Toks AS t FROM documents WHERE doc_id < 10)",
      s"bgr AS (SELECT DISTINCT unnest(${grams5("t")}) AS gram FROM btk)",
      s"bh AS (SELECT xor(${fnv("gram")}, CAST(j AS HUGEINT)) AS z " +
        s"FROM bgr, (SELECT unnest(range(0, $K)) AS j))")
    val bmix = mixStages(Seq("z"), Seq()).zipWithIndex.map { case (b, i) =>
      s"bm$i AS ($b FROM ${if (i == 0) "bh" else s"bm${i - 1}"})"
    }
    val bposCte = Seq(s"bpos AS (SELECT DISTINCT z % $M AS pos FROM bm5)")
    val corp = Seq(
      // probe only boilerplate survivors (g is already per-doc distinct)
      "cgr AS (SELECT g.doc_id, g.gram FROM g JOIN bpk USING (doc_id))",
      s"ch AS (SELECT doc_id, gram, j, " +
        s"xor(${fnv("gram")}, CAST(j AS HUGEINT)) AS z " +
        s"FROM cgr, (SELECT unnest(range(0, $K)) AS j))")
    val cmix = mixStages(Seq("z"), Seq("doc_id", "gram", "j"))
      .zipWithIndex.map { case (b, i) =>
        s"cm$i AS ($b FROM ${if (i == 0) "ch" else s"cm${i - 1}"})"
      }
    val mid = Seq(
      s"cp AS (SELECT doc_id, gram, z % $M AS pos FROM cm5)",
      "hit AS (SELECT DISTINCT doc_id FROM (SELECT doc_id, gram " +
        s"FROM cp JOIN bpos USING (pos) GROUP BY doc_id, gram " +
        s"HAVING count(*) = $K))",
      "clean AS (SELECT b.doc_id FROM bpk b WHERE b.doc_id NOT IN " +
        "(SELECT doc_id FROM hit))",
      "cl AS (SELECT c.doc_id, tk.lang, len(tk.t) AS n " +
        "FROM clean c JOIN tk USING (doc_id))",
      // temperature-0.5 rates from the CLEAN set (q66 fragment)
      "cnt AS (SELECT lang, count(*) AS c FROM cl GROUP BY lang)",
      "ref AS (SELECT min(c) AS cref FROM cnt)",
      "rates AS (SELECT lang, sqrt(CAST(cref AS DOUBLE) / " +
        "CAST(c AS DOUBLE)) * 10000 AS thr FROM cnt, ref)",
      "kz AS (SELECT doc_id, lang, n, CAST(doc_id AS HUGEINT) AS z FROM cl)")
    val kmix = mixStages(Seq("z"), Seq("doc_id", "lang", "n"))
      .zipWithIndex.map { case (b, i) =>
        s"km$i AS ($b FROM ${if (i == 0) "kz" else s"km${i - 1}"})"
      }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    withClause(head ++ bmix ++ bposCte ++ corp ++ cmix ++ mid ++ kmix,
      "SELECT count(*) AS n_docs, " +
        "CAST(coalesce(sum(n), 0) AS BIGINT) AS total_tokens " +
        "FROM km5 k JOIN rates r USING (lang) " +
        s"WHERE $signedMod < r.thr")
  }

  /** End-to-end corpus-pipeline replay (quality keep → benchmark
    * decontamination → MinHash-LSH dedup canonical → deterministic 50%
    * sample), reusing every verified fragment: threshold CASE logic,
    * n-gram collision, the banded-signature chain over the CLEAN doc
    * set, the recursive-CTE closure, and the splitmix64 sample replay.
    */
  val q64CorpusPipeline: String = {
    val pre = Seq(
      // quality keep over the corpus slice (doc_id >= 10)
      s"qtk AS (SELECT doc_id, text, $Toks AS t FROM documents " +
        "WHERE doc_id >= 10)",
      "qg AS (SELECT doc_id, text, len(t) AS n, " +
        "CASE WHEN len(t) >= 3 THEN list_transform(range(0, len(t) - 2), " +
        "i -> array_to_string(t[i + 1 : i + 3], ' ')) " +
        "ELSE [array_to_string(t, ' ')] END AS g3 FROM qtk)",
      "qual AS (SELECT doc_id FROM qg WHERE n >= 30 AND n <= 10000 " +
        "AND CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3) " +
        "<= 0.05 AND CAST(length(text) - length(regexp_replace(text, " +
        "'[.,;:!?''\"()-]', '', 'g')) AS DOUBLE) <= n * 0.5)",
      // benchmark 5-gram set (raw docs < 10) and collision-based removal
      s"btk AS (SELECT doc_id, $Toks AS t FROM documents WHERE doc_id < 10)",
      "bgr AS (SELECT DISTINCT unnest(CASE WHEN len(t) >= 5 " +
        "THEN list_transform(range(0, len(t) - 4), " +
        "i -> array_to_string(t[i + 1 : i + 5], ' ')) " +
        "ELSE [array_to_string(t, ' ')] END) AS gram FROM btk)",
      "cgr AS (SELECT q.doc_id, unnest(CASE WHEN len(k.t) >= 5 " +
        "THEN list_transform(range(0, len(k.t) - 4), " +
        "i -> array_to_string(k.t[i + 1 : i + 5], ' ')) " +
        "ELSE [array_to_string(k.t, ' ')] END) AS gram " +
        "FROM qual q JOIN qtk k USING (doc_id))",
      "bad AS (SELECT DISTINCT cgr.doc_id FROM cgr JOIN bgr USING (gram))",
      "clean AS (SELECT doc_id FROM qual WHERE doc_id NOT IN " +
        "(SELECT doc_id FROM bad))")
    val banded = bandedCtes("",
      base = "(SELECT d.doc_id, d.text FROM documents d JOIN clean USING (doc_id))")
    val post = closureCtes("JOIN clean USING (doc_id)") ++ Seq(
      "canon AS (SELECT c.doc_id FROM clean c LEFT JOIN reach r " +
        "ON r.node = c.doc_id WHERE coalesce(r.component, c.doc_id) = c.doc_id)",
      "dz AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS z FROM canon)")
    val mixed = mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
    }
    val sampled = Seq(
      s"sampled AS (SELECT doc_id FROM dm5 WHERE " +
        s"(((${toSigned("z")}) % 10000 + 10000) % 10000) < 5000)")
    withClause(pre ++ banded ++ post ++ mixed ++ sampled,
      s"SELECT count(*) AS n_docs, CAST(coalesce(sum(len($Toks)), 0) AS BIGINT) " +
        "AS total_tokens FROM documents JOIN sampled USING (doc_id)")
  }

  /** SemDeDup replay: every vector's IVF list = argmax centroid dot
    * (projection fold is IEEE-exact; ties break to the LARGER list id,
    * mirroring `Similarity.bestLists`'s reverse(array_sort) pick), then
    * within-list pairwise cosine. Cosine itself uses DuckDB's
    * list_cosine_similarity — the q21 precedent: at this corpus's
    * pair-cosine spacing (~1e-5 around any threshold) both engines
    * classify identically.
    */
  val q85SemanticDedup: String = withClause(
    planesCtes() ++ Seq(
      "proj AS (SELECT e.vec_id, e.embedding, pv.p, " +
        s"${projection("e.embedding")} AS pr " +
        "FROM embeddings e CROSS JOIN pv pv)",
      "asg AS (SELECT vec_id, embedding, p AS list_id FROM " +
        "(SELECT vec_id, embedding, p, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY pr DESC, p DESC) AS rk FROM proj) " +
        "WHERE rk = 1)",
      "pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), " +
        "CAST(b.embedding AS DOUBLE[])) AS cos " +
        "FROM asg a JOIN asg b ON a.list_id = b.list_id " +
        "AND a.vec_id < b.vec_id)",
      "hit AS (SELECT * FROM pairs WHERE cos >= 0.4)"),
    "SELECT count(*) AS n_pairs, count(DISTINCT b_id) AS n_dropped, " +
      "round(coalesce(max(cos), -1), 4) AS best_cos FROM hit")

  /** Rolling-origin Holt backtest replay (q290,
    * [[operators.Forecast.backtestHolt]]): the q251 list-fold per
    * cutoff (prefixed CTEs), actual = mean of the window's observed
    * dailies, APE scored — all on the shared daily-series CTE.
    */
  def q290ForecastBacktest(cutoffs: Seq[Long], horizon: Int): String = {
    import graft.functions.Grid.snapSql
    val lNew = snapSql("0.3e0 * x[1] + 0.7e0 * (a[1] + a[2])")
    val fcast = snapSql(s"f.st[1] + $horizon.0e0 * f.st[2]")
    val per = cutoffs.distinct.sorted.zipWithIndex.flatMap {
      case (c, i) => Seq(
        s"s$i AS (SELECT o_orderpriority, list([CAST(day AS DOUBLE), " +
          "CAST(rev AS DOUBLE)] ORDER BY day) AS sl FROM bd " +
          s"WHERE day <= $c GROUP BY 1)",
        s"f$i AS (SELECT o_orderpriority, len(sl) AS n_obs, " +
          "list_reduce(list_prepend([sl[1][2], sl[2][2] - sl[1][2]], " +
          "list_transform(sl[2:], p -> [p[2], CAST(NULL AS DOUBLE)])), " +
          s"(a, x) -> [$lNew, " +
          snapSql(s"0.1e0 * ($lNew - a[1]) + 0.9e0 * a[2]") + "]) AS st " +
          s"FROM s$i WHERE len(sl) >= 2)",
        s"a$i AS (SELECT o_orderpriority, ${snapSql("avg(rev)")} " +
          s"AS actual FROM bd WHERE day > $c AND day <= ${c + horizon} " +
          "GROUP BY 1)",
        s"o$i AS (SELECT f.o_orderpriority, CAST($c AS BIGINT) " +
          "AS cutoff, CAST(f.n_obs AS BIGINT) AS n_obs, " +
          s"$fcast AS forecast, a.actual, " +
          snapSql(s"abs(($fcast) - a.actual) / abs(a.actual)") +
          s" AS ape FROM f$i f JOIN a$i a USING (o_orderpriority))")
    }
    val sel = cutoffs.distinct.sorted.indices
      .map(i => s"SELECT * FROM o$i").mkString(" UNION ALL ")
    withClause(Seq(
      "bd AS (SELECT o_orderpriority, date_diff('day', " +
        "DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day, " +
        "round(sum(o_totalprice), 2) AS rev FROM orders " +
        "GROUP BY 1, 2)") ++ per,
      s"SELECT * FROM ($sel) ORDER BY o_orderpriority, cutoff")
  }

  /** Rolling-origin Holt–WINTERS backtest replay (q297,
    * [[operators.Forecast.backtestHoltWinters]]): the q253 seasonal
    * list-fold — state `[l, b, s1..s7]`, calendar-true slot update,
    * every cell snapped per step — run per cutoff over the shared
    * daily-series CTE; forecast = l + h·b + the (t_last + h) mod 7
    * slot; actual = mean of the window's observed dailies; APE.
    * Constants pinned to q253's (α=.3, β=.05, γ=.2, period=7).
    */
  def q297HwBacktest(cutoffs: Seq[Long], horizon: Int): String = {
    import graft.functions.Grid.snapSql
    val lNew = snapSql("0.3e0 * (x[2] - a[CAST(x[1] % 7 AS INT) + 3]) " +
      "+ 0.7e0 * (a[1] + a[2])")
    val bNew = snapSql(s"0.05e0 * ($lNew - a[1]) + 0.95e0 * a[2]")
    val sNew = snapSql(s"0.2e0 * (x[2] - $lNew) + 0.8e0 * v")
    val fcast = snapSql(s"f.st[1] + $horizon.0e0 * f.st[2] + " +
      s"f.st[CAST((f.t_last + $horizon) % 7 AS INT) + 3]")
    val per = cutoffs.distinct.sorted.zipWithIndex.flatMap {
      case (c, i) => Seq(
        s"s$i AS (SELECT o_orderpriority, list([CAST(day AS DOUBLE), " +
          "CAST(rev AS DOUBLE)] ORDER BY day) AS sl FROM bd " +
          s"WHERE day <= $c GROUP BY 1)",
        s"f$i AS (SELECT o_orderpriority, len(sl) AS n_obs, " +
          "sl[-1][1] AS t_last, " +
          "list_reduce(list_prepend(" +
          "list_concat([sl[1][2], sl[2][2] - sl[1][2]], " +
          "[0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0]), " +
          "sl[2:]), " +
          s"(a, x) -> list_concat([$lNew, $bNew], " +
          "list_transform(a[3:], (v, i) -> " +
          "CASE WHEN i = CAST(x[1] % 7 AS INT) + 1 " +
          s"THEN $sNew ELSE v END))) AS st " +
          s"FROM s$i WHERE len(sl) >= 2)",
        s"a$i AS (SELECT o_orderpriority, ${snapSql("avg(rev)")} " +
          s"AS actual FROM bd WHERE day > $c AND day <= ${c + horizon} " +
          "GROUP BY 1)",
        s"o$i AS (SELECT f.o_orderpriority, CAST($c AS BIGINT) " +
          "AS cutoff, CAST(f.n_obs AS BIGINT) AS n_obs, " +
          s"$fcast AS forecast, a.actual, " +
          snapSql(s"abs(($fcast) - a.actual) / abs(a.actual)") +
          s" AS ape FROM f$i f JOIN a$i a USING (o_orderpriority))")
    }
    val sel = cutoffs.distinct.sorted.indices
      .map(i => s"SELECT * FROM o$i").mkString(" UNION ALL ")
    withClause(Seq(
      "bd AS (SELECT o_orderpriority, date_diff('day', " +
        "DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day, " +
        "round(sum(o_totalprice), 2) AS rev FROM orders " +
        "GROUP BY 1, 2)") ++ per,
      s"SELECT * FROM ($sel) ORDER BY o_orderpriority, cutoff")
  }

  /** Bradley–Terry MM replay (q298,
    * [[operators.Preference.bradleyTerry]]): weekly revenue contests
    * between priorities, the symmetric bounded pair table, then
    * `rounds` unrolled MM updates — each item's denominator folds its
    * opponent terms in ascending-opponent order via an ordered
    * list_reduce (the pinned-IEEE-order contract), each term and
    * strength snaps at 1e-6, the winless floor is the grid
    * resolution, and identifiability anchors at the first item (a
    * single-value divide, order-free).
    */
  def q298BradleyTerry(rounds: Int): String = {
    import graft.functions.Grid.snapSql
    val perRound = (0 until rounds).flatMap { r =>
      Seq(
        s"d$r AS MATERIALIZED (SELECT pr.i, list_reduce(list_prepend(" +
          "CAST(0.0 AS DOUBLE), " +
          s"list(${snapSql("pr.nij / (pa.p + pb.p)")} ORDER BY pr.j)), " +
          "(a, x) -> a + x) AS den " +
          s"FROM pr JOIN p$r pa ON pa.i = pr.i " +
          s"JOIN p$r pb ON pb.i = pr.j GROUP BY pr.i)",
        s"r$r AS MATERIALIZED (SELECT w.i, CASE WHEN d.den > 0 THEN " +
          s"greatest(${snapSql("w.wi / d.den")}, 0.000001e0) " +
          s"ELSE 0.000001e0 END AS p FROM wn w JOIN d$r d ON d.i = w.i)",
        s"p${r + 1} AS MATERIALIZED (SELECT r.i, ${snapSql("r.p / a.p")} AS p " +
          s"FROM r$r r CROSS JOIN (SELECT p FROM r$r " +
          "ORDER BY p DESC, i LIMIT 1) a)")
    }
    withClause(Seq(
      "wkr AS MATERIALIZED (SELECT o_orderpriority AS pri, " +
        "date_diff('day', DATE '1992-01-01', " +
        "CAST(o_orderdate AS DATE)) // 7 AS wk, " +
        "round(sum(o_totalprice), 2) AS rev FROM orders GROUP BY 1, 2)",
      "ct AS MATERIALIZED (SELECT CASE WHEN a.rev >= b.rev THEN a.pri ELSE b.pri " +
        "END AS w, CASE WHEN a.rev >= b.rev THEN b.pri ELSE a.pri " +
        "END AS l FROM wkr a JOIN wkr b ON a.wk = b.wk " +
        "AND a.pri < b.pri)",
      "pr AS MATERIALIZED (SELECT i, j, CAST(count(*) AS DOUBLE) AS nij FROM " +
        "(SELECT w AS i, l AS j FROM ct " +
        "UNION ALL SELECT l AS i, w AS j FROM ct) GROUP BY 1, 2)",
      "it AS MATERIALIZED (SELECT DISTINCT i FROM pr)",
      "wn AS MATERIALIZED (SELECT it.i, coalesce(x.wi, 0.0e0) AS wi, " +
        "coalesce(x.nw, 0) AS n_wins FROM it LEFT JOIN " +
        "(SELECT w AS i, CAST(count(*) AS DOUBLE) AS wi, " +
        "CAST(count(*) AS BIGINT) AS nw FROM ct GROUP BY 1) x " +
        "ON x.i = it.i)",
      "ng AS MATERIALIZED (SELECT i, CAST(sum(nij) AS BIGINT) AS n_games " +
        "FROM pr GROUP BY 1)",
      "p0 AS MATERIALIZED (SELECT i, 1.0e0 AS p FROM it)") ++ perRound,
      s"SELECT wn.i AS item, wn.n_wins, ng.n_games, p.p AS strength " +
        s"FROM wn JOIN ng ON ng.i = wn.i JOIN p$rounds p " +
        "ON p.i = wn.i ORDER BY item")
  }

  /** Cohen + linear-weighted kappa replay (q299,
    * [[operators.Agreement.cohenKappa]]): the k×k confusion table,
    * lexicographic 0-based ordinals, exact-long chance cross-products,
    * snapped divisions at the readout only. Dynamic k via CTEs so the
    * oracle mirrors the operator's data-derived alphabet.
    */
  val q299RaterAgreement: String = {
    import graft.functions.Grid.snapSql
    val pe = "CAST(ex.ech AS DOUBLE) / (ob.n * ob.n)"
    val peW = "CAST(ex.ech_w AS DOUBLE) / (ob.n * ob.n * (kk.k - 1))"
    val po = "CAST(ob.agree AS DOUBLE) / ob.n"
    val poW = "CAST(ob.agree_w AS DOUBLE) / (ob.n * (kk.k - 1))"
    withClause(Seq(
      "pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev, " +
        "round(sum(value), 2) AS val FROM events GROUP BY 1)",
      "lb AS (SELECT CASE WHEN n_ev < 64 THEN 'b0' WHEN n_ev < 75 " +
        "THEN 'b1' ELSE 'b2' END AS a, CASE WHEN val < 3100.0 " +
        "THEN 'b0' WHEN val < 3600.0 THEN 'b1' ELSE 'b2' END AS b " +
        "FROM pu)",
      "cf AS MATERIALIZED (SELECT a, b, CAST(count(*) AS BIGINT) " +
        "AS nab FROM lb GROUP BY 1, 2)",
      "ls AS MATERIALIZED (SELECT DISTINCT lab FROM (SELECT a AS lab " +
        "FROM cf UNION SELECT b AS lab FROM cf))",
      "rk AS MATERIALIZED (SELECT lab, CAST(row_number() OVER " +
        "(ORDER BY lab) - 1 AS BIGINT) AS ord FROM ls)",
      "kk AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS k " +
        "FROM ls)",
      "ce AS (SELECT cf.a, cf.b, cf.nab, (kk.k - 1) - " +
        "abs(ra.ord - rb.ord) AS lw FROM cf, rk ra, rk rb, kk " +
        "WHERE ra.lab = cf.a AND rb.lab = cf.b)",
      "ma AS (SELECT a, CAST(sum(nab) AS BIGINT) AS rm FROM ce " +
        "GROUP BY 1)",
      "mb AS (SELECT b, CAST(sum(nab) AS BIGINT) AS cm FROM ce " +
        "GROUP BY 1)",
      "ch AS (SELECT ma.a, mb.b, ma.rm * mb.cm AS pp, (kk.k - 1) - " +
        "abs(ra.ord - rb.ord) AS lw FROM ma, mb, rk ra, rk rb, kk " +
        "WHERE ra.lab = ma.a AND rb.lab = mb.b)",
      "ob AS (SELECT CAST(sum(nab) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN a = b THEN nab ELSE 0 END) AS BIGINT) " +
        "AS agree, CAST(sum(nab * lw) AS BIGINT) AS agree_w FROM ce)",
      "ex AS (SELECT CAST(sum(CASE WHEN a = b THEN pp ELSE 0 END) " +
        "AS BIGINT) AS ech, CAST(sum(pp * lw) AS BIGINT) AS ech_w " +
        "FROM ch)"),
      s"""SELECT ob.n AS n_items, kk.k AS k_labels,
         |  ${snapSql(po)} AS po, ${snapSql(pe)} AS pe,
         |  ${snapSql(s"CASE WHEN ex.ech = ob.n * ob.n THEN NULL " +
          s"ELSE ($po - $pe) / (1.0e0 - $pe) END")} AS kappa,
         |  ${snapSql(poW)} AS po_w, ${snapSql(peW)} AS pe_w,
         |  ${snapSql(s"CASE WHEN ex.ech_w = ob.n * ob.n * (kk.k - 1) " +
          s"THEN NULL ELSE ($poW - $peW) / (1.0e0 - $peW) END")}
         |    AS kappa_w
         |FROM ob, ex, kk""".stripMargin)
  }

  /** PII column-profile replay (q300,
    * [[operators.PiiProfile.profile]]): one SELECT per (column,
    * pattern) cell, UNION ALL — the patterns come verbatim from
    * [[operators.PiiProfile.defaultPatterns]] (single source of
    * truth; only portable constructs, so RE2 and Java regex agree).
    */
  def q300PiiProfile(table: String, cols: Seq[String]): String = {
    import graft.functions.Grid.snapSql
    val parts = for {
      c <- cols
      (pn, pat) <- operators.PiiProfile.defaultPatterns
    } yield
      s"SELECT '$c' AS \"column\", '$pn' AS pattern, " +
        s"CAST(count(*) AS BIGINT) AS n_rows, " +
        s"CAST(count($c) AS BIGINT) AS n_nonnull, " +
        s"CAST(sum(CASE WHEN regexp_matches(CAST($c AS VARCHAR), " +
        s"'$pat') THEN 1 ELSE 0 END) AS BIGINT) AS n_match, " +
        snapSql(s"CASE WHEN count($c) > 0 THEN " +
          s"CAST(sum(CASE WHEN regexp_matches(CAST($c AS VARCHAR), " +
          s"'$pat') THEN 1 ELSE 0 END) AS DOUBLE) / count($c) " +
          "ELSE NULL END") + " AS match_rate, " +
        s"(sum(CASE WHEN regexp_matches(CAST($c AS VARCHAR), '$pat') " +
        s"THEN 1 ELSE 0 END) * 2 > count($c)) AS flagged " +
        s"FROM $table"
    parts.mkString("SELECT * FROM (", " UNION ALL ",
      ") ORDER BY \"column\", pattern")
  }

  /** Power-planning replay (q311, [[operators.Abtest.powerAnalysis]]):
    * the builder calls the operator's OWN inverse-normal for the z
    * factor (single source of truth), embeds it as the same lit17
    * literal, mirrors the snapped mean/sigma/delta trees.
    */
  def q311PowerAnalysis(mdes: Seq[Double], alpha: Double,
      power: Double): String = {
    import graft.functions.Grid.{lit17, snapD, snapSql}
    val za = operators.Abtest.inverseNormalCdf(1 - alpha / 2)
    val zb = operators.Abtest.inverseNormalCdf(power)
    val fac = lit17(2.0 * (za + zb) * (za + zb))
    val mdeList = mdes.map(m => lit17(snapD(m))).mkString("[", ", ", "]")
    withClause(Seq(
      "s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs, " +
        "sum(value) AS sy, sum(value * value) AS syy FROM events " +
        "WHERE value IS NOT NULL GROUP BY 1)",
      "m AS (SELECT event_type, n_obs, " +
        snapSql("sy / n_obs") + " AS mean, " +
        snapSql("sqrt(greatest(0.0, (syy - sy * sy / n_obs) / (n_obs - 1)))") +
        " AS sigma FROM s WHERE n_obs >= 2)",
      s"e AS (SELECT m.*, mde FROM m CROSS JOIN " +
        s"(SELECT unnest($mdeList) AS mde))",
      s"f AS (SELECT event_type, mde, n_obs, mean, sigma, " +
        s"${snapSql("mde * mean")} AS delta FROM e)"),
      "SELECT event_type, mde, n_obs, mean, sigma, delta, " +
        s"CASE WHEN delta <> 0 THEN CAST(ceil($fac * sigma * sigma " +
        "/ (delta * delta)) AS BIGINT) END AS n_per_arm " +
        "FROM f ORDER BY event_type, mde")
  }

  /** McNemar replay (q313, [[operators.Abtest.mcNemar]]): the paired
    * conversion flags, four exact-long cells, the operator's
    * continuity-corrected tree.
    */
  val q313McNemar: String = {
    import graft.functions.Grid.snapSql
    val dd = "date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))"
    withClause(Seq(
      s"pu AS (SELECT user_id, sum(CASE WHEN $dd < 15 AND " +
        "value >= 60.0 THEN 1 ELSE 0 END) > 0 AS a, " +
        s"sum(CASE WHEN $dd >= 15 AND value >= 60.0 THEN 1 ELSE 0 " +
        "END) > 0 AS b FROM events GROUP BY 1)",
      "c AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_both, CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 " +
        "END) AS BIGINT) AS n_only_first, " +
        "CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_only_second, " +
        "CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_neither FROM pu)",
      "x AS (SELECT *, " + snapSql(
        "CASE WHEN n_only_first + n_only_second > 0 THEN " +
          "CAST(abs(n_only_first - n_only_second) - 1 AS DOUBLE) * " +
          "(abs(n_only_first - n_only_second) - 1) / " +
          "(n_only_first + n_only_second) END", 4) + " AS chi2 FROM c)"),
      "SELECT n_pairs, n_both, n_only_first, n_only_second, " +
        "n_neither, chi2, coalesce(chi2 > 3.841, false) " +
        "AS significant FROM x")
  }

  /** Kendall τ-b replay (q314, [[operators.RankCorr.kendallTauBy]]):
    * the capped pair join, exact concordance/tie cells, the
    * operator's readout tree.
    */
  def q314KendallTau(maxPoints: Int): String = {
    import graft.functions.Grid.snapSql
    withClause(Seq(
      "d AS (SELECT event_type AS k, date_diff('day', " +
        "DATE '2024-01-01', CAST(ts AS DATE)) AS day, " +
        "CAST(count(*) AS BIGINT) AS nn, round(sum(value), 2) AS rev " +
        "FROM events GROUP BY 1, 2)",
      "p AS MATERIALIZED (SELECT k, nn, rev, row_number() OVER " +
        "(PARTITION BY k ORDER BY nn, rev) AS i FROM d " +
        s"QUALIFY i <= $maxPoints)",
      "c AS (SELECT a.k, CAST(count(*) AS BIGINT) AS n0, " +
        "CAST(sum(CASE WHEN sign(b.nn - a.nn) * sign(b.rev - a.rev) " +
        "> 0 THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
        "CAST(sum(CASE WHEN sign(b.nn - a.nn) * sign(b.rev - a.rev) " +
        "< 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd, " +
        "CAST(sum(CASE WHEN sign(b.nn - a.nn) = 0 AND " +
        "sign(b.rev - a.rev) <> 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS tx0, CAST(sum(CASE WHEN sign(b.rev - a.rev) = 0 AND " +
        "sign(b.nn - a.nn) <> 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS ty0, CAST(sum(CASE WHEN sign(b.nn - a.nn) = 0 AND " +
        "sign(b.rev - a.rev) = 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS tb FROM p a JOIN p b ON a.k = b.k AND a.i < b.i " +
        "GROUP BY 1)",
      "nn2 AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM p " +
        "GROUP BY 1)",
      "f AS (SELECT c.k, nn2.n, c.c, c.dd, " +
        "c.n0 - (c.tx0 + c.tb) AS fx, c.n0 - (c.ty0 + c.tb) AS fy " +
        "FROM c JOIN nn2 ON nn2.k = c.k)"),
      "SELECT k AS event_type, n, c AS n_concordant, " +
        "dd AS n_discordant, " + snapSql(
        "CASE WHEN fx > 0 AND fy > 0 THEN CAST(c - dd AS DOUBLE) / " +
          "sqrt(CAST(fx * fy AS DOUBLE)) END", 4) +
        " AS tau_b FROM f ORDER BY event_type")
  }

  /** Kruskal–Wallis replay (q315, [[operators.Abtest.kruskalWallis]]):
    * pooled (y, id) row_number order, tie-window midranks, arm-ordered
    * fold of the exact rank-sum squares, the operator's H tree.
    */
  val q315KruskalWallis: String = {
    import graft.functions.Grid.snapSql
    val h = "12.0e0 / (nd * (nd + 1.0e0)) * sr - 3.0e0 * (nd + 1.0e0)"
    val corr = "1.0e0 - CAST(tc AS DOUBLE) / (nd * nd * nd - nd)"
    withClause(Seq(
      "b AS MATERIALIZED (SELECT event_type AS arm, event_id AS id, " +
        "value AS y FROM events WHERE value IS NOT NULL)",
      "r AS (SELECT *, row_number() OVER (ORDER BY y, id) AS rn " +
        "FROM b)",
      "m AS (SELECT *, min(rn) OVER (PARTITION BY y) + " +
        "max(rn) OVER (PARTITION BY y) AS r2 FROM r)",
      "a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(r2) AS BIGINT) AS rs2 FROM m GROUP BY 1)",
      "srt AS (SELECT CAST(count(*) AS BIGINT) AS k_arms, " +
        "list_reduce(list_prepend(0.0e0, " +
        "list(CAST(rs2 AS DOUBLE) * CAST(rs2 AS DOUBLE) / " +
        "(4.0e0 * n) ORDER BY arm)), (acc, x) -> acc + x) AS sr " +
        "FROM a)",
      "t AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tc, " +
        "CAST(sum(t) AS BIGINT) AS nN FROM (SELECT y, " +
        "CAST(count(*) AS BIGINT) AS t FROM b GROUP BY 1))",
      "x AS (SELECT t.nN, srt.k_arms, srt.sr, t.tc, " +
        "CAST(t.nN AS DOUBLE) AS nd FROM srt, t)"),
      s"""SELECT nN AS n_total, k_arms, k_arms - 1 AS df,
         |  ${snapSql(h, 4)} AS h,
         |  ${snapSql(corr, 6)} AS tie_correction,
         |  ${snapSql(s"CASE WHEN ($corr) > 0.0e0 THEN ($h) / ($corr) " +
          "END", 4)} AS h_corrected
         |FROM x""".stripMargin)
  }

  /** Wilcoxon signed-rank replay (q316,
    * [[operators.Abtest.wilcoxonSignedRank]]): zeros dropped, pooled
    * |d| midranks (doubled, exact), the operator's doubled-rank z
    * tree. Integer/integer division is true division on BOTH engines,
    * so `n*(n+1)/2` is the same double.
    */
  val q316Wilcoxon: String = {
    import graft.functions.Grid.snapSql
    val dd = "date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))"
    val varT = "nd * (nd + 1.0e0) * (2.0e0 * nd + 1.0e0) / 24.0e0 " +
      "- CAST(tc AS DOUBLE) / 48.0e0"
    val z = s"CAST(w2 - n * (n + 1) / 2 AS DOUBLE) / " +
      s"(2.0e0 * sqrt($varT))"
    withClause(Seq(
      s"pu AS (SELECT user_id, round(sum(CASE WHEN $dd < 15 " +
        "THEN value ELSE 0.0e0 END), 2) AS y1, " +
        s"round(sum(CASE WHEN $dd >= 15 THEN value ELSE 0.0e0 " +
        "END), 2) AS y2 FROM events GROUP BY 1)",
      "b AS (SELECT user_id AS id, y2 - y1 AS d FROM pu)",
      "nz AS MATERIALIZED (SELECT *, abs(d) AS ad FROM b " +
        "WHERE d <> 0.0e0)",
      "r AS (SELECT *, row_number() OVER (ORDER BY ad, id) AS rn " +
        "FROM nz)",
      "m AS (SELECT *, min(rn) OVER (PARTITION BY ad) + " +
        "max(rn) OVER (PARTITION BY ad) AS r2 FROM r)",
      "st AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN d > 0.0e0 THEN r2 ELSE 0 END) AS BIGINT) " +
        "AS w2 FROM m)",
      "tt AS (SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) " +
        "AS tc FROM (SELECT ad, CAST(count(*) AS BIGINT) AS t " +
        "FROM nz GROUP BY 1))",
      "tp AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pu)",
      "x AS (SELECT tp.n_pairs, st.n, st.w2, tt.tc, " +
        "CAST(st.n AS DOUBLE) AS nd FROM tp, st, tt)",
      s"y AS (SELECT n_pairs, n AS n_nonzero, " +
        "CAST(w2 AS DOUBLE) / 2.0e0 AS w_plus, " +
        snapSql(s"CASE WHEN $varT > 0.0e0 THEN $z END", 4) +
        " AS z FROM x)"),
      "SELECT n_pairs, n_nonzero, w_plus, z, " +
        "coalesce(abs(z) > 1.96, false) AS significant FROM y")
  }

  /** χ² independence replay (q317,
    * [[operators.Abtest.chiSquareIndependence]]): exact contingency
    * cells and marginals over the FULL r×c level grid (zero-observed
    * combinations contribute their (0−e)²/e = e term — omitting them
    * understates χ² on sparse tables), (row, col)-ordered term fold,
    * the operator's trees.
    */
  val q317Chi2Independence: String = {
    import graft.functions.Grid.snapSql
    withClause(Seq(
      "u AS (SELECT c.c_mktsegment AS r, o.o_orderpriority AS c " +
        "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)",
      "ce AS MATERIALIZED (SELECT r, c, CAST(count(*) AS BIGINT) " +
        "AS o FROM u GROUP BY 1, 2)",
      "rt AS (SELECT r, CAST(sum(o) AS BIGINT) AS rt FROM ce " +
        "GROUP BY 1)",
      "ct2 AS (SELECT c, CAST(sum(o) AS BIGINT) AS ct FROM ce " +
        "GROUP BY 1)",
      "tt AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM ce)",
      "lv AS (SELECT CAST(count(DISTINCT r) AS BIGINT) AS r_levels, " +
        "CAST(count(DISTINCT c) AS BIGINT) AS c_levels FROM ce)",
      "gr AS (SELECT rl.r, cl.c FROM (SELECT DISTINCT r FROM ce) rl, " +
        "(SELECT DISTINCT c FROM ce) cl)",
      "fu AS (SELECT gr.r, gr.c, coalesce(ce.o, 0) AS o FROM gr " +
        "LEFT JOIN ce ON ce.r = gr.r AND ce.c = gr.c)",
      "tm AS (SELECT fu.r, fu.c, fu.o, " +
        "CAST(rt.rt * ct2.ct AS DOUBLE) / tt.n AS e FROM fu " +
        "JOIN rt ON rt.r = fu.r JOIN ct2 ON ct2.c = fu.c, tt)",
      "ag AS (SELECT list_reduce(list_prepend(0.0e0, " +
        "list((o - e) * (o - e) / e ORDER BY r, c)), " +
        "(a, x) -> a + x) AS chi FROM tm)"),
      "SELECT tt.n, lv.r_levels, lv.c_levels, " +
        "(lv.r_levels - 1) * (lv.c_levels - 1) AS df, " +
        snapSql("ag.chi", 4) + " AS chi2 FROM tt, lv, ag")
  }

  /** Mann–Kendall replay (q312, [[operators.Robust.mannKendall]]):
    * the deterministic cap, exact-long S and tie terms, the
    * operator's own z tree.
    */
  def q312MannKendall(maxPoints: Int): String = {
    import graft.functions.Grid.snapSql
    val zExpr = "CAST(s_stat + CASE WHEN s_stat > 0 THEN -1 " +
      "WHEN s_stat < 0 THEN 1 ELSE 0 END AS DOUBLE) / sqrt(var_s)"
    withClause(Seq(
      "d AS (SELECT o_orderpriority AS k, date_diff('day', " +
        "DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day, " +
        "round(sum(o_totalprice), 2) AS rev FROM orders GROUP BY 1, 2)",
      "p AS MATERIALIZED (SELECT k, rev, row_number() OVER " +
        "(PARTITION BY k ORDER BY day, rev) AS i FROM d " +
        s"QUALIFY i <= $maxPoints)",
      "s AS (SELECT a.k, CAST(sum(CASE WHEN b.rev > a.rev THEN 1 " +
        "WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s_stat, " +
        "CAST(count(*) AS BIGINT) AS n_pairs FROM p a JOIN p b " +
        "ON a.k = b.k AND a.i < b.i GROUP BY 1)",
      "tt AS (SELECT k, CAST(sum(t * (t - 1) * (2 * t + 5)) " +
        "AS BIGINT) AS tc, CAST(sum(t) AS BIGINT) AS n_obs FROM " +
        "(SELECT k, rev, CAST(count(*) AS BIGINT) AS t FROM p " +
        "GROUP BY 1, 2) GROUP BY 1)",
      "j AS (SELECT s.k, tt.n_obs, s.s_stat, s.n_pairs, " +
        "CAST(tt.n_obs * (tt.n_obs - 1) * (2 * tt.n_obs + 5) - tt.tc " +
        "AS DOUBLE) / 18.0 AS var_s FROM s JOIN tt ON tt.k = s.k " +
        "WHERE tt.n_obs >= 3)",
      s"z AS (SELECT *, ${snapSql(
        s"CASE WHEN var_s > 0.0 THEN $zExpr END", 4)} AS zv FROM j)"),
      s"SELECT k AS o_orderpriority, n_obs, s_stat, n_pairs, " +
        s"${snapSql("var_s")} AS var_s, zv AS z, " +
        "CASE WHEN zv IS NULL THEN 'no_trend' " +
        "WHEN zv > 1.96 THEN 'increasing' " +
        "WHEN zv < -1.96 THEN 'decreasing' ELSE 'no_trend' END " +
        "AS trend FROM z ORDER BY o_orderpriority")
  }

  /** Spearman replay (q309, [[operators.RankCorr.spearmanBy]]):
    * doubled midranks via keyed rank + tie-count windows, the q304
    * exact-long Pearson tree.
    */
  val q309Spearman: String = {
    import graft.functions.Grid.snapSql
    def dmr(c: String): String =
      s"rank() OVER (PARTITION BY k ORDER BY $c) * 2 + " +
        s"count(*) OVER (PARTITION BY k, $c) - 1"
    val rho = snapSql(
      "CASE WHEN n >= 2 AND n * CAST(sxx AS DOUBLE) - " +
        "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0 " +
        "AND n * CAST(syy AS DOUBLE) - " +
        "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <> 0 " +
        "THEN (n * CAST(sxy AS DOUBLE) - " +
        "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
        "sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * " +
        "CAST(sx AS DOUBLE)) * (n * CAST(syy AS DOUBLE) - " +
        "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END", 4)
    withClause(Seq(
      "d AS (SELECT event_type AS k, date_diff('day', " +
        "DATE '2024-01-01', CAST(ts AS DATE)) AS day, " +
        "CAST(count(*) AS BIGINT) AS nn, round(sum(value), 2) AS rev " +
        "FROM events GROUP BY 1, 2)",
      s"r AS (SELECT k, CAST(${dmr("nn")} AS BIGINT) AS rx, " +
        s"CAST(${dmr("rev")} AS BIGINT) AS ry FROM d)",
      "s AS (SELECT k, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy, " +
        "CAST(sum(rx * rx) AS BIGINT) AS sxx, " +
        "CAST(sum(ry * ry) AS BIGINT) AS syy, " +
        "CAST(sum(rx * ry) AS BIGINT) AS sxy FROM r GROUP BY 1)"),
      s"SELECT k AS event_type, n, $rho AS rho FROM s ORDER BY k")
  }

  /** Cronbach replay (q310, [[operators.Agreement.cronbachAlpha]]):
    * the exact-long variance-ratio collapse, one division at the
    * readout.
    */
  val q310CronbachAlpha: String = {
    import graft.functions.Grid.snapSql
    val ratio = "CASE WHEN nn.n * tl.sst - tl.st * tl.st <> 0 THEN " +
      "CAST(nn.n * it.ssi - it.sqi AS DOUBLE) / " +
      "(nn.n * tl.sst - tl.st * tl.st) END"
    withClause(Seq(
      "cell AS MATERIALIZED (SELECT user_id AS u, event_type AS i, " +
        "CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2)",
      "it AS (SELECT CAST(sum(sxx) AS BIGINT) AS ssi, " +
        "CAST(sum(sx * sx) AS BIGINT) AS sqi FROM (SELECT i, " +
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) " +
        "AS sxx FROM cell GROUP BY 1))",
      "tl AS (SELECT CAST(sum(t * t) AS BIGINT) AS sst, " +
        "CAST(sum(t) AS BIGINT) AS st FROM (SELECT u, " +
        "CAST(sum(x) AS BIGINT) AS t FROM cell GROUP BY 1))",
      "nn AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n FROM cell)",
      "kk AS (SELECT CAST(count(DISTINCT i) AS BIGINT) AS k FROM cell)"),
      s"""SELECT nn.n AS n_units, kk.k AS k_items,
         |  ${snapSql(ratio)} AS var_ratio,
         |  ${snapSql(s"CAST(kk.k AS DOUBLE) / (kk.k - 1) * " +
          s"(1.0e0 - ($ratio))")} AS alpha
         |FROM nn, kk, it, tl""".stripMargin)
  }

  /** Murphy/Brier decomposition replay (q307,
    * [[operators.Calibration.murphyDecomposition]]): the splitmix
    * train/test split, exact-count per-source rates, the bounded
    * ordered fold over group terms, the operator's own readout trees.
    */
  val q307BrierDecomposition: String = {
    import graft.functions.Grid.snapSql
    val mixed = mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "bz" else s"bm${n - 1}"
        s"bm$n AS ($body FROM $prev)"
    }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    withClause(Seq(
      "bz AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS z " +
        "FROM documents)") ++ mixed ++ Seq(
      s"spl AS (SELECT doc_id, $signedMod >= 8000 AS is_test FROM bm5)",
      "lab AS MATERIALIZED (SELECT d.doc_id, d.source, " +
        "d.lang = 'en' AS y, s.is_test FROM documents d " +
        "JOIN spl s USING (doc_id))",
      "pr AS MATERIALIZED (SELECT source, " +
        snapSql("CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE) " +
          "/ count(*)") + " AS p FROM lab WHERE NOT is_test " +
        "GROUP BY 1)",
      "g AS MATERIALIZED (SELECT source, CAST(count(*) AS BIGINT) " +
        "AS n, CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS o FROM lab WHERE is_test GROUP BY 1)",
      "j AS (SELECT g.source, g.n, g.o, pr.p FROM g " +
        "JOIN pr USING (source))",
      "tt AS (SELECT CAST(sum(n) AS BIGINT) AS nn, " +
        "CAST(sum(o) AS BIGINT) AS oo FROM j)",
      "tm AS (SELECT j.source, j.n, j.o, j.p, tt.nn, tt.oo, " +
        "CAST(tt.oo AS DOUBLE) / tt.nn AS obar, " +
        "CAST(j.o AS DOUBLE) / j.n AS rate FROM j, tt)",
      "ag AS (SELECT max(nn) AS nn, max(obar) AS obar, " +
        "CAST(count(*) AS BIGINT) AS n_groups, " +
        "list_reduce(list_prepend([0.0e0, 0.0e0, 0.0e0], " +
        "list([n * (p - rate) * (p - rate), " +
        "n * (rate - obar) * (rate - obar), " +
        "n * p * p - 2.0e0 * p * o + o] ORDER BY source)), " +
        "(a, x) -> [a[1] + x[1], a[2] + x[2], a[3] + x[3]]) AS sm " +
        "FROM tm)"),
      s"""SELECT nn AS n_items, n_groups,
         |  ${snapSql("sm[3] / nn")} AS brier,
         |  ${snapSql("sm[1] / nn")} AS reliability,
         |  ${snapSql("sm[2] / nn")} AS resolution,
         |  ${snapSql("obar * (1.0e0 - obar)")} AS uncertainty
         |FROM ag""".stripMargin)
  }

  /** Centroid-silhouette replay (q308,
    * [[operators.Clustering.centroidSilhouette]]): the q87/q93
    * trained-centroid fragment, take-2 assignment, the operator's own
    * per-vector score tree, per-cluster mean/min.
    */
  val q308Silhouette: String = {
    import graft.functions.Grid.snapSql
    withClause(kmTrainCtes(4) ++ Seq(
      kmAssignCte("a3", "c2", take = 2),
      "p2 AS (SELECT vec_id, cid, dist, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM a3)",
      "w2 AS (SELECT vec_id, max(CASE WHEN rk = 1 THEN cid END) " +
        "AS cl, max(CASE WHEN rk = 1 THEN sqrt(dist) END) AS d1, " +
        "max(CASE WHEN rk = 2 THEN sqrt(dist) END) AS d2 " +
        "FROM p2 GROUP BY 1)",
      "sl AS (SELECT cl, CASE WHEN d2 > 0 THEN " +
        snapSql("(d2 - d1) / d2") + " ELSE 0.0e0 END AS sil FROM w2)"),
      "SELECT cl AS cluster, CAST(count(*) AS BIGINT) AS n, " +
        snapSql("avg(sil)", 4) + " AS mean_silhouette, " +
        snapSql("min(sil)") + " AS min_silhouette " +
        "FROM sl GROUP BY 1 ORDER BY 1")
  }

  /** Fleiss' kappa replay (q305, [[operators.Agreement.fleissKappa]]):
    * first-10 slice per user, exact-long agreement numerators, the
    * operator's own readout expression trees.
    */
  val q305FleissKappa: String = {
    import graft.functions.Grid.snapSql
    val pBar = "CAST(sc.s2 - sc.n * 10 AS DOUBLE) / (sc.n * 10 * 9)"
    val pE = "CAST(ct.tt AS DOUBLE) / (sc.n * 10 * (sc.n * 10))"
    withClause(Seq(
      "f AS (SELECT user_id, event_type FROM (SELECT user_id, " +
        "event_type, row_number() OVER (PARTITION BY user_id " +
        "ORDER BY event_id) AS rn FROM events) WHERE rn <= 10)",
      "nic AS MATERIALIZED (SELECT user_id AS it, event_type AS c, " +
        "CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1, 2)",
      "pi AS (SELECT it, CAST(sum(n) AS BIGINT) AS m, " +
        "CAST(sum(n * n) AS BIGINT) AS s2 FROM nic GROUP BY 1)",
      "sc AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(s2) AS BIGINT) AS s2 FROM pi)",
      "ct AS (SELECT CAST(count(*) AS BIGINT) AS k, " +
        "CAST(sum(t * t) AS BIGINT) AS tt FROM (SELECT c, " +
        "CAST(sum(n) AS BIGINT) AS t FROM nic GROUP BY 1))"),
      s"""SELECT sc.n AS n_items, CAST(10 AS BIGINT) AS m_raters,
         |  ct.k AS k_labels, ${snapSql(pBar)} AS p_bar,
         |  ${snapSql(pE)} AS p_e,
         |  ${snapSql(s"CASE WHEN ct.tt = sc.n * 10 * (sc.n * 10) " +
          s"THEN NULL ELSE (($pBar) - ($pE)) / (1.0e0 - ($pE)) END")}
         |    AS kappa
         |FROM sc, ct""".stripMargin)
  }

  /** Nearest-rank matching replay (q306,
    * [[operators.Matching.rankMatchAtt]]): keyed rank windows per
    * (stratum, arm), rank-i-to-rank-i pairs, exact-cent ATT.
    */
  val q306RankMatching: String = {
    import graft.functions.Grid.snapSql
    withClause(Seq(
      "spend AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS sp " +
        "FROM orders GROUP BY 1)",
      "u AS (SELECT c.c_mktsegment AS s, c.c_acctbal >= 4500.0 AS tr, " +
        "c.c_acctbal AS sc, c.c_custkey AS id, " +
        "coalesce(sp.sp, 0.0) AS y FROM customer c " +
        "LEFT JOIN spend sp ON sp.o_custkey = c.c_custkey)",
      "r AS MATERIALIZED (SELECT s, tr, " +
        "CAST(floor(y * 100.0 + 0.5) AS BIGINT) AS yc, " +
        "row_number() OVER (PARTITION BY s, tr " +
        "ORDER BY sc DESC, id) AS rk FROM u)",
      "cn AS (SELECT s, CAST(sum(CASE WHEN tr THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_treated, CAST(sum(CASE WHEN tr THEN 0 " +
        "ELSE 1 END) AS BIGINT) AS n_control FROM r GROUP BY 1)",
      "pr AS (SELECT t.s, CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(t.yc - c.yc) AS BIGINT) AS d " +
        "FROM (SELECT * FROM r WHERE tr) t " +
        "JOIN (SELECT * FROM r WHERE NOT tr) c " +
        "ON c.s = t.s AND c.rk = t.rk GROUP BY 1)"),
      "SELECT cn.s AS c_mktsegment, cn.n_treated, cn.n_control, " +
        "coalesce(pr.n_pairs, 0) AS n_pairs, " +
        snapSql("CAST(pr.d AS DOUBLE) / (100.0 * pr.n_pairs)") +
        " AS att FROM cn LEFT JOIN pr ON pr.s = cn.s " +
        "ORDER BY c_mktsegment")
  }

  /** Seasonal decomposition replay (q301,
    * [[operators.Seasonal.decompose]]): exact-cent RANGE-window trend
    * (one exact-int division per cell), per-slot detrended means at
    * the 1e-4 snap.
    */
  val q301SeasonalDecompose: String = {
    import graft.functions.Grid.snapSql
    withClause(Seq(
      "d AS (SELECT o_orderpriority AS k, date_diff('day', " +
        "DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day, " +
        "round(sum(o_totalprice), 2) AS rev FROM orders GROUP BY 1, 2)",
      "w AS (SELECT k, day, rev, CAST(floor(rev * 100.0 + 0.5) " +
        "AS BIGINT) AS c FROM d)",
      "t AS (SELECT k, day, rev, " +
        snapSql("CAST(sum(c) OVER win AS DOUBLE) / " +
          "(100.0 * count(*) OVER win)") + " AS trend FROM w " +
        "WINDOW win AS (PARTITION BY k ORDER BY day " +
        "RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING))"),
      "SELECT k AS o_orderpriority, day % 7 AS slot, " +
        "CAST(count(*) AS BIGINT) AS n_obs, " +
        snapSql("avg(rev - trend)", 4) + " AS seasonal " +
        "FROM t GROUP BY 1, 2 ORDER BY 1, 2")
  }

  /** EWMA control-chart replay (q302,
    * [[operators.Robust.ewmaControl]]): exact integer Σy/Σy² center,
    * the [z, alarms, first_t] state as a DOUBLE list (the q251
    * struct-accumulator avoidance), per-step grid snap, the limit
    * factor as the same 17-digit literal the operator stamps.
    */
  def q302EwmaControl(lambda: Double, l: Double): String = {
    import graft.functions.Grid.{lit17, snapSql}
    val zNew = snapSql(s"$lambda * x[2] + ${1 - lambda} * a[1]")
    val factor = lit17(l * math.sqrt(lambda / (2 - lambda)))
    withClause(Seq(
      "d AS (SELECT event_type, date_diff('day', DATE '2024-01-01', " +
        "CAST(ts AS DATE)) AS day, CAST(count(*) AS BIGINT) AS n " +
        "FROM events GROUP BY 1, 2)",
      "s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs, " +
        "CAST(sum(n) AS DOUBLE) AS sy, " +
        "CAST(sum(n * n) AS DOUBLE) AS syy, " +
        "list([CAST(day AS DOUBLE), CAST(n AS DOUBLE)] ORDER BY day) " +
        "AS sl FROM d GROUP BY 1)",
      "m AS (SELECT event_type, n_obs, sl, " +
        snapSql("sy / n_obs") + " AS mu0, " +
        snapSql("sqrt(greatest(0.0, (syy - sy * sy / n_obs) / (n_obs - 1)))") +
        " AS sigma0 FROM s WHERE n_obs >= 2)",
      s"ml AS (SELECT *, ${snapSql(s"sigma0 * $factor")} AS lim " +
        "FROM m)",
      "f AS (SELECT event_type, n_obs, mu0, sigma0, lim, " +
        "list_reduce(list_prepend([mu0, 0.0e0, -9223372036854775808], " +
        "sl), " +
        s"(a, x) -> [$zNew, " +
        s"a[2] + CASE WHEN abs(($zNew) - mu0) > lim THEN 1.0e0 " +
        "ELSE 0.0e0 END, " +
        "CASE WHEN a[3] <> -9223372036854775808 THEN a[3] ELSE " +
        s"CASE WHEN abs(($zNew) - mu0) > lim THEN x[1] " +
        "ELSE -9223372036854775808 END END]) AS st FROM ml)"),
      "SELECT event_type, n_obs, mu0, sigma0, lim AS \"limit\", " +
        "st[1] AS ewma_final, CAST(st[2] AS BIGINT) AS n_alarms, " +
        "CASE WHEN st[3] <> -9223372036854775808 THEN " +
        "CAST(st[3] AS BIGINT) END AS first_alarm_t " +
        "FROM f ORDER BY event_type")
  }

  /** SPRT replay (q303, [[operators.Abtest.sprt]]): the Wald walk as
    * a [llr, n, dec] DOUBLE-list fold, per-step snap, all four log
    * constants as the operator's own 17-digit literals.
    */
  def q303Sprt(p0: Double, p1: Double, alpha: Double, beta: Double,
      threshold: Double): String = {
    import graft.functions.Grid.{lit17, snapSql}
    val la = lit17(math.log(p1 / p0))
    val lb = lit17(math.log((1 - p1) / (1 - p0)))
    val up = lit17(math.log((1 - beta) / alpha))
    val lo = lit17(math.log(beta / (1 - alpha)))
    val step = snapSql(
      s"a[1] + CASE WHEN x[2] = 1.0e0 THEN $la ELSE $lb END")
    withClause(Seq(
      "w AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_total, " +
        s"CAST(sum(CASE WHEN value >= $threshold THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_success, " +
        "list([CAST(event_id AS DOUBLE), " +
        s"CASE WHEN value >= $threshold THEN 1.0e0 ELSE 0.0e0 END] " +
        "ORDER BY event_id) AS sl FROM events GROUP BY 1)",
      "f AS (SELECT event_type, n_total, n_success, " +
        "list_reduce(list_prepend([0.0e0, 0.0e0, 0.0e0], sl), " +
        "(a, x) -> CASE WHEN a[3] <> 0.0e0 THEN a ELSE " +
        s"[$step, a[2] + 1.0e0, " +
        s"CASE WHEN ($step) >= $up THEN 1.0e0 " +
        s"WHEN ($step) <= $lo THEN -1.0e0 ELSE 0.0e0 END] END) " +
        "AS st FROM w)"),
      "SELECT event_type, n_total, n_success, " +
        "CASE WHEN st[3] = 1.0e0 THEN 'reject_h0' " +
        "WHEN st[3] = -1.0e0 THEN 'accept_h0' ELSE 'continue' END " +
        "AS decision, " +
        "CAST(CASE WHEN st[3] <> 0.0e0 THEN st[2] ELSE -1.0e0 END " +
        "AS BIGINT) AS n_at_decision, st[1] AS llr_final " +
        "FROM f ORDER BY event_type")
  }

  /** Lagged cross-correlation replay (q304,
    * [[operators.Seasonal.crossCorrelation]]): exact-cent Pearson
    * sums per lag, one fixed float expression tree.
    */
  def q304CrossCorrelation(maxLag: Int): String = {
    import graft.functions.Grid.snapSql
    val ccf = snapSql(
      "CASE WHEN n >= 2 AND n * CAST(sxx AS DOUBLE) - " +
        "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0 " +
        "AND n * CAST(syy AS DOUBLE) - " +
        "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <> 0 " +
        "THEN (n * CAST(sxy AS DOUBLE) - " +
        "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
        "sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * " +
        "CAST(sx AS DOUBLE)) * (n * CAST(syy AS DOUBLE) - " +
        "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END", 4)
    val per = (0 to maxLag).map { k =>
      s"l$k AS (SELECT $k AS lag, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(a.v) AS BIGINT) AS sx, " +
        "CAST(sum(b.v) AS BIGINT) AS sy, " +
        "CAST(sum(a.v * a.v) AS BIGINT) AS sxx, " +
        "CAST(sum(b.v * b.v) AS BIGINT) AS syy, " +
        "CAST(sum(a.v * b.v) AS BIGINT) AS sxy " +
        s"FROM xs a JOIN ys b ON a.t + $k = b.t)"
    }
    val sel = (0 to maxLag).map(k => s"SELECT * FROM l$k")
      .mkString(" UNION ALL ")
    withClause(Seq(
      "d AS (SELECT o_orderpriority AS k, date_diff('day', " +
        "DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day, " +
        "round(sum(o_totalprice), 2) AS rev FROM orders GROUP BY 1, 2)",
      "w AS MATERIALIZED (SELECT day, " +
        "max(CASE WHEN k = '1-URGENT' THEN rev END) AS x, " +
        "max(CASE WHEN k = '5-LOW' THEN rev END) AS y " +
        "FROM d GROUP BY 1)",
      "xs AS MATERIALIZED (SELECT day AS t, " +
        "CAST(floor(x * 100.0 + 0.5) AS BIGINT) AS v FROM w " +
        "WHERE x IS NOT NULL)",
      "ys AS MATERIALIZED (SELECT day AS t, " +
        "CAST(floor(y * 100.0 + 0.5) AS BIGINT) AS v FROM w " +
        "WHERE y IS NOT NULL)") ++ per,
      s"SELECT lag, n, $ccf AS ccf FROM ($sel) ORDER BY lag")
  }

  /** Cross-split leakage replay (q279,
    * [[operators.Dedup.crossSplitLeakage]]): banded candidates +
    * Jaccard verify over the whole corpus, the splitmix 80/20 test
    * flag, cross-split pair classification, and the distinct
    * contaminated-test-doc count.
    */
  val q279SplitLeakage: String = {
    val head = Seq(
      "dz AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS z " +
        "FROM documents)")
    val mixed = mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
    }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    withClause(bandedCtes("") ++ closureCtes("") ++ head ++ mixed ++ Seq(
      s"spl AS (SELECT doc_id, $signedMod >= 8000 AS is_test FROM dm5)",
      "cp AS (SELECT v.a_id, v.b_id, sa.is_test AS ta, " +
        "sb.is_test AS tb FROM ver v " +
        "JOIN spl sa ON sa.doc_id = v.a_id " +
        "JOIN spl sb ON sb.doc_id = v.b_id)",
      "con AS (SELECT DISTINCT cid FROM (SELECT CASE WHEN ta " +
        "THEN a_id ELSE b_id END AS cid FROM cp WHERE ta <> tb))"),
      "SELECT (SELECT CAST(count(*) AS BIGINT) FROM cp) AS n_dup_pairs, " +
        "(SELECT CAST(coalesce(sum(CASE WHEN ta <> tb THEN 1 ELSE 0 " +
        "END), 0) AS BIGINT) FROM cp) AS n_cross_pairs, " +
        "(SELECT CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) " +
        "AS BIGINT) FROM spl) AS n_test, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM con) AS n_contaminated, " +
        "round((SELECT CAST(count(*) AS DOUBLE) FROM con) / " +
        "(SELECT sum(CASE WHEN is_test THEN 1 ELSE 0 END) FROM spl), " +
        "6) AS contamination_rate")
  }

  /** Capstone replay (q280): the q279 audit run under BOTH split
    * strategies — hash-of-doc vs hash-of-cluster-canonical (labels
    * from the recursive closure, the q51 device) — side by side.
    */
  val q280ClusterSplitCapstone: String = {
    val mixD = mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
    }
    val mixC = mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "cz" else s"cm${n - 1}"
        s"cm$n AS ($body FROM $prev)"
    }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    def summary(tag: String, cp: String, spl: String, con: String) =
      s"SELECT '$tag' AS strategy, " +
        s"(SELECT CAST(count(*) AS BIGINT) FROM $cp) AS n_dup_pairs, " +
        s"(SELECT CAST(coalesce(sum(CASE WHEN ta <> tb THEN 1 ELSE 0 " +
        s"END), 0) AS BIGINT) FROM $cp) AS n_cross_pairs, " +
        s"(SELECT CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) " +
        s"AS BIGINT) FROM $spl) AS n_test, " +
        s"(SELECT CAST(count(*) AS BIGINT) FROM $con) " +
        "AS n_contaminated, " +
        s"round((SELECT CAST(count(*) AS DOUBLE) FROM $con) / " +
        s"(SELECT sum(CASE WHEN is_test THEN 1 ELSE 0 END) " +
        s"FROM $spl), 6) AS contamination_rate"
    withClause(bandedCtes("") ++ closureCtes("") ++ Seq(
      "dz AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS z " +
        "FROM documents)") ++ mixD ++ Seq(
      s"spl AS (SELECT doc_id, $signedMod >= 8000 AS is_test FROM dm5)",
      "lab AS (SELECT d.doc_id, coalesce(r.component, d.doc_id) " +
        "AS component FROM (SELECT doc_id FROM documents) d " +
        "LEFT JOIN reach r ON r.node = d.doc_id)",
      "cz AS (SELECT doc_id, CAST(component AS HUGEINT) AS z " +
        "FROM lab)") ++ mixC ++ Seq(
      s"spl2 AS (SELECT doc_id, $signedMod >= 8000 AS is_test " +
        "FROM cm5)",
      "cp AS (SELECT v.a_id, v.b_id, sa.is_test AS ta, " +
        "sb.is_test AS tb FROM ver v " +
        "JOIN spl sa ON sa.doc_id = v.a_id " +
        "JOIN spl sb ON sb.doc_id = v.b_id)",
      "con AS (SELECT DISTINCT cid FROM (SELECT CASE WHEN ta " +
        "THEN a_id ELSE b_id END AS cid FROM cp WHERE ta <> tb))",
      "cp2 AS (SELECT v.a_id, v.b_id, sa.is_test AS ta, " +
        "sb.is_test AS tb FROM ver v " +
        "JOIN spl2 sa ON sa.doc_id = v.a_id " +
        "JOIN spl2 sb ON sb.doc_id = v.b_id)",
      "con2 AS (SELECT DISTINCT cid FROM (SELECT CASE WHEN ta " +
        "THEN a_id ELSE b_id END AS cid FROM cp2 WHERE ta <> tb))"),
      summary("by_cluster", "cp2", "spl2", "con2") + " UNION ALL " +
        summary("by_doc", "cp", "spl", "con") + " ORDER BY strategy")
  }

  /** FK-audit replay (q276,
    * [[operators.Expectations.referentialIntegrity]]): per edge, the
    * key-grain full outer join classified into null-FK / orphan /
    * unreferenced masses, one summary row per edge.
    */
  def q276FkAudit(
      edges: Seq[(String, String, String, String, String)]): String = {
    val parts = edges.zipWithIndex.flatMap {
      case ((rel, ct, fk, pt, pk), i) => Seq(
        s"f$i AS (SELECT $fk AS k, count(*) AS c FROM $ct GROUP BY 1)",
        s"p$i AS (SELECT DISTINCT $pk AS k, 1 AS p FROM $pt)",
        s"j$i AS (SELECT * FROM f$i FULL OUTER JOIN p$i USING (k))",
        s"s$i AS (SELECT '$rel' AS relation, " +
          "CAST(coalesce(sum(c), 0) AS BIGINT) AS n_child, " +
          "CAST(coalesce(sum(CASE WHEN k IS NULL THEN c END), 0) " +
          "AS BIGINT) AS n_null_fk, " +
          "CAST(coalesce(sum(CASE WHEN k IS NOT NULL AND p IS NULL " +
          "THEN c END), 0) AS BIGINT) AS n_orphan_rows, " +
          "CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS n_parent, " +
          "CAST(sum(CASE WHEN p IS NOT NULL AND c IS NULL THEN 1 " +
          "ELSE 0 END) AS BIGINT) AS n_unreferenced " +
          s"FROM j$i)")
    }
    val sel = edges.indices.map(i =>
      "SELECT relation, n_child, n_null_fk, n_orphan_rows, " +
        "round(CAST(n_orphan_rows AS DOUBLE) / n_child, 6) " +
        "AS orphan_rate, n_parent, n_unreferenced, " +
        "round(1.0e0 - CAST(n_unreferenced AS DOUBLE) / n_parent, 6) " +
        s"AS coverage FROM s$i").mkString(" UNION ALL ")
    withClause(parts, sel + " ORDER BY relation")
  }

  /** V-optimal-histogram replay (q275,
    * [[operators.Analyze.vOptimalHistogram]]): equi-width cells with
    * exact long sums, the interval-SSE table from cumsums (same
    * operand order as the driver's `ss − s·s/c`), one MATERIALIZED DP
    * layer per bucket (min with the smallest-split tie via
    * row_number), and a backtrace CTE per layer.
    */
  def q275VOptimalHistogram(inputCells: Int, buckets: Int): String = {
    val layers = (2 to buckets).map { l =>
      s"e$l AS MATERIALIZED (SELECT k, e, j AS split FROM (" +
        "SELECT iv.k, round(p.e + iv.sse, 6) AS e, iv.j, " +
        "row_number() OVER (PARTITION BY iv.k " +
        "ORDER BY round(p.e + iv.sse, 6), iv.j) AS rn " +
        s"FROM iv JOIN e${l - 1} p ON p.k = iv.j - 1 " +
        s"WHERE iv.j >= ${l - 1}) WHERE rn = 1)"
    }
    val bts = (buckets to 1 by -1).map { l =>
      if (l == buckets)
        s"bt$l AS (SELECT e$l.split AS j FROM e$l, nn " +
          s"WHERE e$l.k = nn.n - 1)"
      else
        s"bt$l AS (SELECT e$l.split AS j FROM e$l " +
          s"JOIN bt${l + 1} b ON e$l.k = b.j - 1)"
    }
    val bounds = (1 to buckets)
      .map(l => s"SELECT $l AS bucket, j FROM bt$l")
      .mkString(" UNION ALL ")
    val ssePool =
      "CAST(kk.css - (jj.css - jj.ss) AS DOUBLE) - " +
        "(CAST(kk.cs - (jj.cs - jj.s) AS DOUBLE) * " +
        "(kk.cs - (jj.cs - jj.s))) / (kk.cc - (jj.cc - jj.cnt))"
    withClause(Seq(
      "vals AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents " +
        "WHERE n_chars IS NOT NULL)",
      "vmm AS (SELECT min(v) AS mn, max(v) AS mx FROM vals)",
      s"crq AS (SELECT CAST(((v - mn) * $inputCells) // " +
        "(mx - mn + 1) AS INT) AS cell, count(*) AS cnt, " +
        "sum(v) AS s, sum(v * v) AS ss FROM vals, vmm GROUP BY 1)",
      "cells AS (SELECT cell, cnt, s, ss, " +
        "CAST(row_number() OVER (ORDER BY cell) - 1 AS INT) AS idx " +
        "FROM crq)",
      "cum AS (SELECT idx, cell, cnt, s, ss, " +
        "sum(cnt) OVER w AS cc, sum(s) OVER w AS cs, " +
        "sum(ss) OVER w AS css FROM cells " +
        "WINDOW w AS (ORDER BY idx ROWS UNBOUNDED PRECEDING))",
      "nn AS (SELECT CAST(count(*) AS INT) AS n FROM cells)",
      "iv AS (SELECT jj.idx AS j, kk.idx AS k, " +
        s"round($ssePool, 6) AS sse " +
        "FROM cum jj JOIN cum kk ON jj.idx <= kk.idx)",
      "e1 AS (SELECT k, sse AS e, 0 AS split FROM iv WHERE j = 0)") ++
      layers ++ bts ++ Seq(
      s"bounds AS ($bounds)",
      "rng AS (SELECT bucket, j AS lo, " +
        "coalesce(lead(j) OVER (ORDER BY bucket) - 1, " +
        "(SELECT n - 1 FROM nn)) AS hi FROM bounds)"),
      "SELECT b.bucket, cl.cell AS cell_lo, ch.cell AS cell_hi, " +
        "vmm.mn + CAST(floor(CAST(cl.cell AS DOUBLE) * " +
        s"((vmm.mx - vmm.mn + 1) / CAST($inputCells AS DOUBLE))) " +
        "AS BIGINT) AS value_lo, " +
        "CAST(kk.cc - (jj.cc - jj.cnt) AS BIGINT) AS cnt, " +
        "round(CAST(kk.cs - (jj.cs - jj.s) AS DOUBLE) / " +
        "(kk.cc - (jj.cc - jj.cnt)), 4) AS mean, " +
        "round(i2.sse, 4) AS sse " +
        "FROM rng b JOIN cells cl ON cl.idx = b.lo " +
        "JOIN cells ch ON ch.idx = b.hi " +
        "JOIN cum jj ON jj.idx = b.lo JOIN cum kk ON kk.idx = b.hi " +
        "JOIN iv i2 ON i2.j = b.lo AND i2.k = b.hi, vmm " +
        "ORDER BY b.bucket")
  }

  /** Shapley-attribution replay (q274,
    * [[operators.Attribution.shapleyAttribution]]): user → channel
    * set, v(S) rates at 1e-6, and a LITERAL subset-weight table
    * (weights emitted as the JVM's exact Double.toString, `e0`-forced
    * to DOUBLE) whose per-channel terms fold in sorted-subset order
    * with the same re-round as the driver computation.
    */
  def q274ShapleyAttribution(channels: Seq[String],
      convType: String): String = {
    import graft.functions.Grid.snapSql
    val sorted = channels.sorted
    val nC = sorted.size
    def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
    val rows = sorted.flatMap { c =>
      val others = sorted.filterNot(_ == c)
      (0 until (1 << others.size)).map { mask =>
        val s = others.zipWithIndex.filter { case (_, i) =>
          (mask & (1 << i)) != 0
        }.map(_._1)
        val w = fact(s.size) * fact(nC - s.size - 1) / fact(nC)
        val k0 = s.sorted.mkString(",")
        val k1 = (s :+ c).sorted.mkString(",")
        s"('$c', '$k0', '$k1', ${w}e0)"
      }
    }
    withClause(Seq(
      "users AS (SELECT user_id, list_sort(list(DISTINCT event_type) " +
        s"FILTER (WHERE event_type <> '$convType')) AS chs, " +
        s"max(CASE WHEN event_type = '$convType' THEN 1 ELSE 0 END) " +
        "AS conv FROM events GROUP BY user_id)",
      "v AS (SELECT coalesce(array_to_string(chs, ','), '') AS skey, " +
        snapSql("CAST(sum(conv) AS DOUBLE) / CAST(count(*) AS DOUBLE)") +
        " AS v FROM users GROUP BY 1)",
      s"wt(channel, k0, k1, w) AS (VALUES ${rows.mkString(", ")})",
      "tm AS (SELECT wt.channel, wt.k0, " +
        "wt.w * (coalesce(v1.v, 0.0e0) - coalesce(v0.v, 0.0e0)) " +
        "AS term FROM wt LEFT JOIN v v1 ON v1.skey = wt.k1 " +
        "LEFT JOIN v v0 ON v0.skey = wt.k0)"),
      "SELECT channel, CAST(count(*) AS BIGINT) AS n_subsets, " +
        "list_reduce(list_prepend(0.0e0, list(term ORDER BY k0)), " +
        s"(a, x) -> ${snapSql("a + x")}) AS shapley " +
        "FROM tm GROUP BY channel ORDER BY channel")
  }

  /** NB k-fold cross-validation replay (q271,
    * [[operators.QualityClassifier.crossValidateNb]]): splitmix fold
    * assignment, per-(token, fold) class counts, complement models by
    * count subtraction, per-fold smoothing over the complement
    * vocabulary, and scoring through the (token, fold) join — all
    * log-ratios on the 1e-6 grid like the Spark side.
    */
  def q271NbCrossVal(k: Int): String = {
    val head = Seq(
      "dz AS (SELECT doc_id, text, lang = 'en' AS y, " +
        "CAST(doc_id AS HUGEINT) AS z FROM documents)")
    val mixed = mixStages(Seq("z"), Seq("doc_id", "text", "y"))
      .zipWithIndex.map { case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
      }
    val fold = s"CAST((((${toSigned("z")}) % $k + $k) % $k) AS INTEGER)"
    withClause(head ++ mixed ++ Seq(
      s"df AS (SELECT doc_id, text, y, $fold AS fold FROM dm5)",
      s"dtok AS (SELECT doc_id, fold, y, unnest($Toks) AS token " +
        "FROM df)",
      "tc AS (SELECT token, fold, " +
        "CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cp, " +
        "CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS cn " +
        "FROM dtok GROUP BY 1, 2)",
      "tt AS (SELECT token, CAST(sum(cp) AS BIGINT) AS tpt, " +
        "CAST(sum(cn) AS BIGINT) AS tnt FROM tc GROUP BY token)",
      s"fl AS (SELECT CAST(unnest(range(0, $k)) AS INTEGER) AS fold)",
      "cmp AS (SELECT t.token, f.fold, " +
        "t.tpt - coalesce(c.cp, 0) AS ccp, " +
        "t.tnt - coalesce(c.cn, 0) AS ccn " +
        "FROM tt t CROSS JOIN fl f LEFT JOIN tc c " +
        "ON c.token = t.token AND c.fold = f.fold " +
        "WHERE t.tpt - coalesce(c.cp, 0) + t.tnt - coalesce(c.cn, 0) " +
        "> 0)",
      "occ AS (SELECT fold, CAST(count(*) AS BIGINT) AS v, " +
        "CAST(sum(ccp) AS BIGINT) AS tp, " +
        "CAST(sum(ccn) AS BIGINT) AS tn FROM cmp GROUP BY fold)",
      "dt AS (SELECT fold, " +
        "CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np_f, " +
        "CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS nn_f " +
        "FROM df GROUP BY fold)",
      "gr AS (SELECT " +
        "CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np, " +
        "CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS nn " +
        "FROM df)",
      "meta AS (SELECT o.fold, o.v, o.tp, o.tn, " +
        "round(ln(1.0e0 / (o.tp + 1.0e0 * o.v)) - " +
        "ln(1.0e0 / (o.tn + 1.0e0 * o.v)), 6) AS oov, " +
        "round(ln(CAST(g.np - d.np_f AS DOUBLE) / " +
        "CAST(g.nn - d.nn_f AS DOUBLE)), 6) AS prior " +
        "FROM occ o JOIN dt d ON d.fold = o.fold, gr g)",
      "lr AS (SELECT c.token, c.fold, " +
        "round(ln((c.ccp + 1.0e0) / (m.tp + 1.0e0 * m.v)) - " +
        "ln((c.ccn + 1.0e0) / (m.tn + 1.0e0 * m.v)), 6) AS llr " +
        "FROM cmp c JOIN meta m ON m.fold = c.fold)",
      "pd AS (SELECT d.doc_id, sum(coalesce(l.llr, m.oov)) AS s " +
        "FROM dtok d LEFT JOIN lr l " +
        "ON l.token = d.token AND l.fold = d.fold " +
        "JOIN meta m ON m.fold = d.fold GROUP BY d.doc_id)",
      "sc AS (SELECT f.doc_id, f.fold, f.y, " +
        "m.prior + coalesce(p.s, 0.0e0) AS score FROM df f " +
        "LEFT JOIN pd p ON p.doc_id = f.doc_id " +
        "JOIN meta m ON m.fold = f.fold)"),
      "SELECT fold, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos, " +
        "CAST(sum(CASE WHEN (score > 0) = y THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_correct, " +
        "round(CAST(sum(CASE WHEN (score > 0) = y THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / count(*), 4) AS accuracy, " +
        "round(avg(score), 4) AS mean_score " +
        "FROM sc GROUP BY fold ORDER BY fold")
  }

  /** BFS replay (q270, [[operators.Graph.bfsDistances]]): the
    * customer↔part bipartite graph (both directions), seed parts of
    * one brand, `maxHops` MATERIALIZED frontier rounds (frontier =
    * edge join minus settled — the exact anti-join the operator
    * runs).
    */
  def q270BfsDistances(maxHops: Int, brand: String): String = {
    val hops = (1 to maxHops).flatMap { h =>
      Seq(
        s"f$h AS MATERIALIZED (SELECT DISTINCT e.d AS node " +
          s"FROM f${h - 1} f JOIN e ON f.node = e.s " +
          s"WHERE e.d NOT IN (SELECT node FROM d${h - 1}))",
        s"d$h AS MATERIALIZED (SELECT node, dist FROM d${h - 1} " +
          s"UNION ALL SELECT node, $h AS dist FROM f$h)")
    }
    withClause(Seq(
      "e0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS s, " +
        "'p' || CAST(l_partkey AS VARCHAR) AS d FROM orders " +
        "JOIN lineitem ON o_orderkey = l_orderkey)",
      "e AS MATERIALIZED (SELECT s, d FROM e0 " +
        "UNION ALL SELECT d, s FROM e0)",
      "d0 AS (SELECT DISTINCT 'p' || CAST(p_partkey AS VARCHAR) " +
        s"AS node, 0 AS dist FROM part WHERE p_brand = '$brand')",
      "f0 AS (SELECT node FROM d0)") ++ hops,
      "SELECT CAST(dist AS INTEGER) AS dist, " +
        "CAST(count(*) AS BIGINT) AS n_nodes, " +
        "md5(array_to_string(list_sort(list(node)), ',')) AS nodes_md5 " +
        s"FROM d$maxHops GROUP BY dist ORDER BY dist")
  }

  /** Embedding-outlier replay (q291,
    * [[operators.Similarity.embeddingOutliers]]): the q268 plane
    * chain, in-list pairs, per-anchor top-k by (cos DESC, id), the
    * ordered fold mean, isolated vectors at −1, bottom-N heap.
    */
  def q291EmbeddingOutliers(k: Int, bottomN: Int): String = withClause(
    planesCtes() ++ Seq(
      "proj AS (SELECT e.vec_id, e.embedding, pv.p, " +
        s"${projection("e.embedding")} AS pr " +
        "FROM embeddings e CROSS JOIN pv pv)",
      "asg AS (SELECT vec_id, embedding, p AS list_id FROM " +
        "(SELECT vec_id, embedding, p, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY pr DESC, p DESC) AS rk " +
        "FROM proj) WHERE rk = 1)",
      "opairs AS (SELECT a.vec_id AS anchor, b.vec_id AS b_id, " +
        graft.functions.Grid.snapSql(
          "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), " +
          "CAST(b.embedding AS DOUBLE[]))") + " AS cos " +
        "FROM asg a JOIN asg b ON a.list_id = b.list_id " +
        "AND a.vec_id <> b.vec_id)",
      "tk AS (SELECT anchor, rn, cos FROM (SELECT anchor, cos, " +
        "row_number() OVER (PARTITION BY anchor " +
        "ORDER BY cos DESC, b_id) AS rn FROM opairs) " +
        s"WHERE rn <= $k)",
      "ag AS (SELECT anchor, CAST(count(*) AS BIGINT) AS n_neighbors, " +
        graft.functions.Grid.snapSql("CAST(list_reduce(list_prepend(" +
          "0.0e0, list(cos ORDER BY rn)), (a, x) -> " +
          graft.functions.Grid.snapSql("a + x") +
          ") AS DOUBLE) / CAST(count(*) AS DOUBLE)") +
        " AS knn_sim FROM tk GROUP BY anchor)"),
    "SELECT a2.vec_id AS anchor, " +
      "coalesce(ag.n_neighbors, 0) AS n_neighbors, " +
      "coalesce(ag.knn_sim, -1.0e0) AS knn_sim " +
      "FROM (SELECT vec_id FROM asg) a2 " +
      "LEFT JOIN ag ON ag.anchor = a2.vec_id " +
      s"ORDER BY knn_sim, anchor LIMIT $bottomN")

  /** LOO kNN-accuracy replay (q295,
    * [[operators.Similarity.knnLabelAccuracy]]): the q268 labeled
    * pair chain, per-anchor top-k, majority vote with the smaller-
    * label tie, per-label accuracy.
    */
  def q295KnnAccuracy(k: Int): String = withClause(
    planesCtes() ++ Seq(
      "proj AS (SELECT e.vec_id, e.embedding, e.label, pv.p, " +
        s"${projection("e.embedding")} AS pr " +
        "FROM embeddings e CROSS JOIN pv pv)",
      "asg AS (SELECT vec_id, embedding, label, p AS list_id FROM " +
        "(SELECT vec_id, embedding, label, p, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY pr DESC, p DESC) AS rk " +
        "FROM proj) WHERE rk = 1)",
      "kpairs AS (SELECT a.vec_id AS anchor, a.label AS true_lbl, " +
        "b.vec_id AS b_id, b.label AS nb_lbl, " +
        graft.functions.Grid.snapSql(
          "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), " +
          "CAST(b.embedding AS DOUBLE[]))") + " AS cos " +
        "FROM asg a JOIN asg b ON a.list_id = b.list_id " +
        "AND a.vec_id <> b.vec_id)",
      "tk AS (SELECT anchor, true_lbl, nb_lbl FROM (SELECT anchor, " +
        "true_lbl, nb_lbl, row_number() OVER (PARTITION BY anchor " +
        "ORDER BY cos DESC, b_id) AS rn FROM kpairs) " +
        s"WHERE rn <= $k)",
      "vt AS (SELECT anchor, true_lbl, nb_lbl, count(*) AS v " +
        "FROM tk GROUP BY 1, 2, 3)",
      "pr2 AS (SELECT anchor, true_lbl, nb_lbl AS pred_lbl FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY anchor " +
        "ORDER BY v DESC, nb_lbl) AS pk FROM vt) WHERE pk = 1)"),
    "SELECT true_lbl AS label, CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(CASE WHEN pred_lbl = true_lbl THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS n_correct, " +
      graft.functions.Grid.snapSql("CAST(sum(CASE WHEN pred_lbl = " +
        "true_lbl THEN 1 ELSE 0 END) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE)") + " AS accuracy " +
      "FROM pr2 GROUP BY true_lbl ORDER BY label")

  /** Triplet-mining replay (q268, [[operators.Similarity
    * .mineTriplets]]): the q85 plane-assignment chain, BOTH-direction
    * in-list pairs with labels and 1e-6-rounded cosines, hardest
    * positive (min cos, id tie), then the semi-hard-else-hardest
    * negative pick via (semi DESC, cos DESC, id).
    */
  val q268TripletMining: String = withClause(
    planesCtes() ++ Seq(
      "proj AS (SELECT e.vec_id, e.embedding, e.label, pv.p, " +
        s"${projection("e.embedding")} AS pr " +
        "FROM embeddings e CROSS JOIN pv pv)",
      "asg AS (SELECT vec_id, embedding, label, p AS list_id FROM " +
        "(SELECT vec_id, embedding, label, p, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY pr DESC, p DESC) AS rk " +
        "FROM proj) WHERE rk = 1)",
      "tpairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        "a.label AS la, b.label AS lb, " +
        graft.functions.Grid.snapSql(
          "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), " +
          "CAST(b.embedding AS DOUBLE[]))") + " AS cos " +
        "FROM asg a JOIN asg b ON a.list_id = b.list_id " +
        "AND a.vec_id <> b.vec_id)",
      "hp AS (SELECT a_id, b_id AS pos_id, cos AS pos_cos FROM " +
        "(SELECT a_id, b_id, cos, row_number() OVER " +
        "(PARTITION BY a_id ORDER BY cos, b_id) AS rn FROM tpairs " +
        "WHERE la = lb) WHERE rn = 1)",
      "ng AS (SELECT p.a_id, p.pos_id, p.pos_cos, q.b_id AS neg_id, " +
        "q.cos AS neg_cos, q.cos < p.pos_cos AS semi_hard " +
        "FROM hp p JOIN tpairs q ON q.a_id = p.a_id AND q.la <> q.lb)",
      "pick AS (SELECT *, row_number() OVER (PARTITION BY a_id " +
        "ORDER BY semi_hard DESC, neg_cos DESC, neg_id) AS rn FROM ng)"),
    "SELECT a_id AS anchor, pos_id, pos_cos, neg_id, neg_cos, " +
      "semi_hard FROM pick WHERE rn = 1 ORDER BY anchor")

  /** Quantile-sample sketch replay (q220,
    * [[operators.QuantileSketch.sampleRegistersBy]]): per-source
    * bottom-k of the splitmix64∘fnv1a64 doc-id hash carrying n_chars,
    * nearest-rank readout over the sample (integer rank rule), and the
    * exact per-source nearest-rank quantiles for the audit columns.
    * The (h, id) rank tie-break mirrors the Spark side (id is the
    * STRING cast, so ordering agrees byte-for-byte).
    */
  def q220QuantileSketch(k: Int): String = {
    val head = Seq(
      "d AS (SELECT source, CAST(doc_id AS VARCHAR) AS id, " +
        "CAST(n_chars AS BIGINT) AS v FROM documents " +
        "WHERE n_chars IS NOT NULL)",
      s"h0 AS (SELECT source, id, v, ${fnv("id")} AS z FROM d)")
    val mixed = mixStages(Seq("z"), Seq("source", "id", "v")).zipWithIndex
      .map { case (body, n) =>
        val prev = if (n == 0) "h0" else s"hm${n - 1}"
        s"hm$n AS ($body FROM $prev)"
      }
    withClause(head ++ mixed ++ Seq(
      s"sk AS (SELECT source, id, v, ${toSigned("z")} AS h FROM hm5)",
      "rk AS (SELECT source, v, row_number() OVER (PARTITION BY source " +
        "ORDER BY h, id) AS rank FROM sk)",
      s"reg AS (SELECT source, v FROM rk WHERE rank <= $k)",
      "ri AS (SELECT source, v, row_number() OVER (PARTITION BY source " +
        "ORDER BY v) AS i, count(*) OVER (PARTITION BY source) " +
        "AS n_kept FROM reg)",
      "pc AS (SELECT unnest([50, 90, 99]) AS pct)",
      "est AS (SELECT source, pct, CAST(n_kept AS BIGINT) AS n_kept, " +
        "v AS q_est FROM ri, pc WHERE i = (pct * n_kept + 99) // 100)",
      "xi AS (SELECT source, v, row_number() OVER (PARTITION BY source " +
        "ORDER BY v) AS i, count(*) OVER (PARTITION BY source) " +
        "AS n_docs FROM d)",
      "ext AS (SELECT source, pct, CAST(n_docs AS BIGINT) AS n_docs, " +
        "v AS q_exact FROM xi, pc WHERE i = (pct * n_docs + 99) // 100)"),
      "SELECT e.source, e.pct, x.n_docs, e.n_kept, e.q_est, x.q_exact " +
        "FROM est e JOIN ext x ON x.source = e.source AND x.pct = e.pct " +
        "ORDER BY e.source, e.pct")
  }

  /** Sketch-boundary winsorize replay (q222,
    * [[operators.Robust.winsorizedProfileSketch]]): the q220 bottom-k
    * register chain keyed by order priority carrying money-grid
    * doubles, 5/95 nearest-rank boundaries over the sample, then the
    * exact clamp + means of [[operators.Robust.winsorizedProfile]]'s
    * oracle. Money sums are exact in double on the cent grid, so the
    * unordered aggregation is portable (the q206 precedent).
    */
  def q222WinsorizedSketch(k: Int): String = {
    val head = Seq(
      "d AS (SELECT o_orderpriority AS grp, " +
        "CAST(o_orderkey AS VARCHAR) AS id, " +
        "CAST(o_totalprice AS DOUBLE) AS v FROM orders " +
        "WHERE o_totalprice IS NOT NULL)",
      s"h0 AS (SELECT grp, id, v, ${fnv("id")} AS z FROM d)")
    val mixed = mixStages(Seq("z"), Seq("grp", "id", "v")).zipWithIndex
      .map { case (body, n) =>
        val prev = if (n == 0) "h0" else s"hm${n - 1}"
        s"hm$n AS ($body FROM $prev)"
      }
    withClause(head ++ mixed ++ Seq(
      s"sk AS (SELECT grp, id, v, ${toSigned("z")} AS h FROM hm5)",
      "rk AS (SELECT grp, v, row_number() OVER (PARTITION BY grp " +
        "ORDER BY h, id) AS rank FROM sk)",
      s"reg AS (SELECT grp, v FROM rk WHERE rank <= $k)",
      "ri AS (SELECT grp, v, row_number() OVER (PARTITION BY grp " +
        "ORDER BY v) AS i, count(*) OVER (PARTITION BY grp) " +
        "AS nk FROM reg)",
      "pc AS (SELECT unnest([5, 95]) AS pct)",
      "qb AS (SELECT grp, pct, v AS q FROM ri, pc " +
        "WHERE i = (pct * nk + 99) // 100)",
      "bd AS (SELECT grp, max(CASE WHEN pct = 5 THEN q END) AS lo, " +
        "max(CASE WHEN pct = 95 THEN q END) AS hi FROM qb GROUP BY grp)"),
      "SELECT d.grp, CAST(count(*) AS BIGINT) AS n, lo, hi, " +
        "round(sum(v) / count(*), 4) AS mean_raw, " +
        "round(sum(greatest(lo, least(hi, v))) / count(*), 4) " +
        "AS mean_winsorized " +
        "FROM d JOIN bd USING (grp) GROUP BY d.grp, lo, hi ORDER BY grp")
  }

  /** IVF-bounded margin-mining replay (q219): the q87/q93 trained
    * k-means chain (`kmTrainCtes`), `nAssign`-nearest assignment
    * (`kmAssignCte` with `rk <= nAssign`), candidate pairs DISTINCT
    * over any shared list, then the exact q150 margin chain
    * (rounded-grid top-`k` avgK, ratio margin, per-x best partner)
    * over that candidate table only.
    */
  def q219MarginMiningIvf(nLists: Int, nAssign: Int, k: Int): String =
    withClause(kmTrainCtes(nLists) ++ Seq(
      kmAssignCte("asg", "c2", take = nAssign),
      "cand AS (SELECT DISTINCT a.vec_id AS x, b.vec_id AS y " +
        "FROM asg a JOIN asg b ON a.cid = b.cid " +
        "AND a.vec_id <> b.vec_id)",
      "p AS (SELECT c.x, c.y, " +
        "list_cosine_similarity(ea.v, eb.v) AS cos " +
        "FROM cand c JOIN e ea ON ea.vec_id = c.x " +
        "JOIN e eb ON eb.vec_id = c.y)",
      "r AS (SELECT x, y, cos, row_number() OVER (PARTITION BY x " +
        "ORDER BY " + graft.functions.Grid.snapSql("cos", 4) +
        " DESC, y) AS rn FROM p)",
      s"ak AS (SELECT x, avg(cos) AS avg_k FROM r WHERE rn <= $k " +
        "GROUP BY x)",
      "sc AS (SELECT p.x, p.y, p.cos, " +
        graft.functions.Grid.snapSql(
          "p.cos / ((ax.avg_k + ay.avg_k) / 2)", 4) + " AS margin " +
        "FROM p JOIN ak ax ON ax.x = p.x JOIN ak ay ON ay.x = p.y)",
      "bst AS (SELECT x, y, cos, margin, row_number() OVER " +
        "(PARTITION BY x ORDER BY margin DESC, y) AS rn FROM sc)"),
      "SELECT x, y AS best_match, " +
        graft.functions.Grid.snapSql("cos", 4) + " AS cos, margin " +
        "FROM bst WHERE rn = 1 ORDER BY x")

  /** Scaled-bitext replay (q333): [[q219MarginMiningIvf]]'s trained-
    * IVF candidate chain with the CROSS-LANGUAGE constraint applied to
    * the candidate table before the distinct, then the identical
    * margin chain; langs joined back onto the winner row exactly like
    * the brute q325 readout.
    */
  def q333BitextMiningIvf(nLists: Int, nAssign: Int, k: Int): String =
    withClause(kmTrainCtes(nLists) ++ Seq(
      kmAssignCte("asg", "c2", take = nAssign),
      "lg AS (SELECT doc_id AS vec_id, lang FROM documents)",
      "cand AS (SELECT DISTINCT a.vec_id AS x, b.vec_id AS y " +
        "FROM asg a JOIN asg b ON a.cid = b.cid " +
        "AND a.vec_id <> b.vec_id " +
        "JOIN lg la ON la.vec_id = a.vec_id " +
        "JOIN lg lb ON lb.vec_id = b.vec_id " +
        "WHERE la.lang <> lb.lang)",
      "p AS (SELECT c.x, c.y, " +
        "list_cosine_similarity(ea.v, eb.v) AS cos " +
        "FROM cand c JOIN e ea ON ea.vec_id = c.x " +
        "JOIN e eb ON eb.vec_id = c.y)",
      "r AS (SELECT x, y, cos, row_number() OVER (PARTITION BY x " +
        "ORDER BY " + graft.functions.Grid.snapSql("cos", 4) +
        " DESC, y) AS rn FROM p)",
      s"ak AS (SELECT x, avg(cos) AS avg_k FROM r WHERE rn <= $k " +
        "GROUP BY x)",
      "sc AS (SELECT p.x, p.y, p.cos, " +
        graft.functions.Grid.snapSql(
          "p.cos / ((ax.avg_k + ay.avg_k) / 2)", 4) + " AS margin " +
        "FROM p JOIN ak ax ON ax.x = p.x JOIN ak ay ON ay.x = p.y)",
      "bst AS (SELECT x, y, cos, margin, row_number() OVER " +
        "(PARTITION BY x ORDER BY margin DESC, y) AS rn FROM sc)"),
      "SELECT b.x, b.y AS best_match, " +
        graft.functions.Grid.snapSql("b.cos", 4) + " AS cos, b.margin, " +
        "lx.lang AS x_lang, ly.lang AS match_lang " +
        "FROM bst b JOIN lg lx ON lx.vec_id = b.x " +
        "JOIN lg ly ON ly.vec_id = b.y " +
        "WHERE b.rn = 1 ORDER BY b.x")

  /** Persisted-index bitext probe replay (q392,
    * [[operators.Similarity.bitextProbeIndexed]]): centroids train on
    * the ENGLISH side only (`kmTrainCtes` over the filtered `e`), the
    * index side assigns nearest-1 (what [[operators.Similarity
    * .writeIvfIndex]] wrote — the write/append split is invisible,
    * the q109 disk-round-trip precedent), the foreign delta probes
    * its `nAssign` nearest lists, and the FORWARD margin ranks each
    * probe's candidates (`cos / avgK(x)` — the indexed side never
    * probes back).
    */
  def q392BitextIndexProbe(nLists: Int, nAssign: Int,
      k: Int): String = {
    import graft.functions.Grid.snapSql
    val enWhere = " WHERE vec_id IN (SELECT doc_id FROM documents " +
      "WHERE lang = 'en')"
    withClause(kmTrainCtes(nLists, enWhere) ++ Seq(
      kmAssignCte("iasg", "c2", take = 1),
      "ed AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings " +
        "WHERE vec_id IN (SELECT doc_id FROM documents " +
        "WHERE lang <> 'en'))",
      "dasg AS (SELECT vec_id, v, cid FROM " +
        "(SELECT vec_id, v, cid, dist, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM " +
        s"(SELECT d.vec_id, d.v, c.cid, ${kmDist("d.v", "c.vec")} " +
        "AS dist FROM ed d CROSS JOIN c2 c)) " +
        s"WHERE rk <= $nAssign)",
      "p AS (SELECT d.vec_id AS x, i.vec_id AS y, " +
        "list_cosine_similarity(d.v, i.v) AS cos " +
        "FROM dasg d JOIN iasg i ON i.cid = d.cid)",
      "r AS (SELECT x, y, cos, row_number() OVER (PARTITION BY x " +
        "ORDER BY " + snapSql("cos", 4) + " DESC, y) AS rn FROM p)",
      s"ak AS (SELECT x, avg(cos) AS avg_k FROM r WHERE rn <= $k " +
        "GROUP BY x)",
      "sc AS (SELECT p.x, p.y, p.cos, " +
        snapSql("p.cos / ax.avg_k", 4) + " AS margin " +
        "FROM p JOIN ak ax ON ax.x = p.x)",
      "bst AS (SELECT x, y, cos, margin, row_number() OVER " +
        "(PARTITION BY x ORDER BY margin DESC, y) AS rn FROM sc)",
      "lg AS (SELECT doc_id AS vec_id, lang FROM documents)"),
      "SELECT b.x, b.y AS best_match, " +
        snapSql("b.cos", 4) + " AS cos, b.margin, " +
        "lx.lang AS x_lang " +
        "FROM bst b JOIN lg lx ON lx.vec_id = b.x " +
        "WHERE b.rn = 1 ORDER BY b.x")
  }

  /** Semantic-contamination replay (q393): centroids train on the
    * TRAINING slice, train assigns nearest-1, the benchmark probes
    * `nAssign` lists, snapped cosine ≥ threshold, per-benchmark-doc
    * readout (count, max cos, argmax-offender via the keyed
    * row_number).
    */
  /** The shared q393/q396 chain: train-side centroids, nearest-1
    * train assignment, nAssign benchmark probe, snapped-cosine
    * threshold → `hf(bench_id, train_id, cos)`.
    */
  private def semContamCtes(nLists: Int, nAssign: Int,
      benchBelow: Long, threshold: Double): Seq[String] = {
    import graft.functions.Grid.snapSql
    kmTrainCtes(nLists, s" WHERE vec_id >= $benchBelow") ++ Seq(
      kmAssignCte("tasg", "c2", take = 1),
      "eb AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings " +
        s"WHERE vec_id < $benchBelow)",
      "basg AS (SELECT vec_id, v, cid FROM " +
        "(SELECT vec_id, v, cid, dist, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM " +
        s"(SELECT b.vec_id, b.v, c.cid, ${kmDist("b.v", "c.vec")} " +
        "AS dist FROM eb b CROSS JOIN c2 c)) " +
        s"WHERE rk <= $nAssign)",
      "hits AS (SELECT b.vec_id AS bench_id, t.vec_id AS train_id, " +
        snapSql("list_cosine_similarity(b.v, t.v)", 4) + " AS cos " +
        "FROM basg b JOIN tasg t ON t.cid = b.cid)",
      s"hf AS (SELECT * FROM hits WHERE cos >= " +
        s"${graft.functions.Grid.lit17(threshold)})")
  }

  def q393SemanticContamination(nLists: Int, nAssign: Int,
      benchBelow: Long, threshold: Double): String =
    withClause(
      semContamCtes(nLists, nAssign, benchBelow, threshold) :+
      ("rk2 AS (SELECT *, row_number() OVER (PARTITION BY bench_id " +
        "ORDER BY cos DESC, train_id) AS rn FROM hf)"),
      "SELECT bench_id, CAST(count(*) AS BIGINT) AS n_contaminated, " +
        "max(cos) AS max_cos, " +
        "max(CASE WHEN rn = 1 THEN train_id END) AS worst_offender " +
        "FROM rk2 GROUP BY bench_id ORDER BY bench_id")

  /** Decontamination readout replay (q396): distinct flagged train
    * ids, the language join, per-language counts and the snapped
    * flag rate.
    */
  def q396SemanticDecontamination(nLists: Int, nAssign: Int,
      benchBelow: Long, threshold: Double): String = {
    import graft.functions.Grid.snapSql
    withClause(
      semContamCtes(nLists, nAssign, benchBelow, threshold) ++ Seq(
      "fl AS (SELECT DISTINCT train_id FROM hf)",
      "lg AS (SELECT doc_id AS vec_id, lang FROM documents)",
      "base AS (SELECT e.vec_id, lg.lang FROM embeddings e " +
        s"JOIN lg ON lg.vec_id = e.vec_id " +
        s"WHERE e.vec_id >= $benchBelow)",
      "agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_train, " +
        "CAST(sum(CASE WHEN fl.train_id IS NOT NULL THEN 1 ELSE 0 " +
        "END) AS BIGINT) AS n_flagged " +
        "FROM base LEFT JOIN fl ON fl.train_id = base.vec_id " +
        "GROUP BY lang)"),
      "SELECT lang, n_train, n_flagged, " +
        "n_train - n_flagged AS n_kept, " +
        snapSql("CAST(n_flagged AS DOUBLE) / " +
          "CAST(n_train AS DOUBLE)", 6) + " AS flag_rate " +
        "FROM agg ORDER BY lang")
  }

  /** IVF drift-audit replay (q395, [[operators.Similarity
    * .ivfListProfile]] over a base-write + drifted-append index):
    * base assigns nearest-1 to its own trained centroids, the
    * drifted half (float +0.5 on dim 1, then the double cast — the
    * same arithmetic order as the Spark synth) assigns to the SAME
    * standing centroids, per-list means cross as exact 1e-6 integer
    * sums.
    */
  /** The shared base-write + drifted-append audit CTE chain (ends in
    * `agg(cid, n_base, n_appended, sb, sa)`) and the two 1e-6-grid
    * mean expressions — q395's replay, reused verbatim by the q400
    * maintenance-plan oracle.
    */
  private def ivfDriftCtes(nLists: Int,
      drift: String = "0.5"): Seq[String] =
    kmTrainCtes(nLists, " WHERE vec_id % 2 = 0") ++ Seq(
      kmAssignCte("iasg", "c2", take = 1),
      "ed AS (SELECT vec_id, list_transform(range(1, 65), " +
        "j -> CAST(CASE WHEN j = 1 THEN embedding[j] + " +
        s"CAST($drift AS REAL) ELSE embedding[j] END AS DOUBLE)) AS v " +
        "FROM embeddings WHERE vec_id % 2 = 1)",
      "dasg AS (SELECT vec_id, v, cid, dist FROM " +
        "(SELECT vec_id, v, cid, dist, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM " +
        s"(SELECT d.vec_id, d.v, c.cid, ${kmDist("d.v", "c.vec")} " +
        "AS dist FROM ed d CROSS JOIN c2 c)) WHERE rk = 1)",
      "un AS (SELECT cid, 0 AS app, CAST(floor(dist * 1000000.0e0 " +
        "+ 0.5e0) AS BIGINT) AS nano FROM iasg " +
        "UNION ALL SELECT cid, 1, CAST(floor(dist * 1000000.0e0 " +
        "+ 0.5e0) AS BIGINT) FROM dasg)",
      "agg AS (SELECT cid, CAST(sum(1 - app) AS BIGINT) AS n_base, " +
        "CAST(sum(app) AS BIGINT) AS n_appended, " +
        "CAST(sum(CASE WHEN app = 0 THEN nano END) AS BIGINT) AS sb, " +
        "CAST(sum(CASE WHEN app = 1 THEN nano END) AS BIGINT) AS sa " +
        "FROM un GROUP BY cid)")

  private def driftMeanBaseSql: String =
    graft.functions.Grid.snapSql("CAST(sb AS DOUBLE) / (1000000.0e0 * " +
      "CAST(n_base AS DOUBLE))", 6)

  private def driftMeanAppendedSql: String =
    graft.functions.Grid.snapSql("CAST(sa AS DOUBLE) / (1000000.0e0 * " +
      "CAST(n_appended AS DOUBLE))", 6)

  def q395IvfDriftAudit(nLists: Int): String =
    withClause(ivfDriftCtes(nLists),
      "SELECT CAST(cid AS INTEGER) AS list_id, n_base, n_appended, " +
        driftMeanBaseSql + " AS mean_dist_base, " +
        driftMeanAppendedSql + " AS mean_dist_appended " +
        "FROM agg ORDER BY list_id")

  /** Maintenance-plan replay (q400, [[operators.Similarity
    * .ivfMaintenancePlan]] over the q395 lifecycle): the drift audit
    * plus the decision layer. The file count replays as ARITHMETIC —
    * write and append each produce exactly one file per touched list
    * (`repartition(list_id)` puts a list's rows in one task, so
    * `partitionBy` writes one file per (task, list)), so `n_files =
    * [n_base > 0] + [n_appended > 0]` — the Spark side counts the
    * REAL directory listing and must agree.
    */
  def q400IvfMaintenance(nLists: Int, retrainRatio: Double,
      maxFilesPerList: Int): String = {
    val nf = "(CASE WHEN n_base > 0 THEN 1 ELSE 0 END + " +
      "CASE WHEN n_appended > 0 THEN 1 ELSE 0 END)"
    val ratio = graft.functions.Grid.lit17(retrainRatio)
    // the q400 fixture plants a STRONG drift (+2.0 on dim 1) so the
    // retrain branch actually fires at gate scale (+0.5 reassigns
    // too gently to trip the 1.5x alarm)
    withClause(ivfDriftCtes(nLists, drift = "2.0"),
      "SELECT CAST(cid AS INTEGER) AS list_id, n_base, n_appended, " +
        driftMeanBaseSql + " AS mean_dist_base, " +
        driftMeanAppendedSql + " AS mean_dist_appended, " +
        s"CAST($nf AS BIGINT) AS n_files, " +
        "CASE WHEN n_appended > 0 AND n_base > 0 AND " +
        s"$driftMeanAppendedSql > $ratio * $driftMeanBaseSql " +
        "THEN 'retrain' " +
        s"WHEN $nf > $maxFilesPerList THEN 'compact' " +
        "ELSE 'ok' END AS action " +
        "FROM agg ORDER BY list_id")
  }

  /** Retrain-executed replay (q402, [[operators.Similarity
    * .retrainIvfIndex]] closing the q395→q400 lifecycle): k-means
    * re-trains on the union of the base build and the
    * drifted-as-written appends (the float +0.5 then double cast —
    * the exact bytes the index holds), every row re-assigns to the
    * NEW matrix, and the audit + decision replay over it. n_files
    * replays as the constant 1 — a fresh rewrite is one file per
    * populated list.
    */
  def q402IvfRetrain(nLists: Int, retrainRatio: Double,
      maxFilesPerList: Int): String = {
    val union =
      "SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings " +
        "WHERE vec_id % 2 = 0 " +
        "UNION ALL SELECT vec_id, list_transform(range(1, 65), " +
        "j -> CAST(CASE WHEN j = 1 THEN embedding[j] + " +
        "CAST(2.0 AS REAL) ELSE embedding[j] END AS DOUBLE)) " +
        "FROM embeddings WHERE vec_id % 2 = 1"
    val ratio = graft.functions.Grid.lit17(retrainRatio)
    withClause(kmTrainCtesFrom(nLists, union) ++ Seq(
      kmAssignCte("a3", "c2", take = 1),
      "un AS (SELECT cid, CAST(vec_id % 2 AS INTEGER) AS app, " +
        "CAST(floor(dist * 1000000.0e0 + 0.5e0) AS BIGINT) AS nano " +
        "FROM a3)",
      "agg AS (SELECT cid, CAST(sum(1 - app) AS BIGINT) AS n_base, " +
        "CAST(sum(app) AS BIGINT) AS n_appended, " +
        "CAST(sum(CASE WHEN app = 0 THEN nano END) AS BIGINT) AS sb, " +
        "CAST(sum(CASE WHEN app = 1 THEN nano END) AS BIGINT) AS sa " +
        "FROM un GROUP BY cid)"),
      "SELECT CAST(cid AS INTEGER) AS list_id, n_base, n_appended, " +
        driftMeanBaseSql + " AS mean_dist_base, " +
        driftMeanAppendedSql + " AS mean_dist_appended, " +
        "CAST(1 AS BIGINT) AS n_files, " +
        "CASE WHEN n_appended > 0 AND n_base > 0 AND " +
        s"$driftMeanAppendedSql > $ratio * $driftMeanBaseSql " +
        "THEN 'retrain' " +
        s"WHEN 1 > $maxFilesPerList THEN 'compact' " +
        "ELSE 'ok' END AS action " +
        "FROM agg ORDER BY list_id")
  }

  /** Cross-modal contamination replay (q401, [[operators.MediaDedup
    * .crossNearDupBest]]): train bits = the q235/q236 integer aHash
    * replay; eval bits over the planted populations (exact copy,
    * +3-every-16th perturbation, pixel-REVERSED fresh content — the
    * reverse replays as the 63−i reindex); cross pairs at
    * Hamming ≤ 3 (lossless by the 4-block pigeonhole, so the oracle
    * states plain all-pairs), best match by (hamming, train id),
    * verdict left-joined over the whole eval set.
    */
  val q401CrossmodalContamination: String = {
    def wide(src: String, out: String): Seq[String] = Seq(
      s"${out}s AS (SELECT media_id, sum(p) AS tot FROM $src " +
        "GROUP BY 1)",
      s"${out}b AS (SELECT c.media_id, i, " +
        "CASE WHEN 64 * p > tot THEN 1 ELSE 0 END AS b " +
        s"FROM $src c JOIN ${out}s s USING (media_id))",
      s"${out}k AS (SELECT media_id, i // 16 AS blk, " +
        "CAST(sum(b * (1::BIGINT << CAST(15 - (i % 16) AS INT))) " +
        s"AS BIGINT) AS bv FROM ${out}b GROUP BY 1, 2)",
      s"$out AS (SELECT media_id, " +
        "max(CASE WHEN blk = 0 THEN bv END) AS b0, " +
        "max(CASE WHEN blk = 1 THEN bv END) AS b1, " +
        "max(CASE WHEN blk = 2 THEN bv END) AS b2, " +
        "max(CASE WHEN blk = 3 THEN bv END) AS b3 " +
        s"FROM ${out}k GROUP BY 1)")
    val ham = "bit_count(xor(e.b0, t.b0)) + bit_count(xor(e.b1, " +
      "t.b1)) + bit_count(xor(e.b2, t.b2)) + bit_count(xor(e.b3, t.b3))"
    withClause(Seq(
      "base AS (SELECT vec_id AS media_id, i, " +
        "CAST(greatest(0, least(255, floor((CAST(embedding[i+1] " +
        "AS DOUBLE) + 1.0) * 127.5))) AS BIGINT) AS p " +
        "FROM embeddings, range(64) t(i))",
      "ev AS (SELECT media_id + 200000 AS media_id, i, p FROM base " +
        "WHERE media_id % 4 = 0 " +
        "UNION ALL SELECT media_id + 200000, i, " +
        "CASE WHEN i % 16 = 0 THEN least(p + 3, 255) ELSE p END " +
        "FROM base WHERE media_id % 4 = 1 " +
        "UNION ALL SELECT media_id + 200000, 63 - i, p FROM base " +
        "WHERE media_id % 4 >= 2)") ++
      wide("base", "tw") ++ wide("ev", "ew") ++ Seq(
      s"hits AS (SELECT e.media_id AS e_id, t.media_id AS t_id, " +
        s"CAST($ham AS INTEGER) AS hamming " +
        s"FROM ew e JOIN tw t ON $ham <= 3)",
      "bst AS (SELECT * FROM (SELECT *, row_number() OVER " +
        "(PARTITION BY e_id ORDER BY hamming, t_id) AS rn FROM hits) " +
        "WHERE rn = 1)"),
      "SELECT ids.media_id, bst.t_id IS NOT NULL AS contaminated, " +
        "bst.t_id AS match_id, bst.hamming " +
        "FROM (SELECT DISTINCT media_id FROM ev) ids " +
        "LEFT JOIN bst ON bst.e_id = ids.media_id " +
        "ORDER BY ids.media_id")
  }

  /** The q328 two-channel audio-hash replay over a population CTE
    * `src(media_id, i, v)` → 4-block hash table `out(media_id,
    * b0..b3)` — shared by the q404 cross-corpus probe's two sides.
    */
  private def audioHashCtes(src: String, out: String): Seq[String] = Seq(
    s"${out}f0 AS (SELECT media_id, CAST(i // 2 AS INTEGER) AS f, " +
      "i, v, lag(v) OVER (PARTITION BY media_id, i // 2 ORDER BY i) " +
      s"AS p FROM $src)",
    s"${out}fr AS (SELECT media_id, f, " +
      "CAST(sum(v * v) AS BIGINT) AS e, " +
      "CAST(sum(CASE WHEN p IS NOT NULL AND ((p < 0 AND v >= 0) " +
      "OR (p >= 0 AND v < 0)) THEN 1 ELSE 0 END) AS BIGINT) AS z " +
      s"FROM ${out}f0 WHERE i // 2 < 32 GROUP BY media_id, f)",
    s"${out}t AS (SELECT media_id, CAST(count(*) AS BIGINT) AS nf, " +
      "CAST(sum(e) AS BIGINT) AS te, CAST(sum(z) AS BIGINT) AS tz " +
      s"FROM ${out}fr GROUP BY media_id)",
    s"${out}b AS (SELECT fr.media_id, fr.f, " +
      "CASE WHEN fr.e * t.nf > t.te THEN 1 ELSE 0 END AS be, " +
      "CASE WHEN fr.z * t.nf > t.tz THEN 1 ELSE 0 END AS bz " +
      s"FROM ${out}fr fr JOIN ${out}t t USING (media_id))",
    s"$out AS (SELECT media_id, " +
      "CAST(sum(CASE WHEN f // 16 = 0 THEN be * (1::BIGINT << " +
      "CAST(15 - (f % 16) AS INT)) ELSE 0 END) AS BIGINT) AS b0, " +
      "CAST(sum(CASE WHEN f // 16 = 1 THEN be * (1::BIGINT << " +
      "CAST(15 - (f % 16) AS INT)) ELSE 0 END) AS BIGINT) AS b1, " +
      "CAST(sum(CASE WHEN f // 16 = 0 THEN bz * (1::BIGINT << " +
      "CAST(15 - (f % 16) AS INT)) ELSE 0 END) AS BIGINT) AS b2, " +
      "CAST(sum(CASE WHEN f // 16 = 1 THEN bz * (1::BIGINT << " +
      "CAST(15 - (f % 16) AS INT)) ELSE 0 END) AS BIGINT) AS b3 " +
      s"FROM ${out}b GROUP BY media_id)")

  /** AUDIO cross-corpus contamination replay (q404 — the q401 device
    * for the audio modality): train = the raw PCM population, eval =
    * exact copies (%4=0), +40-every-8th perturbations (%4=1), and
    * sample-REVERSED fresh content (%4∈{2,3}, the 63−i reindex);
    * both sides hash through the q328 two-channel replay, cross
    * pairs at Hamming ≤ 3, best by (hamming, train id).
    */
  val q404AudioContamination: String = {
    val ham = "bit_count(xor(e.b0, t.b0)) + bit_count(xor(e.b1, " +
      "t.b1)) + bit_count(xor(e.b2, t.b2)) + bit_count(xor(e.b3, t.b3))"
    withClause(Seq(
      "base AS (SELECT vec_id AS media_id, i, " +
        "CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 10000.0) " +
        "AS BIGINT) AS raw FROM embeddings, range(64) t(i))",
      "tr AS (SELECT media_id, i, " +
        "greatest(-32768, least(32767, raw)) AS v FROM base)",
      "ev AS (SELECT media_id + 200000 AS media_id, i, " +
        "greatest(-32768, least(32767, raw)) AS v FROM base " +
        "WHERE media_id % 4 = 0 " +
        "UNION ALL SELECT media_id + 200000, i, " +
        "greatest(-32768, least(32767, CASE WHEN i % 8 = 0 " +
        "THEN raw + 40 ELSE raw END)) FROM base WHERE media_id % 4 = 1 " +
        "UNION ALL SELECT media_id + 200000, 63 - i, " +
        "greatest(-32768, least(32767, raw)) FROM base " +
        "WHERE media_id % 4 >= 2)") ++
      audioHashCtes("tr", "tw") ++ audioHashCtes("ev", "ew") ++ Seq(
      s"hits AS (SELECT e.media_id AS e_id, t.media_id AS t_id, " +
        s"CAST($ham AS INTEGER) AS hamming " +
        s"FROM ew e JOIN tw t ON $ham <= 3)",
      "bst AS (SELECT * FROM (SELECT *, row_number() OVER " +
        "(PARTITION BY e_id ORDER BY hamming, t_id) AS rn FROM hits) " +
        "WHERE rn = 1)"),
      "SELECT ids.media_id, bst.t_id IS NOT NULL AS contaminated, " +
        "bst.t_id AS match_id, bst.hamming " +
        "FROM (SELECT DISTINCT media_id FROM ev) ids " +
        "LEFT JOIN bst ON bst.e_id = ids.media_id " +
        "ORDER BY ids.media_id")
  }

  /** Cross-lingual semantic near-dup replay (q334): the q93 trained
    * SemDeDup chain (train → nAssign-nearest lists → within-list pairs
    * canonical a<b, min over shared lists) at `threshold`, with the
    * language join + cross-language filter on the verified set.
    */
  def q334XlingSemanticNearDup(nLists: Int, nAssign: Int,
      threshold: Double): String =
    withClause(kmTrainCtes(nLists) ++ Seq(
      kmAssignCte("asg", "c2", take = nAssign),
      "lg AS (SELECT doc_id AS vec_id, lang FROM documents)",
      "pr AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        "list_cosine_similarity(a.v, b.v) AS cos " +
        "FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id)",
      "pairs AS (SELECT a_id, b_id, min(cos) AS cos FROM pr " +
        "GROUP BY a_id, b_id)",
      "hit AS (SELECT * FROM pairs WHERE cos >= " +
        s"${graft.functions.Grid.lit17(threshold)})"),
      "SELECT h.a_id, h.b_id, la.lang AS lang_a, lb.lang AS lang_b, " +
        s"${graft.functions.Grid.snapSql("h.cos", 4)} AS cos " +
        "FROM hit h JOIN lg la ON la.vec_id = h.a_id " +
        "JOIN lg lb ON lb.vec_id = h.b_id WHERE la.lang <> lb.lang " +
        "ORDER BY h.a_id, h.b_id")

  /** Bitext margin-sweep replay (q335): [[q333BitextMiningIvf]]'s
    * chain through the scored table `sc` (no best-row selection),
    * language joined onto the x side, then the cutoff readout — one
    * non-equi join against the bounded cutoff list, counts per
    * (cutoff, x_lang).
    */
  def q335BitextMarginSweep(nLists: Int, nAssign: Int, k: Int,
      cuts: Seq[Double]): String =
    withClause(kmTrainCtes(nLists) ++ Seq(
      kmAssignCte("asg", "c2", take = nAssign),
      "lg AS (SELECT doc_id AS vec_id, lang FROM documents)",
      "cand AS (SELECT DISTINCT a.vec_id AS x, b.vec_id AS y " +
        "FROM asg a JOIN asg b ON a.cid = b.cid " +
        "AND a.vec_id <> b.vec_id " +
        "JOIN lg la ON la.vec_id = a.vec_id " +
        "JOIN lg lb ON lb.vec_id = b.vec_id " +
        "WHERE la.lang <> lb.lang)",
      "p AS (SELECT c.x, c.y, " +
        "list_cosine_similarity(ea.v, eb.v) AS cos " +
        "FROM cand c JOIN e ea ON ea.vec_id = c.x " +
        "JOIN e eb ON eb.vec_id = c.y)",
      "r AS (SELECT x, y, cos, row_number() OVER (PARTITION BY x " +
        "ORDER BY " + graft.functions.Grid.snapSql("cos", 4) +
        " DESC, y) AS rn FROM p)",
      s"ak AS (SELECT x, avg(cos) AS avg_k FROM r WHERE rn <= $k " +
        "GROUP BY x)",
      "sc AS (SELECT p.x, p.y, p.cos, " +
        graft.functions.Grid.snapSql(
          "p.cos / ((ax.avg_k + ay.avg_k) / 2)", 4) + " AS margin " +
        "FROM p JOIN ak ax ON ax.x = p.x JOIN ak ay ON ay.x = p.y)",
      "cuts AS (SELECT unnest([" +
        cuts.map(graft.functions.Grid.lit17).mkString(", ") +
        "]) AS cutoff)",
      "m AS (SELECT sc.x, lg.lang AS x_lang, sc.margin FROM sc " +
        "JOIN lg ON lg.vec_id = sc.x)"),
      "SELECT c.cutoff, m.x_lang, CAST(count(*) AS BIGINT) AS n_mined, " +
        "CAST(count(DISTINCT m.x) AS BIGINT) AS n_docs " +
        "FROM m JOIN cuts c ON m.margin >= c.cutoff " +
        "GROUP BY c.cutoff, m.x_lang ORDER BY c.cutoff, m.x_lang")

  /** Bitext-recall eval replay (q338): the brute q325 chain AND the
    * trained-IVF q333 chain, both over the identical `vec_id < slice`
    * subset (kmTrainCtes' e carries the slice, so training inits from
    * the slice's smallest ids exactly like the Spark side), joined on
    * x for the per-language agreement readout.
    */
  def q338BitextRecall(slice: Int, nLists: Int, nAssign: Int,
      k: Int): String = {
    import graft.functions.Grid.snapSql
    withClause(kmTrainCtes(nLists, s" WHERE vec_id < $slice") ++ Seq(
      s"lg AS (SELECT doc_id AS vec_id, lang FROM documents " +
        s"WHERE doc_id < $slice)",
      "eb AS (SELECT e.vec_id, e.v, lg.lang FROM e " +
        "JOIN lg ON lg.vec_id = e.vec_id)",
      // brute (gold): all cross-language pairs
      "pb AS (SELECT a.vec_id AS x, b.vec_id AS y, " +
        "list_cosine_similarity(a.v, b.v) AS cos " +
        "FROM eb a JOIN eb b ON a.vec_id <> b.vec_id " +
        "AND a.lang <> b.lang)",
      "rb AS (SELECT x, y, cos, row_number() OVER (PARTITION BY x " +
        s"ORDER BY ${snapSql("cos", 4)} DESC, y) AS rn FROM pb)",
      s"akb AS (SELECT x, avg(cos) AS avg_k FROM rb WHERE rn <= $k " +
        "GROUP BY x)",
      "scb AS (SELECT pb.x, pb.y, " +
        s"${snapSql("pb.cos / ((ax.avg_k + ay.avg_k) / 2)", 4)} " +
        "AS margin FROM pb JOIN akb ax ON ax.x = pb.x " +
        "JOIN akb ay ON ay.x = pb.y)",
      "bstb AS (SELECT x, y, row_number() OVER (PARTITION BY x " +
        "ORDER BY margin DESC, y) AS rn FROM scb)",
      "gold AS (SELECT x, y AS g FROM bstb WHERE rn = 1)",
      // trained-IVF (got): shared-list cross-language candidates
      kmAssignCte("asg", "c2", take = nAssign),
      "cand AS (SELECT DISTINCT a.vec_id AS x, b.vec_id AS y " +
        "FROM asg a JOIN asg b ON a.cid = b.cid " +
        "AND a.vec_id <> b.vec_id " +
        "JOIN lg la ON la.vec_id = a.vec_id " +
        "JOIN lg lb ON lb.vec_id = b.vec_id " +
        "WHERE la.lang <> lb.lang)",
      "pv AS (SELECT c.x, c.y, " +
        "list_cosine_similarity(ea.v, eb2.v) AS cos " +
        "FROM cand c JOIN e ea ON ea.vec_id = c.x " +
        "JOIN e eb2 ON eb2.vec_id = c.y)",
      "rv AS (SELECT x, y, cos, row_number() OVER (PARTITION BY x " +
        s"ORDER BY ${snapSql("cos", 4)} DESC, y) AS rn FROM pv)",
      s"akv AS (SELECT x, avg(cos) AS avg_k FROM rv WHERE rn <= $k " +
        "GROUP BY x)",
      "scv AS (SELECT pv.x, pv.y, " +
        s"${snapSql("pv.cos / ((ax.avg_k + ay.avg_k) / 2)", 4)} " +
        "AS margin FROM pv JOIN akv ax ON ax.x = pv.x " +
        "JOIN akv ay ON ay.x = pv.y)",
      "bstv AS (SELECT x, y, row_number() OVER (PARTITION BY x " +
        "ORDER BY margin DESC, y) AS rn FROM scv)",
      "got AS (SELECT x, y AS gt FROM bstv WHERE rn = 1)",
      "ag AS (SELECT lg.lang AS x_lang, " +
        "CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(CASE WHEN got.gt = gold.g THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_agree " +
        "FROM gold LEFT JOIN got USING (x) " +
        "JOIN lg ON lg.vec_id = gold.x GROUP BY lg.lang)"),
      "SELECT x_lang, n_docs, n_agree, " +
        s"${snapSql("CAST(n_agree AS DOUBLE) / n_docs", 4)} AS recall " +
        "FROM ag ORDER BY x_lang")
  }

  /** LSH S-curve replay (q339): banded candidates over the sliced
    * corpus (the shared q18 CTEs), TRUE shingle-set jaccard for every
    * pair as exact integer intersect/union, capture per decile next
    * to the analytic 1-(1-s^4)^4 at the bin midpoint (pure IEEE
    * multiplications — no pow).
    */
  def q339LshScurve(slice: Int): String = {
    import graft.functions.Grid.snapSql
    // the planted graded near-copies (drop every k-th token,
    // k = 2 + doc_id % 9): DuckDB's 1-based lambda index absorbs the
    // Spark 0-based `i % k != 0` as `(i - 1) % k != 0`; both engines
    // rebuild the identical text string, so the shared tokenizer
    // fragments see the same corpus
    val base = s"(SELECT doc_id, text FROM documents " +
      s"WHERE doc_id < $slice " +
      "UNION ALL SELECT doc_id + 100000, " +
      "array_to_string(list_filter(string_split_regex(text, '\\s+'), " +
      "(t, i) -> (i - 1) % (2 + doc_id % 9) != 0), ' ') " +
      s"FROM documents WHERE doc_id < $slice)"
    val s = "((CAST(bin AS DOUBLE) + 0.5) / 10.0)"
    val s4 = s"($s * $s * $s * $s)"
    val t1 = s"(1.0 - $s4)"
    withClause(bandedCtes("", base) ++ Seq(
      s"tk AS (SELECT doc_id, $Toks AS t FROM $base d)",
      "shg AS (SELECT doc_id AS id, list_distinct(CASE WHEN " +
        "len(t) >= 3 THEN list_transform(range(0, len(t) - 2), " +
        "i -> array_to_string(t[i + 1 : i + 3], ' ')) " +
        "ELSE [array_to_string(t, ' ')] END) AS sh FROM tk)",
      "p AS (SELECT a.id AS a_id, b.id AS b_id, " +
        "CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS i, " +
        "CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) " +
        "AS u FROM shg a JOIN shg b ON a.id < b.id)",
      "binp AS (SELECT a_id, b_id, " +
        "CAST(least((i * 10) // u, 9) AS BIGINT) AS bin FROM p)",
      "j AS (SELECT binp.bin, CASE WHEN c.a_id IS NOT NULL THEN 1 " +
        "ELSE 0 END AS cf FROM binp LEFT JOIN cand c " +
        "ON c.a_id = binp.a_id AND c.b_id = binp.b_id)",
      "ag AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(cf) AS BIGINT) AS n_captured FROM j GROUP BY bin)"),
      "SELECT bin, n_pairs, n_captured, " +
        s"${snapSql("CAST(n_captured AS DOUBLE) / n_pairs", 4)} " +
        "AS capture, " +
        s"${snapSql(s"1.0 - $t1 * $t1 * $t1 * $t1", 4)} AS theory " +
        "FROM ag ORDER BY bin")
  }

  /** Dedup threshold-sweep replay (q345): the q18 banded-candidate
    * CTEs, exact token-set jaccard verify at the loose floor, then
    * the cutoff readout — pairs surviving and distinct b-side docs
    * dropped per jaccard cutoff.
    */
  def q345DedupThresholdSweep(floor: Double,
      cuts: Seq[Double]): String = {
    val jexpr = "CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) " +
      "/ len(list_distinct(list_concat(a.toks, b.toks)))"
    withClause(bandedCtes("") ++ Seq(
      s"dt AS (SELECT doc_id, list_distinct($Toks) AS toks " +
        "FROM documents)",
      s"ver AS (SELECT c.a_id, c.b_id, $jexpr AS j " +
        "FROM cand c JOIN dt a ON a.doc_id = c.a_id " +
        "JOIN dt b ON b.doc_id = c.b_id " +
        s"WHERE $jexpr >= ${graft.functions.Grid.lit17(floor)})",
      "cuts AS (SELECT unnest([" +
        cuts.map(graft.functions.Grid.lit17).mkString(", ") +
        "]) AS cutoff)"),
      "SELECT c.cutoff, CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(count(DISTINCT v.b_id) AS BIGINT) AS n_dropped " +
        "FROM ver v JOIN cuts c ON v.j >= c.cutoff " +
        "GROUP BY c.cutoff ORDER BY c.cutoff")
  }

  /** Cross-modal dedup agreement replay (q346): one planted corpus
    * (originals ∪ per-16th-dim perturbed copies — the q236 plant,
    * expressed on the EMBEDDING so both modalities derive from the
    * same rows; DuckDB's 1-based lambda index absorbs the Spark
    * 0-based `i % 16 = 0` as `(i-1) % 16 = 0`), the q235/q236 aHash
    * pigeonhole pair filter, the q85 hyperplane-list cosine pairs,
    * full-outer joined into the 2×2 agreement grid.
    */
  def q346CrossmodalAgreement(tau: Double): String = {
    val d17 = graft.functions.Grid.lit17(3.0 / 127.5)
    withClause(planesCtes() ++ Seq(
      "corp AS (SELECT vec_id, list_transform(embedding, " +
        "v -> CAST(v AS DOUBLE)) AS embedding FROM embeddings " +
        "UNION ALL SELECT vec_id + 100000, list_transform(embedding, " +
        s"(v, i) -> CAST(v AS DOUBLE) + CASE WHEN (i - 1) % 16 = 0 " +
        s"THEN $d17 ELSE 0.0 END) " +
        "FROM embeddings WHERE vec_id % 3 < 2)",
      "pxb AS (SELECT vec_id AS media_id, i, " +
        "CAST(greatest(0, least(255, " +
        "floor((embedding[i + 1] + 1.0) * 127.5))) AS BIGINT) AS p " +
        "FROM corp, range(64) t(i))",
      "ims AS (SELECT media_id, sum(p) AS tot FROM pxb GROUP BY 1)",
      "ibits AS (SELECT c.media_id, i, CASE WHEN 64 * p > tot " +
        "THEN 1 ELSE 0 END AS b FROM pxb c JOIN ims USING (media_id))",
      "iblk AS (SELECT media_id, i // 16 AS blk, " +
        "CAST(sum(b * (1::BIGINT << CAST(15 - (i % 16) AS INT))) " +
        "AS BIGINT) AS bv FROM ibits GROUP BY 1, 2)",
      "iw AS (SELECT media_id, " +
        "max(CASE WHEN blk = 0 THEN bv END) AS b0, " +
        "max(CASE WHEN blk = 1 THEN bv END) AS b1, " +
        "max(CASE WHEN blk = 2 THEN bv END) AS b2, " +
        "max(CASE WHEN blk = 3 THEN bv END) AS b3 FROM iblk GROUP BY 1)",
      "ip AS (SELECT a.media_id AS a_id, b.media_id AS b_id " +
        "FROM iw a JOIN iw b ON a.media_id < b.media_id " +
        "WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) " +
        "+ bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) " +
        "<= 3)",
      "proj AS (SELECT c.vec_id, c.embedding, pv.p, " +
        s"${projection("c.embedding")} AS pr FROM corp c " +
        "CROSS JOIN pv pv)",
      "asg AS (SELECT vec_id, embedding, p AS list_id FROM " +
        "(SELECT vec_id, embedding, p, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY pr DESC, p DESC) AS rk " +
        "FROM proj) WHERE rk = 1)",
      "ep AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id " +
        "FROM asg a JOIN asg b ON a.list_id = b.list_id " +
        "AND a.vec_id < b.vec_id " +
        "WHERE list_cosine_similarity(a.embedding, b.embedding) >= " +
        s"${graft.functions.Grid.lit17(tau)})",
      "u AS (SELECT ip.a_id IS NOT NULL AS img_dup, " +
        "ep.a_id IS NOT NULL AS emb_dup FROM ip " +
        "FULL OUTER JOIN ep ON ip.a_id = ep.a_id " +
        "AND ip.b_id = ep.b_id)"),
      "SELECT img_dup, emb_dup, CAST(count(*) AS BIGINT) AS n_pairs " +
        "FROM u GROUP BY img_dup, emb_dup ORDER BY img_dup, emb_dup")
  }

  /** Hedge/DoReMi replay (q341): the per-source underlength-rate loss
    * table, then `iters` unrolled multiplicative-weight rounds — each
    * round snaps `w·exp(η·ℓ)` to integer 1e-6 units, sums those
    * integers exactly (order-free), renormalizes on the grid —
    * mirroring [[operators.Mixture.hedgeMixtureWeights]] step for
    * step.
    */
  def q341DoremiWeights(eta: Double, iters: Int, minToks: Int): String = {
    import graft.functions.Grid.{lit17, snapSql}
    val head = Seq(
      s"d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
        s"CAST(sum(CASE WHEN len($Toks) < $minToks THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS hard FROM documents GROUP BY source)",
      "nl AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d)",
      s"w0 AS (SELECT source, n_docs, " +
        s"${snapSql("CAST(hard AS DOUBLE) / n_docs", 4)} AS loss, " +
        s"${snapSql("1.0 / nd", 6)} AS w FROM d, nl)")
    val rounds = (1 to iters).flatMap { k =>
      val prev = if (k == 1) "w0" else s"w${k - 1}"
      Seq(
        s"m$k AS (SELECT source, n_docs, loss, CAST(floor(w * " +
          s"exp(${lit17(eta)} * loss) * 1000000.0 + 0.5) AS BIGINT) " +
          s"AS mm FROM $prev)",
        s"t$k AS (SELECT CAST(sum(mm) AS BIGINT) AS tt FROM m$k)",
        s"w$k AS (SELECT source, n_docs, loss, " +
          s"${snapSql("CAST(mm AS DOUBLE) / tt", 6)} AS w " +
          s"FROM m$k, t$k)")
    }
    withClause(head ++ rounds,
      s"SELECT source, n_docs, loss, w AS weight FROM w$iters " +
        "ORDER BY source")
  }

  /** Fold-robust decontamination replay (q342): the q113 5-gram
    * containment CTEs over a base that aliases [[FoldedTextSql]] AS
    * text (the q320 device — shared fragments apply unchanged),
    * language and the 0.2 verdict joined onto the readout.
    */
  def q342FoldedDecontaminate(benchMax: Int, tau: Double): String =
    s"""WITH fd AS (SELECT doc_id, lang, $FoldedTextSql AS text
       |  FROM documents),
       |tk AS (SELECT doc_id, $Toks AS t FROM fd),
       |sg AS (SELECT doc_id, list_filter(
       |    list_distinct(CASE WHEN len(t) >= 5
       |    THEN list_transform(range(0, len(t) - 4),
       |      i -> array_to_string(t[i + 1 : i + 5], ' '))
       |    ELSE [array_to_string(t, ' ')] END),
       |    g -> g <> '') AS gs FROM tk),
       |bench AS (SELECT DISTINCT unnest(gs) AS gram FROM sg
       |  WHERE doc_id < $benchMax),
       |cg AS (SELECT doc_id, unnest(gs) AS gram FROM sg
       |  WHERE doc_id >= $benchMax),
       |ov AS (SELECT doc_id, count(*) AS n_overlap FROM cg
       |  JOIN bench USING (gram) GROUP BY doc_id),
       |per AS (SELECT doc_id, len(gs) AS n_grams FROM sg
       |  WHERE doc_id >= $benchMax),
       |res AS (SELECT p.doc_id, CAST(p.n_grams AS INTEGER) AS n_grams,
       |  CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       |  CASE WHEN p.n_grams = 0 THEN 0.0
       |    ELSE round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE)
       |      / p.n_grams, 4) END AS contamination_frac
       |  FROM per p LEFT JOIN ov o USING (doc_id))
       |SELECT r.doc_id, fd.lang, r.n_grams, r.n_overlap,
       |  r.contamination_frac,
       |  r.contamination_frac >= ${graft.functions.Grid.lit17(tau)}
       |    AS is_contaminated
       |FROM res r JOIN fd USING (doc_id)
       |ORDER BY r.doc_id""".stripMargin

  /** Trained char-3-gram langid replay (q340): the
    * [[operators.TrainedLangId]] chain — splitmix64 hash split,
    * per-(gram, lang) counts, log-probabilities snapped ONCE to
    * integer nanonats (the survival 1e-9 ln contract), exact integer
    * scoring `prior + Σ lp_present + (G − n_present)·oov`, argmax
    * with class-name tie-break, confusion grid on the holdout.
    */
  def q340CharNgramLangid(trainBuckets: Int,
      topN: Option[Int] = None): String =
    withClause(langidCtes(trainBuckets, topN, scoreAll = false),
      "SELECT lang_true AS lang, lang_pred, " +
        "CAST(count(*) AS BIGINT) AS n FROM best WHERE rn = 1 " +
        "GROUP BY lang_true, lang_pred ORDER BY lang, lang_pred")

  /** The trained-langid CTE chain ending in
    * `best(doc_id, lang_true, lang_pred, rn)` — q340/q343/q348's
    * replay, reusable by pipeline compositions (q349).
    * `scoreAll` scores EVERY document (the deployment shape: labels
    * exist only for the training seed) instead of the holdout only.
    */
  def langidCtes(trainBuckets: Int, topN: Option[Int],
      scoreAll: Boolean): Seq[String] = {
    val head = Seq(
      "lt AS (SELECT doc_id, lang, lower(text) AS t FROM documents)",
      "gs AS (SELECT doc_id, lang, CASE WHEN length(t) >= 3 THEN " +
        "list_transform(range(0, length(t) - 2), " +
        "i -> substr(t, CAST(i + 1 AS INTEGER), 3)) " +
        "ELSE [t] END AS g FROM lt)",
      // split-stage CTEs carry an l-prefix so pipeline compositions
      // (q349) can append the budget-mix chain, which builds its own
      // dz/dm* splitmix stages, without name clashes
      "ldz AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS z " +
        "FROM documents)")
    val mixed = mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "ldz" else s"ldm${n - 1}"
        s"ldm$n AS ($body FROM $prev)"
    }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    val sc9 = "CAST(floor(ln(%s) * 1000000000.0 + 0.5) AS BIGINT)"
    head ++ mixed ++ Seq(
      s"sp AS (SELECT doc_id, $signedMod < $trainBuckets AS is_train " +
        "FROM ldm5)",
      "tr AS (SELECT gs.* FROM gs JOIN sp USING (doc_id) " +
        "WHERE is_train)",
      (if (scoreAll) "te AS (SELECT gs.* FROM gs)"
       else "te AS (SELECT gs.* FROM gs JOIN sp USING (doc_id) " +
        "WHERE NOT is_train)"),
      "wg AS (SELECT lang, unnest(g) AS gr FROM tr)",
      "cnt AS (SELECT gr, lang, CAST(count(*) AS BIGINT) AS n " +
        "FROM wg GROUP BY gr, lang)",
      "vv AS (SELECT CAST(count(DISTINCT gr) AS BIGINT) AS v FROM cnt)",
      "tc AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tt FROM cnt " +
        "GROUP BY lang)",
      "nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS ndoc FROM tr " +
        "GROUP BY lang)",
      "ntot AS (SELECT CAST(sum(ndoc) AS BIGINT) AS nt FROM nd)",
      "cls AS (SELECT nd.lang, " +
        sc9.format("CAST(ndoc AS DOUBLE) / nt") + " AS prior_sc, " +
        sc9.format("1.0 / (tt + v)") + " AS oov_sc " +
        "FROM nd JOIN tc USING (lang), ntot, vv)",
      "lp AS (SELECT gr, lang, " +
        sc9.format("CAST(n + 1 AS DOUBLE) / (tt + v)") + " AS lp_sc " +
        "FROM cnt JOIN tc USING (lang), vv)",
      // pruned form (q348): keep the topN grams by (max lp DESC,
      // gram ASC) — a total order, so the kept set is deterministic;
      // dropped grams fall through to the OOV floor
      topN.map(t =>
        "rkm AS (SELECT gr, max(lp_sc) AS m FROM lp GROUP BY gr), " +
        s"keep AS (SELECT gr FROM rkm ORDER BY m DESC, gr LIMIT $t), " +
        "lps AS (SELECT lp.* FROM lp JOIN keep USING (gr))")
        .getOrElse("lps AS (SELECT * FROM lp)"),
      "hb AS (SELECT doc_id, lang AS lang_true, " +
        "CAST(len(g) AS BIGINT) AS ng FROM te)",
      "occ AS (SELECT doc_id, unnest(g) AS gr FROM te)",
      "pres AS (SELECT occ.doc_id, lps.lang, " +
        "CAST(sum(lp_sc) AS BIGINT) AS s, " +
        "CAST(count(*) AS BIGINT) AS np " +
        "FROM occ JOIN lps USING (gr) GROUP BY occ.doc_id, lps.lang)",
      "sco AS (SELECT h.doc_id, h.lang_true, c.lang, " +
        "c.prior_sc + coalesce(p.s, 0) + " +
        "(h.ng - coalesce(p.np, 0)) * c.oov_sc AS score " +
        "FROM hb h CROSS JOIN cls c LEFT JOIN pres p " +
        "ON p.doc_id = h.doc_id AND p.lang = c.lang)",
      // MATERIALIZED: downstream pipelines (q349's dedup + budget
      // mix) consume best through several branches — unpinned,
      // DuckDB re-inlines the whole train+score chain per branch
      // (~30 s of the round-14 compare pass on q349 alone)
      "best AS MATERIALIZED (SELECT doc_id, lang_true, " +
        "lang AS lang_pred, " +
        "row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY score DESC, lang) AS rn FROM sco)")
  }

  /** Langid-routed pipeline replay (q349): [[langidCtes]] scoring
    * EVERY document (labels exist only for the training seed), the
    * q319 fold dedup over PREDICTED languages, then the q322 budget
    * mix keyed by predicted language — the deployment composition
    * where the model, not the label column, routes the corpus.
    */
  def q349LangidPipeline(trainBuckets: Int, budget: Long,
      alpha: Double): String = {
    val stages = langidCtes(trainBuckets, None, scoreAll = true) ++ Seq(
      "prd AS (SELECT doc_id, lang_pred FROM best WHERE rn = 1)",
      "fd AS (SELECT d.doc_id, p.lang_pred AS lang, d.text " +
        "FROM documents d JOIN prd p USING (doc_id))",
      s"ff AS (SELECT doc_id, lang, text, $FoldedFpSql AS fp FROM fd)",
      "cx AS (SELECT fp, min(doc_id) AS canonical_id FROM ff " +
        "WHERE fp IS NOT NULL GROUP BY fp " +
        "HAVING count(*) >= 2 AND count(DISTINCT lang) >= 2)",
      "sv AS (SELECT ff.doc_id, ff.lang, ff.text FROM ff " +
        "LEFT JOIN cx USING (fp) " +
        "WHERE cx.canonical_id IS NULL OR ff.doc_id = cx.canonical_id)")
    q322LanguageBudgetMix(budget, alpha, base = "sv",
      extraCtes = stages)
  }

  /** Capstone-3 replay — the round-6 stages chained: first-occurrence
    * novelty filter (keep docs whose distinct 3-grams are majority-novel)
    * → SemDeDup over the survivors' embeddings (IVF argmax assignment +
    * within-list cosine, drop the higher id of each pair) → token
    * accounting. Every fragment is the one its standalone oracle
    * (q83/q85) verifies; the chain pins the COMPOSITION. Assignment runs
    * over ALL vectors (it is per-vector, independent of the subset) and
    * pairs are then restricted to novel ids — identical semantics to the
    * Spark side's subset-input dedup, without duplicating the fragment.
    */
  val q88CorpusPipelineV3: String = {
    val novelty = Seq(
      s"tok AS (SELECT doc_id, $Toks AS t FROM documents)",
      "g AS (SELECT doc_id, unnest(list_distinct(" +
        "CASE WHEN len(t) >= 3 THEN list_transform(range(0, len(t) - 2), " +
        "i -> array_to_string(t[i + 1 : i + 3], ' ')) " +
        "ELSE [array_to_string(t, ' ')] END)) AS gram FROM tok)",
      "f AS (SELECT gram, min(doc_id) AS first_id FROM g GROUP BY gram)",
      "nov AS (SELECT g.doc_id FROM g JOIN f USING (gram) " +
        "GROUP BY g.doc_id HAVING 2 * sum(CASE WHEN g.doc_id = f.first_id " +
        "THEN 1 ELSE 0 END) >= count(*))")
    val semantic = planesCtes() ++ Seq(
      "proj AS (SELECT e.vec_id, e.embedding, pv.p, " +
        s"${projection("e.embedding")} AS pr " +
        "FROM embeddings e CROSS JOIN pv pv)",
      "asg AS (SELECT vec_id, embedding, p AS list_id FROM " +
        "(SELECT vec_id, embedding, p, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY pr DESC, p DESC) AS rk FROM proj) " +
        "WHERE rk = 1)",
      "drops AS (SELECT DISTINCT b.vec_id AS b_id " +
        "FROM asg a JOIN asg b ON a.list_id = b.list_id " +
        "AND a.vec_id < b.vec_id " +
        "JOIN nov na ON na.doc_id = a.vec_id " +
        "JOIN nov nb ON nb.doc_id = b.vec_id " +
        "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), " +
        "CAST(b.embedding AS DOUBLE[])) >= 0.4)",
      "kept AS (SELECT n.doc_id FROM nov n " +
        "JOIN embeddings e ON e.vec_id = n.doc_id " +
        "WHERE n.doc_id NOT IN (SELECT b_id FROM drops))")
    withClause(novelty ++ semantic,
      "SELECT count(*) AS n_docs, " +
        "CAST(coalesce(sum(len(t)), 0) AS BIGINT) AS total_tokens " +
        "FROM tok JOIN kept USING (doc_id)")
  }

  /** Lloyd's k-means replay (k clusters, 2 updates, then a final
    * assignment): init = the k smallest vec_ids, distance = the same
    * left-fold (x-c)² accumulation as `VectorFunctions.l2DistanceSq`
    * (IEEE-exact), ties to the smaller cluster id, updated centroids
    * rounded to the 1e-6 grid exactly like
    * [[operators.Clustering.kmeansCentroids]] — the rounding is what
    * makes the unordered double averages safe to feed into the next
    * iteration's assignment on both engines.
    *
    * Divergence bound: the Scala side keeps a previous centroid when a
    * cluster goes EMPTY; this replay simply omits the empty cid from the
    * next update (no row to aggregate). The two agree whenever every
    * cluster stays populated — which holds for this fixture (k = 4 real
    * vectors as seeds over the sf0.01 embeddings; the gate would go red
    * if a data regeneration ever broke it, which is the desired signal).
    */
  private def kmDist(v: String, c: String): String =
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, 65), j -> ($v[j] - $c[j]) * ($v[j] - $c[j]))), " +
      "(a, x) -> a + x)"

  /** Assignment CTE: each vector's `take` nearest centroids from `cents`
    * (ascending (dist, cid) — ties to the smaller id, mirroring
    * `Clustering.nearestLists`). take = 1 is Lloyd's assignment.
    */
  private def kmAssignCte(name: String, cents: String,
      take: Int = 1): String =
    s"$name AS (SELECT vec_id, v, cid, dist FROM " +
      "(SELECT vec_id, v, cid, dist, row_number() OVER " +
      "(PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM " +
      s"(SELECT e.vec_id, e.v, c.cid, ${kmDist("e.v", "c.vec")} AS dist " +
      s"FROM e CROSS JOIN $cents c)) WHERE rk <= $take)"

  private def kmUpdateCte(name: String, assigned: String): String =
    s"$name AS (SELECT cid, list(m ORDER BY pos) AS vec FROM " +
      s"(SELECT cid, j AS pos, round(avg(v[j]), 6) AS m FROM $assigned, " +
      "(SELECT unnest(range(1, 65)) AS j) GROUP BY cid, j) GROUP BY cid)"

  /** e + c0 + two Lloyd updates → trained centroids in CTE `c2` — the
    * fragment q87 (final assignment) and q93 (trained SemDeDup) share.
    * `where` optionally slices the vector table (" WHERE vec_id < n"),
    * mirroring a Spark side that trains on the same slice.
    */
  /** [[kmTrainCtes]] over an arbitrary `e` body — the retrain replay
    * (q402) trains on the INDEX CONTENTS (base ∪ drifted-as-written),
    * not a plain embeddings slice.
    */
  private def kmTrainCtesFrom(k: Int, eBody: String): Seq[String] = Seq(
    s"e AS ($eBody)",
    "c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 " +
      "AS INTEGER) AS cid, v AS vec FROM " +
      s"(SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $k))",
    kmAssignCte("a1", "c0"), kmUpdateCte("c1", "a1"),
    kmAssignCte("a2", "c1"), kmUpdateCte("c2", "a2"))

  private def kmTrainCtes(k: Int, where: String = ""): Seq[String] =
    kmTrainCtesFrom(k,
      "SELECT vec_id, list_transform(embedding, " +
        s"x -> CAST(x AS DOUBLE)) AS v FROM embeddings$where")

  def q87Kmeans(k: Int): String =
    withClause(kmTrainCtes(k) :+ kmAssignCte("a3", "c2"),
      "SELECT cid AS cluster, count(*) AS n, " +
        "round(sum(dist), 2) AS inertia FROM a3 " +
        "GROUP BY cid ORDER BY cid")

  // ---- product quantization replay (q128) ----------------------------

  /** [[kmDist]] generalized to a `len`-dim subvector column. */
  private def pqSubDist(v: String, c: String, len: Int): String =
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, ${len + 1}), " +
      s"j -> ($v[j] - $c[j]) * ($v[j] - $c[j]))), (a, x) -> a + x)"

  /** Lloyd's assignment over a subvector table `src(vec_id, sv)`. */
  private def pqAssignCte(name: String, src: String, cents: String,
      len: Int): String =
    s"$name AS (SELECT vec_id, sv, cid, dist FROM " +
      "(SELECT vec_id, sv, cid, dist, row_number() OVER " +
      "(PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM " +
      s"(SELECT t.vec_id, t.sv, c.cid, ${pqSubDist("t.sv", "c.vec", len)} " +
      s"AS dist FROM $src t CROSS JOIN $cents c)) WHERE rk = 1)"

  private def pqUpdateCte(name: String, assigned: String,
      len: Int): String =
    s"$name AS (SELECT cid, list(m ORDER BY pos) AS vec FROM " +
      s"(SELECT cid, j AS pos, round(avg(sv[j]), 6) AS m FROM $assigned, " +
      s"(SELECT unnest(range(1, ${len + 1})) AS j) GROUP BY cid, j) " +
      "GROUP BY cid)"

  /** Full PQ chain replay ([[operators.Similarity.trainPq]] →
    * [[operators.Similarity.pqEncode]] →
    * [[operators.Similarity.pqAdcTopK]]): per subspace — init from the
    * k smallest vec_ids' subvectors, two Lloyd updates on the 1e-6
    * grid, final argmin code — then the ADC score as the SAME left-fold
    * partial dots of the query's subvectors with each assigned
    * centroid, summed in ascending subspace order (IEEE-exact both
    * sides). Same empty-cluster divergence bound as [[q87Kmeans]]:
    * agreement requires every cluster populated, which the fixture
    * satisfies (the gate goes red if a regeneration breaks it).
    */
  /** The shared per-subspace train→code→partial-dot CTE chain (assumes
    * `e(vec_id, v)` and `qv(v)` exist), plus the join/sum tail.
    */
  private def pqChainCtes(m: Int, kCent: Int, dim: Int): Seq[String] = {
    val sub = dim / m
    (0 until m).flatMap { s =>
      val lo = s * sub
      Seq(
        s"se$s AS (SELECT vec_id, v[${lo + 1}:${lo + sub}] AS sv FROM e)",
        s"c0_$s AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 " +
          "AS INTEGER) AS cid, sv AS vec FROM " +
          s"(SELECT vec_id, sv FROM se$s ORDER BY vec_id LIMIT $kCent))",
        pqAssignCte(s"a1_$s", s"se$s", s"c0_$s", sub),
        pqUpdateCte(s"c1_$s", s"a1_$s", sub),
        pqAssignCte(s"a2_$s", s"se$s", s"c1_$s", sub),
        pqUpdateCte(s"c2_$s", s"a2_$s", sub),
        pqAssignCte(s"code_$s", s"se$s", s"c2_$s", sub),
        s"d_$s AS (SELECT k.vec_id, " +
          "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"list_transform(range(1, ${sub + 1}), " +
          s"j -> c.vec[j] * q.v[${lo} + j])), (a, x) -> a + x) AS d " +
          s"FROM code_$s k JOIN c2_$s c ON c.cid = k.cid, qv q)")
    }
  }

  private def pqJoins(m: Int): String =
    (1 until m).map(s => s"JOIN d_$s USING (vec_id)").mkString(" ")

  private def pqSumExpr(m: Int): String =
    (0 until m).map(s => s"d_$s.d").reduceLeft((a, b) => s"($a + $b)")

  def q128PqAdc(m: Int, kCent: Int, dim: Int, topK: Int): String =
    withClause(Seq(
      "e AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
      "qv AS (SELECT v FROM e WHERE vec_id = 0)") ++
      pqChainCtes(m, kCent, dim),
      s"SELECT vec_id, round(${pqSumExpr(m)}, 4) AS adc_score " +
        s"FROM d_0 ${pqJoins(m)} " +
        s"ORDER BY adc_score DESC, vec_id LIMIT $topK")

  /** IVF-PQ replay ([[operators.Similarity.assignLists]] +
    * [[operators.Similarity.ivfPqTopK]]): the q85 deterministic-plane
    * argmax assigns every vector its list (ties to the LARGER id — the
    * bestLists pick); the query's `nProbe` best lists come from the
    * same projection fold ranked (pr DESC, p DESC); the PQ chain then
    * scores ONLY vectors in probed lists.
    */
  def q129IvfPq(m: Int, kCent: Int, dim: Int, nLists: Int, nProbe: Int,
      topK: Int): String =
    withClause(Seq(
      "e AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
      "qv AS (SELECT v FROM e WHERE vec_id = 0)") ++
      planesCtes(nLists, dim) ++ Seq(
      "proj AS (SELECT e.vec_id, " +
        s"${projection("e.v")} AS pr, pv.p " +
        "FROM e CROSS JOIN pv pv)",
      "asg AS (SELECT vec_id, p AS list_id FROM " +
        "(SELECT vec_id, p, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY pr DESC, p DESC) AS rk " +
        "FROM proj) WHERE rk = 1)",
      "qproj AS (SELECT pv.p, " +
        s"${projection("q.v")} AS pr FROM qv q CROSS JOIN pv pv)",
      s"probes AS (SELECT p FROM qproj ORDER BY pr DESC, p DESC " +
        s"LIMIT $nProbe)") ++
      pqChainCtes(m, kCent, dim),
      s"SELECT vec_id, round(${pqSumExpr(m)}, 4) AS adc_score " +
        s"FROM d_0 ${pqJoins(m)} " +
        "JOIN asg USING (vec_id) " +
        "WHERE asg.list_id IN (SELECT p FROM probes) " +
        s"ORDER BY adc_score DESC, vec_id LIMIT $topK")

  /** Two-stage retrieval replay ([[operators.Similarity
    * .ivfPqTopKReranked]]): the q129 IVF-PQ chain picks `nCand` ADC
    * candidates (adc DESC, vec_id — the limit tie the Spark side uses),
    * then ONLY those rows pay the exact full-dim dot: the same
    * ascending left fold as `VectorFunctions.dot`, rounded at 4.
    */
  private def ivfPqRerankCtes(m: Int, kCent: Int, dim: Int, nLists: Int,
      nProbe: Int, nCand: Int, topK: Int): Seq[String] =
    Seq(
      "e AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
      "qv AS (SELECT v FROM e WHERE vec_id = 0)") ++
      planesCtes(nLists, dim) ++ Seq(
      "proj AS (SELECT e.vec_id, " +
        s"${projection("e.v")} AS pr, pv.p " +
        "FROM e CROSS JOIN pv pv)",
      "asg AS (SELECT vec_id, p AS list_id FROM " +
        "(SELECT vec_id, p, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY pr DESC, p DESC) AS rk " +
        "FROM proj) WHERE rk = 1)",
      "qproj AS (SELECT pv.p, " +
        s"${projection("q.v")} AS pr FROM qv q CROSS JOIN pv pv)",
      s"probes AS (SELECT p FROM qproj ORDER BY pr DESC, p DESC " +
        s"LIMIT $nProbe)") ++
      pqChainCtes(m, kCent, dim) ++ Seq(
      s"cand AS (SELECT vec_id, round(${pqSumExpr(m)}, 4) AS adc_score " +
        s"FROM d_0 ${pqJoins(m)} " +
        "JOIN asg USING (vec_id) " +
        "WHERE asg.list_id IN (SELECT p FROM probes) " +
        s"ORDER BY adc_score DESC, vec_id LIMIT $nCand)",
      "rr AS (SELECT c.vec_id, c.adc_score, " +
        "round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(range(1, ${dim + 1}), " +
        "j -> e.v[j] * q.v[j])), (a, x) -> a + x), 4) AS exact_score " +
        "FROM cand c JOIN e USING (vec_id), qv q " +
        s"ORDER BY exact_score DESC, c.vec_id LIMIT $topK)")

  def q199IvfPqRerank(m: Int, kCent: Int, dim: Int, nLists: Int,
      nProbe: Int, nCand: Int, topK: Int): String =
    withClause(ivfPqRerankCtes(m, kCent, dim, nLists, nProbe, nCand, topK),
      "SELECT vec_id, adc_score, exact_score FROM rr " +
        "ORDER BY exact_score DESC, vec_id")

  /** Capstone: RAG context assembly — the reranked retrieval (the q199
    * chain verbatim) joins the documents table and packs the context
    * window GREEDILY in relevance order until the token budget closes:
    * rank and running token total from ONE window over the ≤ topK-row
    * retrieval result, docs that straddle the budget are dropped whole
    * (no partial documents in a prompt).
    */
  def q200RagContext(m: Int, kCent: Int, dim: Int, nLists: Int,
      nProbe: Int, nCand: Int, topK: Int, budget: Int): String =
    withClause(ivfPqRerankCtes(m, kCent, dim, nLists, nProbe, nCand,
      topK) ++ Seq(
      "dt AS (SELECT r.vec_id, r.exact_score, " +
        s"CAST(len($Toks) AS BIGINT) AS n_tokens, " +
        "CAST(row_number() OVER (ORDER BY r.exact_score DESC, r.vec_id) " +
        "AS INTEGER) AS rank, " +
        "CAST(sum(CAST(len(" + Toks + ") AS BIGINT)) OVER (" +
        "ORDER BY r.exact_score DESC, r.vec_id " +
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens " +
        "FROM rr r JOIN documents d ON d.doc_id = r.vec_id)"),
      s"SELECT rank, vec_id, n_tokens, cum_tokens, exact_score FROM dt " +
        s"WHERE cum_tokens <= $budget ORDER BY rank")

  /** Trained-SemDeDup replay (the q85 pair fragment over q87's TRAINED
    * centroids, with top-2 multi-assignment): every vector takes its two
    * L2-nearest c2 centroids; pairs meet in any shared list (a.id < b.id
    * canonical), then collapse to one row per pair with the smallest
    * shared list id — exactly `Similarity.semanticDupPairsTrained`'s
    * nAssign = 2 semantics. Cosine via list_cosine_similarity at a
    * threshold the fixture's ~1e-5 pair spacing makes engine-stable
    * (q85 precedent).
    */
  def q93TrainedSemanticDedup(k: Int): String =
    withClause(kmTrainCtes(k) ++ Seq(
      kmAssignCte("asg", "c2", take = 2),
      "pr AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.cid AS cid, " +
        "list_cosine_similarity(a.v, b.v) AS cos " +
        "FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id)",
      "pairs AS (SELECT a_id, b_id, min(cid) AS list_id, min(cos) AS cos " +
        "FROM pr GROUP BY a_id, b_id)",
      "hit AS (SELECT * FROM pairs WHERE cos >= 0.4)"),
      "SELECT count(*) AS n_pairs, count(DISTINCT b_id) AS n_dropped, " +
        "round(coalesce(max(cos), -1), 4) AS best_cos FROM hit")

  /** BPE train→encode replay: `rounds` training rounds (count adjacent
    * pairs over the CURRENT stream, pick the (count DESC, l, r) top,
    * rewrite every document) followed by per-document accounting of the
    * final stream — the exact semantics of
    * `TokenizerTraining.trainMerges(minCount = 1)` + `encode`.
    *
    * Stream representation: each document's token stream is a chr(31)-
    * joined string with a LEADING separator ('' for empty docs); base
    * tokens are whitespace-split so they never contain chr(31), and
    * merged tokens join with ' ' — so `ends_with(acc, chr(31) || l)`
    * tests "last token equals l" exactly, and the per-round rewrite is
    * ONE list_reduce fold per row reproducing the leftmost-first merge
    * scan of `applyMerge` (out.last == a && t == b → replace).
    */
  private val BpeSep = "chr(31)"

  /** tok + s0 + `rounds` training rounds + `fin(doc_id, e)` — the BPE
    * train→encode chain shared by q94 (stream accounting), q101
    * (token-id export) and q105 (frozen-vocab OOV; `docFilter` restricts
    * the TRAINING corpus — the m1..mN merge CTEs then replay onto a
    * held-out stream via [[bpeApplyCtes]]).
    */
  private def bpeChainCtes(rounds: Int, docFilter: String = ""): Seq[String] = {
    val sep = BpeSep
    val roundCtes = (1 to rounds).flatMap { i =>
      Seq(
        // token-list view of the previous round's stream
        s"t$i AS (SELECT doc_id, CASE WHEN s = '' THEN CAST([] AS VARCHAR[]) " +
          s"ELSE str_split(substr(s, 2), $sep) END AS t FROM s${i - 1})",
        // adjacent pairs, duplicates kept (adjacentPairStructs semantics)
        s"g$i AS (SELECT t[j] AS l, t[j + 1] AS r FROM " +
          s"(SELECT t, unnest(range(1, len(t))) AS j FROM t$i))",
        s"m$i AS (SELECT l, r FROM g$i GROUP BY l, r " +
          "ORDER BY count(*) DESC, l, r LIMIT 1)",
        // the leftmost-first merge scan as a string fold
        s"s$i AS (SELECT doc_id, CASE WHEN len(t.t) = 0 THEN '' ELSE " +
          "list_reduce(list_prepend(CAST('' AS VARCHAR), t.t), " +
          s"(acc, x) -> CASE WHEN ends_with(acc, $sep || m.l) AND x = m.r " +
          s"THEN acc || ' ' || x ELSE acc || $sep || x END) END AS s " +
          s"FROM t$i t, m$i m)")
    }
    Seq(
      s"tok AS (SELECT doc_id, $Toks AS t FROM documents$docFilter)",
      s"s0 AS (SELECT doc_id, CASE WHEN len(t) = 0 THEN '' ELSE " +
        s"$BpeSep || array_to_string(t, $BpeSep) END AS s FROM tok)") ++
      roundCtes ++ Seq(
      s"fin AS (SELECT doc_id, CASE WHEN s = '' THEN CAST([] AS VARCHAR[]) " +
        s"ELSE str_split(substr(s, 2), $sep) END AS e FROM s$rounds)")
  }

  /** Apply the m1..mN trained-merge CTEs of [[bpeChainCtes]] to a
    * SEPARATE stream: `htok(doc_id, t)` must exist; emits es0..esN and
    * `efin(doc_id, e)`. Sequential per-round application ≡ the
    * rank-priority encoder (NoveltyTokenizerSpec pins the equivalence),
    * so this replays `TokenizerTraining.encode` on held-out text.
    */
  private def bpeApplyCtes(rounds: Int): Seq[String] = {
    val sep = BpeSep
    val enc = (1 to rounds).flatMap { i =>
      Seq(
        s"et$i AS (SELECT doc_id, CASE WHEN s = '' THEN " +
          s"CAST([] AS VARCHAR[]) ELSE str_split(substr(s, 2), $sep) END " +
          s"AS t FROM es${i - 1})",
        s"es$i AS (SELECT doc_id, CASE WHEN len(t.t) = 0 THEN '' ELSE " +
          "list_reduce(list_prepend(CAST('' AS VARCHAR), t.t), " +
          s"(acc, x) -> CASE WHEN ends_with(acc, $sep || m.l) AND x = m.r " +
          s"THEN acc || ' ' || x ELSE acc || $sep || x END) END AS s " +
          s"FROM et$i t, m$i m)")
    }
    Seq(
      s"es0 AS (SELECT doc_id, CASE WHEN len(t) = 0 THEN '' ELSE " +
        s"$BpeSep || array_to_string(t, $BpeSep) END AS s FROM htok)") ++
      enc ++ Seq(
      s"efin AS (SELECT doc_id, CASE WHEN s = '' THEN CAST([] AS VARCHAR[]) " +
        s"ELSE str_split(substr(s, 2), $sep) END AS e FROM es$rounds)")
  }

  /** Frozen-vocab OOV replay (q105): merges AND vocabulary train on the
    * tiny reference split (`trainFilter`), the held-out corpus
    * (`encodeFilter`) encodes against them, and every encoded token
    * absent from the frozen vocab maps to -1 — the OOV path of
    * `TokenizerTraining.encodeIds(vocab = Some(frozen))`. The fixture
    * fact making this a REAL exercise: the corpus vocabulary is ~31
    * near-uniform words, so a 2-doc training split misses a couple of
    * words and every later document carries genuine OOV hits.
    */
  def q105FrozenVocabOov(rounds: Int, trainFilter: String,
      encodeFilter: String): String = {
    val mergeRows = (1 to rounds)
      .map(i => s"SELECT l || ' ' || r AS token, ${i - 1} AS rnk FROM m$i")
      .mkString(" UNION ALL ")
    withClause(bpeChainCtes(rounds, trainFilter) ++ Seq(
      s"htok AS (SELECT doc_id, $Toks AS t FROM documents$encodeFilter)") ++
      bpeApplyCtes(rounds) ++ Seq(
      "pos AS (SELECT doc_id, j AS pos, e[j] AS token FROM " +
        "(SELECT doc_id, e, unnest(range(1, len(e) + 1)) AS j FROM efin))",
      "base AS (SELECT token, CAST(row_number() OVER (ORDER BY token) - 1 " +
        "AS BIGINT) AS tid FROM " +
        "(SELECT DISTINCT unnest(t) AS token FROM tok))",
      "nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base)",
      s"mgv AS ($mergeRows)",
      "mgd AS (SELECT token, nb.n + min(rnk) AS tid FROM mgv, nb " +
        "GROUP BY token, nb.n)",
      "vocab AS (SELECT token, tid FROM base " +
        "UNION ALL SELECT token, tid FROM mgd)",
      "ids AS (SELECT p.doc_id, p.pos, coalesce(v.tid, -1) AS tid " +
        "FROM pos p LEFT JOIN vocab v USING (token))"),
      "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_oov, " +
        "CAST(sum(tid) AS BIGINT) AS sum_ids, " +
        "md5(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos)) " +
        "AS ids_md5 " +
        "FROM ids GROUP BY doc_id ORDER BY doc_id")
  }

  /** Per-language tokenizer-efficiency replay (q140): the q94 chain
    * grouped by language — tokens-per-word after the trained merges
    * and the merged-symbol fraction.
    */
  def q140TokenizerFertility(rounds: Int): String =
    withClause(bpeChainCtes(rounds) :+
      ("per AS (SELECT f.doc_id, d.lang, len(f.e) AS nsub, " +
        "len(list_filter(f.e, x -> contains(x, ' '))) AS nm, " +
        "len(t.t) AS nw " +
        "FROM fin f JOIN tok t USING (doc_id) " +
        "JOIN documents d USING (doc_id))"),
      "SELECT lang, count(*) AS n_docs, " +
        "CAST(sum(nw) AS BIGINT) AS n_words, " +
        "CAST(sum(nsub) AS BIGINT) AS n_bpe_tokens, " +
        "round(sum(nsub) * 1.0 / sum(nw), 4) AS tokens_per_word, " +
        "round(sum(nm) * 1.0 / sum(nsub), 4) AS merged_frac " +
        "FROM per GROUP BY lang ORDER BY lang")

  def q94BpeEncode(rounds: Int): String =
    withClause(bpeChainCtes(rounds),
      "SELECT doc_id, CAST(len(e) AS BIGINT) AS n_tokens, " +
        "CAST(len(list_filter(e, x -> contains(x, ' '))) AS BIGINT) " +
        "AS n_merged, " +
        s"md5(array_to_string(e, $BpeSep)) AS stream_md5 " +
        "FROM fin ORDER BY doc_id")

  /** Token-id export replay: the trained vocabulary = sorted distinct
    * base tokens (ids 0..nBase-1, binary order — the corpus is ASCII
    * lowercase so engines agree) followed by one id per merge in
    * training order (the m1..mN CTEs, duplicates keep the earlier id;
    * merged symbols contain a space so the ranges cannot collide), then
    * every encoded position mapped through it — exactly
    * `TokenizerTraining.vocabulary` + `encodeIds`.
    */
  def q101BpeTokenIds(rounds: Int): String = {
    val mergeRows = (1 to rounds)
      .map(i => s"SELECT l || ' ' || r AS token, ${i - 1} AS rnk FROM m$i")
      .mkString(" UNION ALL ")
    withClause(bpeChainCtes(rounds) ++ Seq(
      "pos AS (SELECT doc_id, j AS pos, e[j] AS token FROM " +
        "(SELECT doc_id, e, unnest(range(1, len(e) + 1)) AS j FROM fin))",
      "base AS (SELECT token, CAST(row_number() OVER (ORDER BY token) - 1 " +
        "AS BIGINT) AS tid FROM " +
        "(SELECT DISTINCT unnest(t) AS token FROM tok))",
      "nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base)",
      s"mgv AS ($mergeRows)",
      "mgd AS (SELECT token, nb.n + min(rnk) AS tid FROM mgv, nb " +
        "GROUP BY token, nb.n)",
      "vocab AS (SELECT token, tid FROM base " +
        "UNION ALL SELECT token, tid FROM mgd)",
      "ids AS (SELECT p.doc_id, p.pos, coalesce(v.tid, -1) AS tid " +
        "FROM pos p LEFT JOIN vocab v USING (token))"),
      "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "CAST(sum(tid) AS BIGINT) AS sum_ids, " +
        "md5(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos)) " +
        "AS ids_md5 " +
        "FROM ids GROUP BY doc_id ORDER BY doc_id")
  }

  /** Waterfill-selection replay: the q91 allocation chain (ordered window
    * sums, FIRST feasible level, zero clamp) floored to whole tokens,
    * then realized as a per-source document pick — splitmix64 hash
    * buckets cumulated per source, whole buckets below the cutoff, the
    * boundary bucket ranked by (signed splitmix64(doc_id), doc_id) with
    * a running token sum — exactly
    * `Mixture.waterfill` + `Mixture.selectByAllocations`.
    */
  def q96WaterfillSelection(budget: Double, buckets: Int): String =
    waterfillSelectionSql(Seq(
      s"t AS (SELECT doc_id, source, $Toks AS tk FROM documents)",
      "tn AS (SELECT doc_id, source, len(tk) AS n FROM t)"),
      budget, buckets)

  /** The `Mixture.selectByAllocations` replay chain, generic over the
    * stratum key: assumes CTEs `tn(doc_id, $key[, extras...], n)` (the
    * budgetable corpus) and `al($key, b)` (floored per-stratum token
    * allocations) already exist, and emits the hash-bucket realization —
    * splitmix64(doc_id) buckets cumulated per stratum, whole buckets
    * below each stratum's cutoff, the boundary bucket ranked by (signed
    * hash, doc_id) under the remainder — ending in
    * `sel(doc_id, $key[, extras...], n)`. `extras` are passthrough
    * columns carried to `sel` untouched (q104 threads lang/bucket
    * through for the final accounting).
    */
  private def realizationCtes(key: String, extras: Seq[String],
      buckets: Int): Seq[String] = {
    val ex = extras.map(e => s", $e").mkString
    val dex = extras.map(e => s", d.$e").mkString
    val kz = s"kz AS (SELECT doc_id, $key$ex, n, " +
      "CAST(doc_id AS HUGEINT) AS z FROM tn)"
    val mixed = mixStages(Seq("z"), Seq("doc_id", key) ++ extras ++ Seq("n"))
      .zipWithIndex.map { case (body, i) =>
        s"km$i AS ($body FROM ${if (i == 0) "kz" else s"km${i - 1}"})"
      }
    Seq(kz) ++ mixed ++ Seq(
      s"d AS (SELECT doc_id, $key$ex, n, ${toSigned("z")} AS zs, " +
        s"CAST(z % $buckets AS INTEGER) AS bk FROM km5)",
      s"bt AS (SELECT $key, bk, CAST(sum(n) AS BIGINT) AS tt FROM d " +
        s"GROUP BY $key, bk)",
      s"cb AS (SELECT $key, bk, tt, coalesce(sum(tt) OVER " +
        s"(PARTITION BY $key ORDER BY bk " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumbk " +
        "FROM bt)",
      s"cut AS (SELECT c.$key, min(c.bk) AS cutb FROM cb c " +
        s"JOIN al USING ($key) WHERE c.cumbk + c.tt > al.b " +
        s"GROUP BY c.$key)",
      s"rem AS (SELECT c.$key, c.bk AS cutb, al.b - c.cumbk AS rm " +
        s"FROM cb c JOIN cut ct ON ct.$key = c.$key AND ct.cutb = c.bk " +
        s"JOIN al ON al.$key = c.$key)",
      s"fullsel AS (SELECT d.doc_id, d.$key$dex, d.n FROM d " +
        s"JOIN rem USING ($key) WHERE d.bk < rem.cutb)",
      s"nocut AS (SELECT d.doc_id, d.$key$dex, d.n FROM d WHERE d.$key " +
        s"NOT IN (SELECT $key FROM cut))",
      s"bnd AS (SELECT d.doc_id, d.$key$dex, d.n, sum(d.n) OVER " +
        s"(PARTITION BY d.$key ORDER BY d.zs, d.doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        s"r2.rm FROM d JOIN rem r2 ON r2.$key = d.$key " +
        "AND d.bk = r2.cutb)",
      s"sel AS (SELECT doc_id, $key$ex, n FROM fullsel " +
        s"UNION ALL SELECT doc_id, $key$ex, n FROM nocut " +
        s"UNION ALL SELECT doc_id, $key$ex, n FROM bnd WHERE cum <= rm)")
  }

  /** The shared allocation + realization chain over any base CTE list
    * ending in `tn(doc_id, source, n)` — used by q96 (raw corpus) and
    * q99 (quality-kept corpus).
    */
  private def waterfillSelectionSql(baseCtes: Seq[String], budget: Double,
      buckets: Int): String = {
    val water = baseCtes ++ Seq(
      "s AS (SELECT source, CAST(sum(n) AS BIGINT) AS c FROM tn " +
        "GROUP BY source)",
      "w AS (SELECT source, c, CASE WHEN source IN ('src0', 'src1') " +
        "THEN 3.0 ELSE 1.0 END AS wt FROM s)",
      "r AS (SELECT source, c, wt, CAST(c AS DOUBLE) / wt AS ratio FROM w)",
      "x AS (SELECT source, c, wt, ratio, " +
        "coalesce(sum(CAST(c AS DOUBLE)) OVER (ORDER BY ratio, source " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cumb, " +
        "sum(wt) OVER (ORDER BY ratio, source " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tailw FROM r)",
      s"y AS (SELECT *, ($budget - cumb) / tailw AS tc FROM x)",
      "z AS (SELECT *, first_value(CASE WHEN ratio >= tc THEN tc END " +
        "IGNORE NULLS) OVER (ORDER BY ratio, source " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "AS ts FROM y)",
      "al AS (SELECT source, CAST(floor(CASE WHEN ts IS NULL " +
        "THEN CAST(c AS DOUBLE) " +
        "ELSE greatest(0.0, least(CAST(c AS DOUBLE), wt * ts)) END) " +
        "AS BIGINT) AS b FROM z)")
    withClause(water ++ realizationCtes("source", Seq(), buckets),
      "SELECT source, count(*) AS n_sel, " +
        "CAST(coalesce(sum(n), 0) AS BIGINT) AS sel_tokens " +
        "FROM sel GROUP BY source ORDER BY source")
  }

  /** Epoch-repeat mixture replay (q107): the q91 waterfill chain with
    * effective capacity `cap × maxEpochs` (ratio and clamp both scale),
    * then `Mixture.selectByAllocationsEpochs` — per source, `fe =
    * min(b // cap, maxEpochs)` COMPLETE epochs (every doc × 1..fe via
    * `unnest(range)`), and the remainder `b − fe·cap` realized as the
    * standard splitmix64 bucket-prefix pick at epoch `fe + 1`.
    */
  def q107EpochSelection(budget: Double, buckets: Int,
      maxEpochs: Int): String = {
    val water = Seq(
      s"t0 AS (SELECT doc_id, source, $Toks AS tk FROM documents)",
      "tn AS (SELECT doc_id, source, len(tk) AS n FROM t0)",
      "s AS (SELECT source, CAST(sum(n) AS BIGINT) AS c FROM tn " +
        "GROUP BY source)",
      "w AS (SELECT source, c, CASE WHEN source IN ('src0', 'src1') " +
        "THEN 5.0 ELSE 1.0 END AS wt FROM s)",
      s"r AS (SELECT source, c, wt, " +
        s"CAST(c AS DOUBLE) * $maxEpochs AS ce FROM w)",
      "r1 AS (SELECT source, c, wt, ce, ce / wt AS ratio FROM r)",
      "x AS (SELECT source, c, wt, ce, ratio, " +
        "coalesce(sum(ce) OVER (ORDER BY ratio, source " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cumb, " +
        "sum(wt) OVER (ORDER BY ratio, source " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tailw FROM r1)",
      s"y AS (SELECT *, ($budget - cumb) / tailw AS tc FROM x)",
      "z AS (SELECT *, first_value(CASE WHEN ratio >= tc THEN tc END " +
        "IGNORE NULLS) OVER (ORDER BY ratio, source " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "AS ts FROM y)",
      "al AS (SELECT source, c, CAST(floor(CASE WHEN ts IS NULL THEN ce " +
        "ELSE greatest(0.0, least(ce, wt * ts)) END) AS BIGINT) AS b " +
        "FROM z)",
      // complete epochs + remainder per source; the fe >= maxEpochs
      // branch mirrors the operator's clamp (partial epoch dropped when
      // the allocation already realizes as maxEpochs complete passes)
      s"alr AS (SELECT source, b, c AS cap, CASE WHEN c <= 0 THEN 0 " +
        s"ELSE least(b // c, $maxEpochs) END AS fe FROM al)",
      s"alr2 AS (SELECT source, b, cap, fe, CASE WHEN fe >= $maxEpochs " +
        "THEN 0 ELSE b - fe * cap END AS rb FROM alr)",
      "kz AS (SELECT doc_id, source, n, CAST(doc_id AS HUGEINT) AS z " +
        "FROM tn)")
    val mixed = mixStages(Seq("z"), Seq("doc_id", "source", "n"))
      .zipWithIndex.map { case (body, i) =>
        s"km$i AS ($body FROM ${if (i == 0) "kz" else s"km${i - 1}"})"
      }
    val select = Seq(
      s"d AS (SELECT doc_id, source, n, ${toSigned("z")} AS zs, " +
        s"CAST(z % $buckets AS INTEGER) AS bk FROM km5)",
      "bt AS (SELECT source, bk, CAST(sum(n) AS BIGINT) AS tt FROM d " +
        "GROUP BY source, bk)",
      "cb AS (SELECT source, bk, tt, coalesce(sum(tt) OVER " +
        "(PARTITION BY source ORDER BY bk " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumbk " +
        "FROM bt)",
      "cut AS (SELECT c2.source, min(c2.bk) AS cutb FROM cb c2 " +
        "JOIN alr2 USING (source) WHERE c2.cumbk + c2.tt > alr2.rb " +
        "GROUP BY c2.source)",
      "rem AS (SELECT c2.source, c2.bk AS cutb, alr2.rb - c2.cumbk AS rm " +
        "FROM cb c2 JOIN cut ct ON ct.source = c2.source " +
        "AND ct.cutb = c2.bk JOIN alr2 ON alr2.source = c2.source)",
      "complete AS (SELECT t.doc_id, t.source, t.n, " +
        "CAST(unnest(range(1, a.fe + 1)) AS INTEGER) AS epoch " +
        "FROM tn t JOIN alr2 a USING (source))",
      "fullsel AS (SELECT d.doc_id, d.source, d.n, " +
        "CAST(a.fe + 1 AS INTEGER) AS epoch FROM d " +
        "JOIN rem USING (source) JOIN alr2 a USING (source) " +
        "WHERE d.bk < rem.cutb)",
      "nocut AS (SELECT d.doc_id, d.source, d.n, " +
        "CAST(a.fe + 1 AS INTEGER) AS epoch FROM d " +
        "JOIN alr2 a USING (source) WHERE d.source " +
        "NOT IN (SELECT source FROM cut))",
      "bnd AS (SELECT d.doc_id, d.source, d.n, " +
        "CAST(a.fe + 1 AS INTEGER) AS epoch, sum(d.n) OVER " +
        "(PARTITION BY d.source ORDER BY d.zs, d.doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "r2.rm FROM d JOIN rem r2 ON r2.source = d.source " +
        "AND d.bk = r2.cutb JOIN alr2 a ON a.source = d.source)",
      "sel AS (SELECT doc_id, source, n, epoch FROM complete " +
        "UNION ALL SELECT doc_id, source, n, epoch FROM fullsel " +
        "UNION ALL SELECT doc_id, source, n, epoch FROM nocut " +
        "UNION ALL SELECT doc_id, source, n, epoch FROM bnd " +
        "WHERE cum <= rm)")
    withClause(water ++ mixed ++ select,
      "SELECT source, count(*) AS n_rows, " +
        "count(DISTINCT doc_id) AS n_docs, " +
        "CAST(max(epoch) AS INTEGER) AS max_epoch, " +
        "CAST(sum(n) AS BIGINT) AS sel_tokens " +
        "FROM sel GROUP BY source ORDER BY source")
  }

  /** CCNet capstone replay (q104): language-ID (the q26 stopword-profile
    * CASE) splits the corpus; a 5-gram add-α LM per language trains on
    * doc_id < 250 (count tables keyed by (lang, gram)); held-out docs
    * score by average smoothed ln-prob on the 1e-4 grid; the per-language
    * (lang, avg_lp) histogram cuts head/middle/tail at the 1/3 / 2/3
    * doc-count percentiles (strictly-better count vs total·frac — the
    * fraction literal is CAST(1 AS DOUBLE)/3, NOT 1.0/3: DuckDB's 1.0 is
    * DECIMAL and decimal division would diverge from Spark's IEEE
    * double); bucket-weighted waterfill (head 6 / middle 3 / tail 1)
    * allocates `budget` tokens over the (lang, bucket) strata; the
    * generic [[realizationCtes]] chain realizes the pick per stratum.
    */
  def q104CcnetSelection(budget: Double, buckets: Int): String = {
    def hits(words: Seq[String]): String =
      s"len(list_filter($Toks, t -> t IN " +
        words.map(w => s"'$w'").mkString("(", ", ", ")") + "))"
    val f13 = "CAST(1 AS DOUBLE) / 3"
    val f23 = "CAST(2 AS DOUBLE) / 3"
    val lm = Seq(
      s"tokd AS (SELECT doc_id, $Toks AS t FROM documents)",
      s"lh AS (SELECT doc_id, ${hits(functions.TextFunctions.EnStop)} AS he, " +
        s"${hits(functions.TextFunctions.DeStop)} AS hd, " +
        s"${hits(functions.TextFunctions.FrStop)} AS hf FROM documents)",
      "lng AS (SELECT doc_id, CASE " +
        "WHEN he >= hd AND he >= hf AND he > 0 THEN 'en' " +
        "WHEN hd >= hf AND hd > 0 THEN 'de' " +
        "WHEN hf > 0 THEN 'fr' ELSE 'und' END AS lg FROM lh)",
      "tr AS (SELECT l.lg, k.t FROM tokd k JOIN lng l USING (doc_id) " +
        "WHERE doc_id < 250)",
      "te AS (SELECT k.doc_id, l.lg, k.t FROM tokd k " +
        "JOIN lng l USING (doc_id) WHERE doc_id >= 250)",
      "v AS (SELECT lg, CAST(count(DISTINCT w) AS DOUBLE) AS vs FROM " +
        "(SELECT lg, unnest(t) AS w FROM tr) GROUP BY lg)",
      "n5 AS (SELECT lg, g, count(*) AS cn FROM " +
        "(SELECT lg, array_to_string(t[i + 1 : i + 5], ' ') AS g FROM " +
        "(SELECT lg, t, unnest(range(0, len(t) - 4)) AS i FROM tr " +
        "WHERE len(t) >= 5)) GROUP BY lg, g)",
      "n4 AS (SELECT lg, c, count(*) AS cc FROM " +
        "(SELECT lg, array_to_string(t[i + 1 : i + 4], ' ') AS c FROM " +
        "(SELECT lg, t, unnest(range(0, len(t) - 3)) AS i FROM tr " +
        "WHERE len(t) >= 4)) GROUP BY lg, c)",
      "tep AS (SELECT doc_id, lg, " +
        "array_to_string(t[i + 1 : i + 5], ' ') AS g, " +
        "array_to_string(t[i + 1 : i + 4], ' ') AS c FROM " +
        "(SELECT doc_id, lg, t, unnest(range(0, len(t) - 4)) AS i " +
        "FROM te WHERE len(t) >= 5))",
      "sc AS (SELECT p.doc_id, p.lg, " +
        "ln((coalesce(n5.cn, 0) + 0.4) / (coalesce(n4.cc, 0) + 0.4 * v.vs)) " +
        "AS lp FROM tep p " +
        "LEFT JOIN n5 ON n5.lg = p.lg AND n5.g = p.g " +
        "LEFT JOIN n4 ON n4.lg = p.lg AND n4.c = p.c " +
        "JOIN v ON v.lg = p.lg)",
      "scd AS (SELECT doc_id, lg, round(avg(lp), 4) AS avg_lp FROM sc " +
        "GROUP BY doc_id, lg)",
      "hist AS (SELECT lg, avg_lp, count(*) AS hc FROM scd " +
        "GROUP BY lg, avg_lp)",
      "hb AS (SELECT lg, avg_lp, coalesce(sum(hc) OVER " +
        "(PARTITION BY lg ORDER BY avg_lp DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS abv, " +
        "sum(hc) OVER (PARTITION BY lg) AS tot FROM hist)",
      s"bk2 AS (SELECT lg, avg_lp, CASE WHEN abv < tot * ($f13) " +
        s"THEN 'head' WHEN abv < tot * ($f23) THEN 'middle' " +
        "ELSE 'tail' END AS bucket FROM hb)",
      "tn AS (SELECT s.doc_id, s.lg || '_' || b.bucket AS sk, " +
        "s.lg, b.bucket, len(k.t) AS n FROM scd s " +
        "JOIN bk2 b ON b.lg = s.lg AND b.avg_lp = s.avg_lp " +
        "JOIN tokd k ON k.doc_id = s.doc_id)",
      "caps AS (SELECT sk, min(bucket) AS bucket, " +
        "CAST(sum(n) AS BIGINT) AS c FROM tn GROUP BY sk)",
      "wf0 AS (SELECT sk, c, CASE WHEN bucket = 'head' THEN 6.0 " +
        "WHEN bucket = 'middle' THEN 3.0 ELSE 1.0 END AS wt FROM caps)",
      "r2 AS (SELECT sk, c, wt, CAST(c AS DOUBLE) / wt AS ratio FROM wf0)",
      "x2 AS (SELECT sk, c, wt, ratio, " +
        "coalesce(sum(CAST(c AS DOUBLE)) OVER (ORDER BY ratio, sk " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cumb, " +
        "sum(wt) OVER (ORDER BY ratio, sk " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tailw FROM r2)",
      s"y2 AS (SELECT *, ($budget - cumb) / tailw AS tc FROM x2)",
      "z2 AS (SELECT *, first_value(CASE WHEN ratio >= tc THEN tc END " +
        "IGNORE NULLS) OVER (ORDER BY ratio, sk " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "AS ts FROM y2)",
      "al AS (SELECT sk, CAST(floor(CASE WHEN ts IS NULL " +
        "THEN CAST(c AS DOUBLE) " +
        "ELSE greatest(0.0, least(CAST(c AS DOUBLE), wt * ts)) END) " +
        "AS BIGINT) AS b FROM z2)")
    val accounting = Seq(
      "cells AS (SELECT lg, bucket, count(*) AS n_docs, " +
        "CAST(sum(n) AS BIGINT) AS cell_tokens FROM tn GROUP BY lg, bucket)",
      "sagg AS (SELECT lg, bucket, count(*) AS n_sel, " +
        "CAST(sum(n) AS BIGINT) AS sel_tokens FROM sel GROUP BY lg, bucket)")
    withClause(
      lm ++ realizationCtes("sk", Seq("lg", "bucket"), buckets) ++ accounting,
      "SELECT c.lg AS lang, c.bucket, c.n_docs, c.cell_tokens, " +
        "CAST(coalesce(s2.n_sel, 0) AS BIGINT) AS n_sel, " +
        "CAST(coalesce(s2.sel_tokens, 0) AS BIGINT) AS sel_tokens " +
        "FROM cells c LEFT JOIN sagg s2 " +
        "ON s2.lg = c.lg AND s2.bucket = c.bucket " +
        "ORDER BY lang, c.bucket")
  }

  /** Capstone-4 replay: the q64 quality fragment (token bounds, dup
    * 3-gram fraction, punct-per-token) gates the corpus, then the q96
    * allocation + realization chain runs over the KEPT documents.
    */
  def q99CorpusPipelineV4(budget: Double, buckets: Int): String =
    waterfillSelectionSql(Seq(
      s"qtk AS (SELECT doc_id, text, $Toks AS t FROM documents)",
      "qg AS (SELECT doc_id, text, len(t) AS n, " +
        "CASE WHEN len(t) >= 3 THEN list_transform(range(0, len(t) - 2), " +
        "i -> array_to_string(t[i + 1 : i + 3], ' ')) " +
        "ELSE [array_to_string(t, ' ')] END AS g3 FROM qtk)",
      "qual AS (SELECT doc_id FROM qg WHERE n >= 30 AND n <= 10000 " +
        "AND CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3) " +
        "<= 0.05 AND CAST(length(text) - length(regexp_replace(text, " +
        "'[.,;:!?''\"()-]', '', 'g')) AS DOUBLE) <= n * 0.5)",
      "tn AS (SELECT g.doc_id, d.source, g.n FROM qg g " +
        "JOIN qual USING (doc_id) " +
        "JOIN documents d ON d.doc_id = g.doc_id)"),
      budget, buckets)

  /** Persisted-trained-IVF query replay: q87's trained centroids (c2),
    * every vector assigned to its L2-nearest list, the query vector's
    * `nProbe` nearest lists probed, cosine top-`topK` within them —
    * exactly `Clustering.kmeansCentroids` + `Similarity.writeIvfIndex` +
    * `ivfTopKIndexed` (whose probe choice is driver-side arithmetic on
    * the sidecar matrix; the oracle does the same arithmetic in SQL).
    * Ordering convention = the q22 precedent: unrounded cosine DESC
    * then id.
    */
  def q98TrainedIvfQuery(k: Int, nProbe: Int, topK: Int): String =
    withClause(kmTrainCtes(k) ++ Seq(
      kmAssignCte("a3", "c2"),
      "qv AS (SELECT v FROM e WHERE vec_id = 0)",
      s"pr AS (SELECT c.cid FROM c2 c, qv " +
        s"ORDER BY ${kmDist("qv.v", "c.vec")}, c.cid LIMIT $nProbe)",
      "cand AS (SELECT a.vec_id, a.v FROM a3 a JOIN pr ON pr.cid = a.cid)"),
      "SELECT vec_id AS id, " +
        "round(list_cosine_similarity(cand.v, qv.v), 4) AS cos " +
        "FROM cand, qv " +
        "ORDER BY list_cosine_similarity(cand.v, qv.v) DESC, vec_id " +
        s"LIMIT $topK")

  /** Topic-balanced mix replay (q112): q87's trained centroids assign
    * every embedding to its topic; documents' token masses aggregate
    * per topic; an equal-weight waterfill allocates the budget; the
    * generic [[realizationCtes]] chain realizes the per-topic pick —
    * `Clustering.kmeansCentroids/assign` + `Mixture.waterfill` +
    * `selectByAllocations` joined across the two tables.
    */
  def q112TopicBalancedMix(k: Int, budget: Double, buckets: Int): String =
    withClause(kmTrainCtes(k) ++ Seq(
      kmAssignCte("a3", "c2"),
      s"tokd AS (SELECT doc_id, len($Toks) AS n FROM documents)",
      "tn AS (SELECT t.doc_id, 'c' || CAST(a.cid AS VARCHAR) AS sk, t.n " +
        "FROM tokd t JOIN a3 a ON a.vec_id = t.doc_id)",
      "s2 AS (SELECT sk, CAST(sum(n) AS BIGINT) AS c FROM tn GROUP BY sk)",
      "r2 AS (SELECT sk, c, CAST(c AS DOUBLE) / 1.0 AS ratio FROM s2)",
      "x2 AS (SELECT sk, c, ratio, " +
        "coalesce(sum(CAST(c AS DOUBLE)) OVER (ORDER BY ratio, sk " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cumb, " +
        "sum(1.0) OVER (ORDER BY ratio, sk " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tailw " +
        "FROM r2)",
      s"y2 AS (SELECT *, ($budget - cumb) / tailw AS tc FROM x2)",
      "z2 AS (SELECT *, first_value(CASE WHEN ratio >= tc THEN tc END " +
        "IGNORE NULLS) OVER (ORDER BY ratio, sk " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "AS ts FROM y2)",
      "al AS (SELECT sk, CAST(floor(CASE WHEN ts IS NULL " +
        "THEN CAST(c AS DOUBLE) " +
        "ELSE greatest(0.0, least(CAST(c AS DOUBLE), 1.0 * ts)) END) " +
        "AS BIGINT) AS b FROM z2)") ++
      realizationCtes("sk", Seq(), buckets),
      "SELECT sk AS topic, count(*) AS n_sel, " +
        "CAST(coalesce(sum(n), 0) AS BIGINT) AS sel_tokens " +
        "FROM sel GROUP BY sk ORDER BY topic")

  /** Quantized persisted-IVF replay (q108): q98's trained-centroid
    * assignment and probe choice, with the q76 int8 quantization at
    * rest — every assigned vector carries (scale = max|x|/127, codes =
    * round(x/scale)), the query quantizes the same way, and the probed
    * lists score by the integer code dot rescaled by both scales —
    * exactly `writeIvfIndexQuantized` + `ivfTopKIndexedQuantized`.
    */
  def q108QuantizedIvfQuery(k: Int, nProbe: Int, topK: Int): String =
    withClause(kmTrainCtes(k) ++ Seq(
      kmAssignCte("a3", "c2"),
      "qs AS (SELECT a.vec_id, a.cid, a.v, " +
        "list_max(list_transform(a.v, x -> abs(x))) / 127.0 AS scale " +
        "FROM a3 a)",
      "qc AS (SELECT vec_id, cid, scale, list_transform(v, x -> " +
        "CASE WHEN scale = 0 THEN 0 " +
        "ELSE CAST(round(x / scale) AS INTEGER) END) AS q FROM qs)",
      "qv AS (SELECT v FROM e WHERE vec_id = 0)",
      "qq0 AS (SELECT v, " +
        "list_max(list_transform(v, x -> abs(x))) / 127.0 AS q_scale " +
        "FROM qv)",
      "qq AS (SELECT q_scale, list_transform(v, x -> " +
        "CASE WHEN q_scale = 0 THEN 0 " +
        "ELSE CAST(round(x / q_scale) AS INTEGER) END) AS q_q FROM qq0)",
      s"pr AS (SELECT c.cid FROM c2 c, qv " +
        s"ORDER BY ${kmDist("qv.v", "c.vec")}, c.cid LIMIT $nProbe)",
      "cand AS (SELECT t.vec_id, t.scale, t.q FROM qc t " +
        "JOIN pr ON pr.cid = t.cid)",
      "sc AS (SELECT t.vec_id, " +
        "round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(range(1, len(t.q) + 1), " +
        "i -> t.q[i] * qq.q_q[i])), (a, x) -> a + x) AS DOUBLE) " +
        "* t.scale * qq.q_scale, 4) AS qscore FROM cand t, qq)"),
      s"SELECT vec_id AS id, qscore FROM sc " +
        s"ORDER BY qscore DESC, vec_id LIMIT $topK")

  /** FakeCodec semantics in SQL: n_bytes = UTF-8 octet length,
    * byte_entropy_q = number of occupied histogram buckets = distinct
    * `byte % 16` values (a bucket count is > 0 iff some byte lands in it).
    */
  val q33MultimodalFeatures: String =
    """WITH b AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS n FROM documents),
      |byi AS (SELECT doc_id, n, unnest(range(0, n)) AS i, hx FROM b),
      |bv AS (SELECT doc_id, n,
      |  (strpos('0123456789ABCDEF', substring(hx, 2 * i + 1, 1)) - 1) * 16
      |  + (strpos('0123456789ABCDEF', substring(hx, 2 * i + 2, 1)) - 1) AS byte
      |  FROM byi),
      |agg AS (SELECT doc_id, CAST(any_value(n) AS INTEGER) AS n_bytes,
      |  CAST(count(DISTINCT byte % 16) AS INTEGER) AS byte_entropy_q
      |  FROM bv GROUP BY doc_id)
      |-- empty/NULL text yields no byte rows but Spark still emits the doc
      |SELECT d.doc_id AS media_id, coalesce(a.n_bytes, 0) AS n_bytes,
      |  coalesce(a.byte_entropy_q, 0) AS byte_entropy_q
      |FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id""".stripMargin

  /** Efraimidis–Spirakis weighted-sample replay
    * ([[operators.Sampling.weightedSampleWithoutReplacement]]):
    * `u = ((splitmix64(doc_id) >>> 11) + 0.5) · 2⁻⁵³` in exact double
    * arithmetic (`// 2048` on the unsigned HUGEINT IS the shift),
    * key = −ln(u)/n_chars, k smallest by (key, doc_id).
    */
  def q119WeightedSample(k: Int): String = {
    val head = Seq(
      "dz AS (SELECT doc_id, n_chars, CAST(doc_id AS HUGEINT) AS z " +
        "FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)")
    val mixed = mixStages(Seq("z"), Seq("doc_id", "n_chars")).zipWithIndex
      .map { case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
      }
    withClause(head ++ mixed ++ Seq(
      "ky AS (SELECT doc_id, n_chars, -ln((z // 2048 + 0.5) " +
        "/ 9007199254740992.0) / n_chars AS k FROM dm5)",
      s"top AS (SELECT * FROM ky ORDER BY k, doc_id LIMIT $k)"),
      "SELECT doc_id, n_chars, round(k, 6) AS sample_key FROM top " +
        "ORDER BY doc_id")
  }

  /** Weighted-median sketch replay (q233,
    * [[operators.QuantileSketch.weightedSampleRegistersBy]]): the
    * q119 exponential-key chain keyed by source (splitmix of the
    * numeric doc id, 53-bit uniform, −ln(u)/w with w = token count),
    * per-source bottom-k, unweighted nearest-rank median of the
    * sample, and the q181 exact cumulative-weight device as the audit
    * columns.
    */
  def q233WeightedMedianSketch(k: Int): String = {
    val head = Seq(
      s"tok AS (SELECT source, doc_id, n_chars, len($Toks) AS w " +
        "FROM documents)",
      "f AS (SELECT * FROM tok WHERE w > 0 AND n_chars IS NOT NULL)",
      "dz AS (SELECT source, doc_id, n_chars, w, " +
        "CAST(doc_id AS HUGEINT) AS z FROM f)")
    val mixed = mixStages(Seq("z"),
      Seq("source", "doc_id", "n_chars", "w")).zipWithIndex
      .map { case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
      }
    withClause(head ++ mixed ++ Seq(
      "ky AS (SELECT source, doc_id, n_chars, -ln((z // 2048 + 0.5) " +
        "/ 9007199254740992.0) / w AS sk FROM dm5)",
      "rk AS (SELECT source, n_chars, row_number() OVER (PARTITION BY " +
        "source ORDER BY sk, doc_id) AS rank FROM ky)",
      s"reg AS (SELECT source, n_chars FROM rk WHERE rank <= $k)",
      "ri AS (SELECT source, n_chars, row_number() OVER (PARTITION BY " +
        "source ORDER BY n_chars) AS i, count(*) OVER (PARTITION BY " +
        "source) AS n_kept FROM reg)",
      "est AS (SELECT source, CAST(n_kept AS BIGINT) AS n_kept, " +
        "n_chars AS wm_est FROM ri WHERE i = (50 * n_kept + 99) // 100)",
      "c AS (SELECT source, n_chars, w, sum(w) OVER (PARTITION BY " +
        "source ORDER BY n_chars, doc_id ROWS UNBOUNDED PRECEDING) " +
        "AS cum, sum(w) OVER (PARTITION BY source) AS tot FROM f)",
      "exn AS (SELECT source, min(n_chars) AS wm_exact, " +
        "CAST(max(tot) AS BIGINT) AS total_weight FROM c " +
        "WHERE cum * 2 >= tot GROUP BY source)"),
      "SELECT e.source, e.n_kept, e.wm_est, x.wm_exact, " +
        "x.total_weight FROM est e JOIN exn x USING (source) " +
        "ORDER BY e.source")
  }

  /** Naive-Bayes classifier replay ([[operators.QualityClassifier]]):
    * the 80% train split is the splitmix64 bucket rule, the count
    * tables and smoothed llr are exact SQL arithmetic, and held-out
    * scores (prior + Σ llr) replay to the 1e-4 grid.
    */
  def q117NbClassifier(trainBuckets: Int, alpha: Double): String = {
    val head = Seq(
      s"tk AS (SELECT doc_id, lang = 'en' AS pos, $Toks AS t FROM documents)",
      "dz AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS z FROM documents)")
    val mixed = mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
    }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    withClause(head ++ mixed ++ Seq(
      s"sp AS (SELECT doc_id, $signedMod < $trainBuckets AS is_train FROM dm5)",
      "tr AS (SELECT tk.* FROM tk JOIN sp USING (doc_id) WHERE is_train)",
      "te AS (SELECT tk.* FROM tk JOIN sp USING (doc_id) WHERE NOT is_train)",
      "w AS (SELECT pos, unnest(t) AS token FROM tr)",
      "cnt AS (SELECT token, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos, " +
        "sum(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg FROM w GROUP BY token)",
      "tot AS (SELECT count(*) AS v, sum(c_pos) AS tp, sum(c_neg) AS tn FROM cnt)",
      "pri AS (SELECT ln(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)" +
        " / sum(CASE WHEN pos THEN 0 ELSE 1 END)) AS p FROM tr)",
      "sw AS (SELECT doc_id, unnest(t) AS token FROM te)",
      s"sc AS (SELECT doc_id, coalesce(" +
        s"ln((c_pos + $alpha) / (tp + $alpha * v)) " +
        s"- ln((c_neg + $alpha) / (tn + $alpha * v)), " +
        s"ln($alpha / (tp + $alpha * v)) - ln($alpha / (tn + $alpha * v))) " +
        "AS l FROM sw LEFT JOIN cnt USING (token), tot)",
      "agg AS (SELECT doc_id, count(*) AS n_tokens, sum(l) AS sl " +
        "FROM sc GROUP BY doc_id)"),
      "SELECT t.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens, " +
        "round(p + coalesce(a.sl, 0), 4) AS score, " +
        "(p + coalesce(a.sl, 0)) > 0 AS predicted, t.pos AS actual " +
        "FROM te t LEFT JOIN agg a ON t.doc_id = a.doc_id, pri " +
        "ORDER BY t.doc_id")
  }

  /** Reliability-bin replay ([[operators.QualityClassifier.calibration]]
    * over the q117 held-out scores): the q117 CTE chain up to the raw
    * log-odds, then sigmoid → equal-width bins (top edge folded into
    * the last) → per-bin mean prediction vs observed positive
    * fraction.
    */
  def q158Calibration(trainBuckets: Int, alpha: Double,
      bins: Int): String = {
    val head = Seq(
      s"tk AS (SELECT doc_id, lang = 'en' AS pos, $Toks AS t FROM documents)",
      "dz AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS z FROM documents)")
    val mixed = mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
    }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    withClause(head ++ mixed ++ Seq(
      s"sp AS (SELECT doc_id, $signedMod < $trainBuckets AS is_train FROM dm5)",
      "tr AS (SELECT tk.* FROM tk JOIN sp USING (doc_id) WHERE is_train)",
      "te AS (SELECT tk.* FROM tk JOIN sp USING (doc_id) WHERE NOT is_train)",
      "w AS (SELECT pos, unnest(t) AS token FROM tr)",
      "cnt AS (SELECT token, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos, " +
        "sum(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg FROM w GROUP BY token)",
      "tot AS (SELECT count(*) AS v, sum(c_pos) AS tp, sum(c_neg) AS tn FROM cnt)",
      "pri AS (SELECT ln(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)" +
        " / sum(CASE WHEN pos THEN 0 ELSE 1 END)) AS p FROM tr)",
      "sw AS (SELECT doc_id, unnest(t) AS token FROM te)",
      s"sc AS (SELECT doc_id, coalesce(" +
        s"ln((c_pos + $alpha) / (tp + $alpha * v)) " +
        s"- ln((c_neg + $alpha) / (tn + $alpha * v)), " +
        s"ln($alpha / (tp + $alpha * v)) - ln($alpha / (tn + $alpha * v))) " +
        "AS l FROM sw LEFT JOIN cnt USING (token), tot)",
      "agg AS (SELECT doc_id, sum(l) AS sl FROM sc GROUP BY doc_id)",
      "fs AS (SELECT t.doc_id, p + coalesce(a.sl, 0) AS score, t.pos " +
        "FROM te t LEFT JOIN agg a ON t.doc_id = a.doc_id, pri)",
      s"bn AS (SELECT CAST(least(floor((1.0 / (1.0 + exp(-score))) * $bins), " +
        s"${bins - 1}) AS INTEGER) AS bin, " +
        "1.0 / (1.0 + exp(-score)) AS pp, pos FROM fs)"),
      "SELECT bin, count(*) AS n, round(avg(pp), 4) AS avg_pred, " +
        "round(avg(CASE WHEN pos THEN 1.0 ELSE 0.0 END), 4) AS frac_pos, " +
        "round(abs(avg(pp) - avg(CASE WHEN pos THEN 1.0 ELSE 0.0 END)), 4) " +
        "AS gap FROM bn GROUP BY bin ORDER BY bin")
  }

  /** Poisson-bootstrap replay ([[operators.Bootstrap.poissonCiOfMean]]):
    * the q67 double-mix of (doc_id, rep) feeding the q119 exact-double
    * uniform, the Poisson(1) inverse-CDF cut points embedded as the
    * SAME round-trip double literals the operator computes, replicate
    * means as exact integer-sum ratios, and the CI order statistics by
    * row_number.
    */
  def q159PoissonBootstrap(reps: Int): String = {
    val head = Seq(
      "dz AS (SELECT source, doc_id, n_chars, CAST(doc_id AS HUGEINT) AS z " +
        "FROM documents WHERE n_chars IS NOT NULL)")
    def rounds(tag: String, from: String, pass: Seq[String]): Seq[String] =
      mixStages(Seq("z"), pass).zipWithIndex.map { case (body, n) =>
        val prev = if (n == 0) from else s"$tag${n - 1}"
        s"$tag$n AS ($body FROM $prev)"
      }
    val first = rounds("ma", "dz", Seq("source", "doc_id", "n_chars"))
    val xorStage = Seq(
      "mx AS (SELECT source, n_chars, rep, xor(z, CAST(rep AS HUGEINT)) " +
        s"AS z FROM ma5, unnest(range(0, $reps)) t(rep))")
    val second = rounds("mb", "mx", Seq("source", "n_chars", "rep"))
    val cuts = operators.Bootstrap.CumPoisson1
    val caseW = cuts.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${cuts.length} END")
    val klo = "greatest(1, CAST(floor(live * 0.025) AS BIGINT))"
    withClause(head ++ first ++ xorStage ++ second ++ Seq(
      "uw AS (SELECT source, n_chars, rep, " +
        "(z // 2048 + 0.5) / 9007199254740992.0 AS u FROM mb5)",
      s"pw AS (SELECT source, n_chars, rep, $caseW AS w FROM uw)",
      "rm AS (SELECT source, rep, sum(w * n_chars) AS sw, sum(w) AS n " +
        "FROM pw GROUP BY source, rep HAVING sum(w) > 0)",
      "mr AS (SELECT source, CAST(sw AS DOUBLE) / n AS m FROM rm)",
      "rk AS (SELECT source, m, row_number() OVER " +
        "(PARTITION BY source ORDER BY m) AS rn, " +
        "count(*) OVER (PARTITION BY source) AS live FROM mr)",
      s"pos AS (SELECT source, m, rn, live, $klo AS klo, " +
        s"live - $klo + 1 AS khi FROM rk)",
      "ci AS (SELECT source, max(live) AS n_reps, " +
        "round(max(CASE WHEN rn = klo THEN m END), 4) AS ci_lo, " +
        "round(max(CASE WHEN rn = khi THEN m END), 4) AS ci_hi " +
        "FROM pos GROUP BY source)",
      "pt AS (SELECT source, count(*) AS n_docs, " +
        "round(avg(n_chars), 4) AS mean_est FROM documents " +
        "WHERE n_chars IS NOT NULL GROUP BY source)"),
      "SELECT pt.source, pt.n_docs, pt.mean_est, ci.n_reps, ci.ci_lo, " +
        "ci.ci_hi FROM pt JOIN ci USING (source) ORDER BY source")
  }

  /** Two-epoch batch-GD logistic replay
    * ([[operators.QualityClassifier.trainLogistic]] at w₀ = 0, epochs
    * = 2): hashed unigram+bigram features (the q115 device, mod a
    * power-of-two bucket count), epoch 1 closed-form (σ(0) = 0.5),
    * epoch 2 through the explicit margin join, held-out docs scored
    * under the final weights. Every expression mirrors the Spark
    * operation tree (`g = Σ x·err / N`, `w ← w − lr·g`) so the only
    * divergence channel is double-summation order — absorbed by the
    * 1e-4 output grid.
    */
  def q160Logistic(trainBuckets: Int, buckets: Int, lr: Double): String = {
    require((buckets & (buckets - 1)) == 0,
      s"oracle replay needs a power-of-two bucket count, got $buckets")
    val head = Seq(
      s"tk AS (SELECT doc_id, lang = 'en' AS pos, $Toks AS t FROM documents)",
      "dz AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS z FROM documents)")
    val mixed = mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
    }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    withClause(head ++ mixed ++ Seq(
      s"sp AS (SELECT doc_id, $signedMod < $trainBuckets AS is_train FROM dm5)",
      "fg AS (SELECT doc_id, unnest(list_concat(t, " +
        "CASE WHEN len(t) >= 2 THEN list_transform(range(0, len(t) - 1), " +
        "i -> t[i + 1] || ' ' || t[i + 2]) " +
        "ELSE CAST([] AS VARCHAR[]) END)) AS gram FROM tk)",
      s"fb AS (SELECT doc_id, CAST(${fnv("gram")} % $buckets AS BIGINT) " +
        "AS bucket FROM fg)",
      "fc AS (SELECT doc_id, bucket, count(*) AS c FROM fb " +
        "GROUP BY doc_id, bucket)",
      "fx AS (SELECT doc_id, bucket, CAST(c AS DOUBLE) / " +
        "(sum(c) OVER (PARTITION BY doc_id)) AS x, " +
        "sum(c) OVER (PARTITION BY doc_id) AS nf FROM fc)",
      "trd AS (SELECT tk.doc_id, CASE WHEN pos THEN 1.0 ELSE 0.0 END AS y " +
        "FROM tk JOIN sp USING (doc_id) WHERE is_train)",
      "ntr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM trd)",
      // epoch 1: all weights 0 -> sigma(0) = 0.5 exactly
      "e1 AS (SELECT doc_id, 0.5 - y AS err FROM trd)",
      s"w1 AS (SELECT bucket, -($lr * (sum(x * err) / n)) AS w " +
        "FROM fx JOIN e1 USING (doc_id), ntr GROUP BY bucket, n)",
      s"b1 AS (SELECT -($lr * (sum(err) / n)) AS b FROM e1, ntr " +
        "GROUP BY n)",
      // epoch 2: explicit margins under (w1, b1)
      "d2 AS (SELECT doc_id, sum(w1.w * fx.x) AS dot FROM fx " +
        "JOIN w1 USING (bucket) GROUP BY doc_id)",
      "z2 AS (SELECT t.doc_id, t.y, b1.b + coalesce(d2.dot, 0.0) AS z " +
        "FROM trd t LEFT JOIN d2 USING (doc_id), b1)",
      "e2 AS (SELECT doc_id, 1.0 / (1.0 + exp(-z)) - y AS err FROM z2)",
      s"w2 AS (SELECT w1.bucket, w1.w - $lr * (g.gr) AS w FROM w1 " +
        "JOIN (SELECT bucket, sum(x * err) / any_value(n) AS gr FROM fx " +
        "JOIN e2 USING (doc_id), ntr GROUP BY bucket) g USING (bucket))",
      s"b2 AS (SELECT b1.b - $lr * (sum(err) / n) AS b FROM e2, b1, ntr " +
        "GROUP BY b1.b, n)",
      // held-out scoring under the final model; unseen buckets weigh 0
      "te AS (SELECT tk.doc_id, pos FROM tk JOIN sp USING (doc_id) " +
        "WHERE NOT is_train)",
      "ds AS (SELECT fx.doc_id, any_value(fx.nf) AS nf, " +
        "sum(fx.x * coalesce(w2.w, 0.0)) AS dot FROM fx " +
        "LEFT JOIN w2 USING (bucket) " +
        "JOIN te ON te.doc_id = fx.doc_id GROUP BY fx.doc_id)",
      "fs AS (SELECT te.doc_id, CAST(coalesce(ds.nf, 0) AS BIGINT) " +
        "AS n_feats, b2.b + coalesce(ds.dot, 0.0) AS z, te.pos " +
        "FROM te LEFT JOIN ds USING (doc_id), b2)"),
      "SELECT doc_id, n_feats, round(1.0 / (1.0 + exp(-z)), 4) AS score, " +
        "z > 0 AS predicted, pos AS actual FROM fs ORDER BY doc_id")
  }

  /** The q117 CTE chain up to raw held-out scores — shared by the
    * threshold-sweep and AUC replays.
    */
  private def nbScoreChain(trainBuckets: Int,
      alpha: Double): Seq[String] = {
    val head = Seq(
      s"tk AS (SELECT doc_id, lang = 'en' AS pos, $Toks AS t FROM documents)",
      "dz AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS z FROM documents)")
    val mixed = mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
    }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    head ++ mixed ++ Seq(
      s"sp AS (SELECT doc_id, $signedMod < $trainBuckets AS is_train FROM dm5)",
      "tr AS (SELECT tk.* FROM tk JOIN sp USING (doc_id) WHERE is_train)",
      "te AS (SELECT tk.* FROM tk JOIN sp USING (doc_id) WHERE NOT is_train)",
      "w AS (SELECT pos, unnest(t) AS token FROM tr)",
      "cnt AS (SELECT token, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos, " +
        "sum(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg FROM w GROUP BY token)",
      "tot AS (SELECT count(*) AS v, sum(c_pos) AS tp, sum(c_neg) AS tn FROM cnt)",
      "pri AS (SELECT ln(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)" +
        " / sum(CASE WHEN pos THEN 0 ELSE 1 END)) AS p FROM tr)",
      "sw AS (SELECT doc_id, unnest(t) AS token FROM te)",
      s"sc AS (SELECT doc_id, coalesce(" +
        s"ln((c_pos + $alpha) / (tp + $alpha * v)) " +
        s"- ln((c_neg + $alpha) / (tn + $alpha * v)), " +
        s"ln($alpha / (tp + $alpha * v)) - ln($alpha / (tn + $alpha * v))) " +
        "AS l FROM sw LEFT JOIN cnt USING (token), tot)",
      "agg AS (SELECT doc_id, sum(l) AS sl FROM sc GROUP BY doc_id)",
      "fs AS (SELECT t.doc_id, p + coalesce(a.sl, 0) AS score, t.pos " +
        "FROM te t LEFT JOIN agg a ON t.doc_id = a.doc_id, pri)")
  }

  /** Operating-curve replay: raw q117 scores against a fixed
    * threshold list, precision/recall/F1 with zero-denominator nulls.
    */
  def q190ThresholdSweep(trainBuckets: Int, alpha: Double,
      taus: Seq[Double]): String = {
    val list = taus.mkString("[", ", ", "]")
    withClause(nbScoreChain(trainBuckets, alpha) ++ Seq(
      s"th AS (SELECT CAST(unnest($list) AS DOUBLE) AS tau)",
      "ag AS (SELECT tau, " +
        "CAST(sum(CASE WHEN score > tau AND pos THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS tp, " +
        "CAST(sum(CASE WHEN score > tau AND NOT pos THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS fp, " +
        "CAST(sum(CASE WHEN score <= tau AND pos THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS fn " +
        "FROM fs, th GROUP BY tau)"),
      "SELECT tau, tp, fp, fn, " +
        "CASE WHEN tp + fp > 0 THEN " +
        "round(tp / CAST(tp + fp AS DOUBLE), 4) END AS \"precision\", " +
        "CASE WHEN tp + fn > 0 THEN " +
        "round(tp / CAST(tp + fn AS DOUBLE), 4) END AS recall, " +
        "CASE WHEN tp > 0 THEN " +
        "round(2.0 * tp / (2.0 * tp + fp + fn), 4) END AS f1 " +
        "FROM ag ORDER BY tau")
  }

  /** Per-source transfer audit of the q117/q190 NB filter at its
    * natural operating point (score > 0): held-out confusion counts
    * grouped by the documents' source domain.
    */
  def q324FilterTransfer(trainBuckets: Int, alpha: Double): String =
    withClause(nbScoreChain(trainBuckets, alpha) ++ Seq(
      "fsx AS (SELECT f.doc_id, f.score, f.pos, d.source " +
        "FROM fs f JOIN documents d USING (doc_id))",
      "ag AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(CASE WHEN score > 0 AND pos THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS tp, " +
        "CAST(sum(CASE WHEN score > 0 AND NOT pos THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS fp, " +
        "CAST(sum(CASE WHEN score <= 0 AND pos THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS fn " +
        "FROM fsx GROUP BY source)"),
      "SELECT source, n_docs, tp, fp, fn, " +
        "CASE WHEN tp + fp > 0 THEN " +
        "round(tp / CAST(tp + fp AS DOUBLE), 4) END AS \"precision\", " +
        "CASE WHEN tp + fn > 0 THEN " +
        "round(tp / CAST(tp + fn AS DOUBLE), 4) END AS recall, " +
        "CASE WHEN tp > 0 THEN " +
        "round(2.0 * tp / (2.0 * tp + fp + fn), 4) END AS f1 " +
        "FROM ag ORDER BY source")

  /** Exact mid-rank Mann-Whitney AUC over the q117 held-out scores. */
  def q191RocAuc(trainBuckets: Int, alpha: Double): String =
    withClause(nbScoreChain(trainBuckets, alpha) ++ Seq(
      "r AS (SELECT doc_id, score, pos, CAST(row_number() OVER " +
        "(ORDER BY score, doc_id) AS DOUBLE) AS rn FROM fs)",
      "m AS (SELECT pos, avg(rn) OVER (PARTITION BY score) AS midrank " +
        "FROM r)",
      "ag AS (SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_pos, " +
        "CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n_neg, " +
        "sum(CASE WHEN pos THEN midrank END) AS rs FROM m)"),
      "SELECT n_pos, n_neg, round((rs - n_pos * (n_pos + 1) / 2.0) " +
        "/ CAST(n_pos * n_neg AS DOUBLE), 4) AS auc FROM ag")

  /** Cumulative-gains replay: q117 held-out scores cut into score-desc
    * deciles (ntile with the doc_id tie-break), per-decile capture of
    * the positive class and lift vs the base rate — the
    * marketing/classifier-triage readout over the same `fs` chain.
    */
  def q204GainsDeciles(trainBuckets: Int, alpha: Double): String =
    withClause(nbScoreChain(trainBuckets, alpha) ++ Seq(
      "r AS (SELECT doc_id, pos, CAST(ntile(10) OVER " +
        "(ORDER BY score DESC, doc_id) AS INTEGER) AS decile FROM fs)",
      "d AS (SELECT decile, count(*) AS n, " +
        "CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos " +
        "FROM r GROUP BY decile)",
      "t AS (SELECT sum(n) AS tn, sum(n_pos) AS tp FROM d)"),
      "SELECT decile, n, n_pos, " +
        "CAST(sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED " +
        "PRECEDING) AS BIGINT) AS cum_pos, " +
        "round(sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED " +
        "PRECEDING) / CAST(tp AS DOUBLE), 4) AS capture, " +
        "round((n_pos / CAST(n AS DOUBLE)) / (tp / CAST(tn AS DOUBLE))" +
        ", 4) AS lift FROM d, t ORDER BY decile")

  /** RRF ensemble replay ([[operators.RankFusion]], q137): the q117 NB
    * classifier (hash-split trained, scoring ALL docs), the q100
    * bigram LM (trained below `lmSplit`, scoring all docs with ≥ 2
    * tokens), and the heuristic score — each competition-ranked
    * (`rank()` = 1 + strictly better), fused `Σ 1/(k + r)` over the
    * rankings containing the doc.
    */
  def q137RankFusion(trainBuckets: Int, nbAlpha: Double, lmSplit: Int,
      lmAlpha: Double, k: Int, topK: Int, heurSql: String): String = {
    val head = Seq(
      s"tk AS (SELECT doc_id, lang = 'en' AS pos, $Toks AS t FROM documents)",
      "dz AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS z FROM documents)")
    val mixed = mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
    }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    withClause(head ++ mixed ++ Seq(
      s"sp AS (SELECT doc_id, $signedMod < $trainBuckets AS is_train FROM dm5)",
      "tr AS (SELECT tk.* FROM tk JOIN sp USING (doc_id) WHERE is_train)",
      "w AS (SELECT pos, unnest(t) AS token FROM tr)",
      "cnt AS (SELECT token, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos, " +
        "sum(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg FROM w GROUP BY token)",
      "tot AS (SELECT count(*) AS v, sum(c_pos) AS tp, sum(c_neg) AS tn FROM cnt)",
      "pri AS (SELECT ln(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)" +
        " / sum(CASE WHEN pos THEN 0 ELSE 1 END)) AS p FROM tr)",
      "sw AS (SELECT doc_id, unnest(t) AS token FROM tk)",
      s"sc AS (SELECT doc_id, coalesce(" +
        s"ln((c_pos + $nbAlpha) / (tp + $nbAlpha * v)) " +
        s"- ln((c_neg + $nbAlpha) / (tn + $nbAlpha * v)), " +
        s"ln($nbAlpha / (tp + $nbAlpha * v)) - ln($nbAlpha / (tn + $nbAlpha * v))) " +
        "AS l FROM sw LEFT JOIN cnt USING (token), tot)",
      "agg AS (SELECT doc_id, sum(l) AS sl FROM sc GROUP BY doc_id)",
      "nb AS (SELECT tk.doc_id, round(p + coalesce(a.sl, 0), 4) AS s " +
        "FROM tk LEFT JOIN agg a ON tk.doc_id = a.doc_id, pri)",
      s"ltr AS (SELECT * FROM tk WHERE doc_id < $lmSplit)",
      "uni AS (SELECT w AS l, count(*) AS c1 FROM " +
        "(SELECT unnest(t) AS w FROM ltr) GROUP BY w)",
      "lv AS (SELECT CAST(count(*) AS DOUBLE) AS vs FROM uni)",
      "bi AS (SELECT l, r, count(*) AS c2 FROM " +
        "(SELECT t[j] AS l, t[j + 1] AS r FROM " +
        "(SELECT t, unnest(range(1, len(t))) AS j FROM ltr)) GROUP BY l, r)",
      "tep AS (SELECT doc_id, t[j] AS l, t[j + 1] AS r FROM " +
        "(SELECT doc_id, t, unnest(range(1, len(t))) AS j FROM tk))",
      s"lsc AS (SELECT p.doc_id, ln((coalesce(b.c2, 0) + $lmAlpha) / " +
        s"(coalesce(u.c1, 0) + $lmAlpha * lv.vs)) AS lp FROM tep p " +
        "LEFT JOIN bi b ON b.l = p.l AND b.r = p.r " +
        "LEFT JOIN uni u ON u.l = p.l CROSS JOIN lv)",
      "lmt AS (SELECT doc_id, round(avg(lp), 4) AS s FROM lsc GROUP BY doc_id)",
      s"heur AS (SELECT doc_id, $heurSql AS s FROM documents)",
      "rh AS (SELECT doc_id, rank() OVER (ORDER BY s DESC) AS r FROM heur)",
      "rn AS (SELECT doc_id, rank() OVER (ORDER BY s DESC) AS r FROM nb)",
      "rl AS (SELECT doc_id, rank() OVER (ORDER BY s DESC) AS r FROM lmt)",
      "f AS (SELECT coalesce(rh.doc_id, rn.doc_id, rl.doc_id) AS doc_id, " +
        "rh.r AS r1, rn.r AS r2, rl.r AS r3 FROM rh " +
        "FULL JOIN rn ON rh.doc_id = rn.doc_id " +
        "FULL JOIN rl ON coalesce(rh.doc_id, rn.doc_id) = rl.doc_id)"),
      "SELECT doc_id, r1 AS rank_heur, r2 AS rank_nb, r3 AS rank_lm, " +
        s"round(coalesce(1.0 / ($k + r1), 0) + coalesce(1.0 / ($k + r2), 0) " +
        s"+ coalesce(1.0 / ($k + r3), 0), 6) AS rrf " +
        s"FROM f ORDER BY rrf DESC, doc_id LIMIT $topK")
  }

  /** Count–min-sketch replay ([[operators.Sketches]]): cell of (token,
    * row j) = `splitmix64(fnv1a64(token) XOR j) mod width` (the Bloom
    * device), cells summed from the exact counts, estimate = min cell.
    */
  def q121CountMin(depth: Int, width: Int): String = {
    val head = Seq(
      s"tk AS (SELECT $Toks AS t FROM documents)",
      "tok AS (SELECT unnest(t) AS token FROM tk)",
      "tc AS (SELECT token, count(*) AS c_true FROM tok GROUP BY token)",
      s"th AS (SELECT token, c_true, j, " +
        s"xor(${fnv("token")}, CAST(j AS HUGEINT)) AS z " +
        s"FROM tc, (SELECT unnest(range(0, $depth)) AS j))")
    val mixed = mixStages(Seq("z"), Seq("token", "c_true", "j"))
      .zipWithIndex.map { case (body, n) =>
        val prev = if (n == 0) "th" else s"cm${n - 1}"
        s"cm$n AS ($body FROM $prev)"
      }
    withClause(head ++ mixed ++ Seq(
      s"hb AS (SELECT token, c_true, j, z % $width AS bucket FROM cm5)",
      "cells AS (SELECT j, bucket, sum(c_true) AS cell FROM hb " +
        "GROUP BY j, bucket)",
      "est AS (SELECT token, min(cell) AS c_est FROM hb " +
        "JOIN cells USING (j, bucket) GROUP BY token)"),
      "SELECT t.token, t.c_true, CAST(e.c_est AS BIGINT) AS c_est, " +
        "CAST(e.c_est - t.c_true AS BIGINT) AS overcount " +
        "FROM tc t JOIN est e USING (token) ORDER BY t.token")
  }

  /** HyperLogLog replay ([[operators.Sketches.hllRegisters]]): register
    * index = top `p` bits of splitmix64(fnv1a64(token)); the zero-run
    * length comes from the SAME literal-powers bit-length comparison as
    * the Spark side (integer-exact); estimate constants (α_m, the
    * 2.5·m small-range threshold) are the identical literals.
    */
  def q122Hll(p: Int): String = {
    val sub = 64 - p
    val m = (1L << p).toDouble
    val alpha = graft.operators.Sketches.hllAlpha(p)
    val subPow = (BigInt(1) << sub).toString // 2^(64-p) as HUGEINT
    val powers = (0 until sub).map(1L << _).mkString("[", ", ", "]")
    val e = s"($alpha * $m * $m) / (s_occ + ($m - n_occ))"
    val head = Seq(
      s"tk AS (SELECT $Toks AS t FROM documents)",
      "tok AS (SELECT unnest(t) AS token FROM tk)",
      "dt AS (SELECT DISTINCT token FROM tok)",
      s"th AS (SELECT ${fnv("token")} AS z FROM dt)")
    val mixed = mixStages(Seq("z"), Seq()).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "th" else s"hm${n - 1}"
        s"hm$n AS ($body FROM $prev)"
    }
    withClause(head ++ mixed ++ Seq(
      s"hh AS (SELECT z // $subPow AS idx, " +
        s"CAST(z % $subPow AS BIGINT) AS rest FROM hm5)",
      s"rr AS (SELECT idx, max($sub + 1 - " +
        s"len(list_filter($powers, q -> q <= rest))) AS m_j " +
        "FROM hh GROUP BY idx)",
      "ag AS (SELECT count(*) AS n_occ, " +
        "coalesce(sum(power(2.0, -m_j)), 0) AS s_occ, " +
        "coalesce(sum(m_j), 0) AS reg_sum FROM rr)",
      "tr AS (SELECT count(DISTINCT token) AS n_true FROM tok)"),
      s"SELECT CAST(${1L << p} AS BIGINT) AS m, " +
        "CAST(n_occ AS BIGINT) AS n_registers_used, " +
        "CAST(reg_sum AS BIGINT) AS reg_sum, " +
        s"round(CASE WHEN $e <= 2.5 * $m AND ($m - n_occ) > 0 " +
        s"THEN $m * ln($m / ($m - n_occ)) ELSE $e END, 4) " +
        "AS hll_estimate, CAST(n_true AS BIGINT) AS n_true FROM ag, tr")
  }

  /** Grouped-HLL replay ([[operators.Sketches.hllRegistersBy]]): the
    * q122 chain carrying the group key through hash, registers, and
    * the per-group estimate aggregation.
    */
  /** Grouped KMV replay ([[operators.Sketches.kmvSketchBy]] →
    * [[operators.Sketches.kmvEstimateBy]]): distinct per-source
    * 3-gram hashes, SIGNED ascending rank, bottom-k kept; estimate
    * `(k−1)/u_k` with the +2^63 shift, exact `n_kept` when the sketch
    * never filled; exact distinct count joined for the audit.
    */
  def q212KmvDistinct(k: Int): String = {
    val head = Seq(
      s"tok AS (SELECT source, $Toks AS t FROM documents)",
      "g AS (SELECT source, unnest(list_distinct(CASE WHEN len(t) >= 3 " +
        "THEN list_transform(range(0, len(t) - 2), " +
        "i -> array_to_string(t[i + 1 : i + 3], ' ')) " +
        "ELSE [array_to_string(t, ' ')] END)) AS gram FROM tok)",
      "dg AS (SELECT DISTINCT source AS key, gram FROM g)",
      s"th AS (SELECT key, ${fnv("gram")} AS z FROM dg)")
    val mixed = mixStages(Seq("z"), Seq("key")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "th" else s"hm${n - 1}"
        s"hm$n AS ($body FROM $prev)"
    }
    withClause(head ++ mixed ++ Seq(
      s"sk AS (SELECT key, ${toSigned("z")} AS h FROM hm5)",
      "rk AS (SELECT key, h, row_number() OVER (PARTITION BY key " +
        "ORDER BY h) AS rank FROM sk)",
      s"ag AS (SELECT key, sum(CASE WHEN rank <= $k THEN 1 ELSE 0 END) " +
        s"AS n_kept, max(CASE WHEN rank = $k THEN h END) AS hk " +
        "FROM rk GROUP BY key)",
      "tr AS (SELECT source AS key, count(DISTINCT gram) AS n_true " +
        "FROM g GROUP BY source)"),
      "SELECT a.key, CAST(n_kept AS BIGINT) AS n_kept, " +
        s"CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE) " +
        s"ELSE round(CAST(${k - 1} AS DOUBLE) / " +
        "((CAST(hk AS DOUBLE) + 9223372036854775808.0) / " +
        "18446744073709551616.0), 4) END AS dv_est, n_true " +
        "FROM ag a JOIN tr USING (key) ORDER BY key")
  }

  /** KMV overlap replay ([[operators.Sketches.kmvOverlapMatrix]]):
    * per-key bottom-k sketches, per-pair union sketch (bottom-k of the
    * two sketches' hashes), membership-in-both counting, the (k−1)/u_k
    * union estimate, and the EXACT pairwise intersection joined for
    * the audit.
    */
  def q216KmvOverlap(k: Int): String = {
    val head = Seq(
      s"tok AS (SELECT source, $Toks AS t FROM documents)",
      "g AS (SELECT source, unnest(list_distinct(CASE WHEN len(t) >= 3 " +
        "THEN list_transform(range(0, len(t) - 2), " +
        "i -> array_to_string(t[i + 1 : i + 3], ' ')) " +
        "ELSE [array_to_string(t, ' ')] END)) AS gram FROM tok)",
      "dg AS (SELECT DISTINCT source AS key, gram FROM g)",
      s"th AS (SELECT key, ${fnv("gram")} AS z FROM dg)")
    val mixed = mixStages(Seq("z"), Seq("key")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "th" else s"hm${n - 1}"
        s"hm$n AS ($body FROM $prev)"
    }
    withClause(head ++ mixed ++ Seq(
      s"sk AS (SELECT key, ${toSigned("z")} AS h FROM hm5)",
      "rk AS (SELECT key, h, row_number() OVER (PARTITION BY key " +
        "ORDER BY h) AS rank FROM sk)",
      s"kk AS (SELECT key, h FROM rk WHERE rank <= $k)",
      "ks AS (SELECT DISTINCT key FROM kk)",
      "bo AS (SELECT a.key AS key_a, b.key AS key_b, a.h " +
        "FROM kk a JOIN kk b ON a.h = b.h AND a.key < b.key)",
      "pu AS (SELECT DISTINCT key_a, key_b, h FROM (" +
        "SELECT a.key AS key_a, kb.key AS key_b, a.h FROM kk a " +
        "JOIN ks kb ON a.key < kb.key " +
        "UNION ALL " +
        "SELECT ka.key AS key_a, a.key AS key_b, a.h FROM kk a " +
        "JOIN ks ka ON ka.key < a.key))",
      "pr AS (SELECT key_a, key_b, h, row_number() OVER (" +
        "PARTITION BY key_a, key_b ORDER BY h) AS rank FROM pu)",
      s"pk AS (SELECT * FROM pr WHERE rank <= $k)",
      "ag AS (SELECT pk.key_a, pk.key_b, count(*) AS n_union_kept, " +
        "CAST(sum(CASE WHEN bo.h IS NOT NULL THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_both, " +
        s"max(CASE WHEN pk.rank = $k THEN pk.h END) AS hk " +
        "FROM pk LEFT JOIN bo ON bo.key_a = pk.key_a " +
        "AND bo.key_b = pk.key_b AND bo.h = pk.h GROUP BY 1, 2)",
      "ti AS (SELECT a.key AS key_a, b.key AS key_b, " +
        "count(*) AS n_true_inter FROM dg a JOIN dg b " +
        "ON a.gram = b.gram AND a.key < b.key GROUP BY 1, 2)",
      s"fin AS (SELECT ag.*, CASE WHEN n_union_kept < $k " +
        "THEN CAST(n_union_kept AS DOUBLE) " +
        s"ELSE round(CAST(${k - 1} AS DOUBLE) / " +
        "((CAST(hk AS DOUBLE) + 9223372036854775808.0) / " +
        "18446744073709551616.0), 4) END AS dv_union FROM ag)"),
      "SELECT f.key_a, f.key_b, f.n_union_kept, f.n_both, f.dv_union, " +
        "CAST(f.n_both AS DOUBLE) / f.n_union_kept * f.dv_union " +
        "AS inter_est, coalesce(ti.n_true_inter, 0) AS n_true_inter " +
        "FROM fin f LEFT JOIN ti ON ti.key_a = f.key_a " +
        "AND ti.key_b = f.key_b ORDER BY f.key_a, f.key_b")
  }

  def q123HllBySource(p: Int): String = {
    val sub = 64 - p
    val m = (1L << p).toDouble
    val alpha = graft.operators.Sketches.hllAlpha(p)
    val subPow = (BigInt(1) << sub).toString
    val powers = (0 until sub).map(1L << _).mkString("[", ", ", "]")
    val e = s"($alpha * $m * $m) / (s_occ + ($m - n_occ))"
    val head = Seq(
      s"tk AS (SELECT source, $Toks AS t FROM documents)",
      "tok AS (SELECT source, unnest(t) AS token FROM tk)",
      "dt AS (SELECT DISTINCT source, token FROM tok)",
      s"th AS (SELECT source, ${fnv("token")} AS z FROM dt)")
    val mixed = mixStages(Seq("z"), Seq("source")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "th" else s"hm${n - 1}"
        s"hm$n AS ($body FROM $prev)"
    }
    withClause(head ++ mixed ++ Seq(
      s"hh AS (SELECT source, z // $subPow AS idx, " +
        s"CAST(z % $subPow AS BIGINT) AS rest FROM hm5)",
      s"rr AS (SELECT source, idx, max($sub + 1 - " +
        s"len(list_filter($powers, q -> q <= rest))) AS m_j " +
        "FROM hh GROUP BY source, idx)",
      "ag AS (SELECT source, count(*) AS n_occ, " +
        "coalesce(sum(power(2.0, -m_j)), 0) AS s_occ, " +
        "coalesce(sum(m_j), 0) AS reg_sum FROM rr GROUP BY source)",
      "tr AS (SELECT source, count(DISTINCT token) AS n_true FROM tok " +
        "GROUP BY source)"),
      s"SELECT ag.source, CAST(${1L << p} AS BIGINT) AS m, " +
        "CAST(n_occ AS BIGINT) AS n_registers_used, " +
        "CAST(reg_sum AS BIGINT) AS reg_sum, " +
        s"round(CASE WHEN $e <= 2.5 * $m AND ($m - n_occ) > 0 " +
        s"THEN $m * ln($m / ($m - n_occ)) ELSE $e END, 4) " +
        "AS hll_estimate, CAST(n_true AS BIGINT) AS n_true " +
        "FROM ag JOIN tr USING (source) ORDER BY ag.source")
  }

  /** Dedup preflight replay (q363): q123's HLL chain run over the
    * per-language FOLDED fingerprints (NULL fps excluded — they opt
    * out of dedup) next to the exact distinct count and doc count —
    * the cheap pre-flight a 100 TB pipeline reads to decide whether
    * the dedup shuffle is worth paying.
    */
  def q363DedupPreflight(p: Int): String = {
    val sub = 64 - p
    val m = (1L << p).toDouble
    val alpha = graft.operators.Sketches.hllAlpha(p)
    val subPow = (BigInt(1) << sub).toString
    val powers = (0 until sub).map(1L << _).mkString("[", ", ", "]")
    val e = s"($alpha * $m * $m) / (s_occ + ($m - n_occ))"
    val head = Seq(
      s"f AS (SELECT lang, $FoldedFpSql AS fp FROM documents)",
      "ff AS (SELECT lang, fp FROM f WHERE fp IS NOT NULL)",
      "dt AS (SELECT DISTINCT lang, fp FROM ff)",
      s"th AS (SELECT lang, ${fnv("fp")} AS z FROM dt)")
    val mixed = mixStages(Seq("z"), Seq("lang")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "th" else s"hm${n - 1}"
        s"hm$n AS ($body FROM $prev)"
    }
    withClause(head ++ mixed ++ Seq(
      s"hh AS (SELECT lang, z // $subPow AS idx, " +
        s"CAST(z % $subPow AS BIGINT) AS rest FROM hm5)",
      s"rr AS (SELECT lang, idx, max($sub + 1 - " +
        s"len(list_filter($powers, q -> q <= rest))) AS m_j " +
        "FROM hh GROUP BY lang, idx)",
      "ag AS (SELECT lang, count(*) AS n_occ, " +
        "coalesce(sum(power(2.0, -m_j)), 0) AS s_occ, " +
        "coalesce(sum(m_j), 0) AS reg_sum FROM rr GROUP BY lang)",
      "tr AS (SELECT lang, count(DISTINCT fp) AS n_distinct, " +
        "count(*) AS n_docs FROM ff GROUP BY lang)"),
      s"SELECT ag.lang, CAST(${1L << p} AS BIGINT) AS m, " +
        "CAST(n_occ AS BIGINT) AS n_registers_used, " +
        "CAST(reg_sum AS BIGINT) AS reg_sum, " +
        s"round(CASE WHEN $e <= 2.5 * $m AND ($m - n_occ) > 0 " +
        s"THEN $m * ln($m / ($m - n_occ)) ELSE $e END, 4) " +
        "AS hll_estimate, CAST(n_distinct AS BIGINT) AS n_distinct, " +
        "CAST(n_docs AS BIGINT) AS n_docs " +
        "FROM ag JOIN tr USING (lang) ORDER BY ag.lang")
  }

  /** Capstone #7 replay: tile rewrite (q118 fragment) → NB classifier
    * gate on the CLEANED text over the splitmix 80% split (q117
    * fragment) → DSIR weights of the accepted pool vs the cleaned
    * target slice (q115 fragment) → top-k → per-source accounting.
    */
  def q120CleanSelect(k: Int, buckets: Int, alpha: Double,
      trainBuckets: Int): String = {
    val head = Seq(
      s"tk0 AS (SELECT doc_id, $Toks AS t FROM documents)",
      "tiles AS (SELECT doc_id, j AS tile_idx, " +
        "array_to_string(t[j * 8 + 1 : j * 8 + 8], ' ') AS tile " +
        "FROM (SELECT doc_id, t, " +
        "unnest(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS j " +
        "FROM tk0) " +
        "WHERE array_to_string(t[j * 8 + 1 : j * 8 + 8], ' ') <> '')",
      "kr AS (SELECT doc_id, tile_idx, tile, row_number() OVER " +
        "(PARTITION BY tile ORDER BY doc_id, tile_idx) AS rn FROM tiles)",
      "cln AS (SELECT doc_id, string_agg(tile, ' ' ORDER BY tile_idx) " +
        "AS clean FROM kr WHERE rn = 1 GROUP BY doc_id)",
      "ct AS (SELECT d.doc_id, d.lang, d.source, coalesce(c.clean, '') " +
        "AS text FROM documents d LEFT JOIN cln c USING (doc_id))",
      s"ctk AS (SELECT doc_id, lang, source, lang = 'en' AS pos, " +
        s"$Toks AS t FROM ct)",
      "dz AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS z FROM documents)")
    val mixed = mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
    }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    val rest = Seq(
      s"sp AS (SELECT doc_id, $signedMod < $trainBuckets AS is_train " +
        "FROM dm5)",
      "tr AS (SELECT ctk.* FROM ctk JOIN sp USING (doc_id) WHERE is_train)",
      "w AS (SELECT pos, unnest(t) AS token FROM tr)",
      "cnt AS (SELECT token, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos, " +
        "sum(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg FROM w GROUP BY token)",
      "tot AS (SELECT count(*) AS v, sum(c_pos) AS tp, sum(c_neg) AS tn " +
        "FROM cnt)",
      "pri AS (SELECT ln(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)" +
        " / sum(CASE WHEN pos THEN 0 ELSE 1 END)) AS p FROM tr)",
      "sw AS (SELECT doc_id, unnest(t) AS token FROM ctk)",
      s"sc AS (SELECT doc_id, coalesce(" +
        s"ln((c_pos + $alpha) / (tp + $alpha * v)) " +
        s"- ln((c_neg + $alpha) / (tn + $alpha * v)), " +
        s"ln($alpha / (tp + $alpha * v)) - ln($alpha / (tn + $alpha * v))) " +
        "AS l FROM sw LEFT JOIN cnt USING (token), tot)",
      "nag AS (SELECT doc_id, sum(l) AS sl FROM sc GROUP BY doc_id)",
      "acc AS (SELECT c.doc_id FROM ctk c LEFT JOIN nag USING (doc_id), " +
        "pri WHERE p + coalesce(sl, 0) > 0)",
      "pool AS (SELECT ctk.doc_id, source, t FROM ctk JOIN acc " +
        "USING (doc_id) WHERE ctk.doc_id >= 10)",
      "tgt AS (SELECT doc_id, t FROM ctk WHERE doc_id < 10)",
      "fgp AS (SELECT doc_id, unnest(list_concat(t, " +
        "CASE WHEN len(t) >= 2 THEN list_transform(range(0, len(t) - 1), " +
        "i -> t[i + 1] || ' ' || t[i + 2]) " +
        "ELSE CAST([] AS VARCHAR[]) END)) AS gram FROM pool)",
      "fgt AS (SELECT doc_id, unnest(list_concat(t, " +
        "CASE WHEN len(t) >= 2 THEN list_transform(range(0, len(t) - 1), " +
        "i -> t[i + 1] || ' ' || t[i + 2]) " +
        "ELSE CAST([] AS VARCHAR[]) END)) AS gram FROM tgt)",
      s"fbp AS (SELECT doc_id, CAST(${fnv("gram")} % $buckets AS BIGINT) " +
        "AS bucket FROM fgp)",
      s"fbt AS (SELECT CAST(${fnv("gram")} % $buckets AS BIGINT) " +
        "AS bucket FROM fgt)",
      "tcd AS (SELECT bucket, count(*) AS c_t FROM fbt GROUP BY bucket)",
      "rcd AS (SELECT bucket, count(*) AS c_r FROM fbp GROUP BY bucket)",
      "ttd AS (SELECT count(*) AS t_tot FROM fbt)",
      "rtd AS (SELECT count(*) AS r_tot FROM fbp)",
      s"ds AS (SELECT f.doc_id, " +
        s"ln((coalesce(tcd.c_t, 0) + $alpha) / (t_tot + $alpha * $buckets)) " +
        s"- ln((coalesce(rcd.c_r, 0) + $alpha) / (r_tot + $alpha * $buckets)) " +
        "AS llr FROM fbp f LEFT JOIN tcd USING (bucket) " +
        "LEFT JOIN rcd USING (bucket), ttd, rtd)",
      "dw AS (SELECT p.doc_id, p.source, coalesce(s2.lw, 0) AS log_w " +
        "FROM pool p LEFT JOIN (SELECT doc_id, sum(llr) AS lw FROM ds " +
        "GROUP BY doc_id) s2 USING (doc_id))",
      s"top AS (SELECT * FROM dw ORDER BY log_w DESC, doc_id LIMIT $k)")
    withClause(head ++ mixed ++ rest,
      "SELECT source, CAST(count(*) AS BIGINT) AS n_sel, " +
        "round(sum(log_w), 4) AS sel_log_w " +
        "FROM top GROUP BY source ORDER BY source")
  }

  /** DSIR importance-weight replay ([[operators.Dsir]]): unigram +
    * bigram grams, FNV-1a bucket mod `buckets` (a power of two divides
    * 2^64, so the unsigned HUGEINT mod equals the JVM `pmod` of the
    * signed hash), add-α smoothed target (doc_id < 10) vs raw
    * (doc_id >= 10) bucket distributions, per-doc llr sum rounded to 4.
    */
  def q115DsirWeights(buckets: Int, alpha: Double): String = {
    require((buckets & (buckets - 1)) == 0,
      s"oracle replay needs a power-of-two bucket count, got $buckets")
    withClause(
      Seq(
        s"tk AS (SELECT doc_id, $Toks AS t FROM documents)",
        "fg AS (SELECT doc_id, unnest(list_concat(t, " +
          "CASE WHEN len(t) >= 2 THEN list_transform(range(0, len(t) - 1), " +
          "i -> t[i + 1] || ' ' || t[i + 2]) " +
          "ELSE CAST([] AS VARCHAR[]) END)) AS gram FROM tk)",
        s"fb AS (SELECT doc_id, CAST(${fnv("gram")} % $buckets AS BIGINT) " +
          "AS bucket FROM fg)",
        "tc AS (SELECT bucket, count(*) AS c_t FROM fb WHERE doc_id < 10 " +
          "GROUP BY bucket)",
        "rc AS (SELECT bucket, count(*) AS c_r FROM fb WHERE doc_id >= 10 " +
          "GROUP BY bucket)",
        "tt AS (SELECT count(*) AS t_tot FROM fb WHERE doc_id < 10)",
        "rt AS (SELECT count(*) AS r_tot FROM fb WHERE doc_id >= 10)",
        s"sc AS (SELECT f.doc_id, " +
          s"ln((coalesce(tc.c_t, 0) + $alpha) / (tt.t_tot + $alpha * $buckets)) " +
          s"- ln((coalesce(rc.c_r, 0) + $alpha) / (rt.r_tot + $alpha * $buckets)) " +
          "AS llr FROM fb f LEFT JOIN tc USING (bucket) " +
          "LEFT JOIN rc USING (bucket), tt, rt WHERE f.doc_id >= 10)"),
      "SELECT doc_id, count(*) AS n_feats, round(sum(llr), 4) AS log_w " +
        "FROM sc GROUP BY doc_id ORDER BY doc_id")
  }

  /** Cluster-safe split replay
    * ([[operators.Sampling.assignClusterSafeSplit]] over the q43
    * Jaccard components): the recursive-CTE closure labels the
    * clustered docs, every doc's split KEY is its component (or its
    * own id), and the splitmix chain + cumulative thresholds replay
    * the q147 device on that key.
    */
  val q161ClusterSafeSplit: String = {
    val head = Seq(
      s"t AS (SELECT doc_id, list_distinct($Toks) AS toks " +
        "FROM documents WHERE doc_id < 200)",
      "edges0 AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id " +
        "FROM t a, t b WHERE a.doc_id < b.doc_id " +
        "AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) " +
        "/ len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9)",
      "edges AS (SELECT a_id AS s, b_id AS d FROM edges0 " +
        "UNION SELECT b_id, a_id FROM edges0)",
      "nodes AS (SELECT DISTINCT s AS node FROM edges)",
      "reach AS (WITH RECURSIVE r(node, lbl) AS (" +
        "SELECT node, node FROM nodes UNION " +
        "SELECT e.d, r.lbl FROM r JOIN edges e ON e.s = r.node) " +
        "SELECT * FROM r)",
      "comp AS (SELECT node AS id, min(lbl) AS component FROM reach " +
        "GROUP BY node)",
      "dz AS (SELECT d.doc_id, " +
        "coalesce(c.component, d.doc_id) AS split_key, " +
        "CAST(coalesce(c.component, d.doc_id) AS HUGEINT) AS z " +
        "FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)")
    val mixed = mixStages(Seq("z"), Seq("doc_id", "split_key"))
      .zipWithIndex.map { case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
      }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    withClause(head ++ mixed ++ Seq(
      s"sp AS (SELECT doc_id, split_key, CASE WHEN $signedMod < 8000 " +
        s"THEN 'train' WHEN $signedMod < 9000 THEN 'val' " +
        "ELSE 'test' END AS split FROM dm5)"),
      "SELECT split, count(*) AS n_docs, " +
        "count(DISTINCT split_key) AS n_keys " +
        "FROM sp GROUP BY split ORDER BY split")
  }

  /** Capstone #12 replay: the q161 cluster-safe split chain feeding
    * the q117 NB train (train split only), test-split scoring, and the
    * q158 calibration tail — one statement, every stage exact.
    */
  def q162LeakageSafeEval(alpha: Double, bins: Int): String = {
    val head = Seq(
      s"tk AS (SELECT doc_id, lang = 'en' AS pos, $Toks AS t FROM documents)",
      s"tj AS (SELECT doc_id, list_distinct($Toks) AS toks " +
        "FROM documents WHERE doc_id < 200)",
      "edges0 AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id " +
        "FROM tj a, tj b WHERE a.doc_id < b.doc_id " +
        "AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) " +
        "/ len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9)",
      "edges AS (SELECT a_id AS s, b_id AS d FROM edges0 " +
        "UNION SELECT b_id, a_id FROM edges0)",
      "nodes AS (SELECT DISTINCT s AS node FROM edges)",
      "reach AS (WITH RECURSIVE r(node, lbl) AS (" +
        "SELECT node, node FROM nodes UNION " +
        "SELECT e.d, r.lbl FROM r JOIN edges e ON e.s = r.node) " +
        "SELECT * FROM r)",
      "comp AS (SELECT node AS id, min(lbl) AS component FROM reach " +
        "GROUP BY node)",
      "dz AS (SELECT d.doc_id, " +
        "CAST(coalesce(c.component, d.doc_id) AS HUGEINT) AS z " +
        "FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)")
    val mixed = mixStages(Seq("z"), Seq("doc_id")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
    }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    withClause(head ++ mixed ++ Seq(
      s"sp AS (SELECT doc_id, CASE WHEN $signedMod < 8000 THEN 'train' " +
        s"WHEN $signedMod < 9000 THEN 'val' ELSE 'test' END AS split " +
        "FROM dm5)",
      "tr AS (SELECT tk.* FROM tk JOIN sp USING (doc_id) " +
        "WHERE split = 'train')",
      "te AS (SELECT tk.* FROM tk JOIN sp USING (doc_id) " +
        "WHERE split = 'test')",
      "w AS (SELECT pos, unnest(t) AS token FROM tr)",
      "cnt AS (SELECT token, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos, " +
        "sum(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg FROM w GROUP BY token)",
      "tot AS (SELECT count(*) AS v, sum(c_pos) AS tp, sum(c_neg) AS tn FROM cnt)",
      "pri AS (SELECT ln(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)" +
        " / sum(CASE WHEN pos THEN 0 ELSE 1 END)) AS p FROM tr)",
      "sw AS (SELECT doc_id, unnest(t) AS token FROM te)",
      s"sc AS (SELECT doc_id, coalesce(" +
        s"ln((c_pos + $alpha) / (tp + $alpha * v)) " +
        s"- ln((c_neg + $alpha) / (tn + $alpha * v)), " +
        s"ln($alpha / (tp + $alpha * v)) - ln($alpha / (tn + $alpha * v))) " +
        "AS l FROM sw LEFT JOIN cnt USING (token), tot)",
      "agg AS (SELECT doc_id, sum(l) AS sl FROM sc GROUP BY doc_id)",
      "fs AS (SELECT t.doc_id, p + coalesce(a.sl, 0) AS score, t.pos " +
        "FROM te t LEFT JOIN agg a ON t.doc_id = a.doc_id, pri)",
      s"bn AS (SELECT CAST(least(floor((1.0 / (1.0 + exp(-score))) * $bins), " +
        s"${bins - 1}) AS INTEGER) AS bin, " +
        "1.0 / (1.0 + exp(-score)) AS pp, pos FROM fs)"),
      "SELECT bin, count(*) AS n, round(avg(pp), 4) AS avg_pred, " +
        "round(avg(CASE WHEN pos THEN 1.0 ELSE 0.0 END), 4) AS frac_pos, " +
        "round(abs(avg(pp) - avg(CASE WHEN pos THEN 1.0 ELSE 0.0 END)), 4) " +
        "AS gap FROM bn GROUP BY bin ORDER BY bin")
  }

  /** Named-split replay ([[operators.Sampling.assignSplit]] at
    * train/val/test = 8000/1000/1000): the splitmix bucket chain, then
    * the cumulative-threshold CASE, then per-(source, split)
    * accounting.
    */
  val q147HashSplit: String = {
    val head = Seq(
      s"dz AS (SELECT doc_id, source, len($Toks) AS n_toks, " +
        "CAST(doc_id AS HUGEINT) AS z FROM documents)")
    val mixed = mixStages(Seq("z"), Seq("doc_id", "source", "n_toks"))
      .zipWithIndex.map { case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
      }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    withClause(head ++ mixed ++ Seq(
      s"sp AS (SELECT source, n_toks, CASE WHEN $signedMod < 8000 " +
        s"THEN 'train' WHEN $signedMod < 9000 THEN 'val' " +
        "ELSE 'test' END AS split FROM dm5)"),
      "SELECT source, split, count(*) AS n_docs, " +
        "CAST(sum(n_toks) AS BIGINT) AS n_tokens " +
        "FROM sp GROUP BY source, split ORDER BY source, split")
  }

  /** Pairwise HLL overlap replay
    * ([[operators.Sketches.hllOverlapMatrix]] over per-source TRIGRAM
    * vocabularies): the q123 per-source register chain, then for every
    * `a < b` source pair the idx-wise-max union registers, the same
    * small-range-corrected estimate on singles and union (each rounded
    * BEFORE the inclusion–exclusion subtraction), plus the exact
    * intersection count for the gate.
    */
  def q146HllOverlap(p: Int): String = {
    val sub = 64 - p
    val m = (1L << p).toDouble
    val alpha = graft.operators.Sketches.hllAlpha(p)
    val subPow = (BigInt(1) << sub).toString
    val powers = (0 until sub).map(1L << _).mkString("[", ", ", "]")
    def estim(nOcc: String, sOcc: String): String = {
      val e = s"($alpha * $m * $m) / ($sOcc + ($m - $nOcc))"
      s"round(CASE WHEN $e <= 2.5 * $m AND ($m - $nOcc) > 0 " +
        s"THEN $m * ln($m / ($m - $nOcc)) ELSE $e END, 4)"
    }
    val head = Seq(
      s"tk AS (SELECT source, $Toks AS t FROM documents)",
      "g3 AS (SELECT source, unnest(CASE WHEN len(t) >= 3 " +
        "THEN list_transform(range(0, len(t) - 2), " +
        "i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]) " +
        "ELSE [array_to_string(t, ' ')] END) AS gram FROM tk)",
      "dg AS (SELECT DISTINCT source, gram FROM g3)",
      s"th AS (SELECT source, ${fnv("gram")} AS z FROM dg)")
    val mixed = mixStages(Seq("z"), Seq("source")).zipWithIndex.map {
      case (body, n) =>
        val prev = if (n == 0) "th" else s"hm${n - 1}"
        s"hm$n AS ($body FROM $prev)"
    }
    withClause(head ++ mixed ++ Seq(
      s"hh AS (SELECT source, z // $subPow AS idx, " +
        s"CAST(z % $subPow AS BIGINT) AS rest FROM hm5)",
      s"rr AS (SELECT source, idx, max($sub + 1 - " +
        s"len(list_filter($powers, q -> q <= rest))) AS m_j " +
        "FROM hh GROUP BY source, idx)",
      "sg AS (SELECT source, count(*) AS n_occ, " +
        "coalesce(sum(power(2.0, -m_j)), 0) AS s_occ " +
        "FROM rr GROUP BY source)",
      s"se AS (SELECT source, ${estim("n_occ", "s_occ")} AS est FROM sg)",
      "ks AS (SELECT DISTINCT source FROM rr)",
      "ps AS (SELECT x.source AS a, y.source AS b FROM ks x " +
        "JOIN ks y ON x.source < y.source)",
      "ur AS (SELECT p.a, p.b, r.idx, max(r.m_j) AS m_j FROM ps p " +
        "JOIN rr r ON r.source = p.a OR r.source = p.b " +
        "GROUP BY p.a, p.b, r.idx)",
      "ug AS (SELECT a, b, count(*) AS n_occ, " +
        "coalesce(sum(power(2.0, -m_j)), 0) AS s_occ " +
        "FROM ur GROUP BY a, b)",
      s"ue AS (SELECT a, b, ${estim("n_occ", "s_occ")} AS est_union " +
        "FROM ug)",
      "xo AS (SELECT x.source AS a, y.source AS b, count(*) AS n_true " +
        "FROM dg x JOIN dg y ON x.gram = y.gram AND x.source < y.source " +
        "GROUP BY x.source, y.source)"),
      "SELECT ue.a, ue.b, ea.est AS est_a, eb.est AS est_b, " +
        "ue.est_union, round(ea.est + eb.est - ue.est_union, 4) " +
        "AS est_overlap, " +
        "CAST(coalesce(xo.n_true, 0) AS BIGINT) AS true_overlap " +
        "FROM ue JOIN se ea ON ea.source = ue.a " +
        "JOIN se eb ON eb.source = ue.b " +
        "LEFT JOIN xo ON xo.a = ue.a AND xo.b = ue.b " +
        "ORDER BY ue.a, ue.b")
  }

  /** Split-conformal replay ([[operators.Conformal
    * .splitConformalByGroup]] on orders by priority): the q147 hash-
    * split chain on o_orderkey, per-group train mean on the 1e-4 grid,
    * calibration |residual| at the exact conformal rank
    * ⌈(n+1)(1−α)⌉ (clamped to n), held-out coverage.
    */
  def q247Conformal(alphaPct: Int): String = {
    val keep = (100 - alphaPct).toString
    val head = Seq(
      "dz AS (SELECT o_orderkey AS id, o_orderpriority AS g, " +
        "o_totalprice AS y, CAST(o_orderkey AS HUGEINT) AS z FROM orders)")
    val mixed = mixStages(Seq("z"), Seq("id", "g", "y"))
      .zipWithIndex.map { case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
      }
    val signedMod = s"(((${toSigned("z")}) % 10000 + 10000) % 10000)"
    withClause(head ++ mixed ++ Seq(
      s"sp AS (SELECT id, g, y, CASE WHEN $signedMod < 5000 " +
        s"THEN 'train' WHEN $signedMod < 7500 THEN 'cal' " +
        "ELSE 'test' END AS split FROM dm5)",
      "fit AS (SELECT g, CAST(count(*) AS BIGINT) AS n_train, " +
        "round(sum(y) / count(*), 4) AS yhat FROM sp " +
        "WHERE split = 'train' GROUP BY g)",
      // MATERIALIZED (cr, qh): three consumers sit on cr and two on
      // qh — unpinned, the splitmix split chain re-inlines per
      // consumer (~12 s of the round-14 compare pass on q247)
      "cr AS MATERIALIZED (SELECT sp.g, sp.id, " +
        "round(abs(sp.y - fit.yhat), 4) AS r " +
        "FROM sp JOIN fit USING (g) WHERE split = 'cal')",
      "nc AS (SELECT g, CAST(count(*) AS BIGINT) AS n_cal FROM cr " +
        "GROUP BY g)",
      "rk AS (SELECT g, id, r, row_number() OVER " +
        "(PARTITION BY g ORDER BY r, id) AS rn FROM cr)",
      s"qh AS MATERIALIZED (SELECT rk.g, nc.n_cal, rk.r AS qhat FROM rk " +
        s"JOIN nc USING (g) WHERE rk.rn = least(nc.n_cal, " +
        s"((nc.n_cal + 1) * $keep + 99) // 100))",
      "tv AS (SELECT sp.g, sp.y, fit.yhat, qh.qhat, qh.n_cal, " +
        "fit.n_train FROM sp JOIN fit USING (g) JOIN qh USING (g) " +
        "WHERE split = 'test')"),
      "SELECT g AS o_orderpriority, n_train, n_cal, " +
        "CAST(count(*) AS BIGINT) AS n_test, yhat, qhat, " +
        "round(CAST(sum(CASE WHEN abs(y - yhat) <= qhat THEN 1 " +
        "ELSE 0 END) AS DOUBLE) / count(*), 4) AS coverage " +
        "FROM tv GROUP BY g, n_train, n_cal, yhat, qhat " +
        "ORDER BY o_orderpriority")
  }

  /** User-level DP noisy-sum replay ([[operators.Privacy.noisySums]]
    * over events by event_type, unit = user): per-user clipped integer
    * totals, group sums, geometric noise at rational α from the SAME
    * exact BigInt threshold table as the Spark expression.
    */
  def q252DpSums(seed: Long, clip: Long, alphaNum: Long, alphaDen: Long,
      cap: Int): String = {
    val seedMix = functions.DedupFunctions.splitmix64(seed)
    val seedLit =
      if (seedMix >= 0) seedMix.toString else s"($seedMix + $P64)"
    val ts = operators.Privacy.geometricThresholds(cap, alphaNum, alphaDen)
    val noiseCase = "CASE " + (-cap until cap).zip(ts).map {
      case (x, t) => s"WHEN z < CAST($t AS HUGEINT) THEN CAST($x AS BIGINT) "
    }.mkString + s"ELSE CAST($cap AS BIGINT) END"
    val head = Seq(
      "pu AS (SELECT event_type, user_id, least(" + clip +
        ", greatest(0, CAST(floor(sum(CAST(value AS DOUBLE))) " +
        "AS BIGINT))) AS c FROM events GROUP BY 1, 2)",
      "cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_units, " +
        "CAST(sum(c) AS BIGINT) AS sum_clipped, " +
        s"${lpField("event_type")} AS gk FROM pu " +
        "GROUP BY event_type)",
      s"hz AS (SELECT event_type, n_units, sum_clipped, " +
        s"xor(${fnv("gk")}, CAST($seedLit AS HUGEINT)) AS z " +
        "FROM cnt)")
    val mixed = mixStages(Seq("z"),
      Seq("event_type", "n_units", "sum_clipped"))
      .zipWithIndex.map { case (body, n) =>
        val prev = if (n == 0) "hz" else s"hm${n - 1}"
        s"hm$n AS ($body FROM $prev)"
      }
    withClause(head ++ mixed :+
      s"nz AS (SELECT event_type, n_units, sum_clipped, " +
        s"$noiseCase AS noise FROM hm5)",
      "SELECT event_type, n_units, sum_clipped, noise, " +
        "greatest(CAST(0 AS BIGINT), sum_clipped + noise) AS sum_noisy " +
        "FROM nz ORDER BY event_type")
  }

  /** DP noisy-count replay ([[operators.Privacy.noisyCounts]] over
    * documents grouped by (source, lang)): per-group uniform =
    * splitmix64(fnv1a64(injectiveKey) XOR splitmix64(seed)) in HUGEINT,
    * then the two-sided geometric inverse CDF walked against the SAME
    * exact integer threshold table the Spark expression compiles in
    * ([[operators.Privacy.geometricThresholds]]) — no float anywhere.
    */
  def q239DpCounts(seed: Long, cap: Int): String = {
    val seedMix = functions.DedupFunctions.splitmix64(seed)
    val seedLit =
      if (seedMix >= 0) seedMix.toString else s"($seedMix + $P64)"
    val ts = operators.Privacy.geometricThresholds(cap)
    val noiseCase = "CASE " + (-cap until cap).zip(ts).map {
      case (x, t) => s"WHEN z < CAST($t AS HUGEINT) THEN CAST($x AS BIGINT) "
    }.mkString + s"ELSE CAST($cap AS BIGINT) END"
    val head = Seq(
      "cnt AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n, " +
        s"concat(${lpField("source")}, ${lpField("lang")}) AS gk " +
        "FROM documents GROUP BY source, lang)",
      s"hz AS (SELECT source, lang, n, " +
        s"xor(${fnv("gk")}, CAST($seedLit AS HUGEINT)) AS z FROM cnt)")
    val mixed = mixStages(Seq("z"), Seq("source", "lang", "n"))
      .zipWithIndex.map { case (body, n) =>
        val prev = if (n == 0) "hz" else s"hm${n - 1}"
        s"hm$n AS ($body FROM $prev)"
      }
    withClause(head ++ mixed :+
      s"nz AS (SELECT source, lang, n, $noiseCase AS noise FROM hm5)",
      "SELECT source, lang, n, noise, " +
        "greatest(CAST(0 AS BIGINT), n + noise) AS n_noisy " +
        "FROM nz ORDER BY source, lang")
  }

  /** ANALYZE replay (q266, [[operators.Analyze.tableStats]]): one
    * UNION ALL branch per column with the kind-matched typed stats.
    * `kind` ∈ num | str | ts.
    */
  def q266AnalyzeStats(table: String,
      cols: Seq[(String, String)]): String = {
    val parts = cols.map { case (c, kind) =>
      val (mnn, mxn) =
        if (kind == "num")
          (s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      val (mns, mxs) = kind match {
        case "str" => (s"min($c)", s"max($c)")
        case "ts" =>
          (s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)")
        case _ => ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      }
      val al =
        if (kind == "str")
          s"round(CAST(sum(length($c)) AS DOUBLE) / count($c), 4)"
        else "CAST(NULL AS DOUBLE)"
      s"SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, " +
        s"CAST(count(*) - count($c) AS BIGINT) AS n_nulls, " +
        s"CAST(count(DISTINCT $c) AS BIGINT) AS ndv, " +
        s"$mnn AS min_num, $mxn AS max_num, $mns AS min_str, " +
        s"$mxs AS max_str, $al AS avg_len FROM $table"
    }
    parts.mkString(" UNION ALL ") + " ORDER BY col_name"
  }

  /** Winnowing CTE chain (q262/q263,
    * [[operators.Winnow]]): canonicalize → char k-grams with
    * positions → FNV-1a per gram → per-window min of
    * `struct(h, −pos)` (rightmost-tie min, matching Spark's struct
    * ordering field for field) → the DISTINCT selected set `sel`.
    * Short docs (< w grams) get the single truncated window at s=1;
    * `pos BETWEEN s AND s+w−1` clips it for free since pos ≤ ng.
    */
  private def winnowCtes(k: Int, w: Int, docFilter: String = "",
      p: String = ""): Seq[String] = Seq(
    s"${p}docs AS (SELECT doc_id, regexp_replace(lower(text), " +
      s"'[^a-z0-9]', '', 'g') AS c FROM documents$docFilter)",
    s"${p}wbase AS (SELECT doc_id, c, length(c) - ${k - 1} AS ng " +
      s"FROM ${p}docs WHERE length(c) - ${k - 1} > 0)",
    s"${p}gp AS (SELECT doc_id, ng, c, unnest(range(1, ng + 1)) " +
      s"AS pos FROM ${p}wbase)",
    s"${p}gg AS (SELECT doc_id, ng, pos, " +
      s"substr(c, CAST(pos AS INT), $k) AS gram FROM ${p}gp)",
    s"${p}gh0 AS (SELECT doc_id, ng, pos, ${fnv("gram")} AS z " +
      s"FROM ${p}gg)",
    s"${p}gh AS (SELECT doc_id, ng, pos, ${toSigned("z")} AS h " +
      s"FROM ${p}gh0)",
    s"${p}win AS (SELECT doc_id, unnest(range(1, " +
      s"greatest(ng - ${w - 1}, 1) + 1)) AS s FROM ${p}wbase)",
    // per-window pick = min h, rightmost-position tie — as a keyed
    // row_number instead of min(struct_pack(...)): DuckDB's struct-
    // min aggregate ran at ~5k rows/s (87 s of the round-14 compare
    // pass in this one CTE); the window form is ~35× faster and
    // row-for-row identical (h is an exact int64, ties break on the
    // SAME (h, pos DESC) order the struct min encoded)
    s"${p}ch AS (SELECT doc_id, s, h, pos, " +
      "row_number() OVER (PARTITION BY doc_id, s " +
      "ORDER BY h, pos DESC) AS rn " +
      s"FROM (SELECT w.doc_id, w.s, g.h, g.pos " +
      s"FROM ${p}win w JOIN ${p}gh g ON g.doc_id = w.doc_id " +
      s"AND g.pos BETWEEN w.s AND w.s + ${w - 1}))",
    s"${p}sel AS (SELECT DISTINCT doc_id, pos, h FROM ${p}ch " +
      "WHERE rn = 1)")

  /** Per-doc winnowing profile replay (q262). */
  def q262Winnowing(k: Int, w: Int): String =
    withClause(winnowCtes(k, w) :+
      (s"prof AS (SELECT doc_id, CAST(ng AS BIGINT) AS n_grams, " +
        s"CAST(greatest(ng - ${w - 1}, 1) AS BIGINT) AS n_windows " +
        "FROM wbase)"),
      "SELECT p.doc_id, p.n_grams, p.n_windows, " +
        "CAST(count(*) AS BIGINT) AS n_fp, " +
        "round(CAST(count(*) AS DOUBLE) / p.n_windows, 4) AS density, " +
        "md5(array_to_string(list_sort(list(CAST(pos AS VARCHAR) || " +
        "':' || CAST(h AS VARCHAR))), ',')) AS fp_md5 " +
        "FROM sel s JOIN prof p USING (doc_id) " +
        "GROUP BY p.doc_id, p.n_grams, p.n_windows ORDER BY p.doc_id")

  /** Winnow match-pair replay (q263): distinct selected hashes, the
    * `maxDf` ubiquitous-fingerprint drop, pair join, `minShared` floor.
    */
  def q263WinnowMatches(k: Int, w: Int, minShared: Int,
      maxDf: Int): String =
    withClause(winnowCtes(k, w) ++ Seq(
      "hs AS (SELECT DISTINCT doc_id, h FROM sel)",
      "rare AS (SELECT h FROM hs GROUP BY h " +
        s"HAVING count(*) <= $maxDf)",
      "hk AS (SELECT doc_id, h FROM hs JOIN rare USING (h))"),
      "SELECT a.doc_id AS a_id, b.doc_id AS b_id, " +
        "CAST(count(*) AS BIGINT) AS n_shared " +
        "FROM hk a JOIN hk b ON a.h = b.h AND a.doc_id < b.doc_id " +
        s"GROUP BY 1, 2 HAVING count(*) >= $minShared " +
        "ORDER BY n_shared DESC, a_id, b_id")

  /** Index-match replay (q273, [[operators.Winnow
    * .matchAgainstIndex]]): index docs and probe docs winnow
    * separately (prefixed CTE chains), the index side takes the
    * `maxDf` drop, shared distinct hashes floor at `minShared`. The
    * persisted layout is deliberately INVISIBLE — the oracle is the
    * in-memory computation, the disk round-trip must not change a
    * row (the q109/q130 precedent).
    */
  def q273WinnowIndexMatch(k: Int, w: Int, minShared: Int, maxDf: Int,
      idxFilter: String, probeFilter: String): String =
    withClause(winnowCtes(k, w, idxFilter, "i") ++
      winnowCtes(k, w, probeFilter, "p") ++ Seq(
      "ih AS (SELECT DISTINCT doc_id AS index_id, h FROM isel)",
      s"irare AS (SELECT h FROM ih GROUP BY h " +
        s"HAVING count(*) <= $maxDf)",
      "ik AS (SELECT index_id, h FROM ih JOIN irare USING (h))",
      "ph AS (SELECT DISTINCT doc_id AS probe_id, h FROM psel)"),
      "SELECT p.probe_id, i.index_id, " +
        "CAST(count(*) AS BIGINT) AS n_shared " +
        "FROM ph p JOIN ik i ON p.h = i.h " +
        s"GROUP BY 1, 2 HAVING count(*) >= $minShared " +
        "ORDER BY probe_id, index_id")

  /** Unigram-LM EM round replay (q256,
    * [[operators.TokenizerTraining.unigramEmRound]]): candidate
    * substrings of the truncated word table ranked (count DESC, piece)
    * with the single-char alphabet closure, initial log-probs on the
    * 1e-6 grid, then the Viterbi E-step UNROLLED — `maxWordLen` value
    * layers (`v1..vN`, each the per-word best split at position j with
    * the earliest-i tie-break Spark's strict `>` scan keeps) over the
    * cumulative reachable-position table `u0..uN`, then `maxWordLen`
    * backtrace layers emitting one piece each — and the corpus-weighted
    * M-step re-normalization. Every stage score re-rounds at 1e-6, so
    * the DP trajectory (including ties) replays engine-independently.
    */
  def q256UnigramEm(k: Int, maxPieceLen: Int, maxWordLen: Int,
      topOut: Int): String = {
    val valueCtes = (1 to maxWordLen).flatMap { j =>
      val lo = math.max(0, j - maxPieceLen)
      Seq(
        s"v$j AS (SELECT word, wcnt, $j AS j, best, back FROM (" +
          "SELECT p.word, p.wcnt, round(p.best + v.lp, 6) AS best, " +
          "p.j AS back, row_number() OVER (PARTITION BY p.word " +
          "ORDER BY round(p.best + v.lp, 6) DESC, p.j) AS rn " +
          s"FROM u${j - 1} p JOIN vocab v " +
          s"ON v.piece = substr(p.word, p.j + 1, $j - p.j) " +
          s"WHERE p.j >= $lo AND p.j < $j AND length(p.word) >= $j) " +
          "WHERE rn = 1)",
        // MATERIALIZED: DuckDB inlines plain CTEs, so the cumulative
        // union chain would otherwise expand 2^maxWordLen scans
        s"u$j AS MATERIALIZED (SELECT * FROM u${j - 1} " +
          s"UNION ALL SELECT * FROM v$j)")
    }
    val backCtes = (1 to maxWordLen).map { t =>
      s"b$t AS (SELECT b.word, b.wcnt, u.back AS j, " +
        "substr(b.word, u.back + 1, b.j - u.back) AS piece " +
        s"FROM b${t - 1} b JOIN u$maxWordLen u " +
        "ON u.word = b.word AND u.j = b.j WHERE b.j > 0)"
    }
    val pieceUnion = (1 to maxWordLen)
      .map(t => s"SELECT wcnt, piece FROM b$t").mkString(" UNION ALL ")
    withClause(Seq(
      s"tok AS (SELECT $Toks AS t FROM documents)",
      s"w0 AS (SELECT substr(x, 1, $maxWordLen) AS word FROM " +
        "(SELECT unnest(t) AS x FROM tok))",
      "words AS (SELECT word, count(*) AS wcnt FROM w0 GROUP BY word)",
      "cand AS (SELECT piece, sum(wcnt) AS cnt FROM (" +
        "SELECT wcnt, unnest(flatten(list_transform(" +
        "range(1, length(word) + 1), i -> list_transform(" +
        s"range(1, least($maxPieceLen, length(word) - i + 1) + 1), " +
        "l -> substr(word, CAST(i AS INT), CAST(l AS INT)))))) " +
        "AS piece FROM words) GROUP BY piece)",
      "ranked AS (SELECT piece, cnt FROM (SELECT piece, cnt, " +
        "row_number() OVER (ORDER BY cnt DESC, piece) AS rk FROM cand) " +
        s"WHERE rk <= $k OR length(piece) = 1)",
      "tot AS (SELECT sum(cnt) AS c FROM ranked)",
      "vocab AS (SELECT piece, round(ln(CAST(cnt AS DOUBLE)) - " +
        "ln(CAST(tot.c AS DOUBLE)), 6) AS lp FROM ranked, tot)",
      "u0 AS (SELECT word, wcnt, 0 AS j, CAST(0.0 AS DOUBLE) AS best, " +
        "0 AS back FROM words)") ++ valueCtes ++ Seq(
      "b0 AS (SELECT word, wcnt, length(word) AS j FROM words)") ++
      backCtes ++ Seq(
      s"pieces AS ($pieceUnion)",
      "uses AS (SELECT piece, CAST(sum(wcnt) AS BIGINT) AS n_uses " +
        "FROM pieces GROUP BY piece)",
      "tu AS (SELECT sum(n_uses) AS t FROM uses)"),
      "SELECT u.piece, CAST(r.cnt AS BIGINT) AS cnt, u.n_uses, " +
        "round(ln(CAST(u.n_uses AS DOUBLE)) - " +
        "ln(CAST(tu.t AS DOUBLE)), 4) AS logp_next " +
        "FROM uses u JOIN ranked r USING (piece), tu " +
        s"ORDER BY u.n_uses DESC, u.piece LIMIT $topOut")
  }

  /** The cross-lingual diacritic fold as SQL — mirrors
    * [[operators.CrossLingual.foldText]] (lower → 1:1 translate →
    * collapse non-alphanumerics), textually identical function chain.
    */
  val FoldedTextSql: String = {
    val from = operators.CrossLingual.AccentFrom
    val to = operators.CrossLingual.AccentTo
    s"regexp_replace(translate(lower(text), '$from', '$to'), " +
      "'[^a-z0-9]+', ' ', 'g')"
  }

  /** The distinct folded token list over [[FoldedTextSql]]. */
  val FoldedToksSql: String =
    "list_distinct(list_filter(string_split_regex(lower(" +
      s"$FoldedTextSql), '\\s+'), t -> t <> ''))"

  /** Folded fingerprint mirroring
    * [[operators.CrossLingual.foldedFingerprint]]: md5 of the sorted
    * distinct folded tokens, NULL when the folded token set is empty
    * (fully non-Latin documents opt out of dedup instead of all
    * colliding on md5('')).
    */
  val FoldedFpSql: String =
    s"CASE WHEN len($FoldedToksSql) > 0 THEN md5(array_to_string(" +
      s"list_sort($FoldedToksSql), ' ')) END"

  /** The SCRIPT-AWARE fold as SQL — mirrors
    * [[operators.CrossLingual.foldTextScripted]]'s regexp stage:
    * lower → 1:1 translate → keep `\p{L}\p{Nd}` of every script →
    * isolate each unsegmented-script (Han/kana) character as its own
    * token. The `\x{...}` range class is the same text RE2 and Java
    * both parse; the only dialect seam is the backreference spelling
    * (`\1` vs `$1`). The Thai/Lao/Khmer bigram explosion happens at
    * token grain in [[ScriptedToksSql]].
    */
  val ScriptedFoldSql: String = scriptedFoldSqlOf("text")

  /** [[ScriptedFoldSql]] over an arbitrary inner text expression —
    * the parametric form the width-fold oracle composes with a
    * `translate` wrapped around the column.
    */
  def scriptedFoldSqlOf(inner: String): String = {
    val from = operators.CrossLingual.AccentFrom
    val to = operators.CrossLingual.AccentTo
    val cls = operators.CrossLingual.UnsegmentedClass
    s"regexp_replace(regexp_replace(translate(lower($inner), '$from', " +
      s"'$to'), '[^\\p{L}\\p{Nd}]+', ' ', 'g'), " +
      s"'([$cls])', ' \\1 ', 'g')"
  }

  /** Distinct token list over [[ScriptedFoldSql]], with each
    * Thai/Lao/Khmer run exploded into its overlapping character
    * bigrams — DuckDB's `range(1, length)` is exclusive-end, exactly
    * Spark's `sequence(1, length - 1)` inclusive, and `substr` counts
    * characters in both engines.
    */
  val ScriptedToksSql: String = scriptedToksSqlOf("text")

  /** [[ScriptedToksSql]] over an arbitrary inner text expression. */
  def scriptedToksSqlOf(inner: String): String = {
    val sh = operators.CrossLingual.ShingledClass
    "list_distinct(list_filter(flatten(list_transform(" +
      s"list_filter(string_split_regex(lower(${scriptedFoldSqlOf(inner)}), " +
      "'\\s+'), t -> t <> ''), " +
      s"t -> CASE WHEN regexp_matches(t, '^[$sh]{2,}$$') " +
      "THEN list_transform(range(1, length(t)), " +
      "i -> substr(t, CAST(i AS INTEGER), 2)) " +
      "ELSE [t] END)), t -> t <> ''))"
  }

  /** Script-aware fingerprint mirroring
    * [[operators.CrossLingual.foldedFingerprintScripted]] — strings
    * sort BINARY (UTF-8 bytewise) in both engines, so the sorted
    * multi-script token join hashes identically.
    */
  val ScriptedFpSql: String = scriptedFpSqlOf("text")

  /** [[ScriptedFpSql]] over an arbitrary inner text expression. */
  def scriptedFpSqlOf(inner: String): String =
    s"CASE WHEN len(${scriptedToksSqlOf(inner)}) > 0 THEN " +
      s"md5(array_to_string(list_sort(${scriptedToksSqlOf(inner)}), " +
      "' ')) END"

  /** The q391/q394/q397 multilingual synth (mirrors
    * `SparkEntry.scriptSynth`) as CTEs ending in
    * `sy(doc_id, lang, text)`.
    */
  val ScriptSynthCtes: Seq[String] = Seq(
    "uu AS (SELECT doc_id, doc_id // 5 AS b FROM documents)",
    "sy AS (SELECT doc_id, " +
      "CASE doc_id % 5 WHEN 0 THEN 'zh' WHEN 1 THEN 'zh-tw' " +
      "WHEN 2 THEN 'ru' WHEN 3 THEN 'ru-md' ELSE 'en' END AS lang, " +
      "CASE doc_id % 5 " +
      "WHEN 0 THEN '机器学习模型' || CAST(b AS VARCHAR) || '号' " +
      "WHEN 1 THEN '模型。机器, 学习 ' || CAST(b AS VARCHAR) || '号' " +
      "WHEN 2 THEN 'модель машинного обучения ' || CAST(b AS VARCHAR) " +
      "WHEN 3 THEN 'обучения, модель — машинного ' " +
      "|| CAST(b AS VARCHAR) " +
      "ELSE 'machine learning model ' || CAST(b AS VARCHAR) " +
      "END AS text FROM uu)")

  /** The q399 Thai/Lao synth (mirrors `SparkEntry.thaiSynth`) as
    * CTEs ending in `sy(doc_id, lang, text)` — run-preserving
    * re-crawl pairs (punctuation / token order change, the unbroken
    * script runs don't) plus the Latin control.
    */
  val ThaiSynthCtes: Seq[String] = Seq(
    "uu AS (SELECT doc_id, doc_id // 5 AS b FROM documents)",
    "sy AS (SELECT doc_id, " +
      "CASE doc_id % 5 WHEN 0 THEN 'th' WHEN 1 THEN 'th-x' " +
      "WHEN 2 THEN 'lo' WHEN 3 THEN 'lo-x' ELSE 'en' END AS lang, " +
      "CASE doc_id % 5 " +
      "WHEN 0 THEN 'การเรียนรู้ ของเครื่อง ' || CAST(b AS VARCHAR) " +
      "WHEN 1 THEN 'ของเครื่อง, การเรียนรู้! ' || CAST(b AS VARCHAR) " +
      "WHEN 2 THEN 'ການຮຽນຮູ້ ເຄື່ອງຈັກ ' || CAST(b AS VARCHAR) " +
      "WHEN 3 THEN 'ເຄື່ອງຈັກ — ການຮຽນຮູ້ ' || CAST(b AS VARCHAR) " +
      "ELSE 'machine learning model ' || CAST(b AS VARCHAR) " +
      "END AS text FROM uu)")

  /** Incremental scripted-dedup replay (q394,
    * [[operators.CrossLingual.flagIncrementalScripted]]): the corpus
    * slice's fingerprint index, the delta probed with one left join —
    * NULL keys never index and never match.
    */
  /** The scripted incremental-dedup replay over an arbitrary synth
    * (`sy`) and corpus/delta predicates — shared by q394 (zh/ru,
    * id-threshold split) and q403 (Thai/Lao, PARITY split so every
    * th/lo delta truly probes its corpus partner).
    */
  private def scriptIncrementalSql(synth: Seq[String],
      corpusWhere: String, deltaWhere: String,
      fpSql: String = ScriptedFpSql): String =
    withClause(synth ++ Seq(
      s"cf AS (SELECT doc_id, lang, $fpSql AS fp FROM sy " +
        s"WHERE $corpusWhere)",
      "ix AS (SELECT fp, min(doc_id) AS matched_id, " +
        "list_sort(list_distinct(list(lang))) AS langs FROM cf " +
        "WHERE fp IS NOT NULL GROUP BY fp)",
      s"df AS (SELECT doc_id, lang, $fpSql AS fp FROM sy " +
        s"WHERE $deltaWhere)"),
      "SELECT d.doc_id, d.lang, " +
        "ix.matched_id IS NOT NULL AS is_dup, ix.matched_id, " +
        "CASE WHEN ix.matched_id IS NOT NULL THEN " +
        "array_to_string(ix.langs, ',') END AS matched_langs, " +
        "ix.matched_id IS NOT NULL AND " +
        "NOT list_contains(ix.langs, d.lang) AS is_cross_lingual " +
        "FROM df d LEFT JOIN ix ON ix.fp = d.fp ORDER BY d.doc_id")

  def q394ScriptIncremental(splitAt: Long): String =
    scriptIncrementalSql(ScriptSynthCtes,
      s"doc_id < $splitAt", s"doc_id >= $splitAt")

  /** The q415 canonical-stack synth (mirrors `SparkEntry.canonSynth`)
    * — per pair a plain zh+ASCII corpus row and a delta twin dressed
    * with a BOM, a fullwidth re-spelled tag (the REVERSE width
    * translate) and a soft hyphen inside a word; ends in
    * `sy(doc_id, lang, text)`.
    */
  val CanonSynthCtes: Seq[String] = {
    val fw = operators.CrossLingual.WidthFrom
    val asc = operators.CrossLingual.WidthTo.replace("'", "''")
    val bom = "\ufeff"
    val shy = "\u00ad"
    Seq("sy AS (SELECT doc_id, CASE WHEN doc_id % 2 = 1 THEN " +
      "'zh-tw' ELSE 'zh' END AS lang, CASE WHEN doc_id % 2 = 1 " +
      s"THEN '${bom}模型训练 ' || translate('gpu' || (doc_id // 2) || " +
      s"' benchmark', '$asc', '$fw') || ' clean${shy}up' " +
      "ELSE '模型训练 gpu' || (doc_id // 2) || ' benchmark cleanup' " +
      "END AS text FROM documents)")
  }

  /** Canonical-stack incremental replay (q415,
    * [[operators.CrossLingual.flagIncrementalCanonical]]): the q394
    * shape with the canonical fingerprint (invisible strip → width
    * fold → scripted) over the dressed-twin synth at a parity split.
    */
  val q415CanonicalIncremental: String = {
    val fw = operators.CrossLingual.WidthFrom
    val asc = operators.CrossLingual.WidthTo.replace("'", "''")
    val cls = operators.CrossLingual.InvisibleClass
    val canonFp = scriptedFpSqlOf(
      s"translate(regexp_replace(text, '[$cls]', '', 'g'), '$fw', " +
        s"'$asc')")
    scriptIncrementalSql(CanonSynthCtes,
      "doc_id % 2 = 0", "doc_id % 2 = 1", canonFp)
  }

  /** Thai-family incremental replay (q403): the q394 shape over the
    * bigram-shingled Thai/Lao synth with a PARITY corpus/delta split
    * — synth pair ids are consecutive, so every th/lo delta doc has
    * its run-preserving partner in the corpus and must flag, while
    * the en controls' b values never cross the parity line and come
    * back clean.
    */
  val q403ThaiIncremental: String =
    scriptIncrementalSql(ThaiSynthCtes,
      "doc_id % 2 = 0", "doc_id % 2 = 1")

  /** Scripted keep-best replay (q397, [[operators.CrossLingual
    * .scriptAwareClustersKeepBest]]): the q391 cluster CTEs with the
    * (score DESC, id) window election; score = char length (both
    * engines count codepoints).
    */
  val q397ScriptKeepBest: String =
    withClause(ScriptSynthCtes ++ Seq(
      s"f AS (SELECT doc_id, lang, length(text) AS score, " +
        s"$ScriptedFpSql AS fp FROM sy)",
      "cl AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, " +
        "array_to_string(list_sort(list_distinct(list(lang))), ',') " +
        "AS langs FROM f WHERE fp IS NOT NULL GROUP BY fp " +
        "HAVING count(*) >= 2 AND count(DISTINCT lang) >= 2)",
      "el AS (SELECT fp, doc_id AS canonical_id, " +
        "CAST(score AS BIGINT) AS canonical_score, " +
        "row_number() OVER (PARTITION BY fp " +
        "ORDER BY score DESC, doc_id) AS rn FROM f " +
        "WHERE fp IS NOT NULL)"),
      "SELECT cl.fp, cl.n_docs, cl.n_langs, el.canonical_id, " +
        "el.canonical_score, cl.langs " +
        "FROM cl JOIN el ON el.fp = cl.fp AND el.rn = 1 " +
        "ORDER BY el.canonical_id")

  /** Cross-lingual near-dup replay: the q18 banded-candidate CTEs run
    * over the FOLDED text (base subquery aliases the fold AS text so
    * the shared tokenizer fragment applies unchanged), token-set
    * Jaccard ≥ `threshold` verify, language mismatch, per-pair-of-
    * languages readout with the exact 1e-6-grid jaccard mean.
    */
  def q320CrossLingualNearDup(threshold: Double): String = {
    import graft.functions.Grid.snapSql
    val base = s"(SELECT doc_id, $FoldedTextSql AS text, lang " +
      "FROM documents)"
    val jexpr = "CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) " +
      "/ len(list_distinct(list_concat(a.toks, b.toks)))"
    withClause(bandedCtes("", base) ++ Seq(
      s"dt AS (SELECT doc_id, lang, list_distinct($Toks) AS toks " +
        s"FROM $base)",
      s"ver AS (SELECT c.a_id, c.b_id, a.lang AS lang_a, " +
        s"b.lang AS lang_b, $jexpr AS j " +
        "FROM cand c JOIN dt a ON a.doc_id = c.a_id " +
        "JOIN dt b ON b.doc_id = c.b_id " +
        s"WHERE $jexpr >= ${threshold}e0 AND a.lang <> b.lang)"),
      "SELECT lang_a, lang_b, CAST(count(*) AS BIGINT) AS n_pairs, " +
        snapSql(
          "CAST(sum(CAST(floor(j * 1000000.0 + 0.5) AS BIGINT)) " +
            "AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0)", 4) +
        " AS avg_j, max(j) AS max_j " +
        "FROM ver GROUP BY lang_a, lang_b ORDER BY lang_a, lang_b")
  }

  /** Language-budget-mix replay: α-weights as exact scaled integers
    * (floor(T^α·1e6 + ½) — libm pow agrees within an ulp, the KM
    * ln-factor contract), budgets by pure integer division, and the
    * greedy prefix over (splitmix64(doc_id), doc_id) order with an
    * exact integer running token sum per language.
    */
  def q322LanguageBudgetMix(budget: Long, alpha: Double,
      base: String = "documents",
      extraCtes: Seq[String] = Nil): String = {
    import graft.functions.Grid.lit17
    val head = extraCtes ++ Seq(
      s"d AS (SELECT doc_id, lang, CAST(len($Toks) AS BIGINT) AS ntok " +
        s"FROM $base)",
      "tot AS (SELECT lang, CAST(sum(ntok) AS BIGINT) AS t " +
        "FROM d GROUP BY lang)",
      s"w AS (SELECT lang, t, CAST(floor(pow(CAST(t AS DOUBLE), " +
        s"${lit17(alpha)}) * 1000000.0 + 0.5) AS BIGINT) AS wsc " +
        "FROM tot)",
      "sw AS (SELECT CAST(sum(wsc) AS BIGINT) AS swsc FROM w)",
      // HUGEINT product: a BIGINT B*wsc overflows at corpus scale
      s"b AS (SELECT lang, t, CAST((CAST($budget AS HUGEINT) * wsc) " +
        "// swsc AS BIGINT) AS budget FROM w, sw)",
      "dz AS (SELECT doc_id, lang, ntok, CAST(doc_id AS HUGEINT) AS z " +
        "FROM d)")
    val mixed = mixStages(Seq("z"), Seq("doc_id", "lang", "ntok"))
      .zipWithIndex.map { case (body, n) =>
        val prev = if (n == 0) "dz" else s"dm${n - 1}"
        s"dm$n AS ($body FROM $prev)"
      }
    withClause(head ++ mixed ++ Seq(
      s"ord AS (SELECT doc_id, lang, ntok, ${toSigned("z")} AS skey " +
        "FROM dm5)",
      "cum AS (SELECT lang, doc_id, ntok, sum(ntok) OVER (" +
        "PARTITION BY lang ORDER BY skey, doc_id " +
        "ROWS UNBOUNDED PRECEDING) AS ctok FROM ord)",
      "sel AS (SELECT c.lang, c.ntok FROM cum c JOIN b USING (lang) " +
        "WHERE c.ctok <= b.budget)",
      "ag AS (SELECT lang, count(*) AS n, sum(ntok) AS tk " +
        "FROM sel GROUP BY lang)"),
      "SELECT b.lang, CAST(coalesce(ag.n, 0) AS BIGINT) AS n_docs, " +
        "CAST(coalesce(ag.tk, 0) AS BIGINT) AS tokens_selected, " +
        "CAST(b.budget AS BIGINT) AS budget, b.t AS total_tokens " +
        "FROM b LEFT JOIN ag USING (lang) ORDER BY b.lang")
  }

  /** Multilingual corpus-pipeline capstone replay (q327): the q319
    * fold-fingerprint dedup (canonical = min id survives), the q99
    * quality-keep rules, then the q322 budget-mix chain over the
    * survivors — three stages, all oracle fragments shared with their
    * standalone gates.
    */
  def q327MultilingualPipeline(budget: Long, alpha: Double): String = {
    val stages = Seq(
      s"f AS (SELECT doc_id, lang, $FoldedFpSql AS fp FROM documents)",
      "cx AS (SELECT fp, min(doc_id) AS canonical_id FROM f " +
        "WHERE fp IS NOT NULL GROUP BY fp " +
        "HAVING count(*) >= 2 AND count(DISTINCT lang) >= 2)",
      "sv AS (SELECT f.doc_id FROM f LEFT JOIN cx USING (fp) " +
        "WHERE cx.canonical_id IS NULL OR f.doc_id = cx.canonical_id)",
      s"qtk AS (SELECT d.doc_id, d.text, d.lang, $Toks AS t " +
        "FROM documents d JOIN sv USING (doc_id))",
      "qg AS (SELECT doc_id, text, len(t) AS n, " +
        "CASE WHEN len(t) >= 3 THEN list_transform(range(0, len(t) - 2), " +
        "i -> array_to_string(t[i + 1 : i + 3], ' ')) " +
        "ELSE [array_to_string(t, ' ')] END AS g3 FROM qtk)",
      "qual AS (SELECT doc_id FROM qg WHERE n >= 30 AND n <= 10000 " +
        "AND CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3) " +
        "<= 0.05 AND CAST(length(text) - length(regexp_replace(text, " +
        "'[.,;:!?''\"()-]', '', 'g')) AS DOUBLE) <= n * 0.5)")
    q322LanguageBudgetMix(budget, alpha,
      base = "(SELECT q.doc_id, q.lang, q.text FROM qtk q " +
        "JOIN qual USING (doc_id))",
      extraCtes = stages)
  }

  // ---- round 15: data selection & memorization auditing --------------

  /** The shared q351/q358 hardness rank over a trained assignment:
    * per-cluster `row_number` by (dist DESC, vec_id) plus the cluster
    * size — [[graft.operators.Clustering.pruneEasiest]]'s `ranked`
    * stage on the q87 kmeans replay.
    */
  private val pruneRankCte: String =
    "rk AS (SELECT vec_id, cid, dist, row_number() OVER " +
      "(PARTITION BY cid ORDER BY dist DESC, vec_id) AS rn, " +
      "count(*) OVER (PARTITION BY cid) AS nc FROM a3)"

  /** SSL-prototype pruning replay (q351): kmeans train + assign, the
    * hardness rank, the exact integer keep rule, per-cluster
    * accounting with the kept-id md5 (numeric sort, comma join — the
    * Spark side's sort_array/concat_ws program verbatim).
    */
  def q351PrototypePrune(k: Int, keepPct: Int): String =
    withClause(kmTrainCtes(k) ++ Seq(
      kmAssignCte("a3", "c2"),
      pruneRankCte,
      s"kp AS (SELECT *, (rn - 1) * 100 < nc * $keepPct AS kept " +
        "FROM rk)"),
      "SELECT cid AS cluster, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_kept, " +
        "md5(array_to_string(list_sort(list(vec_id) " +
        "FILTER (WHERE kept)), ',')) AS kept_md5, " +
        "round(sum(CASE WHEN kept THEN dist END), 2) AS inertia_kept " +
        "FROM kp GROUP BY cid ORDER BY cluster")

  /** The q358 sweep: the SAME rank CTE crossed with the bounded
    * keep-pct values, grouped per (pct, cluster).
    */
  def q358PruneSweep(k: Int, pcts: Seq[Int]): String = {
    val pv = pcts.map(p => s"($p)").mkString(", ")
    withClause(kmTrainCtes(k) ++ Seq(
      kmAssignCte("a3", "c2"),
      pruneRankCte,
      s"sw AS (SELECT rk.*, p.pct FROM rk CROSS JOIN " +
        s"(VALUES $pv) p(pct))",
      "kp AS (SELECT *, (rn - 1) * 100 < nc * pct AS kept FROM sw)"),
      "SELECT CAST(pct AS INTEGER) AS keep_pct, cid AS cluster, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_kept, " +
        "round(sum(CASE WHEN kept THEN dist END), 2) AS inertia_kept " +
        "FROM kp GROUP BY pct, cid ORDER BY keep_pct, cluster")
  }

  /** D4 capstone replay (q353): the q93 trained-SemDeDup chain (multi-
    * assign pairs, min-id survives) feeding the q351 prune rank over
    * the SURVIVORS, accounted against the full single-assignment.
    */
  def q353D4Pipeline(k: Int, threshold: Double, keepPct: Int): String =
    withClause(kmTrainCtes(k) ++ Seq(
      kmAssignCte("asg", "c2", take = 2),
      "pr AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        "list_cosine_similarity(a.v, b.v) AS cos " +
        "FROM asg a JOIN asg b ON a.cid = b.cid " +
        "AND a.vec_id < b.vec_id)",
      "hit AS (SELECT DISTINCT b_id FROM (SELECT a_id, b_id, " +
        "min(cos) AS cos FROM pr GROUP BY a_id, b_id) " +
        s"WHERE cos >= $threshold)",
      kmAssignCte("a3", "c2"),
      "sv AS (SELECT a3.* FROM a3 LEFT JOIN hit " +
        "ON a3.vec_id = hit.b_id WHERE hit.b_id IS NULL)",
      "rk AS (SELECT vec_id, cid, dist, row_number() OVER " +
        "(PARTITION BY cid ORDER BY dist DESC, vec_id) AS rn, " +
        "count(*) OVER (PARTITION BY cid) AS nc FROM sv)",
      s"kp AS (SELECT *, (rn - 1) * 100 < nc * $keepPct AS kept " +
        "FROM rk)",
      "acc AS (SELECT cid, CAST(count(*) AS BIGINT) AS n FROM a3 " +
        "GROUP BY cid)",
      "ded AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_dedup, " +
        "CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_kept, md5(array_to_string(list_sort(list(vec_id) " +
        "FILTER (WHERE kept)), ',')) AS kept_md5 FROM kp GROUP BY cid)"),
      "SELECT acc.cid AS cluster, acc.n, ded.n_dedup, ded.n_kept, " +
        "ded.kept_md5 FROM acc JOIN ded USING (cid) ORDER BY cluster")

  /** Character-coverage replay (q357): lowercased codepoint counts
    * (the charGrams n = 1 slicing — substr over the codepoint range),
    * the (count DESC, char ASC) running sum (INTEGER summand — see
    * RunningSumGateSpec's whitelist), and per target the min rank
    * whose cumulative count crosses `target_bp·total / 10000` by the
    * exact cross-multiplication.
    */
  def q357CharCoverage(targetsBp: Seq[Int]): String = {
    val tg = targetsBp.mkString("[", ", ", "]")
    s"""WITH lt AS (SELECT lower(text) AS t FROM documents),
       |chs AS (SELECT unnest(CASE WHEN length(t) >= 1
       |  THEN list_transform(range(0, length(t)),
       |    i -> substr(t, CAST(i + 1 AS INTEGER), 1))
       |  ELSE [t] END) AS ch FROM lt),
       |cnt AS (SELECT ch, CAST(count(*) AS BIGINT) AS n FROM chs
       |  WHERE ch <> '' GROUP BY ch),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
       |  CAST(count(*) AS BIGINT) AS alpha FROM cnt),
       |rk AS (SELECT ch, n, sum(n) OVER (ORDER BY n DESC, ch
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |  row_number() OVER (ORDER BY n DESC, ch) AS pos FROM cnt),
       |tg AS (SELECT unnest($tg) AS target_bp)
       |SELECT CAST(tg.target_bp AS INTEGER) AS target_bp,
       |  CAST(min(pos) AS BIGINT) AS n_chars,
       |  CAST(min(tot.total) AS BIGINT) AS total_chars,
       |  CAST(min(tot.alpha) AS BIGINT) AS alphabet_size
       |FROM tg, rk, tot
       |WHERE cum * 10000 >= CAST(tg.target_bp AS BIGINT) * tot.total
       |GROUP BY tg.target_bp ORDER BY target_bp""".stripMargin
  }

  /** aHash-vs-dHash agreement replay (q356): the q236 planted corpus
    * (base + exact copies + brightness-perturbed copies), BOTH hash
    * rules recomputed from the pixels (PNG lossless — the q235
    * device): aHash bit `64·p > Σp`, dHash bit `p[i] < p[j]` with
    * `j = (i div 8)·8 + (i mod 8 + 1) mod 8` (the cyclic row
    * gradient), then the all-pairs union of the two ≤ `maxH` pair
    * sets with per-modality hammings NULLed outside their own set —
    * the full-outer join [[graft.operators.MediaDedup.nearDupPairs]]
    * agreement the Spark side plans as two banded equi-joins
    * (pigeonhole-lossless at maxH ≤ 3, so all-pairs here is exact).
    */
  /** bits(media_id, i, b) → `${pfx}wide(media_id, b0..b3)` — the
    * 16-bit MSB-first block packing shared by every image-hash
    * replay (q356, q366).
    */
  private def blk(bits: String, pfx: String): Seq[String] = Seq(
    s"${pfx}blocks AS (SELECT media_id, i // 16 AS blk, " +
      "CAST(sum(b * (1::BIGINT << CAST(15 - (i % 16) AS INT))) " +
      s"AS BIGINT) AS bv FROM $bits GROUP BY 1, 2)",
    s"${pfx}wide AS (SELECT media_id, " +
      "max(CASE WHEN blk = 0 THEN bv END) AS b0, " +
      "max(CASE WHEN blk = 1 THEN bv END) AS b1, " +
      "max(CASE WHEN blk = 2 THEN bv END) AS b2, " +
      "max(CASE WHEN blk = 3 THEN bv END) AS b3 " +
      s"FROM ${pfx}blocks GROUP BY 1)")

  /** XOR-popcount Hamming distance over the 4-block layout. */
  private def ham(a: String, b: String): String =
    s"bit_count(xor($a.b0, $b.b0)) + bit_count(xor($a.b1, $b.b1)) " +
      s"+ bit_count(xor($a.b2, $b.b2)) + bit_count(xor($a.b3, $b.b3))"

  /** The q236 planted image corpus (base + exact copies + brightness-
    * perturbed copies) as per-pixel rows — shared by q356/q366.
    */
  private val PlantedCorpusCtes: Seq[String] = Seq(
    "base AS (SELECT vec_id AS media_id, i, " +
      "CAST(greatest(0, least(255, floor((CAST(embedding[i+1] " +
      "AS DOUBLE) + 1.0) * 127.5))) AS BIGINT) AS p " +
      "FROM embeddings, range(64) t(i))",
    "corpus AS (SELECT media_id, i, p FROM base UNION ALL " +
      "SELECT media_id + 100000, i, " +
      "CASE WHEN media_id % 3 = 1 AND i % 16 = 0 " +
      "THEN least(p + 3, 255) ELSE p END " +
      "FROM base WHERE media_id % 3 < 2)")

  def q356DhashAgreement(maxH: Int): String = {
    withClause(PlantedCorpusCtes ++ Seq(
      "s AS (SELECT media_id, sum(p) AS tot FROM corpus GROUP BY 1)",
      "abits AS (SELECT c.media_id, i, " +
        "CASE WHEN 64 * p > tot THEN 1 ELSE 0 END AS b " +
        "FROM corpus c JOIN s USING (media_id))") ++
      blk("abits", "a") ++ Seq(
      "dbits AS (SELECT c.media_id, c.i, " +
        "CASE WHEN c.p < n.p THEN 1 ELSE 0 END AS b " +
        "FROM corpus c JOIN corpus n ON n.media_id = c.media_id " +
        "AND n.i = (c.i // 8) * 8 + (c.i % 8 + 1) % 8)") ++
      blk("dbits", "d") ++ Seq(
      "pr AS (SELECT a.media_id AS a_id, b.media_id AS b_id, " +
        s"${ham("a", "b")} AS ha, ${ham("da", "db")} AS hd " +
        "FROM awide a JOIN awide b ON a.media_id < b.media_id " +
        "JOIN dwide da ON da.media_id = a.media_id " +
        "JOIN dwide db ON db.media_id = b.media_id)"),
      "SELECT a_id, b_id, " +
        s"CAST(CASE WHEN ha <= $maxH THEN ha END AS INTEGER) " +
        "AS a_hamming, " +
        s"CAST(CASE WHEN hd <= $maxH THEN hd END AS INTEGER) " +
        "AS d_hamming " +
        s"FROM pr WHERE ha <= $maxH OR hd <= $maxH " +
        "ORDER BY a_id, b_id")
  }

  /** Three-hash consensus replay (q366): aHash + dHash + pHash bits
    * all recomputed from the planted corpus pixels (the q356/q364
    * fragments), all-pairs with three hammings, membership flags at
    * `maxH`, consensus = at least two of three agree.
    */
  def q366HashConsensus(maxH: Int): String = {
    import graft.functions.Grid.lit17
    val ct = graft.operators.MediaDedup.DctCos
      .map(row => row.map(lit17).mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    def flag(h: String) = s"$h <= $maxH"
    withClause(PlantedCorpusCtes ++ Seq(
      "s AS (SELECT media_id, sum(p) AS tot FROM corpus GROUP BY 1)",
      "abits AS (SELECT c.media_id, i, " +
        "CASE WHEN 64 * p > tot THEN 1 ELSE 0 END AS b " +
        "FROM corpus c JOIN s USING (media_id))") ++
      blk("abits", "a") ++ Seq(
      "dbits AS (SELECT c.media_id, c.i, " +
        "CASE WHEN c.p < n.p THEN 1 ELSE 0 END AS b " +
        "FROM corpus c JOIN corpus n ON n.media_id = c.media_id " +
        "AND n.i = (c.i // 8) * 8 + (c.i % 8 + 1) % 8)") ++
      blk("dbits", "d") ++ Seq(
      "pl AS (SELECT media_id, list(CAST(p AS DOUBLE) ORDER BY i) " +
        "AS v FROM corpus GROUP BY media_id)",
      s"pct AS (SELECT $ct AS t)",
      "pco AS (SELECT media_id, k, list_reduce(list_prepend(" +
        "CAST(0.0 AS DOUBLE), list_transform(range(0, 64), " +
        "i -> (t[CAST(k % 8 AS INT) + 1][CAST(i % 8 AS INT) + 1] " +
        "* t[CAST(k // 8 AS INT) + 1][CAST(i // 8 AS INT) + 1]) " +
        "* v[i + 1])), (a, x) -> a + x) AS c " +
        "FROM pl, range(64) rk(k), pct)",
      "pac AS (SELECT media_id, list(c ORDER BY k) AS cs FROM pco " +
        "GROUP BY media_id)",
      "psa AS (SELECT media_id, cs, list_reduce(list_prepend(" +
        "CAST(0.0 AS DOUBLE), cs[2:64]), (a, x) -> a + x) AS sumac " +
        "FROM pac)",
      "pbits AS (SELECT media_id, k AS i, " +
        "CASE WHEN k >= 1 AND cs[CAST(k AS INT) + 1] * 63.0 > sumac " +
        "THEN 1 ELSE 0 END AS b FROM psa, range(64) rk(k))") ++
      blk("pbits", "p") ++ Seq(
      "pr AS (SELECT a.media_id AS a_id, b.media_id AS b_id, " +
        s"${ham("a", "b")} AS hha, ${ham("da", "db")} AS hhd, " +
        s"${ham("pa", "pb")} AS hhp " +
        "FROM awide a JOIN awide b ON a.media_id < b.media_id " +
        "JOIN dwide da ON da.media_id = a.media_id " +
        "JOIN dwide db ON db.media_id = b.media_id " +
        "JOIN pwide pa ON pa.media_id = a.media_id " +
        "JOIN pwide pb ON pb.media_id = b.media_id)"),
      "SELECT a_id, b_id, " +
        s"${flag("hha")} AS in_ahash, ${flag("hhd")} AS in_dhash, " +
        s"${flag("hhp")} AS in_phash, " +
        s"(CASE WHEN ${flag("hha")} THEN 1 ELSE 0 END + " +
        s"CASE WHEN ${flag("hhd")} THEN 1 ELSE 0 END + " +
        s"CASE WHEN ${flag("hhp")} THEN 1 ELSE 0 END) >= 2 " +
        "AS consensus " +
        s"FROM pr WHERE ${flag("hha")} OR ${flag("hhd")} " +
        s"OR ${flag("hhp")} ORDER BY a_id, b_id")
  }

  /** pHash replay (q364): pixels as ordered per-media lists (PNG
    * lossless — the q235 device), the full 8×8 DCT-II with the SAME
    * 1e-9-snapped cosine table embedded as 17-digit literals
    * ([[graft.operators.MediaDedup.DctCos]]), every coefficient an
    * index-ordered `list_reduce` fold in the exact association order
    * `(cos_w·cos_u)·v`, the AC sum folded in k order, the
    * coeff·63 > ΣAC bit rule, aHash block packing.
    */
  def q364PHash: String = {
    import graft.functions.Grid.lit17
    val ct = graft.operators.MediaDedup.DctCos
      .map(row => row.map(lit17).mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    s"""WITH px AS (SELECT vec_id AS media_id, i,
       |  CAST(greatest(0, least(255, floor((CAST(embedding[i+1]
       |    AS DOUBLE) + 1.0) * 127.5))) AS BIGINT) AS p
       |  FROM embeddings, range(64) t(i)),
       |pl AS (SELECT media_id, list(CAST(p AS DOUBLE) ORDER BY i)
       |  AS v FROM px GROUP BY media_id),
       |ct AS (SELECT $ct AS t),
       |co AS (SELECT media_id, k, list_reduce(list_prepend(
       |    CAST(0.0 AS DOUBLE), list_transform(range(0, 64),
       |    i -> (t[CAST(k % 8 AS INT) + 1][CAST(i % 8 AS INT) + 1]
       |      * t[CAST(k // 8 AS INT) + 1][CAST(i // 8 AS INT) + 1])
       |      * v[i + 1])), (a, x) -> a + x) AS c
       |  FROM pl, range(64) s(k), ct),
       |ac AS (SELECT media_id, list(c ORDER BY k) AS cs FROM co
       |  GROUP BY media_id),
       |sa AS (SELECT media_id, cs, list_reduce(list_prepend(
       |    CAST(0.0 AS DOUBLE), cs[2:64]), (a, x) -> a + x) AS sumac
       |  FROM ac),
       |bits AS (SELECT media_id, k,
       |  CASE WHEN k >= 1 AND cs[CAST(k AS INT) + 1] * 63.0 > sumac
       |    THEN 1 ELSE 0 END AS b
       |  FROM sa, range(64) s(k)),
       |blocks AS (SELECT media_id, k // 16 AS blk,
       |  CAST(sum(b * (1::BIGINT << CAST(15 - (k % 16) AS INT)))
       |    AS BIGINT) AS bv FROM bits GROUP BY 1, 2),
       |wide AS (SELECT media_id,
       |  max(CASE WHEN blk = 0 THEN bv END) AS b0,
       |  max(CASE WHEN blk = 1 THEN bv END) AS b1,
       |  max(CASE WHEN blk = 2 THEN bv END) AS b2,
       |  max(CASE WHEN blk = 3 THEN bv END) AS b3
       |  FROM blocks GROUP BY media_id),
       |ones AS (SELECT media_id, CAST(sum(b) AS INTEGER) AS n_ones
       |  FROM bits GROUP BY media_id)
       |SELECT media_id, b0, b1, b2, b3, n_ones
       |FROM wide JOIN ones USING (media_id)
       |ORDER BY media_id""".stripMargin
  }

  /** Secret-Sharer canary exposure replay (q354): the decoy slot
    * values (top corpus tokens, count DESC / token ASC), then one
    * unrolled block per insertion count — augmented trigram/context
    * counts, candidate grams scored on the integer NANONAT grid
    * (q340's `floor(ln·1e9 + ½)`), exact integer candidate sums, the
    * secret's rank by (score DESC, token ASC), exposure bits snapped
    * at 1e-4 — mirroring
    * [[graft.operators.Memorization.canaryExposure]] stage for stage.
    */
  def q354CanaryExposure(prefix: Seq[String], secret: String,
      suffix: Seq[String], nDecoys: Int, inserts: Seq[Int]): String = {
    import graft.functions.Grid.snapSql
    val toksT = prefix ++ Seq(" ") ++ suffix // slot marker
    def seg(ts: Seq[String]): String =
      ts.map(t => if (t == " ") "w" else s"'$t'")
        .reduce((a, b) => s"$a || ' ' || $b")
    val tpls = (0 to toksT.size - 3).map { i =>
      val g = toksT.slice(i, i + 3); val c = toksT.slice(i, i + 2)
      s"struct_pack(g := ${seg(g)}, c := ${seg(c)})"
    }
    val canaryList = (prefix ++ Seq(secret) ++ suffix)
      .map(t => s"'$t'").mkString("[", ", ", "]")
    val head = Seq(
      s"tok AS (SELECT $Toks AS t FROM documents)",
      "dec AS (SELECT w FROM (SELECT unnest(t) AS w FROM tok) " +
        s"WHERE w <> '$secret' GROUP BY w " +
        s"ORDER BY count(*) DESC, w LIMIT $nDecoys)",
      s"cd AS (SELECT w FROM dec UNION ALL SELECT '$secret')",
      // N = the ACTUAL candidate count: a corpus with fewer distinct
      // tokens than nDecoys caps the decoy set (mirrors the Spark
      // side's decoys.size + 1)
      "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cd)",
      s"cg AS (SELECT w, unnest([${tpls.mkString(", ")}]) AS u FROM cd)",
      "cgf AS (SELECT w, u.g AS gram, u.c AS ctx FROM cg)")
    val sc9 = "CAST(floor(ln(%s) * 1000000000.0 + 0.5) AS BIGINT)"
    val blocks = inserts.flatMap { r =>
      val p = s"i$r"
      Seq(
        s"${p}au AS (SELECT t FROM tok UNION ALL " +
          s"SELECT $canaryList AS t FROM range($r))",
        s"${p}g3 AS (SELECT array_to_string(t[j + 1 : j + 3], ' ') " +
          "AS gram, CAST(count(*) AS BIGINT) AS c3 FROM " +
          "(SELECT t, unnest(range(0, len(t) - 2)) AS j " +
          s"FROM ${p}au WHERE len(t) >= 3) GROUP BY 1)",
        s"${p}g2 AS (SELECT array_to_string(t[j + 1 : j + 2], ' ') " +
          "AS ctx, CAST(count(*) AS BIGINT) AS c2 FROM " +
          "(SELECT t, unnest(range(0, len(t) - 1)) AS j " +
          s"FROM ${p}au WHERE len(t) >= 2) GROUP BY 1)",
        s"${p}vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v " +
          s"FROM (SELECT unnest(t) AS w FROM ${p}au))",
        s"${p}sc AS (SELECT cgf.w, " +
          sc9.format(s"(coalesce(c3, 0) + 0.4) / " +
            s"(coalesce(c2, 0) + 0.4 * ${p}vv.v)") + " AS lp_sc " +
          s"FROM cgf LEFT JOIN ${p}g3 USING (gram) " +
          s"LEFT JOIN ${p}g2 USING (ctx), ${p}vv)",
        s"${p}ts AS (SELECT w, CAST(sum(lp_sc) AS BIGINT) AS s " +
          s"FROM ${p}sc GROUP BY w)",
        s"${p}ss AS (SELECT s FROM ${p}ts WHERE w = '$secret')",
        s"${p}rk AS (SELECT CAST(count(*) + 1 AS INTEGER) AS rank " +
          s"FROM ${p}ts t, ${p}ss x WHERE t.s > x.s " +
          s"OR (t.s = x.s AND t.w < '$secret'))")
    }
    val rows = inserts.map { r =>
      val p = s"i$r"
      s"SELECT CAST($r AS INTEGER) AS n_insert, rank, " +
        s"(SELECT s FROM ${p}ss) AS score_sc, " +
        s"${snapSql("ln(CAST(nn.n AS DOUBLE) / rank) / ln(2.0)", 4)} " +
        s"AS exposure FROM ${p}rk, nn"
    }.mkString(" UNION ALL ")
    withClause(head ++ blocks,
      s"SELECT * FROM ($rows) ORDER BY n_insert")
  }

  /** Interpolated Kneser–Ney bigram replay (q355): bigram TYPE counts
    * from the train split, context totals/fan-out and continuation
    * fan-in derived from the type table, then per-test-bigram
    * `ln(p_KN)` in the EXACT association order of
    * [[graft.operators.NgramLm.knScoredGrams]] — `(max(c2 − d, 0) +
    * (d·n1f)·p_cont) / ct`, backoff `p_cont = (n1b + 1)/(B + V)` —
    * averaged per doc on the 1e-4 grid (round after the aggregate,
    * the q100 device).
    */
  def q355KnBigram(splitId: Long, discount: Double): String =
    withClause(knCtes(splitId, discount),
      "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
        "round(avg(lp), 4) AS kn_lp " +
        "FROM sc GROUP BY doc_id ORDER BY doc_id")

  /** The KN train+score chain ending in `sc(doc_id, lp)` — one row per
    * test bigram with its interpolated-KN ln-prob. Shared by q355
    * (per-doc scores) and q359 (per-language smoother comparison);
    * also leaves `tr`/`te`/`tep`/`bi` in scope for the add-α chain.
    */
  private def knCtes(splitId: Long, discount: Double): Seq[String] = {
    val pc = "(CAST(coalesce(bw.n1b, 0) + 1 AS DOUBLE) / " +
      "CAST(bb.btypes + vv.v AS DOUBLE))"
    Seq(
      s"tok AS (SELECT doc_id, $Toks AS t FROM documents)",
      s"tr AS (SELECT * FROM tok WHERE doc_id < $splitId)",
      s"te AS (SELECT * FROM tok WHERE doc_id >= $splitId)",
      "bp AS (SELECT t[j] AS l, t[j + 1] AS r FROM " +
        "(SELECT t, unnest(range(1, len(t))) AS j FROM tr))",
      "bi AS (SELECT l, r, CAST(count(*) AS BIGINT) AS c2 FROM bp " +
        "GROUP BY l, r)",
      "cx AS (SELECT l, CAST(sum(c2) AS BIGINT) AS ct, " +
        "CAST(count(*) AS BIGINT) AS n1f FROM bi GROUP BY l)",
      "bw AS (SELECT r, CAST(count(*) AS BIGINT) AS n1b FROM bi " +
        "GROUP BY r)",
      "bb AS (SELECT CAST(count(*) AS BIGINT) AS btypes FROM bi)",
      "vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM " +
        "(SELECT unnest(t) AS w FROM tr))",
      "tep AS (SELECT doc_id, t[j] AS l, t[j + 1] AS r FROM " +
        "(SELECT doc_id, t, unnest(range(1, len(t))) AS j FROM te))",
      "sc AS (SELECT p.doc_id, " +
        "ln(CASE WHEN coalesce(cx.ct, 0) > 0 " +
        s"THEN (greatest(CAST(coalesce(bi.c2, 0) AS DOUBLE) - " +
        s"$discount, CAST(0.0 AS DOUBLE)) + " +
        s"($discount * cx.n1f) * $pc) / cx.ct " +
        s"ELSE $pc END) AS lp " +
        "FROM tep p LEFT JOIN bi ON bi.l = p.l AND bi.r = p.r " +
        "LEFT JOIN cx ON cx.l = p.l " +
        "LEFT JOIN bw ON bw.r = p.r, bb, vv)")
  }

  /** Smoother comparison replay (q359): per language on the holdout,
    * the mean of the per-doc add-α scores (q100's exact chain — the
    * SAME `bi` bigram table, unigram context counts) next to the mean
    * of the per-doc KN scores, both per-doc values on the 1e-4 grid
    * BEFORE the per-language mean (mirroring the Spark side averaging
    * the operators' rounded outputs).
    */
  def q359SmoothingEval(splitId: Long, discount: Double,
      alpha: Double): String = {
    import graft.functions.Grid.snapSql
    withClause(knCtes(splitId, discount) ++ Seq(
      "kdoc AS (SELECT doc_id, round(avg(lp), 4) AS kn_lp FROM sc " +
        "GROUP BY doc_id)",
      "uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM " +
        "(SELECT unnest(t) AS w FROM tr) GROUP BY w)",
      "av AS (SELECT CAST(count(*) AS DOUBLE) AS vs FROM uni)",
      "aal AS (SELECT p.doc_id, " +
        s"ln((coalesce(bi.c2, 0) + $alpha) / " +
        s"(coalesce(u.c1, 0) + $alpha * av.vs)) AS lp " +
        "FROM tep p LEFT JOIN bi ON bi.l = p.l AND bi.r = p.r " +
        "LEFT JOIN uni u ON u.w = p.l, av)",
      "adoc AS (SELECT doc_id, round(avg(lp), 4) AS avg_lp FROM aal " +
        "GROUP BY doc_id)",
      s"lng AS (SELECT doc_id, lang FROM documents " +
        s"WHERE doc_id >= $splitId)"),
      "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        s"${snapSql("avg(a.avg_lp)", 4)} AS addalpha_lp, " +
        s"${snapSql("avg(k.kn_lp)", 4)} AS kn_lp " +
        "FROM lng JOIN adoc a USING (doc_id) " +
        "JOIN kdoc k USING (doc_id) " +
        "GROUP BY lang ORDER BY lang")
  }

  /** k-center greedy replay (q352): seed = min vec_id, then `k − 1`
    * unrolled farthest-first rounds — per round the min distance to the
    * accumulated centers (exact double `min` over the same kmDist
    * folds), the (mind DESC, vec_id) top-1 pick, and the growing center
    * set — mirroring [[graft.operators.Coreset.kCenterGreedy]]'s
    * driver fold exactly; `dist_sq` snaps at emission only.
    */
  def q352KCenterCoreset(k: Int): String = {
    import graft.functions.Grid.snapSql
    val unionAll = (0 until k).map(i => s"SELECT * FROM c$i")
      .mkString(" UNION ALL ")
    withClause(kCenterCtes(k),
      "SELECT k_idx, CAST(vec_id AS BIGINT) AS vec_id, " +
        s"${snapSql("dist_sq", 6)} AS dist_sq FROM ($unionAll) " +
        "ORDER BY k_idx")
  }

  /** The unrolled k-center chain: `e` (double vectors), per-round
    * `c{i}(k_idx, vec_id, dist_sq)` picks and the accumulated center
    * set `a{i}(vec_id, v)` — `a{k-1}` is the full selection. Shared by
    * q352 (trajectory) and q360 (coverage eval).
    */
  private def kCenterCtes(k: Int): Seq[String] = {
    val rounds = (1 until k).flatMap { i => Seq(
      s"d$i AS (SELECT e.vec_id, min(${kmDist("e.v", "a.v")}) AS mind " +
        s"FROM e, a${i - 1} a GROUP BY e.vec_id)",
      s"p$i AS (SELECT vec_id, mind FROM d$i " +
        "ORDER BY mind DESC, vec_id LIMIT 1)",
      s"c$i AS (SELECT $i AS k_idx, vec_id, mind AS dist_sq FROM p$i)",
      s"a$i AS (SELECT a.* FROM a${i - 1} a UNION ALL " +
        s"SELECT e.vec_id, e.v FROM e JOIN p$i USING (vec_id))")
    }
    Seq(
      "e AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
      "a0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)",
      "c0 AS (SELECT 0 AS k_idx, vec_id, CAST(0.0 AS DOUBLE) " +
        "AS dist_sq FROM a0)") ++ rounds
  }

  /** Grouped k-center replay (q361): per-group seeds (min id via a
    * keyed row_number), then `k − 1` unrolled rounds — each row's min
    * distance to ITS group's accumulated centers (label-keyed join,
    * exact double min), the per-group (mind DESC, vec_id) argmax via
    * a keyed row_number, and the growing per-group center sets.
    */
  def q361GroupedCoreset(k: Int): String = {
    import graft.functions.Grid.snapSql
    val rounds = (1 until k).flatMap { i => Seq(
      s"d$i AS (SELECT e.grp, e.vec_id, " +
        s"min(${kmDist("e.v", "a.v")}) AS mind " +
        s"FROM e JOIN a${i - 1} a ON a.grp = e.grp " +
        "GROUP BY e.grp, e.vec_id)",
      s"p$i AS (SELECT grp, vec_id, mind FROM (SELECT grp, vec_id, " +
        "mind, row_number() OVER (PARTITION BY grp " +
        s"ORDER BY mind DESC, vec_id) AS rn FROM d$i) WHERE rn = 1)",
      s"c$i AS (SELECT grp, $i AS k_idx, vec_id, mind AS dist_sq " +
        s"FROM p$i)",
      s"a$i AS (SELECT a.* FROM a${i - 1} a UNION ALL " +
        s"SELECT e.grp, e.vec_id, e.v FROM e " +
        s"JOIN p$i ON p$i.grp = e.grp AND p$i.vec_id = e.vec_id)")
    }
    val unionAll = (0 until k).map(i => s"SELECT * FROM c$i")
      .mkString(" UNION ALL ")
    withClause(Seq(
      "e AS (SELECT CAST(label AS BIGINT) AS grp, vec_id, " +
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "FROM embeddings)",
      "a0 AS (SELECT grp, vec_id, v FROM (SELECT grp, vec_id, v, " +
        "row_number() OVER (PARTITION BY grp ORDER BY vec_id) AS rn " +
        "FROM e) WHERE rn = 1)",
      "c0 AS (SELECT grp, 0 AS k_idx, vec_id, " +
        "CAST(0.0 AS DOUBLE) AS dist_sq FROM a0)") ++ rounds,
      "SELECT grp AS label, k_idx, CAST(vec_id AS BIGINT) AS vec_id, " +
        s"${snapSql("dist_sq", 6)} AS dist_sq FROM ($unionAll) " +
        "ORDER BY label, k_idx")
  }

  /** Dedup × quality ablation replay (q362): per-doc fold-dedup and
    * quality flags (the q327 fragments as FLAGS instead of filters),
    * crossed with the four on/off variants, conditional doc/token
    * sums — always exactly four rows.
    */
  def q362AblationGrid: String =
    withClause(Seq(
      s"f AS (SELECT doc_id, $FoldedFpSql AS fp FROM documents)",
      "cn AS (SELECT fp, min(doc_id) AS canonical_id FROM f " +
        "WHERE fp IS NOT NULL GROUP BY fp)",
      "dfl AS (SELECT f.doc_id, (cn.canonical_id IS NULL OR " +
        "f.doc_id = cn.canonical_id) AS d FROM f LEFT JOIN cn " +
        "USING (fp))",
      s"qtk AS (SELECT doc_id, text, $Toks AS t FROM documents)",
      "qg AS (SELECT doc_id, text, len(t) AS n, " +
        "CAST(len(t) AS BIGINT) AS tk, " +
        "CASE WHEN len(t) >= 3 THEN list_transform(range(0, len(t) - 2), " +
        "i -> array_to_string(t[i + 1 : i + 3], ' ')) " +
        "ELSE [array_to_string(t, ' ')] END AS g3 FROM qtk)",
      "qfl AS (SELECT doc_id, tk, (n >= 30 AND n <= 10000 " +
        "AND CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3) " +
        "<= 0.05 AND CAST(length(text) - length(regexp_replace(text, " +
        "'[.,;:!?''\"()-]', '', 'g')) AS DOUBLE) <= n * 0.5) AS q " +
        "FROM qg)"),
      "SELECT v.dd AS dedup_on, v.qq AS quality_on, " +
        "CAST(sum(CASE WHEN (NOT v.dd OR d) AND (NOT v.qq OR q) " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_docs, " +
        "CAST(sum(CASE WHEN (NOT v.dd OR d) AND (NOT v.qq OR q) " +
        "THEN tk ELSE 0 END) AS BIGINT) AS n_tokens " +
        "FROM dfl JOIN qfl USING (doc_id) CROSS JOIN " +
        "(VALUES (false, false), (false, true), (true, false), " +
        "(true, true)) v(dd, qq) " +
        "GROUP BY v.dd, v.qq ORDER BY dedup_on, quality_on")

  /** Coreset coverage eval replay (q360): the q352 selection vs the
    * first-k-ids baseline, each point's min distance to its center
    * set (exact double min over the kmDist folds, snapped at 1e-6 —
    * [[graft.operators.Coreset.assignToCenters]]), then max / 1e-4
    * mean per method.
    */
  def q360CoresetCoverage(k: Int): String = {
    import graft.functions.Grid.snapSql
    def cov(name: String, centers: String) =
      s"$name AS (SELECT e.vec_id, " +
        snapSql(s"min(${kmDist("e.v", "s.v")})", 6) + " AS cd " +
        s"FROM e, $centers s GROUP BY e.vec_id)"
    withClause(kCenterCtes(k) ++ Seq(
      s"bl AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $k)",
      cov("ka", s"a${k - 1}"), cov("kb", "bl"),
      "un AS (SELECT 'kcenter' AS method, cd FROM ka " +
        "UNION ALL SELECT 'first_k' AS method, cd FROM kb)"),
      "SELECT method, CAST(count(*) AS BIGINT) AS n_points, " +
        "max(cd) AS max_cover, " +
        s"${snapSql("avg(cd)", 4)} AS mean_cover " +
        "FROM un GROUP BY method ORDER BY method")
  }

  /** The shared one-way ANOVA core replay ([[operators.Abtest
    * .anovaCore]]): exact HUGEINT moments to the bounded arm table,
    * the arm-ordered fold of s²/n, the operator's F tree. `src` must
    * emit `(arm, c)` with `c` already on the integer grid.
    */
  private def anovaCoreSql(src: String, ssDivisor: String)
      : Seq[String] = {
    import graft.functions.Grid.snapSql
    Seq(
      s"aa AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS sa, " +
        "CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS qa " +
        s"FROM $src GROUP BY 1)",
      "ff AS (SELECT CAST(count(*) AS BIGINT) AS k_arms, " +
        "CAST(sum(n) AS BIGINT) AS n_total, " +
        "CAST(sum(sa) AS HUGEINT) AS sS, " +
        "CAST(sum(qa) AS HUGEINT) AS qQ, " +
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list(CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / " +
        "CAST(n AS DOUBLE) ORDER BY arm)), (acc, x) -> acc + x) " +
        "AS sg FROM aa)",
      "xx AS (SELECT n_total, k_arms, " +
        "sg - CAST(sS AS DOUBLE) * CAST(sS AS DOUBLE) / " +
        "CAST(n_total AS DOUBLE) AS ssb, " +
        "CAST(qQ AS DOUBLE) - sg AS ssw FROM ff)",
      "res AS (SELECT n_total, k_arms, " +
        "k_arms - 1 AS df_between, " +
        "n_total - k_arms AS df_within, " +
        s"${snapSql("ssb", 4)} / $ssDivisor AS ss_between, " +
        s"${snapSql("ssw", 4)} / $ssDivisor AS ss_within, " +
        snapSql("CASE WHEN k_arms >= 2 AND " +
          "CAST(n_total - k_arms AS DOUBLE) > 0.0e0 AND " +
          "ssw > 0.0e0 THEN (ssb / CAST(k_arms - 1 AS DOUBLE)) / " +
          "(ssw / CAST(n_total - k_arms AS DOUBLE)) END", 4) +
        " AS f_stat, " +
        snapSql("CASE WHEN ssb + ssw > 0.0e0 " +
          "THEN ssb / (ssb + ssw) END", 6) + " AS eta_sq FROM xx)")
  }

  private val anovaSelect: String =
    "SELECT n_total, k_arms, df_between, df_within, ss_between, " +
      "ss_within, f_stat, eta_sq FROM res"

  /** One-way ANOVA replay (q367, [[operators.Abtest.anovaF]]): cent
    * grid, SS rescaled to y units by the same snapped-then-divided
    * program.
    */
  val q367AnovaF: String = withClause(
    Seq("bb AS (SELECT event_type AS arm, " +
      "CAST(floor(value * 100.0e0 + 0.5e0) AS BIGINT) AS c " +
      "FROM events WHERE value IS NOT NULL)") ++
      anovaCoreSql("bb", "10000.0e0"),
    anovaSelect)

  /** Brown–Forsythe replay (q368, [[operators.Abtest.brownForsythe]]):
    * per-arm doubled exact median, |2c − m2| deviations, the ANOVA
    * core on the doubled grid (no SS rescale — the operator's
    * contract).
    */
  val q368BrownForsythe: String = withClause(
    Seq("bb0 AS (SELECT event_type AS arm, event_id AS id, " +
      "CAST(floor(value * 100.0e0 + 0.5e0) AS BIGINT) AS c " +
      "FROM events WHERE value IS NOT NULL)",
      "rr AS (SELECT *, row_number() OVER (PARTITION BY arm " +
        "ORDER BY c, id) AS rn, " +
        "count(*) OVER (PARTITION BY arm) AS na FROM bb0)",
      "mm AS (SELECT arm, (CASE WHEN max(na) % 2 = 1 THEN 2 ELSE 1 " +
        "END) * CAST(sum(c) AS BIGINT) AS m2 FROM rr " +
        "WHERE rn = (na + 1) // 2 OR rn = (na + 2) // 2 GROUP BY arm)",
      "bb AS (SELECT bb0.arm, abs(bb0.c * 2 - mm.m2) AS c " +
        "FROM bb0 JOIN mm USING (arm))") ++
      anovaCoreSql("bb", "1.0e0"),
    anovaSelect)

  /** Friedman replay (q369, [[operators.Abtest.friedman]]): complete
    * blocks only, block-keyed doubled midranks, exact HUGEINT
    * quadratic sums, the Conover tie-adjusted χ² tree.
    */
  val q369Friedman: String = {
    import graft.functions.Grid.snapSql
    val num = "sumRsq - nd * nd * kd * (kd + 1.0e0) * (kd + 1.0e0) " +
      "/ 4.0e0"
    val den = "a2d - nd * kd * (kd + 1.0e0) * (kd + 1.0e0) / 4.0e0"
    val chi = s"(kd - 1.0e0) * ($num) / ($den)"
    withClause(Seq(
      "pu AS (SELECT * FROM (SELECT user_id AS b, " +
        "event_type AS arm, " +
        "CAST(sum(CAST(floor(value * 100.0e0 + 0.5e0) AS BIGINT)) " +
        "AS BIGINT) AS y FROM events GROUP BY 1, 2) " +
        "WHERE y IS NOT NULL)",
      "kk AS (SELECT CAST(count(DISTINCT arm) AS BIGINT) AS k_arms " +
        "FROM pu)",
      "cc AS (SELECT pu.*, kk.k_arms, " +
        "count(*) OVER (PARTITION BY b) AS kb FROM pu, kk)",
      "co AS (SELECT * FROM cc WHERE kb = k_arms)",
      "rr AS (SELECT *, row_number() OVER (PARTITION BY b " +
        "ORDER BY y, arm) AS rn FROM co)",
      "mm AS (SELECT *, min(rn) OVER (PARTITION BY b, y) + " +
        "max(rn) OVER (PARTITION BY b, y) AS r2 FROM rr)",
      "pa AS (SELECT k_arms, arm, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(r2 AS HUGEINT)) AS HUGEINT) AS rr2 " +
        "FROM mm GROUP BY 1, 2)",
      "fo AS (SELECT k_arms, CAST(max(n) AS BIGINT) AS n_blocks, " +
        "CAST(sum(rr2 * rr2) AS HUGEINT) AS sr2 FROM pa GROUP BY 1)",
      "cs AS (SELECT CAST(sum(CAST(r2 AS HUGEINT) * r2) AS HUGEINT) " +
        "AS a2 FROM mm)",
      "xx AS (SELECT n_blocks, k_arms, " +
        "CAST(k_arms AS DOUBLE) AS kd, " +
        "CAST(n_blocks AS DOUBLE) AS nd, " +
        "CAST(sr2 AS DOUBLE) / 4.0e0 AS sumRsq, " +
        "CAST(a2 AS DOUBLE) / 4.0e0 AS a2d FROM fo, cs)"),
      s"""SELECT n_blocks, k_arms, k_arms - 1 AS df,
         |  ${snapSql(s"CASE WHEN n_blocks > 0 AND ($den) > 0.0e0 " +
          s"THEN $chi END", 4)} AS chi2,
         |  ${snapSql(s"CASE WHEN n_blocks > 0 AND ($den) > 0.0e0 " +
          s"AND nd * (kd - 1.0e0) > 0.0e0 " +
          s"THEN ($chi) / (nd * (kd - 1.0e0)) END", 6)} AS kendall_w
         |FROM xx""".stripMargin)
  }

  /** The daily-revenue correlogram CTE chain shared by q370/q375/q376
    * ([[operators.Seasonal.autocorrelation]]'s replay): row-positioned
    * series, the ×n² integer-carried centered numerator per lag
    * (exact HUGEINT), snapped r's in `rt`.
    */
  private def acfCtes(maxLag: Int): Seq[String] = {
    import graft.functions.Grid.snapSql
    Seq(
      "se AS (SELECT day, CAST(floor(rev * 100.0e0 + 0.5e0) " +
        "AS BIGINT) AS y FROM (SELECT " +
        "date_diff('day', DATE '1992-01-01', " +
        "CAST(o_orderdate AS DATE)) AS day, " +
        "round(sum(o_totalprice), 2) AS rev FROM orders GROUP BY 1) " +
        "WHERE rev IS NOT NULL)",
      "ii AS (SELECT row_number() OVER (ORDER BY day) AS rn, y " +
        "FROM se)",
      "tt AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sS FROM ii)",
      s"ll AS (SELECT CAST(lag AS BIGINT) AS lag FROM " +
        s"range(0, ${maxLag + 1}) t(lag))",
      "pp AS (SELECT ll.lag, CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(CAST(a.y AS HUGEINT) * b.y) AS HUGEINT) AS pP, " +
        "CAST(sum(CAST(a.y AS HUGEINT)) AS HUGEINT) AS aA, " +
        "CAST(sum(CAST(b.y AS HUGEINT)) AS HUGEINT) AS bB " +
        "FROM ll CROSS JOIN ii a JOIN ii b ON b.rn = a.rn + ll.lag " +
        "GROUP BY 1)",
      "nn AS (SELECT pp.*, tt.n, tt.sS, " +
        "n * n * pP - n * sS * (aA + bB) + (n - lag) * sS * sS " +
        "AS num FROM pp, tt)",
      "n0 AS (SELECT num AS num0 FROM nn WHERE lag = 0)",
      "rt AS (SELECT lag, n_pairs, CAST(n AS DOUBLE) AS nd, " +
        snapSql("CASE WHEN num0 > 0 THEN CAST(num AS DOUBLE) / " +
          "CAST(num0 AS DOUBLE) END", 6) + " AS acf FROM nn, n0)")
  }

  /** Correlogram replay (q370): [[acfCtes]] + the snapped-r Ljung–Box
    * fold in lag order.
    */
  def q370AcfLjungbox(maxLag: Int): String = {
    import graft.functions.Grid.snapSql
    withClause(acfCtes(maxLag) ++ Seq(
      "ts AS (SELECT list(struct_pack(lag := lag, acf := acf) " +
        "ORDER BY lag) AS tl FROM rt)"),
      s"""SELECT lag, n_pairs, acf,
         |  ${snapSql("CASE WHEN lag >= 1 THEN nd * (nd + 2.0e0) * " +
          "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list_transform(list_filter(ts.tl, t -> t.lag >= 1 AND " +
          "t.lag <= rt.lag), t -> t.acf * t.acf / (nd - t.lag))), " +
          "(a, x) -> a + x) END", 4)} AS q_lb
         |FROM rt, ts ORDER BY lag""".stripMargin)
  }

  /** PACF replay (q375, [[operators.Seasonal.partialAutocorrelation]]):
    * the Durbin–Levinson recursion UNROLLED over the bounded lag
    * count — per round one pkk CTE (j-ascending inner-product folds, a
    * zero denominator nulls it) and one φ-vector update CTE, every φ
    * snapped at 6 exactly like the driver fold.
    */
  def q375Pacf(maxLag: Int): String = {
    import graft.functions.Grid.snapSql
    val dl = (1 to maxLag).flatMap { k =>
      if (k == 1) Seq(
        s"e1 AS (SELECT r, ${snapSql("r[1]", 6)} AS pkk FROM ph0)",
        "d1 AS (SELECT r, [pkk] AS phi FROM e1)")
      else {
        val num = s"r[$k] - list_reduce(list_prepend(" +
          s"CAST(0.0 AS DOUBLE), list_transform(range(1, $k), " +
          s"j -> phi[j] * r[$k - j])), (a, x) -> a + x)"
        val den = "1.0e0 - list_reduce(list_prepend(" +
          s"CAST(0.0 AS DOUBLE), list_transform(range(1, $k), " +
          "j -> phi[j] * r[j])), (a, x) -> a + x)"
        Seq(
          s"e$k AS (SELECT r, phi, CASE WHEN ($den) = 0.0e0 " +
            s"THEN NULL ELSE ${snapSql(s"($num) / ($den)", 6)} END " +
            s"AS pkk FROM d${k - 1})",
          s"d$k AS (SELECT r, list_append(list_transform(phi, " +
            s"(x, j) -> ${snapSql(s"x - pkk * phi[$k - j]", 6)}), " +
            s"pkk) AS phi, pkk FROM e$k)")
      }
    }
    val union = (1 to maxLag).map(k =>
      s"SELECT CAST($k AS BIGINT) AS lag, " +
        s"(SELECT pkk FROM e$k) AS pacf")
      .mkString(" UNION ALL ")
    withClause(acfCtes(maxLag) ++ Seq(
      "ph0 AS (SELECT list(acf ORDER BY lag) AS r FROM rt " +
        "WHERE lag >= 1)") ++ dl ++ Seq(s"uu AS ($union)"),
      "SELECT rt.lag, rt.acf, uu.pacf FROM rt JOIN uu " +
        "ON uu.lag = rt.lag ORDER BY rt.lag")
  }

  /** Runs-test replay (q376, [[operators.Seasonal.runsTest]]): exact
    * doubled median over the positioned series, median ties dropped,
    * runs = 1 + sign changes via the rn+1 pair join, exact-long
    * moments into the z tree.
    */
  val q376RunsTest: String = {
    import graft.functions.Grid.snapSql
    val mu = "CAST(twoab AS DOUBLE) / nd + 1.0e0"
    val sig2 = "CAST(twoab AS DOUBLE) * CAST(twoab - n AS DOUBLE) / " +
      "(nd * nd * (nd - 1.0e0))"
    withClause(Seq(
      "se AS (SELECT day, CAST(floor(rev * 100.0e0 + 0.5e0) " +
        "AS BIGINT) AS y FROM (SELECT " +
        "date_diff('day', DATE '1992-01-01', " +
        "CAST(o_orderdate AS DATE)) AS day, " +
        "round(sum(o_totalprice), 2) AS rev FROM orders GROUP BY 1) " +
        "WHERE rev IS NOT NULL)",
      "tv AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM se)",
      "rv AS (SELECT se.*, row_number() OVER (ORDER BY y, day) " +
        "AS rvn FROM se)",
      "mm AS (SELECT (CASE WHEN max(nv) % 2 = 1 THEN 2 ELSE 1 END) " +
        "* CAST(sum(y) AS BIGINT) AS m2 FROM rv, tv " +
        "WHERE rvn = (nv + 1) // 2 OR rvn = (nv + 2) // 2)",
      "sg AS (SELECT day, CASE WHEN y * 2 > m2 THEN 1 ELSE 0 END " +
        "AS s FROM se, mm WHERE y * 2 <> m2)",
      "sq AS (SELECT *, row_number() OVER (ORDER BY day) AS rn " +
        "FROM sg)",
      "ch AS (SELECT CAST(coalesce(sum(CASE WHEN a.s <> b.s THEN 1 " +
        "ELSE 0 END), 0) AS BIGINT) AS c FROM sq a " +
        "JOIN sq b ON b.rn = a.rn + 1)",
      "cn AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(coalesce(sum(s), 0) AS BIGINT) AS n_above FROM sg)",
      "xx AS (SELECT n, n_above, n - n_above AS n_below, " +
        "CASE WHEN n > 0 THEN c + 1 ELSE 0 END AS runs, " +
        "2 * n_above * (n - n_above) AS twoab, " +
        "CAST(n AS DOUBLE) AS nd FROM cn, ch)"),
      s"""SELECT n, n_above, n_below, runs,
         |  ${snapSql("CASE WHEN n_above > 0 AND n_below > 0 AND " +
          s"n >= 2 THEN (CAST(runs AS DOUBLE) - ($mu)) / " +
          s"sqrt($sig2) END", 4)} AS z
         |FROM xx""".stripMargin)
  }

  /** Matryoshka recall replay (q377, [[operators.Similarity
    * .matryoshkaRecall]]): per width the truncated-cosine folds
    * (j-ascending, mirroring the zip_with/aggregate program), snapped
    * before ranking, per-(query, width) row_number top-k, exact
    * hit-count recall.
    */
  def q377Matryoshka(k: Int, full: Int): String = {
    import graft.functions.Grid.snapSql
    def fold(a: String, b: String) = "list_reduce(list_prepend(" +
      "CAST(0.0 AS DOUBLE), list_transform(range(d), " +
      s"i -> CAST($a[i + 1] AS DOUBLE) * CAST($b[i + 1] AS DOUBLE)))" +
      ", (acc, x) -> acc + x)"
    withClause(Seq(
      "qs AS (SELECT vec_id AS qid, embedding AS q_emb " +
        "FROM embeddings WHERE vec_id % 100 = 7)",
      "pr AS (SELECT e.vec_id AS nid, q.qid, e.embedding AS v, " +
        "q.q_emb, t.d FROM embeddings e, qs q, " +
        "unnest([8, 16, 32, 64]) t(d) WHERE e.vec_id <> q.qid)",
      s"cf AS (SELECT qid, nid, d, ${fold("v", "q_emb")} AS dd, " +
        s"sqrt(${fold("v", "v")}) AS na, " +
        s"sqrt(${fold("q_emb", "q_emb")}) AS nb FROM pr)",
      "cs AS (SELECT qid, nid, d, " +
        snapSql("CASE WHEN na * nb = 0.0e0 THEN 0.0e0 " +
          "ELSE dd / (na * nb) END", 6) + " AS cos FROM cf)",
      "rk AS (SELECT *, row_number() OVER (PARTITION BY qid, d " +
        s"ORDER BY cos DESC, nid) AS rn FROM cs QUALIFY rn <= $k)",
      s"gt AS (SELECT qid, nid FROM rk WHERE d = $full)",
      "gtc AS (SELECT qid, CAST(count(*) AS BIGINT) AS gtn " +
        "FROM gt GROUP BY 1)",
      "ht AS (SELECT qid, d, CAST(count(*) AS BIGINT) AS hits " +
        "FROM rk JOIN gt USING (qid, nid) GROUP BY 1, 2)",
      "qd AS (SELECT qid, d FROM qs, unnest([8, 16, 32, 64]) t(d))",
      // per-query recall as an exact 1e-6-grid integer (the operator's
      // nano device): zero-hit widths survive via the LEFT join, the
      // denominator is the ACTUAL per-query ground-truth size
      "pq AS (SELECT qd.d, CAST(floor(1000000.0e0 * " +
        "CAST(COALESCE(ht.hits, 0) AS DOUBLE) / " +
        "CAST(gtc.gtn AS DOUBLE) + 0.5e0) AS BIGINT) AS nano " +
        "FROM qd LEFT JOIN ht ON ht.qid = qd.qid AND ht.d = qd.d " +
        "LEFT JOIN gtc ON gtc.qid = qd.qid)",
      "sm AS (SELECT d, CAST(sum(nano) AS BIGINT) AS sn FROM pq " +
        "GROUP BY 1)",
      "nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM qs)"),
      s"""SELECT d, n_queries,
         |  ${snapSql("CAST(sn AS DOUBLE) / (1000000.0e0 * " +
          "CAST(n_queries AS DOUBLE))", 6)} AS mean_recall
         |FROM sm, nq ORDER BY d""".stripMargin)
  }

  /** Holm step-down replay (q378, [[operators.Multiplicity
    * .holmBonferroni]]): the q248 z/p chain, ranks by (p, grp), the
    * first-failure rank as a window max — rejections strictly below
    * it.
    */
  def q378Holm(alphaPct: Int): String = {
    import graft.functions.Grid.snapSql
    withClause(Seq(
      "u AS (SELECT c.c_mktsegment AS grp, " +
        "CAST(o.o_custkey % 2 AS VARCHAR) AS arm, " +
        "o.o_totalprice + CASE WHEN c.c_mktsegment = 'BUILDING' " +
        "AND o.o_custkey % 2 = 1 THEN 2000.0e0 ELSE 0.0e0 END AS y " +
        "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)",
      "ag AS (SELECT grp, arm, CAST(count(*) AS BIGINT) AS n, " +
        "sum(y) AS sy, sum(y * y) AS syy FROM u GROUP BY 1, 2)",
      "st AS (SELECT grp, arm, n, sy / CAST(n AS DOUBLE) AS m, " +
        "((syy - sy * sy / CAST(n AS DOUBLE)) / " +
        "(CAST(n AS DOUBLE) - 1)) / CAST(n AS DOUBLE) AS s FROM ag)",
      "zt AS (SELECT a.grp, a.n AS n_a, b.n AS n_b, " +
        "round(a.m - b.m, 4) AS diff, " +
        "round((a.m - b.m) / sqrt(a.s + b.s), 4) AS z " +
        "FROM st a JOIN st b ON a.grp = b.grp " +
        "AND a.arm = '0' AND b.arm = '1')",
      "pv AS (SELECT grp, n_a, n_b, diff, z, " +
        "round(least(1.0e0, 2.0e0 * " +
        "(exp(-0.5e0 * abs(z) * abs(z)) * 0.3989422804014327e0) * " +
        "((1.0e0 / (1.0e0 + 0.2316419e0 * abs(z))) * " +
        "(0.319381530e0 + (1.0e0 / (1.0e0 + 0.2316419e0 * abs(z))) " +
        "* (-0.356563782e0 + (1.0e0 / (1.0e0 + 0.2316419e0 * " +
        "abs(z))) * (1.781477937e0 + (1.0e0 / (1.0e0 + " +
        "0.2316419e0 * abs(z))) * (-1.821255978e0 + " +
        "(1.0e0 / (1.0e0 + 0.2316419e0 * abs(z))) * " +
        "1.330274429e0)))))), 6) AS p FROM zt)",
      "rk AS (SELECT *, CAST(row_number() OVER (ORDER BY p, grp) " +
        "AS INTEGER) AS rank, " +
        "CAST(count(*) OVER () AS BIGINT) AS m FROM pv " +
        "WHERE p IS NOT NULL)",
      s"th AS (SELECT *, ${snapSql(s"$alphaPct / (100.0e0 * " +
        "CAST(m - rank + 1 AS DOUBLE))", 6)} AS holm_threshold " +
        "FROM rk)",
      "kf AS (SELECT *, min(CASE WHEN p > holm_threshold THEN rank " +
        "END) OVER () AS kfail FROM th)"),
      "SELECT grp AS segment, n_a, n_b, diff, z, p, rank, " +
        "holm_threshold, kfail IS NULL OR rank < kfail AS rejected " +
        "FROM kf UNION ALL " +
        "SELECT grp, n_a, n_b, diff, z, p, CAST(NULL AS INTEGER), " +
        "CAST(NULL AS DOUBLE), false FROM pv WHERE p IS NULL " +
        "ORDER BY rank NULLS LAST")
  }

  /** Image quality replay (q371, [[operators.Multimodal
    * .imageQualityStats]]): the q235 lossless-PNG pixel device, exact
    * integer moments for brightness/contrast, the 4-neighbor
    * Laplacian over the 6×6 interior for sharpness.
    */
  val q371ImageQuality: String = {
    import graft.functions.Grid.snapSql
    withClause(Seq(
      "px AS (SELECT vec_id AS media_id, i, " +
        "CAST(greatest(0, least(255, floor((CAST(embedding[i+1] " +
        "AS DOUBLE) + 1.0) * 127.5))) AS BIGINT) AS p " +
        "FROM embeddings, range(64) t(i))",
      "gg AS (SELECT media_id, CAST(sum(p) AS BIGINT) AS sv, " +
        "CAST(sum(p * p) AS BIGINT) AS svv FROM px GROUP BY 1)",
      "lap AS (SELECT c.media_id, " +
        "4 * c.p - pw.p - pe.p - pn.p - ps.p AS l FROM px c " +
        "JOIN px pw ON pw.media_id = c.media_id AND pw.i = c.i - 1 " +
        "JOIN px pe ON pe.media_id = c.media_id AND pe.i = c.i + 1 " +
        "JOIN px pn ON pn.media_id = c.media_id AND pn.i = c.i - 8 " +
        "JOIN px ps ON ps.media_id = c.media_id AND ps.i = c.i + 8 " +
        "WHERE c.i % 8 BETWEEN 1 AND 6 AND c.i // 8 BETWEEN 1 AND 6)",
      "ls AS (SELECT media_id, CAST(sum(l) AS BIGINT) AS sl, " +
        "CAST(sum(l * l) AS BIGINT) AS sll FROM lap GROUP BY 1)"),
      s"""SELECT gg.media_id,
         |  ${snapSql("CAST(sv AS DOUBLE) / 64.0e0", 4)} AS brightness,
         |  ${snapSql("(64.0e0 * CAST(svv AS DOUBLE) - " +
          "CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) / 4096.0e0", 4)}
         |    AS contrast_var,
         |  ${snapSql("(36.0e0 * CAST(sll AS DOUBLE) - " +
          "CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)) / 1296.0e0", 4)}
         |    AS sharpness
         |FROM gg JOIN ls USING (media_id) ORDER BY media_id""".stripMargin)
  }

  /** The q372/q379/q382 web-URL synth (mirrors `SparkEntry.webUrls`):
    * `src` must provide (doc_id, ...); emits `rw(doc_id, url, ...)`.
    */
  private def urlSynthCtes(src: String, carry: String = ""): Seq[String] =
    Seq(
      s"uu AS (SELECT *, doc_id // 3 AS base FROM $src)",
      s"rw AS (SELECT doc_id$carry, CASE " +
        "WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.host' || " +
        "CAST(base % 7 AS VARCHAR) " +
        "|| '.example.org:443/docs/' || CAST(base AS VARCHAR) " +
        "|| '/?b=2&utm_source=feed&a=1' " +
        "WHEN doc_id % 3 = 1 THEN 'https://host' || " +
        "CAST(base % 7 AS VARCHAR) " +
        "|| '.example.org/docs/' || CAST(base AS VARCHAR) " +
        "|| '?a=1&fbclid=x' " +
        "|| CAST(doc_id AS VARCHAR) || '&b=2' " +
        "ELSE 'https://host' || CAST(base % 7 AS VARCHAR) || " +
        "'.example.org/docs/' " +
        "|| CAST(base AS VARCHAR) || '/?b=2&a=1#frag-' || " +
        "CAST(doc_id AS VARCHAR) END AS url FROM uu)")

  /** [[graft.functions.Urls.canonicalize]] as DuckDB CTEs over `rw`:
    * emits `cn(doc_id, url, canonical_url, ...)` — the identical
    * regex + list program, function for function.
    */
  private def urlCanonCtes(carry: String = ""): Seq[String] = {
    val tracking = graft.functions.Urls.trackingParams
      .map(p => s"'$p'").mkString(", ")
    // percent normalization mirror ([[graft.functions.Urls
    // .normalizePercent]]): split on '%', every piece after the
    // first re-folds its triplet (uppercase hex; unreserved bytes
    // decode) or re-attaches its '%' untouched
    val hex = "upper(substr(p, 1, 2))"
    val code = "((strpos('0123456789ABCDEF', " +
      s"substr($hex, 1, 1)) - 1) * 16 + " +
      s"strpos('0123456789ABCDEF', substr($hex, 2, 1)) - 1)"
    val unres = s"($code BETWEEN 48 AND 57 OR $code BETWEEN 65 AND " +
      s"90 OR $code BETWEEN 97 AND 122 OR $code IN (45, 46, 95, 126))"
    Seq(
      s"p00 AS (SELECT doc_id$carry, url, string_split(" +
        "regexp_extract(url, '^([^#]*)', 1), '%') AS pp FROM rw)",
      // coalesce: DuckDB's array_to_string over an EMPTY list (a
      // URL with no '%') is NULL where Spark's array_join is ''
      s"pn AS (SELECT doc_id$carry, url, pp[1] || " +
        "coalesce(array_to_string(" +
        "list_transform(pp[2:], p -> CASE " +
        "WHEN NOT regexp_matches(substr(p, 1, 2), " +
        "'^[0-9A-Fa-f]{2}$') THEN '%' || p " +
        s"WHEN $unres THEN chr(CAST($code AS INTEGER)) " +
        "|| substr(p, 3) " +
        s"ELSE '%' || $hex || substr(p, 3) END), ''), '') AS u " +
        "FROM p00)",
      s"p1 AS (SELECT doc_id$carry, url, " +
        "lower(regexp_extract(u, '^([^:/?#]+)://', 1)) AS scheme, " +
        "lower(regexp_extract(u, '^[^:/?#]+://([^/?#]*)', 1)) " +
        "AS hostport, " +
        "regexp_extract(u, '^[^:/?#]+://[^/?#]*([^?#]*)', 1) " +
        "AS raw_path, " +
        "regexp_extract(u, '\\?([^#]*)', 1) AS raw_q FROM pn)",
      // dot-segment resolution ([[graft.functions.Urls
      // .resolveDotSegments]]): the identical string-buffer fold —
      // DuckDB's list_reduce seeded with the '' root via
      // list_prepend mirrors Spark's aggregate('' init) — '.'
      // keeps, '..' pops (incl. an empty segment), else appends
      "p2 AS (SELECT *, " +
        "regexp_replace(regexp_extract(hostport, '^([^:]*)', 1), " +
        "'^www\\.', '') AS host, " +
        "regexp_extract(hostport, ':([0-9]+)$', 1) AS port, " +
        "regexp_replace(list_reduce(" +
        "list_prepend('', string_split(raw_path, '/')[2:]), " +
        "(acc, s) -> CASE WHEN s = '.' THEN acc " +
        "WHEN s = '..' THEN regexp_replace(acc, '/[^/]*$', '') " +
        "ELSE acc || '/' || s END), '/+$', '') AS pstrip FROM p1)",
      "p3 AS (SELECT *, " +
        "port <> '' AND NOT (scheme = 'http' AND port = '80') " +
        "AND NOT (scheme = 'https' AND port = '443') AS keep_port, " +
        "CASE WHEN pstrip = '' THEN '/' ELSE pstrip END AS path, " +
        "array_to_string(list_sort(list_filter(" +
        "string_split(raw_q, '&'), q -> length(q) > 0 " +
        "AND NOT starts_with(regexp_extract(q, '^([^=]*)', 1), " +
        s"'utm_') AND regexp_extract(q, '^([^=]*)', 1) NOT IN " +
        s"($tracking))), '&') AS qs FROM p2)",
      s"cn AS (SELECT doc_id$carry, url, CASE WHEN scheme = '' " +
        "THEN NULL " +
        "ELSE scheme || '://' || host || " +
        "(CASE WHEN keep_port THEN ':' || port ELSE '' END) || " +
        "path || (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END) " +
        "END AS canonical_url FROM p3)")
  }

  /** URL dedup replay (q372): synth + canonicalization + one hash
    * aggregation on the derived key.
    */
  val q372UrlDedup: String =
    withClause(urlSynthCtes("documents") ++ urlCanonCtes(),
      "SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(count(DISTINCT url) AS BIGINT) AS n_raw, " +
        "min(doc_id) AS canonical_doc " +
        "FROM cn GROUP BY 1 ORDER BY canonical_url")

  /** Incremental URL dedup replay (q379, [[operators.UrlDedup]]):
    * corpus-side index of canonical URLs, delta probed with one left
    * join — unparseable (NULL) keys never index and never match.
    */
  val q379IncrementalUrl: String =
    withClause(urlSynthCtes("documents") ++ urlCanonCtes() ++ Seq(
      "ix AS (SELECT canonical_url AS curl, min(doc_id) AS matched_id " +
        "FROM cn WHERE doc_id < 300 AND canonical_url IS NOT NULL " +
        "GROUP BY 1)",
      "dl AS (SELECT doc_id, canonical_url FROM cn " +
        "WHERE doc_id >= 300)"),
      "SELECT dl.doc_id, dl.canonical_url, " +
        "ix.matched_id IS NOT NULL AS is_dup, ix.matched_id " +
        "FROM dl LEFT JOIN ix ON dl.canonical_url = ix.curl " +
        "ORDER BY dl.doc_id")

  /** Percent-normalization dedup replay (q390): the five-variant
    * synth (%7E/%7e/~ spellings, fragment-with-'?', query decode +
    * reserved case fold), then the SAME canonicalization CTE chain —
    * the percent mirror sits inside [[urlCanonCtes]] for every URL
    * oracle alike.
    */
  val q390UrlPercent: String =
    withClause(Seq(
      "uu AS (SELECT doc_id, doc_id // 5 AS base FROM documents)",
      "rw AS (SELECT doc_id, 'https://host' || " +
        "CAST(base % 7 AS VARCHAR) || '.example.org' || " +
        "CASE doc_id % 5 " +
        "WHEN 0 THEN '/%7Euser' || CAST(base AS VARCHAR) || '/docs' " +
        "WHEN 1 THEN '/~user' || CAST(base AS VARCHAR) || '/docs' " +
        "WHEN 2 THEN '/%7euser' || CAST(base AS VARCHAR) || '/docs' " +
        "WHEN 3 THEN '/~user' || CAST(base AS VARCHAR) || " +
        "'/docs#sec?x=' || CAST(doc_id AS VARCHAR) " +
        "ELSE '/~user' || CAST(base AS VARCHAR) || " +
        "'/docs?x=%41%2f&utm_source=z' END AS url FROM uu)") ++
      urlCanonCtes(),
      "SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(count(DISTINCT url) AS BIGINT) AS n_raw, " +
        "min(doc_id) AS canonical_doc " +
        "FROM cn GROUP BY 1 ORDER BY canonical_url")

  /** Dot-segment dedup replay (q398): the five-variant synth
    * (plain, `/./`, `/tmp/../`, leading `/..`, `%2E`-encoded dot +
    * trailing slash), then the SAME canonicalization CTE chain —
    * the list_reduce resolution mirror sits inside [[urlCanonCtes]]
    * for every URL oracle alike.
    */
  val q398UrlDotSegments: String =
    withClause(Seq(
      "uu AS (SELECT doc_id, doc_id // 5 AS base FROM documents)",
      "rw AS (SELECT doc_id, 'https://host' || " +
        "CAST(base % 7 AS VARCHAR) || '.example.org' || " +
        "CASE doc_id % 5 " +
        "WHEN 0 THEN '/docs/' || CAST(base AS VARCHAR) || '/page' " +
        "WHEN 1 THEN '/docs/./' || CAST(base AS VARCHAR) || '/page' " +
        "WHEN 2 THEN '/docs/tmp/../' || CAST(base AS VARCHAR) " +
        "|| '/page' " +
        "WHEN 3 THEN '/../docs/' || CAST(base AS VARCHAR) " +
        "|| '/page' " +
        "ELSE '/docs/%2E/' || CAST(base AS VARCHAR) || '/page/' " +
        "END AS url FROM uu)") ++
      urlCanonCtes(),
      "SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(count(DISTINCT url) AS BIGINT) AS n_raw, " +
        "min(doc_id) AS canonical_doc " +
        "FROM cn GROUP BY 1 ORDER BY canonical_url")

  /** The A&S 26.2.17 two-sided normal p as SQL text over a z column
    * expression — [[operators.Multiplicity.normalTwoSidedP]]'s
    * polynomial verbatim (the q248 fragment).
    */
  private def normalPSql(z: String): String =
    s"round(least(1.0e0, 2.0e0 * " +
      s"(exp(-0.5e0 * abs($z) * abs($z)) * 0.3989422804014327e0) * " +
      s"((1.0e0 / (1.0e0 + 0.2316419e0 * abs($z))) * " +
      s"(0.319381530e0 + (1.0e0 / (1.0e0 + 0.2316419e0 * abs($z))) " +
      s"* (-0.356563782e0 + (1.0e0 / (1.0e0 + 0.2316419e0 * " +
      s"abs($z))) * (1.781477937e0 + (1.0e0 / (1.0e0 + " +
      s"0.2316419e0 * abs($z))) * (-1.821255978e0 + " +
      s"(1.0e0 / (1.0e0 + 0.2316419e0 * abs($z))) * " +
      s"1.330274429e0)))))), 6)"

  /** The exact cent-grid per-arm moment CTEs shared by the Welch
    * family replays (q380/q381): `mo(arm, n, m, v)`.
    */
  private val welchMomentCtes: Seq[String] = Seq(
    "bb AS (SELECT event_type AS arm, " +
      "CAST(floor(value * 100.0e0 + 0.5e0) AS BIGINT) AS c " +
      "FROM events WHERE value IS NOT NULL)",
    "aa AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS s, " +
      "CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q " +
      "FROM bb GROUP BY 1)",
    "mo AS (SELECT arm, n, " +
      "CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m, " +
      "(CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / " +
      "CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0e0) AS v " +
      "FROM aa)")

  /** Pairwise Welch + Holm replay (q380, [[operators.Abtest
    * .pairwiseWelch]] + [[operators.Multiplicity.holmBonferroni]]).
    */
  def q380PairwisePosthoc(alphaPct: Int): String = {
    import graft.functions.Grid.snapSql
    withClause(welchMomentCtes ++ Seq(
      "pw AS (SELECT a.arm || '|' || b.arm AS pair, " +
        "a.arm AS arm_a, b.arm AS arm_b, a.n AS n_a, b.n AS n_b, " +
        snapSql("(a.m - b.m) / 100.0e0", 4) + " AS diff, " +
        "CASE WHEN a.n >= 2 AND b.n >= 2 AND " +
        "a.v / CAST(a.n AS DOUBLE) + b.v / CAST(b.n AS DOUBLE) " +
        "> 0.0e0 THEN round((a.m - b.m) / " +
        "sqrt(a.v / CAST(a.n AS DOUBLE) + b.v / CAST(b.n AS DOUBLE))" +
        ", 4) END AS z FROM mo a JOIN mo b ON a.arm < b.arm)",
      s"pv AS (SELECT *, ${normalPSql("z")} AS p FROM pw)",
      "rk AS (SELECT *, CAST(row_number() OVER (ORDER BY p, pair) " +
        "AS INTEGER) AS rank, " +
        "CAST(count(*) OVER () AS BIGINT) AS m FROM pv " +
        "WHERE p IS NOT NULL)",
      s"th AS (SELECT *, ${snapSql(s"$alphaPct / (100.0e0 * " +
        "CAST(m - rank + 1 AS DOUBLE))", 6)} AS holm_threshold " +
        "FROM rk)",
      "kf AS (SELECT *, min(CASE WHEN p > holm_threshold THEN rank " +
        "END) OVER () AS kfail FROM th)"),
      "SELECT pair, arm_a, arm_b, n_a, n_b, diff, z, p, rank, " +
        "holm_threshold, kfail IS NULL OR rank < kfail AS rejected " +
        "FROM kf UNION ALL " +
        "SELECT pair, arm_a, arm_b, n_a, n_b, diff, z, p, " +
        "CAST(NULL AS INTEGER), CAST(NULL AS DOUBLE), false " +
        "FROM pv WHERE p IS NULL ORDER BY rank NULLS LAST")
  }

  /** Welch ANOVA replay (q381, [[operators.Abtest.welchAnova]]): the
    * moment CTEs, then the four arm-ordered folds (W, weighted mean,
    * numerator, Λ) and the F-star and df2 tree with the degeneracy guard.
    */
  val q381WelchAnova: String = {
    import graft.functions.Grid.snapSql
    def fold(term: String) = "list_reduce(list_prepend(" +
      s"CAST(0.0 AS DOUBLE), list_transform(ml, x -> $term)), " +
      "(a, t) -> a + t)"
    withClause(welchMomentCtes ++ Seq(
      "onr AS (SELECT CAST(sum(n) AS BIGINT) AS n_total, " +
        "CAST(count(*) AS BIGINT) AS k_arms, " +
        "CAST(min(n) AS BIGINT) AS minn, " +
        "min(CASE WHEN n >= 2 THEN v END) AS minv, " +
        "list(struct_pack(arm := arm, nd := CAST(n AS DOUBLE), " +
        "m := m, v := v) ORDER BY arm) AS ml FROM mo)",
      s"w1 AS (SELECT *, ${fold("x.nd / x.v")} AS W, " +
        "CAST(k_arms AS DOUBLE) AS kd FROM onr)",
      s"w2 AS (SELECT *, ${fold("(x.nd / x.v) * x.m")} / W AS mb " +
        "FROM w1)",
      s"w3 AS (SELECT *, ${fold("(x.nd / x.v) * (x.m - mb) * " +
        "(x.m - mb)")} / (kd - 1.0e0) AS A, " +
        s"${fold("(1.0e0 - (x.nd / x.v) / W) * " +
          "(1.0e0 - (x.nd / x.v) / W) / (x.nd - 1.0e0)")} AS lam " +
        "FROM w2)",
      "w4 AS (SELECT *, k_arms >= 2 AND minn >= 2 AND " +
        "minv > 0.0e0 AND lam > 0.0e0 AS ok FROM w3)"),
      s"""SELECT n_total, k_arms, k_arms - 1 AS df1,
         |  ${snapSql("CASE WHEN ok THEN (kd * kd - 1.0e0) / " +
          "(3.0e0 * lam) END", 4)} AS df2,
         |  ${snapSql("CASE WHEN ok THEN A / (1.0e0 + 2.0e0 * " +
          "(kd - 2.0e0) / (kd * kd - 1.0e0) * lam) END", 4)} AS f_stat
         |FROM w4""".stripMargin)
  }

  /** Periodogram replay (q383, [[operators.Seasonal.periodogram]]):
    * the embedded twiddle tables, ×n integer centering, rn-ordered
    * per-frequency folds, the operator's power tree.
    */
  def q383Periodogram(nWindow: Int, maxFreq: Int): String = {
    import graft.functions.Grid.snapSql
    val cosL = graft.operators.Seasonal.duckLitArray(
      graft.operators.Seasonal.cosTable(nWindow))
    val sinL = graft.operators.Seasonal.duckLitArray(
      graft.operators.Seasonal.sinTable(nWindow))
    withClause(Seq(
      "se AS (SELECT day, CAST(floor(rev * 100.0e0 + 0.5e0) " +
        "AS BIGINT) AS y FROM (SELECT " +
        "date_diff('day', DATE '1992-01-01', " +
        "CAST(o_orderdate AS DATE)) AS day, " +
        "round(sum(o_totalprice), 2) AS rev FROM orders GROUP BY 1) " +
        "WHERE rev IS NOT NULL)",
      "ii AS (SELECT row_number() OVER (ORDER BY day) AS rn, y " +
        "FROM se)",
      s"wi AS (SELECT rn, y FROM ii WHERE rn <= $nWindow)",
      "tt AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(y) AS BIGINT) AS sS FROM wi)",
      s"cl AS (SELECT $cosL AS ct, $sinL AS st)",
      s"tm AS (SELECT k, rn, CAST(n * y - sS AS DOUBLE) AS yc, " +
        s"CAST((k * (rn - 1)) % $nWindow AS BIGINT) AS j, n " +
        s"FROM wi, tt, range(1, ${maxFreq + 1}) t(k))",
      "tr AS (SELECT k, n, rn, " +
        "yc * (SELECT ct FROM cl)[CAST(j + 1 AS INT)] AS tc, " +
        "yc * (SELECT st FROM cl)[CAST(j + 1 AS INT)] AS ts " +
        "FROM tm)",
      "fo AS (SELECT k, n, " +
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(list(struct_pack(rn := rn, tc := tc, " +
        "ts := ts) ORDER BY rn), x -> x.tc)), (a, v) -> a + v) " +
        "AS ca, " +
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(list(struct_pack(rn := rn, tc := tc, " +
        "ts := ts) ORDER BY rn), x -> x.ts)), (a, v) -> a + v) " +
        "AS cb FROM tr GROUP BY 1, 2)",
      "px AS (SELECT k, CAST(n AS DOUBLE) AS nd, " +
        "ca / (CAST(n AS DOUBLE) * 100.0e0) AS a, " +
        "cb / (CAST(n AS DOUBLE) * 100.0e0) AS b FROM fo)"),
      s"""SELECT CAST(k AS BIGINT) AS k,
         |  ${snapSql(s"$nWindow.0e0 / CAST(k AS DOUBLE)", 4)}
         |    AS period,
         |  ${snapSql("(a * a + b * b) * 2.0e0 / nd", 4)} AS power
         |FROM px ORDER BY k""".stripMargin)
  }

  /** Cochran's Q replay (q384, [[operators.Abtest.cochranQ]]): the
    * ≥2-events binary, bounded-arm grid completion, exact HUGEINT
    * quadratic sums, the ×k²-carried Q tree.
    */
  val q384CochranQ: String = {
    import graft.functions.Grid.snapSql
    withClause(Seq(
      "bx AS (SELECT user_id AS b, event_type AS arm, " +
        "CASE WHEN count(*) >= 2 THEN 1 ELSE 0 END AS x " +
        "FROM events GROUP BY 1, 2)",
      "al AS (SELECT DISTINCT arm FROM bx)",
      "blk AS (SELECT DISTINCT b FROM bx)",
      "fu AS (SELECT blk.b, al.arm, coalesce(bx.x, 0) AS x " +
        "FROM blk CROSS JOIN al LEFT JOIN bx USING (b, arm))",
      "rw AS (SELECT b, CAST(sum(x) AS BIGINT) AS r FROM fu " +
        "GROUP BY 1)",
      "rr AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks, " +
        "CAST(sum(CAST(r AS HUGEINT) * r) AS HUGEINT) AS sr2, " +
        "CAST(sum(CAST(r AS HUGEINT)) AS HUGEINT) AS tT FROM rw)",
      "cw AS (SELECT arm, CAST(sum(x) AS BIGINT) AS c FROM fu " +
        "GROUP BY 1)",
      "cc AS (SELECT CAST(count(*) AS BIGINT) AS k_arms, " +
        "list(struct_pack(arm := arm, c := c) ORDER BY arm) AS cl " +
        "FROM cw)",
      "xx AS (SELECT n_blocks, k_arms, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(cl, t -> CAST(k_arms * t.c - tT AS HUGEINT) " +
        "* (k_arms * t.c - tT))), (a, v) -> a + v) AS num, " +
        "CAST(k_arms AS HUGEINT) * (k_arms * tT - sr2) AS den " +
        "FROM rr, cc)"),
      s"""SELECT n_blocks, k_arms, k_arms - 1 AS df,
         |  ${snapSql("CASE WHEN den > 0 THEN " +
          "CAST(k_arms - 1 AS DOUBLE) * CAST(num AS DOUBLE) / " +
          "CAST(den AS DOUBLE) END", 4)} AS q_stat
         |FROM xx""".stripMargin)
  }

  /** Seasonal/trend strength replay (q385, [[operators.Seasonal
    * .strength]]): the q332 residual-register CTEs, then exact
    * HUGEINT moments on the register's own 1e-4 grids and the FPP3
    * strength trees.
    */
  val q385SeasonalStrength: String = {
    import graft.functions.Grid.snapSql
    def varOf(c: String) =
      s"(CAST(count(*) AS DOUBLE) * CAST(sum(CAST($c AS HUGEINT) * " +
        s"$c) AS DOUBLE) - CAST(sum(CAST($c AS HUGEINT)) AS DOUBLE) " +
        s"* CAST(sum(CAST($c AS HUGEINT)) AS DOUBLE)) / " +
        "(CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE) * " +
        "1.0e8)"
    withClause(Seq(
      "d AS (SELECT o_orderpriority AS k, " +
        "date_diff('day', DATE '1992-01-01', " +
        "CAST(o_orderdate AS DATE)) AS day, " +
        "round(sum(o_totalprice), 2) AS rev FROM orders " +
        "GROUP BY 1, 2)",
      "w AS (SELECT k, day, rev, " +
        "CAST(floor(rev * 100.0 + 0.5) AS BIGINT) AS c FROM d)",
      "t AS (SELECT k, day, rev, " +
        snapSql("CAST(sum(c) OVER win AS DOUBLE) / " +
          "(100.0 * count(*) OVER win)") + " AS trend FROM w " +
        "WINDOW win AS (PARTITION BY k ORDER BY day " +
        "RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING))",
      "sr AS (SELECT k, day % 7 AS slot, " +
        snapSql("avg(rev - trend)", 4) + " AS seasonal " +
        "FROM t GROUP BY 1, 2)",
      // the scaled-integer register: floor(x·1e4 + 0.5) on the
      // snapped resid reproduces the snap's own integer exactly
      // (floor(m/1e4·1e4 + 0.5) = m), so scaling the RAW expression
      // is the identical integer
      "r AS (SELECT t.k, " +
        s"CAST(floor(${snapSql("(t.rev - t.trend) - sr.seasonal",
          4)} * 1.0e4 + 0.5e0) AS BIGINT) AS r4, " +
        "CAST(floor(sr.seasonal * 1.0e4 + 0.5e0) AS BIGINT) AS s4, " +
        "CAST(floor(t.rev * 1.0e4 + 0.5e0) AS BIGINT) AS y4 " +
        "FROM t JOIN sr ON sr.k = t.k AND sr.slot = t.day % 7)",
      "r2 AS (SELECT k, r4, r4 + s4 AS sr4, y4 - s4 AS tr4 FROM r)",
      "m AS (SELECT k, CAST(count(*) AS BIGINT) AS n_points, " +
        s"${snapSql(varOf("r4"), 6)} AS var_resid, " +
        s"${snapSql(varOf("sr4"), 6)} AS var_detrended, " +
        s"${snapSql(varOf("tr4"), 6)} AS var_deseasonalized " +
        "FROM r2 GROUP BY k)"),
      s"""SELECT k AS o_orderpriority, n_points, var_resid,
         |  var_detrended, var_deseasonalized,
         |  ${snapSql("CASE WHEN var_detrended > 0.0e0 THEN " +
          "greatest(0.0e0, 1.0e0 - var_resid / var_detrended) " +
          "ELSE 0.0e0 END", 6)} AS strength_seasonal,
         |  ${snapSql("CASE WHEN var_deseasonalized > 0.0e0 THEN " +
          "greatest(0.0e0, 1.0e0 - var_resid / var_deseasonalized) " +
          "ELSE 0.0e0 END", 6)} AS strength_trend
         |FROM m ORDER BY o_orderpriority""".stripMargin)
  }

  /** Host reputation replay (q389): the synth + canonicalization
    * fragments, host regexp, exact counts and snapped shares.
    */
  val q389HostReputation: String = {
    import graft.functions.Grid.snapSql
    withClause(
      urlSynthCtes("documents", carry = ", text") ++
      urlCanonCtes(carry = ", text") ++ Seq(
      "hh AS (SELECT doc_id, canonical_url AS curl, " +
        "regexp_extract(canonical_url, '^[a-z]+://([^/:?#]+)', 1) " +
        s"AS host, CAST(len($Toks) AS BIGINT) AS tk FROM cn)"),
      s"""SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT curl) AS BIGINT) AS n_pages,
         |  CAST(sum(tk) AS BIGINT) AS n_tokens,
         |  ${snapSql("CAST(count(*) - count(DISTINCT curl) " +
          "AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)} AS dup_share,
         |  ${snapSql("CAST(sum(tk) AS DOUBLE) / " +
          "CAST(count(*) AS DOUBLE)", 4)} AS tokens_per_doc
         |FROM hh GROUP BY host ORDER BY host""".stripMargin)
  }

  /** Per-host cap replay (q405, [[operators.UrlDedup.capPerHost]]):
    * the synth + canonicalization fragments, host regexp, ONE rank
    * window with the identical (score desc, id asc) order.
    */
  val q405HostCap: String =
    withClause(
      urlSynthCtes("documents", carry = ", text") ++
      urlCanonCtes(carry = ", text") ++ Seq(
      "hh AS (SELECT doc_id, " +
        "regexp_extract(canonical_url, '^[a-z]+://([^/:?#]+)', 1) " +
        s"AS host, CAST(len($Toks) AS BIGINT) AS n_tokens FROM cn)",
      "rk AS (SELECT doc_id, host, n_tokens, " +
        "CAST(row_number() OVER (PARTITION BY host " +
        "ORDER BY n_tokens DESC, doc_id) AS INTEGER) AS host_rank " +
        "FROM hh)"),
      "SELECT doc_id, host, n_tokens, host_rank, " +
        "host_rank <= 10 AS is_kept FROM rk ORDER BY host, host_rank")

  /** Duplicated-line removal replay (q406,
    * [[operators.Boilerplate.removeDuplicatedLines]]): the synth
    * header/chunk/footer assembly, positional line explode (zipped
    * unnest), document frequency per line STRING, and the ordered
    * struct-list rebuild — the exact Spark device in list functions.
    */
  val q406LineDedup: String = {
    val hdr = "'subscribe to the newsletter variant ' || (doc_id % 3)"
    val ftr = "'copyright footer variant ' || (doc_id % 3)"
    withClause(Seq(
      s"tk0 AS (SELECT doc_id, lang, $Toks AS t FROM documents)",
      "ck AS (SELECT doc_id, lang, list_transform(range(0, " +
        "greatest(CAST(ceil(len(t) / 12.0) AS BIGINT), 1)), " +
        "i -> array_to_string(t[i * 12 + 1 : i * 12 + 12], ' ')) " +
        "AS chs FROM tk0)",
      s"ls AS (SELECT doc_id, lang, $hdr || chr(10) || " +
        "array_to_string(chs, chr(10)) || chr(10) || " +
        s"$ftr AS text FROM ck)",
      "sp AS (SELECT doc_id, lang, string_split(text, chr(10)) " +
        "AS lines FROM ls)",
      "ln AS (SELECT doc_id, unnest(range(len(lines))) AS pos, " +
        "unnest(lines) AS line FROM sp)",
      "df AS (SELECT line, count(DISTINCT doc_id) AS df FROM ln " +
        "GROUP BY 1)",
      "ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, " +
        "CAST(sum(CASE WHEN df > 5 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_removed, array_to_string(list_transform(list_filter(" +
        "list(struct_pack(p := pos, d := CASE WHEN df > 5 THEN 1 " +
        "ELSE 0 END, l := line) ORDER BY pos), x -> x.d = 0), " +
        "x -> x.l), chr(10)) AS clean_text FROM ln JOIN df " +
        "USING (line) GROUP BY doc_id)"),
      "SELECT sp.doc_id, sp.lang, n_lines, n_removed, clean_text " +
        "FROM sp JOIN ag USING (doc_id) ORDER BY doc_id")
  }

  /** Wasserstein-1 drift replay (q407,
    * [[operators.Divergence.wasserstein1By]]): the (group, value)
    * histogram, the bounded groups × values grid, keyed CDF windows,
    * and the HUGEINT step terms — `|c_g·n_rest − c_rest·n_g|·Δv`
    * summed exactly, one double division on the 1e-6 grid.
    */
  val q407Wasserstein: String = {
    import graft.functions.Grid.snapSql
    withClause(Seq(
      "dv AS (SELECT source AS g, " +
        s"CAST(len($Toks) AS BIGINT) AS v FROM documents)",
      "h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM dv " +
        "GROUP BY 1, 2)",
      "tv AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM h " +
        "GROUP BY 1)",
      "gs AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_g FROM h " +
        "GROUP BY 1)",
      "tt AS (SELECT CAST(sum(ct) AS BIGINT) AS n_all FROM tv)",
      "grid AS (SELECT gs.g, gs.n_g, tv.v, tv.ct, " +
        "coalesce(h.c, 0) AS c FROM gs CROSS JOIN tv " +
        "LEFT JOIN h ON h.g = gs.g AND h.v = tv.v)",
      "cum AS (SELECT g, n_g, v, sum(c) OVER w AS cc, " +
        "sum(ct) OVER w AS cct, lead(v) OVER w AS vn FROM grid " +
        "WINDOW w AS (PARTITION BY g ORDER BY v))",
      "sm AS (SELECT g, n_g, n_all, sum(CASE WHEN vn IS NULL THEN " +
        "CAST(0 AS HUGEINT) ELSE abs(CAST(cc AS HUGEINT) * " +
        "(n_all - n_g) - CAST(cct - cc AS HUGEINT) * n_g) * " +
        "(vn - v) END) AS num FROM cum CROSS JOIN tt " +
        "GROUP BY 1, 2, 3)"),
      s"""SELECT g AS source, n_g AS n_rows,
         |  ${snapSql("CASE WHEN n_all > n_g THEN " +
          "CAST(num AS DOUBLE) / (CAST(n_g AS DOUBLE) * " +
          "CAST(n_all - n_g AS DOUBLE)) END", 6)} AS w1_vs_rest
         |FROM sm ORDER BY source""".stripMargin)
  }

  /** Width-fold dedup replay (q408,
    * [[operators.CrossLingual.foldWidth]]): the synth pair via the
    * REVERSE translate of the same literal map, then both
    * fingerprints — scripted as-is and scripted-over-width-fold —
    * per planted pair.
    */
  val q408WidthFold: String = {
    val fw = operators.CrossLingual.WidthFrom
    val asc = operators.CrossLingual.WidthTo.replace("'", "''")
    withClause(Seq(
      "w0 AS (SELECT doc_id, doc_id // 2 AS pair_id, " +
        "'模型训练数据 gpu' || (doc_id // 2) || " +
        "' benchmark 2024 edition' AS t0 FROM documents)",
      "ws AS (SELECT pair_id, CASE WHEN doc_id % 2 = 1 THEN " +
        s"translate(t0, '$asc', '$fw') ELSE t0 END AS text FROM w0)",
      s"fp AS (SELECT pair_id, ${scriptedFpSqlOf("text")} AS fs, " +
        s"${scriptedFpSqlOf(s"translate(text, '$fw', '$asc')")} " +
        "AS fwk FROM ws)"),
      "SELECT pair_id, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(count(DISTINCT fs) AS BIGINT) AS n_keys_scripted, " +
        "CAST(count(DISTINCT fwk) AS BIGINT) AS n_keys_width " +
        "FROM fp GROUP BY 1 ORDER BY 1")
  }

  /** Invisible-character dedup replay (q411,
    * [[operators.CrossLingual.foldedFingerprintCanonical]]): the
    * dressed-twin synth (BOM + ZWSP + soft hyphen spelled as Scala
    * escapes, landing as raw chars in both engines' literals), the
    * width key, and the canonical key = scripted over
    * width-fold over the `[InvisibleClass]` deletion.
    */
  val q411InvisibleDedup: String = {
    val fw = operators.CrossLingual.WidthFrom
    val asc = operators.CrossLingual.WidthTo.replace("'", "''")
    val cls = operators.CrossLingual.InvisibleClass
    val dressed = "\ufeff数据清洗 data pipe\u200bline" +
      "\u0020clean\u00adup "
    val wideInner = s"translate(text, '$fw', '$asc')"
    val canonInner = s"translate(regexp_replace(text, '[$cls]', " +
      s"'', 'g'), '$fw', '$asc')"
    withClause(Seq(
      "iv AS (SELECT doc_id, doc_id // 2 AS pair_id, " +
        s"CASE WHEN doc_id % 2 = 1 THEN '$dressed' || (doc_id // 2) " +
        "ELSE '数据清洗 data pipeline cleanup ' || (doc_id // 2) END " +
        "AS text FROM documents)",
      s"fp AS (SELECT pair_id, ${scriptedFpSqlOf(wideInner)} AS fwk, " +
        s"${scriptedFpSqlOf(canonInner)} AS fck FROM iv)"),
      "SELECT pair_id, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(count(DISTINCT fwk) AS BIGINT) AS n_keys_wide, " +
        "CAST(count(DISTINCT fck) AS BIGINT) AS n_keys_canonical " +
        "FROM fp GROUP BY 1 ORDER BY 1")
  }

  /** Two-sample W1 replay (q412, [[operators.Divergence
    * .wasserstein1]]): en/de token-count histograms tagged as the two
    * groups of the q407 core — same grid, windows, HUGEINT terms —
    * read out at the 'p' row.
    */
  val q412W1TwoSample: String = {
    import graft.functions.Grid.snapSql
    withClause(Seq(
      s"pe AS (SELECT 'p' AS g, CAST(len($Toks) AS BIGINT) AS v " +
        "FROM documents WHERE lang = 'en')",
      s"qd AS (SELECT 'q' AS g, CAST(len($Toks) AS BIGINT) AS v " +
        "FROM documents WHERE lang = 'de')",
      "h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c " +
        "FROM (SELECT * FROM pe UNION ALL SELECT * FROM qd) " +
        "GROUP BY 1, 2)",
      "tv AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM h " +
        "GROUP BY 1)",
      "gs AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_g FROM h " +
        "GROUP BY 1)",
      "tt AS (SELECT CAST(sum(ct) AS BIGINT) AS n_all FROM tv)",
      "grid AS (SELECT gs.g, gs.n_g, tv.v, tv.ct, " +
        "coalesce(h.c, 0) AS c FROM gs CROSS JOIN tv " +
        "LEFT JOIN h ON h.g = gs.g AND h.v = tv.v)",
      "cum AS (SELECT g, n_g, v, sum(c) OVER w AS cc, " +
        "sum(ct) OVER w AS cct, lead(v) OVER w AS vn FROM grid " +
        "WINDOW w AS (PARTITION BY g ORDER BY v))",
      "sm AS (SELECT g, n_g, n_all, sum(CASE WHEN vn IS NULL THEN " +
        "CAST(0 AS HUGEINT) ELSE abs(CAST(cc AS HUGEINT) * " +
        "(n_all - n_g) - CAST(cct - cc AS HUGEINT) * n_g) * " +
        "(vn - v) END) AS num FROM cum CROSS JOIN tt " +
        "GROUP BY 1, 2, 3)"),
      s"""SELECT n_g AS n_p, n_all - n_g AS n_q,
         |  ${snapSql("CASE WHEN n_all > n_g THEN " +
          "CAST(num AS DOUBLE) / (CAST(n_g AS DOUBLE) * " +
          "CAST(n_all - n_g AS DOUBLE)) END", 6)} AS w1
         |FROM sm WHERE g = 'p'""".stripMargin)
  }

  /** Char-entropy replay (q413, [[operators.Robust.entropyProfile]]
    * at character grain): the spam plant, char explode, and the
    * identical `round(ln(n) − Σc·ln(c)/n, 4)` program — the q182
    * entropy mirror, one grain down.
    */
  val q413CharEntropy: String =
    withClause(Seq(
      "sx AS (SELECT doc_id, CASE WHEN doc_id % 10 = 0 THEN " +
        "'error ' || repeat('a', 150) ELSE text END AS text " +
        "FROM documents)",
      "ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c " +
        "FROM sx)",
      "ct AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS k " +
        "FROM ch GROUP BY 1, 2)",
      "ag AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n, " +
        "CAST(count(*) AS BIGINT) AS n_cats, " +
        "sum(CAST(k AS DOUBLE) * ln(CAST(k AS DOUBLE))) AS clc " +
        "FROM ct GROUP BY 1)"),
      """SELECT doc_id, n, n_cats,
        |  round(ln(CAST(n AS DOUBLE)) - clc / n, 4) AS entropy,
        |  CASE WHEN n_cats > 1 THEN
        |    round((ln(CAST(n AS DOUBLE)) - clc / n) /
        |      ln(CAST(n_cats AS DOUBLE)), 4)
        |  ELSE 0.0 END AS entropy_norm,
        |  (CASE WHEN n_cats > 1 THEN
        |    round((ln(CAST(n AS DOUBLE)) - clc / n) /
        |      ln(CAST(n_cats AS DOUBLE)), 4)
        |  ELSE 0.0 END) < 0.35 AS is_garbled
        |FROM ag ORDER BY doc_id""".stripMargin)

  /** Script-vs-label audit replay (q414,
    * [[operators.CrossLingual.scriptProfile]]): the removal-device
    * counts per class, snapped shares, the fixed-tie-order dominant
    * CASE, and the suspect verdict.
    */
  val q414ScriptMislabel: String = {
    import graft.functions.Grid.snapSql
    val han = operators.CrossLingual.UnsegmentedClass
    val cyr = operators.CrossLingual.CyrillicClass
    val thai = operators.CrossLingual.ShingledClass
    val arab = operators.CrossLingual.ArabicClass
    def cnt(cls: String): String =
      s"CAST(length(text) - length(regexp_replace(text, '[$cls]', " +
        "'', 'g')) AS BIGINT)"
    def share(c: String): String =
      s"CASE WHEN n_chars > 0 THEN ${snapSql(
        s"CAST($c AS DOUBLE) / CAST(n_chars AS DOUBLE)")} END"
    withClause(Seq(
      "pc AS (SELECT doc_id, lang, " +
        "CAST(length(text) AS BIGINT) AS n_chars, " +
        s"${cnt(han)} AS n_han, ${cnt("a-zA-Z")} AS n_latin, " +
        s"${cnt(cyr)} AS n_cyrillic, ${cnt(thai)} AS n_thai_family, " +
        s"${cnt(arab)} AS n_arabic FROM documents)",
      "sh AS (SELECT *, " +
        s"${share("n_han")} AS han_share, " +
        s"${share("n_latin")} AS latin_share, " +
        "CASE WHEN n_han >= n_latin AND n_han >= n_cyrillic AND " +
        "n_han >= n_thai_family AND n_han >= n_arabic AND n_han > 0 " +
        "THEN 'han' WHEN n_latin >= n_cyrillic AND " +
        "n_latin >= n_thai_family AND n_latin >= n_arabic AND " +
        "n_latin > 0 THEN 'latin' WHEN n_cyrillic >= n_thai_family " +
        "AND n_cyrillic >= n_arabic AND n_cyrillic > 0 THEN " +
        "'cyrillic' WHEN n_thai_family >= n_arabic AND " +
        "n_thai_family > 0 THEN 'thai' WHEN n_arabic > 0 THEN " +
        "'arabic' ELSE 'none' END AS dominant_script FROM pc)"),
      "SELECT doc_id, lang, n_chars, n_han, n_latin, n_cyrillic, " +
        "n_thai_family, n_arabic, han_share, latin_share, " +
        "dominant_script, (lang = 'zh' AND han_share < 0.2) OR " +
        "(lang IN ('en', 'de', 'fr', 'es') AND han_share > 0.5) " +
        "AS is_suspect FROM sh ORDER BY doc_id")
  }

  /** URL blocklist replay (q416,
    * [[operators.UrlDedup.applyBlocklist]]): the synth +
    * canonicalization fragments, host/path extraction, the VALUES
    * rule table, and the min-fold verdict.
    */
  val q416UrlBlocklist: String =
    withClause(
      urlSynthCtes("documents") ++ urlCanonCtes() ++ Seq(
      "bl AS (SELECT * FROM (VALUES ('host4.example.org', '/'), " +
        "('host2.example.org', '/docs/1')) t(host, path_prefix))",
      "hp AS (SELECT doc_id, canonical_url, " +
        "regexp_extract(canonical_url, '^[a-z]+://([^/:?#]+)', 1) " +
        "AS host, regexp_extract(canonical_url, " +
        "'^[a-z]+://[^/?#]*([^?#]*)', 1) AS path FROM cn)",
      "jn AS (SELECT hp.doc_id, hp.canonical_url, hp.host, " +
        "CASE WHEN bl.path_prefix IS NOT NULL AND " +
        "starts_with(hp.path, bl.path_prefix) THEN bl.path_prefix " +
        "END AS hit FROM hp LEFT JOIN bl USING (host))"),
      "SELECT doc_id, min(canonical_url) AS canonical_url, " +
        "min(host) AS host, min(hit) AS blocked_prefix, " +
        "min(hit) IS NOT NULL AS is_blocked FROM jn " +
        "GROUP BY doc_id ORDER BY doc_id")

  /** Per-host retention funnel replay (q409): the q382 chain at host
    * grain — URL canonical dedup → folded-fingerprint dedup → the
    * quality replay — closed with the q405 cap window at 5.
    */
  val q409HostRetention: String =
    withClause(
      urlSynthCtes("documents", carry = ", text") ++
      urlCanonCtes(carry = ", text") ++ Seq(
      "hh AS (SELECT doc_id, text, canonical_url, " +
        "regexp_extract(canonical_url, '^[a-z]+://([^/:?#]+)', 1) " +
        "AS host FROM cn)",
      "ix AS (SELECT canonical_url AS curl, min(doc_id) " +
        "AS matched_id FROM cn WHERE canonical_url IS NOT NULL " +
        "GROUP BY 1)",
      "au AS (SELECT hh.doc_id, hh.text, hh.host FROM hh " +
        "LEFT JOIN ix ON hh.canonical_url = ix.curl " +
        "WHERE ix.matched_id IS NULL OR hh.doc_id = ix.matched_id)",
      s"ff AS (SELECT doc_id, text, host, $FoldedFpSql AS fp FROM au)",
      "fc AS (SELECT fp, min(doc_id) AS fcanon FROM ff " +
        "WHERE fp IS NOT NULL GROUP BY 1)",
      "af AS (SELECT ff.doc_id, ff.text, ff.host FROM ff " +
        "LEFT JOIN fc USING (fp) " +
        "WHERE fc.fcanon IS NULL OR ff.doc_id = fc.fcanon)",
      s"qtk AS (SELECT doc_id, text, host, $Toks AS t FROM af)",
      "qg AS (SELECT doc_id, text, len(t) AS n, " +
        "CASE WHEN len(t) >= 3 THEN list_transform(range(0, " +
        "len(t) - 2), i -> array_to_string(t[i + 1 : i + 3], ' ')) " +
        "ELSE [array_to_string(t, ' ')] END AS g3 FROM qtk)",
      "qual AS (SELECT doc_id FROM qg WHERE n >= 30 AND n <= 10000 " +
        "AND CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / " +
        "len(g3) <= 0.05 AND CAST(length(text) - " +
        "length(regexp_replace(text, '[.,;:!?''\"()-]', '', 'g')) " +
        "AS DOUBLE) <= n * 0.5)",
      "kp AS (SELECT q.doc_id, q.host, CAST(len(q.t) AS BIGINT) " +
        "AS tk FROM qtk q JOIN qual USING (doc_id))",
      "rk AS (SELECT doc_id, host, tk, row_number() OVER " +
        "(PARTITION BY host ORDER BY tk DESC, doc_id) AS rn FROM kp)",
      "cp AS (SELECT host, CAST(count(*) AS BIGINT) AS n_capped, " +
        "CAST(sum(tk) AS BIGINT) AS tokens_capped FROM rk " +
        "WHERE rn <= 5 GROUP BY 1)",
      "c0 AS (SELECT host, CAST(count(*) AS BIGINT) AS n_raw " +
        "FROM hh GROUP BY 1)",
      "c1 AS (SELECT host, CAST(count(*) AS BIGINT) " +
        "AS n_after_url FROM au GROUP BY 1)",
      "c2 AS (SELECT host, CAST(count(*) AS BIGINT) " +
        "AS n_after_fp FROM af GROUP BY 1)",
      "c3 AS (SELECT host, CAST(count(*) AS BIGINT) " +
        "AS n_quality FROM kp GROUP BY 1)"),
      "SELECT c0.host, c0.n_raw, " +
        "coalesce(c1.n_after_url, 0) AS n_after_url, " +
        "coalesce(c2.n_after_fp, 0) AS n_after_fp, " +
        "coalesce(c3.n_quality, 0) AS n_quality, " +
        "coalesce(cp.n_capped, 0) AS n_capped, " +
        "coalesce(cp.tokens_capped, 0) AS tokens_capped " +
        "FROM c0 LEFT JOIN c1 USING (host) LEFT JOIN c2 USING (host) " +
        "LEFT JOIN c3 USING (host) LEFT JOIN cp USING (host) " +
        "ORDER BY c0.host")

  /** Code-switch audit replay (q410,
    * [[operators.CrossLingual.codeSwitchAudit]]): the mixed-tail
    * synth, token-list chunk slices (exact — tokens carry no
    * whitespace, so re-tokenizing a joined chunk is the slice), the
    * stopword-profile CASE per chunk, bounded per-language counts.
    */
  val q410CodeSwitch: String = {
    import graft.functions.{TextFunctions => TFn}
    def hitsOf(e: String, words: Seq[String]): String =
      s"len(list_filter($e, t -> t IN " +
        words.map(w => s"'$w'").mkString("(", ", ", ")") + "))"
    val en = hitsOf("x", TFn.EnStop)
    val de = hitsOf("x", TFn.DeStop)
    val fr = hitsOf("x", TFn.FrStop)
    val vote = s"CASE WHEN $en >= $de AND $en >= $fr AND $en > 0 " +
      s"THEN 'en' WHEN $de >= $fr AND $de > 0 THEN 'de' " +
      s"WHEN $fr > 0 THEN 'fr' ELSE 'und' END"
    withClause(Seq(
      s"hd AS (SELECT doc_id, array_to_string(($Toks)[1:24], ' ') " +
        "AS head FROM documents)",
      "mx AS (SELECT doc_id, CASE WHEN doc_id % 4 = 1 THEN head || " +
        "' der die das und ist nicht ein eine zu den von mit auf " +
        "dem sich des' WHEN doc_id % 4 = 2 THEN head || " +
        "' le la les et est une dans pour pas sur avec au il elle " +
        "ne que' ELSE head || " +
        "' the and of to in is it that for on with as' END " +
        "AS text FROM hd)",
      s"tk AS (SELECT doc_id, $Toks AS t FROM mx)",
      "ch AS (SELECT doc_id, list_transform(range(0, " +
        "greatest(CAST(ceil(len(t) / 8.0) AS BIGINT), 1)), " +
        "i -> t[i * 8 + 1 : i * 8 + 8]) AS chs FROM tk)",
      s"vt AS (SELECT doc_id, list_transform(chs, x -> $vote) " +
        "AS votes FROM ch)",
      "ag AS (SELECT doc_id, CAST(len(votes) AS BIGINT) AS n_chunks, " +
        "CAST(len(list_filter(votes, v -> v = 'en')) AS BIGINT) " +
        "AS n_en, " +
        "CAST(len(list_filter(votes, v -> v = 'de')) AS BIGINT) " +
        "AS n_de, " +
        "CAST(len(list_filter(votes, v -> v = 'fr')) AS BIGINT) " +
        "AS n_fr, " +
        "CAST(len(list_filter(votes, v -> v = 'und')) AS BIGINT) " +
        "AS n_und FROM vt)"),
      "SELECT doc_id, n_chunks, n_en, n_de, n_fr, n_und, " +
        "CASE WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_und " +
        "THEN 'en' WHEN n_de >= n_fr AND n_de >= n_und THEN 'de' " +
        "WHEN n_fr >= n_und THEN 'fr' ELSE 'und' END " +
        "AS primary_lang, " +
        "CAST((CASE WHEN n_en > 0 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN n_de > 0 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN n_fr > 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_langs, " +
        "((CASE WHEN n_en > 0 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN n_de > 0 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN n_fr > 0 THEN 1 ELSE 0 END)) >= 2 AS is_mixed " +
        "FROM ag ORDER BY doc_id")
  }

  /** Web-pipeline capstone replay (q382): URL canonical dedup →
    * folded-fingerprint dedup → the q327 quality replay, per-language
    * counts at every stage.
    */
  val q382WebPipeline: String =
    withClause(
      urlSynthCtes("documents", carry = ", text, lang") ++
      urlCanonCtes(carry = ", text, lang") ++ Seq(
      "ix AS (SELECT canonical_url AS curl, min(doc_id) " +
        "AS matched_id FROM cn WHERE canonical_url IS NOT NULL " +
        "GROUP BY 1)",
      "au AS (SELECT cn.doc_id, cn.text, cn.lang FROM cn " +
        "LEFT JOIN ix ON cn.canonical_url = ix.curl " +
        "WHERE ix.matched_id IS NULL OR cn.doc_id = ix.matched_id)",
      s"ff AS (SELECT doc_id, text, lang, $FoldedFpSql AS fp FROM au)",
      "fc AS (SELECT fp, min(doc_id) AS fcanon FROM ff " +
        "WHERE fp IS NOT NULL GROUP BY 1)",
      "af AS (SELECT ff.doc_id, ff.text, ff.lang FROM ff " +
        "LEFT JOIN fc USING (fp) " +
        "WHERE fc.fcanon IS NULL OR ff.doc_id = fc.fcanon)",
      s"qtk AS (SELECT doc_id, text, lang, $Toks AS t FROM af)",
      "qg AS (SELECT doc_id, text, len(t) AS n, " +
        "CASE WHEN len(t) >= 3 THEN list_transform(range(0, " +
        "len(t) - 2), i -> array_to_string(t[i + 1 : i + 3], ' ')) " +
        "ELSE [array_to_string(t, ' ')] END AS g3 FROM qtk)",
      "qual AS (SELECT doc_id FROM qg WHERE n >= 30 AND n <= 10000 " +
        "AND CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / " +
        "len(g3) <= 0.05 AND CAST(length(text) - " +
        "length(regexp_replace(text, '[.,;:!?''\"()-]', '', 'g')) " +
        "AS DOUBLE) <= n * 0.5)",
      "kp AS (SELECT q.doc_id, q.lang, CAST(len(q.t) AS BIGINT) " +
        "AS tk FROM qtk q JOIN qual USING (doc_id))",
      "c0 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_raw " +
        "FROM documents GROUP BY 1)",
      "c1 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_after_url " +
        "FROM au GROUP BY 1)",
      "c2 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_after_fp " +
        "FROM af GROUP BY 1)",
      "c3 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept, " +
        "CAST(sum(tk) AS BIGINT) AS tokens_kept FROM kp GROUP BY 1)"),
      "SELECT c0.lang, c0.n_raw, " +
        "coalesce(c1.n_after_url, 0) AS n_after_url, " +
        "coalesce(c2.n_after_fp, 0) AS n_after_fp, " +
        "coalesce(c3.n_kept, 0) AS n_kept, " +
        "coalesce(c3.tokens_kept, 0) AS tokens_kept " +
        "FROM c0 LEFT JOIN c1 USING (lang) LEFT JOIN c2 USING (lang) " +
        "LEFT JOIN c3 USING (lang) ORDER BY c0.lang")

  /** JL distortion replay (q373, [[operators.RandomProjection]]): the
    * embedded sign-matrix literal, index-ordered projection and
    * distance folds, exact 1e-6-grid ratio moments.
    */
  val q373JlDistortion: String = {
    import graft.functions.Grid.{lit17, snapSql}
    val m = graft.operators.RandomProjection.signMatrix(64, 16)
    val signs = graft.operators.RandomProjection.signsDuckSql(m)
    val inv = lit17(1.0 / math.sqrt(16.0))
    // the sign matrix is a ONE-ROW CTE iterated row-wise
    // (list_transform over the matrix itself): inlining the 16×64
    // literal inside the per-element lambda made DuckDB rebuild it
    // N·16·64 times — 281 s of the round-14 compare pass for this
    // oracle alone. Same i-ascending fold per row, identical bits.
    val projJ = snapSql("list_reduce(list_prepend(" +
      "CAST(0.0 AS DOUBLE), list_transform(range(64), " +
      "i -> CAST(embedding[i + 1] AS DOUBLE) * " +
      s"srow[i + 1])), (a, x) -> a + x) * $inv", 6)
    withClause(Seq(
      s"sg AS (SELECT $signs AS signs)",
      "pr AS (SELECT vec_id, embedding, " +
        s"list_transform(sg.signs, srow -> $projJ) AS proj " +
        "FROM embeddings, sg)",
      "pe AS (SELECT a.vec_id, a.embedding AS ea, b.embedding AS eb, " +
        "a.proj AS pa, b.proj AS pb FROM pr a " +
        "JOIN pr b ON b.vec_id = a.vec_id + 1)",
      "dd AS (SELECT *, " +
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(range(64), i -> " +
        "(CAST(ea[i + 1] AS DOUBLE) - CAST(eb[i + 1] AS DOUBLE)) * " +
        "(CAST(ea[i + 1] AS DOUBLE) - CAST(eb[i + 1] AS DOUBLE)))), " +
        "(a, x) -> a + x) AS do_, " +
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(range(16), i -> " +
        "(pa[i + 1] - pb[i + 1]) * (pa[i + 1] - pb[i + 1]))), " +
        "(a, x) -> a + x) AS dp_ FROM pe)",
      "rr AS (SELECT CAST(floor(dp_ / do_ * 1.0e6 + 0.5e0) " +
        "AS BIGINT) AS r6 FROM dd WHERE do_ > 0.0e0)"),
      "SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(64 AS INTEGER) AS d_in, CAST(16 AS INTEGER) AS d_out, " +
        snapSql("CAST(sum(r6) AS DOUBLE) / " +
          "(CAST(count(*) AS DOUBLE) * 1.0e6)", 6) + " AS mean_ratio, " +
        "CAST(min(r6) AS DOUBLE) / 1.0e6 AS min_ratio, " +
        "CAST(max(r6) AS DOUBLE) / 1.0e6 AS max_ratio, " +
        snapSql("CAST(sum(CASE WHEN abs(r6 - 1000000) <= 300000 " +
          "THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)",
          6) + " AS frac_within_30pct FROM rr")
  }

  /** UniMax replay (q374, [[operators.Mixture.waterfill]] with unit
    * weights and epoch-scaled capacity — the q91 window replay with
    * `cap = 4·c`, `wt = 1`).
    */
  val q374Unimax: String = {
    import graft.functions.Grid.snapSql
    withClause(Seq(
      s"t0 AS (SELECT lang, len($Toks) AS n FROM documents)",
      "s0 AS (SELECT lang, CAST(sum(n) AS BIGINT) AS c FROM t0 " +
        "GROUP BY lang)",
      "r0 AS (SELECT lang, c, CAST(c AS DOUBLE) * 4 AS cap, " +
        "1.0e0 AS wt, (CAST(c AS DOUBLE) * 4) / 1.0e0 AS ratio " +
        "FROM s0)",
      "x0 AS (SELECT lang, c, cap, wt, ratio, " +
        "coalesce(sum(cap) OVER (ORDER BY ratio, lang " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0e0) " +
        "AS cumb, " +
        "sum(wt) OVER (ORDER BY ratio, lang " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tailw " +
        "FROM r0)",
      "y0 AS (SELECT *, (20000.0e0 - cumb) / tailw AS tc FROM x0)",
      "z0 AS (SELECT *, first_value(CASE WHEN ratio >= tc THEN tc " +
        "END IGNORE NULLS) OVER (ORDER BY ratio, lang " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "AS ts FROM y0)",
      "a0 AS (SELECT lang, c AS c_tokens, " +
        "CASE WHEN ts IS NULL THEN cap ELSE greatest(0.0e0, " +
        "least(cap, wt * ts)) END AS alloc FROM z0)"),
      s"""SELECT lang, c_tokens, ${snapSql("alloc", 2)} AS alloc,
         |  ${snapSql("alloc / CAST(c_tokens AS DOUBLE)", 4)}
         |    AS epochs_used
         |FROM a0 ORDER BY lang""".stripMargin)
  }
}
