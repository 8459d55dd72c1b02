package graft.operators

import graft.expressions.HashExpressions
import graft.functions.{DedupFunctions => DF, TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-level deduplication operators, designed for the 100 TB path:
  *
  *  - exact / fingerprint dedup are single hash-shuffles (map-side partial
  *    aggregation keeps the shuffle at one row per distinct key);
  *  - MinHash-LSH candidate generation is shingles → signatures → band
  *    explode → *equi-join on band key* — never a cross join, so cost is
  *    O(rows·bands + bucket collisions), not O(rows²);
  *  - SimHash near-dup joins on signature prefixes (bucketing) before the
  *    Hamming check;
  *  - embedding near-dup buckets by random-hyperplane LSH signature.
  */
object Dedup {

  /** Exact dedup on a normalized content hash: keeps the smallest id per
    * distinct content. One shuffle on a 16-byte key.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(lower(col(textCol))).as("content_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Canonical-fingerprint dedup (token-order/duplication insensitive). */
  def fingerprintDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TF.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** MinHash signatures (k slots over `shingleLen`-word shingles),
    * computed in one pass per document (DF.minhashSigFast).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, shingleLen: Int = 3): DataFrame =
    df.select(col(idCol),
      DF.minhashFast(TF.tokens(col(textCol)), k, shingleLen).as("sig"))

  /** LSH candidate pairs: ids sharing at least one MinHash band key.
    * `bands * rowsPerBand` must equal `k`. Returns distinct (a_id, b_id)
    * with a_id < b_id.
    */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, shingleLen: Int = 3, bands: Int = 4): DataFrame =
    candidatePairsFromSignatures(
      minhashSignatures(df, idCol, textCol, k, shingleLen)
        .select(col(idCol).as("id"), col("sig")),
      bands, k / bands)

  /** THE candidate-pair construction (band explode → equi-join on the
    * band key → a_id < b_id → distinct), shared by every LSH entry point
    * so banding/tie-break changes cannot silently diverge between the
    * text-column and token-column paths. `sig` is (id, sig).
    */
  private def candidatePairsFromSignatures(sig: DataFrame, bands: Int,
      rows: Int): DataFrame = {
    val banded = sig.select(col("id"),
      explode(DF.bandKeys(col("sig"), bands, rows)).as("bk"))
    banded.as("a").join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** MinHash near-dup pairs verified by exact Jaccard ≥ `threshold` over
    * distinct tokens (candidates from LSH, so the verify join is sparse).
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 16, shingleLen: Int = 3,
      bands: Int = 4): DataFrame = {
    val t = TF.tokens(col(textCol))
    nearDupPairsFromTokens(df, idCol, t, array_distinct(t), threshold, k,
      shingleLen, bands)
  }

  /** The LSH-candidates + Jaccard-verify pipeline over caller-supplied
    * token expressions — `toks` feeds the signatures (ordered, duplicated
    * tokens, as shingles need), `dtoks` the verify join. [[dedupCorpus]]
    * passes columns MATERIALIZED in its persisted input so the regexp
    * tokenization runs once per document, not once per pipeline stage
    * that references the text.
    */
  private def nearDupPairsFromTokens(df: DataFrame, idCol: String,
      toksC: Column, dtoksC: Column, threshold: Double, k: Int,
      shingleLen: Int, bands: Int): DataFrame = {
    val cands = candidatePairsFromSignatures(
      df.select(col(idCol).as("id"),
        DF.minhashFast(toksC, k, shingleLen).as("sig")),
      bands, k / bands)
    val toks = df.select(col(idCol).as("id"), dtoksC.as("toks"))
    cands
      .join(toks.withColumnRenamed("id", "a_id")
        .withColumnRenamed("toks", "a_toks"), "a_id")
      .join(toks.withColumnRenamed("id", "b_id")
        .withColumnRenamed("toks", "b_toks"), "b_id")
      .withColumn("jaccard", DF.jaccard(col("a_toks"), col("b_toks")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** 64-bit SimHash per document. */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), DF.simhash(TF.tokens(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`.
    *
    * `nTables = 0` (default): bucket on the high 16 bits — ONE bucket per
    * doc, cheapest join, but a heuristic: a pair differing anywhere in the
    * top 16 bits is missed (recall measured in DedupClusterSpec; weak for
    * large `maxHamming`).
    *
    * `nTables > 0`: the standard block-rotation scheme (Manku et al.,
    * WWW'07 near-duplicate detection): split the 64-bit signature into
    * `nTables` contiguous blocks and bucket once per block. A pair within
    * Hamming distance `maxHamming < nTables` has fewer differing bits
    * than blocks, so BY PIGEONHOLE some block is identical — recall is
    * exactly 1. Cost: `nTables` bucket rows per doc (still equi-joins,
    * never all-pairs); choose `nTables = maxHamming + 1` with blocks wide
    * enough (64/nTables bits) that buckets stay selective.
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8, nTables: Int = 0): DataFrame = {
    val s = simhashes(df, idCol, textCol)
    val banded =
      if (nTables <= 0)
        s.withColumn("tbl", lit(0))
          .withColumn("key", shiftrightunsigned(col("simhash"), 48))
      else {
        require(nTables <= 32, s"nTables $nTables leaves blocks under 2 bits")
        val width = 64 / nTables
        val blocks = (0 until nTables).map { i =>
          val hi = if (i == nTables - 1) 64 else (i + 1) * width
          val mask = if (hi - i * width >= 64) -1L else (1L << (hi - i * width)) - 1
          struct(lit(i).as("tbl"),
            shiftrightunsigned(col("simhash"), i * width)
              .bitwiseAND(lit(mask)).as("key"))
        }
        s.select(col(idCol), col("simhash"),
            explode(array(blocks: _*)).as("blk"))
          .select(col(idCol), col("simhash"),
            col("blk.tbl").as("tbl"), col("blk.key").as("key"))
      }
    val joined = banded.as("a").join(banded.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("hamming",
        DF.hamming64(col("a.simhash"), col("b.simhash")))
      .filter(col("hamming") <= maxHamming)
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"),
        col("hamming"))
    // multi-table banding can surface the same pair through several blocks
    if (nTables <= 0) joined else joined.distinct()
  }

  /** Connected components over near-dup candidate pairs — the transitive
    * closure step a real dedup needs (A~B and B~C must dedup A,B,C
    * together even when A~C was never emitted as a pair).
    *
    * Hybrid execution, sized by the distinct-edge count (one action):
    *  - ≤ `localThreshold` edges (the common case — candidates are
    *    LSH-pruned and verified before they get here): single-task
    *    union-find inside an executor ([[localComponents]]) — one job
    *    instead of O(diameter) rounds of shuffle jobs;
    *  - larger graphs: hash-min label propagation — every node starts
    *    labeled with its own id; each round joins labels across edges and
    *    keeps the minimum seen; stops when a round changes nothing. Per
    *    round: one shuffle join + one aggregation, state persisted and
    *    the lineage cut each iteration (at 100 TB the alternative —
    *    letting the plan grow per round — is what kills iterative jobs),
    *    shuffle-partition count derived from the edge count, not the
    *    session. Each round also POINTER-JUMPS (adopts the label of the
    *    current label), so convergence is O(log diameter) rounds — 2-4
    *    for the near-clique graphs dedup produces, and still ~7 for a
    *    60-node chain that plain propagation would take 59 rounds on.
    *
    * @return (id, component) where component = min id in the component.
    *         The result is MATERIALIZED (local path: persisted; loop
    *         path: locally checkpointed — the iterative lineage is cut,
    *         so nothing replays). Callers that keep a session alive may
    *         `unpersist()` the local-path result once downstream output
    *         is materialized, as [[dedupCorpus]] does.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50, localThreshold: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    // both edge orientations in ONE pass over pairs (a union of two
    // selects would re-evaluate the caller's candidate pipeline twice).
    // Null ids are dropped EXPLICITLY so both execution paths agree (the
    // distributed path would silently drop them as null join keys; the
    // local union-find would NPE).
    val edgesRaw = pairs
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist()
    // materialize ONCE so the caller's candidate pipeline (often a join
    // or pair-verify) is never replayed into the iterative rounds
    val nEdges = edgesRaw.count()
    if (nEdges <= localThreshold && localOrdering(edgesRaw).isDefined) {
      // Near-dup edge sets are tiny relative to the corpus (candidates are
      // already LSH-pruned + verified): when the whole graph fits in one
      // partition, a single-task union-find replaces O(diameter) rounds of
      // shuffle jobs — one job, one task, exact same (id, min-id) labels.
      val out = localComponents(edgesRaw).persist()
      out.count()
      edgesRaw.unpersist()
      return out
    }
    // size the iterative stages to the GRAPH, not the session — but never
    // below the cluster's parallelism (nEdges/1e6 would give ONE partition
    // for a 2M-edge graph on a 32-core machine). Both loop inputs carry
    // this partitioning EXPLICITLY (repartition below); the session conf
    // is never touched, so concurrent queries on the same session are
    // unaffected and cache-eviction replays see the same plan.
    val numParts = math.max(spark.sparkContext.defaultParallelism.toLong,
      math.min(nEdges / 1000000L, Int.MaxValue.toLong)).toInt
    // lay edges out by the join key once; every round's edge↔label join
    // then reuses this partitioning (no per-round edge shuffle)
    val edges = edgesRaw.repartition(numParts, col("dst")).persist()
    edges.count()
    edgesRaw.unpersist()
    // localCheckpoint (NOT persist): persist caches data but the logical
    // plan still grows by one join+agg per round — at graph-diameter
    // round counts (chains of near-dups do occur) the accumulated plan
    // OOMs the driver just STRINGIFYING it for AQE. Checkpointing
    // re-roots each round's plan at the materialized RDD, so plan size
    // is O(1) in rounds. Tradeoff: checkpoint blocks are released by the
    // context cleaner when the driver-side handle is GC'd (not by an
    // explicit unpersist) — acceptable because labels are the SMALL side
    // (2 ids per node vs the edge set) and pointer jumping caps live
    // rounds at O(log diameter), so at most ~10 snapshots coexist.
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .repartition(numParts, col("id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate label for each node: the min of its neighbors' labels;
      // the previous label rides along so convergence is checked in the
      // SAME job (no second join per round). The explicit repartition
      // before the groupBy sizes the aggregation's shuffle to the GRAPH
      // (the join output satisfies the agg's required distribution, so no
      // session-partition-count exchange is inserted) and leaves
      // viaNeighbors hash-partitioned on id2 at numParts — co-partitioned
      // with labels for the join below
      val viaNeighbors = edges
        .join(labels, edges("dst") === labels("id"))
        .repartition(numParts, col("src"))
        .groupBy(col("src").as("id2"))
        .agg(min(col("component")).as("nbr_component"))
      val stepped = labels
        .join(viaNeighbors, labels("id") === col("id2"), "left")
        .select(col("id"), col("component").as("prev"),
          least(col("component"), coalesce(col("nbr_component"),
            col("component"))).as("component"))
        .localCheckpoint(true) // both jump-join sides read this once
      // pointer jump: also adopt the label OF the current label
      // (labels always name a node in the same component, so this
      // preserves correctness while halving the remaining distance —
      // rounds drop from O(diameter) to O(log diameter), which is what
      // survives chain-shaped dup graphs at scale)
      val jump = stepped.select(col("id").as("jid"),
        col("component").as("jcomponent"))
      val next = stepped
        .join(jump, stepped("component") === col("jid"), "left")
        .select(col("id"), col("prev"),
          least(col("component"), coalesce(col("jcomponent"),
            col("component"))).as("component"))
        .repartition(numParts, col("id"))
        .localCheckpoint(true) // materialize + cut the plan (see above)
      val changed =
        next.filter(col("component") =!= col("prev")).limit(1).count()
      labels = next.drop("prev")
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      // partial labels would silently leave duplicates un-clustered
      System.err.println(s"[dedup] connectedComponents did NOT converge " +
        s"in $maxIter rounds; labels may be non-minimal (graph diameter " +
        s"> maxIter). Increase maxIter.")
    edges.unpersist()
    labels
  }

  /** The ordering the local union-find must use to agree with the
    * distributed path's `min(component)`: Spark's `min` over StringType
    * compares UTF8String bytes (codepoint order), NOT Java's UTF-16
    * `String.compareTo` — they diverge on supplementary characters. Only
    * id types whose JVM ordering provably matches Spark's take the local
    * path; anything else (structs, arrays, decimals...) falls back to the
    * distributed propagation, which uses Spark's own comparators.
    */
  private def localOrdering(edges: DataFrame): Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    val cmp: Option[(Any, Any) => Int] = edges.schema("src").dataType match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType |
          FloatType | BooleanType | DateType | TimestampType =>
        Some((x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y))
      case StringType => // UTF-8 byte order == Spark's UTF8String order
        Some((x, y) => java.util.Arrays.compareUnsigned(
          x.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8),
          y.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      case _ => None
    }
    cmp.map(f => new Ordering[Any] {
      def compare(x: Any, y: Any): Int = f(x, y)
    })
  }

  /** Single-task union-find over a (src, dst) edge DataFrame that fits in
    * one partition. Union-by-min with path compression, so every root is
    * the minimum id of its component — identical labels to the iterative
    * hash-min propagation, minus the per-round job overhead. Runs inside
    * an executor task (coalesce(1) → mapPartitions), NOT on the driver.
    * Caller guarantees ids are non-null and [[localOrdering]]-comparable.
    */
  private def localComponents(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val spark = edges.sparkSession
    val idType = edges.schema("src").dataType
    val ord = localOrdering(edges).getOrElse(
      throw new IllegalArgumentException(
        s"localComponents: unsupported id type $idType"))
    val outRdd = edges.coalesce(1).rdd.mapPartitions { it =>
      val parent = new scala.collection.mutable.HashMap[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      it.foreach { row =>
        val a = row.get(0); val b = row.get(1)
        if (!parent.contains(a)) parent(a) = a
        if (!parent.contains(b)) parent(b) = b
        val ra = find(a); val rb = find(b)
        if (ra != rb) { // attach the larger root under the smaller
          if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
        }
      }
      // materialize the key set BEFORE emitting: find() path-compresses
      // (writes into the map), and mutating a HashMap while iterating its
      // keysIterator is undefined by the collection contract
      val keys = parent.keys.toArray
      keys.iterator.map(k => Row(k, find(k)))
    }
    spark.createDataFrame(outRdd, StructType(Seq(
      StructField("id", idType), StructField("component", idType))))
  }

  /** End-to-end corpus dedup: MinHash-LSH candidates → Jaccard verify →
    * transitive clusters → keep the minimum id per cluster. Returns the
    * input with `component` and `is_canonical` columns.
    *
    * The returned frame is MATERIALIZED AND PERSISTED (the upstream
    * caches are released only after it exists, so nothing recomputes).
    * Ownership of that cache passes to the innermost active
    * [[graft.CacheScope]] — wrap "dedupCorpus + your action" in
    * `CacheScope.scoped { ... }` and it is released for you after the
    * action. Without a scope the CALLER must `unpersist()` the result
    * once downstream output is materialized; in a long-lived session,
    * leaking one of these per invocation is what made round 3's bench
    * q64 4× slower than the same plan in a fresh session.
    */
  def dedupCorpus(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, k: Int = 16, shingleLen: Int = 3,
      bands: Int = 4, tokensCol: Option[String] = None): DataFrame = {
    // materialize the input ONCE: the stages below reference it ~6 times
    // (signature build, both candidate self-join sides, both token-verify
    // sides, the final join back) — when `df` is itself a pipeline (e.g.
    // CorpusPipeline's quality + decontamination stages), re-executing
    // that subtree per reference measured 90+ s where the cached form
    // runs in ~2 s. The token array (and its distinct form, which the
    // verify join consumes) is materialized INTO the cache, so the
    // regexp tokenization runs once per document instead of once per
    // referencing stage (signatures + both verify sides). With
    // `tokensCol` (the tokenize-once contract) the caller's column is
    // used as-is — no second token copy enters the cache.
    val toksName = tokensCol.getOrElse("__toks")
    val withToks = tokensCol match {
      case Some(_) => df
      case None    => df.withColumn("__toks", TF.tokens(col(textCol)))
    }
    val input = withToks
      .withColumn("__dtoks", array_distinct(col(toksName)))
      .persist()
    val pairs = nearDupPairsFromTokens(input, idCol, col(toksName),
      col("__dtoks"), threshold, k, shingleLen, bands)
    val comps = connectedComponents(pairs, "a_id", "b_id")
    val out = input.drop("__toks", "__dtoks")
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .withColumn("is_canonical", col("component") === col(idCol))
      .persist()
    out.count() // materialize, then release the upstream caches
    comps.unpersist()
    input.unpersist()
    graft.CacheScope.register(out)
  }

  /** Re-elect each duplicate cluster's surviving document by SCORE
    * rather than id: given a clustered frame (the [[dedupCorpus]]
    * output, or anything carrying `componentCol`), the member
    * maximizing `scoreCol` — ties on smallest id — becomes the
    * canonical. The FineWeb/SlimPajama keep rule: retain the
    * best-quality (longest, highest-scoring) member of each duplicate
    * cluster, not the arbitrary lowest-id one. Returns the input with
    * `is_canonical` replaced.
    *
    * 100 TB shape: one window partitioned BY COMPONENT — duplicate
    * clusters are small (band-verified near-dup groups), so no
    * partition approaches corpus scale; the shuffle key is the
    * component id. Determinism: (score desc, id asc) is a total order
    * within a cluster.
    */
  def electCanonicalByScore(clustered: DataFrame, idCol: String,
      componentCol: String, scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(componentCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    clustered
      .withColumn("__dd_rk", row_number().over(w))
      .withColumn("is_canonical", col("__dd_rk") === 1)
      .drop("__dd_rk")
  }

  /** Soft deduplication — the down-WEIGHTING alternative to removal
    * (the SlimPajama/DataComp-LM ablation axis: instead of keeping one
    * member per duplicate cluster, keep them all at weight
    * `1 / |cluster|` so each distinct content unit contributes one
    * unit of training mass however many times it was scraped). Adds
    * `cluster_size` and `soft_weight` to a clustered frame
    * ([[dedupCorpus]] / [[connectedComponents]] output); feed the
    * weight to a sampler ([[Sampling]]) or a mixture accounting.
    *
    * One component-partitioned count window — bounded per cluster by
    * the same hub caps that bound the clustering itself, parallel
    * across clusters (the [[electCanonicalByScore]] shape).
    */
  def softDedupWeights(clustered: DataFrame,
      componentCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(componentCol))
    clustered
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("soft_weight", lit(1.0) / col("cluster_size"))
  }

  /** The persistent dedup index of a corpus, NORMALIZED into its two
    * access paths so the signature is stored once per document, not once
    * per band row (inline duplication costs `bands`× the signature volume
    * — at 100 TB and 4 bands that is ~3 extra copies of 16 longs per
    * document, tens of TB of pure redundancy):
    *
    *  - `bands` (band, key, index_id): the candidate-lookup side — at
    *    100 TB, `write.partitionBy("band")` + bucket by `key` so delta
    *    joins prune files;
    *  - `signatures` (index_id, sig): joined only for the CANDIDATES the
    *    band join surfaces — a tiny fraction of the corpus, so the extra
    *    equi-join touches little data.
    *
    * Daily deltas join against both; the corpus text is NEVER re-read.
    *
    * `meta` is present iff the index came off disk ([[readIndex]]): it
    * carries the persisted layout's moduli so the incremental joins can
    * include `key_bucket` as a join key — which is what lets dynamic
    * partition pruning cut the bands scan to the delta's buckets (the
    * layout's whole point). An in-memory index has no layout, so the
    * join stays (band, key).
    */
  final case class DedupIndex(signatures: DataFrame, bands: DataFrame,
      meta: Option[DedupIndexMeta] = None)

  def buildDedupIndex(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, shingleLen: Int = 3, bands: Int = 4): DedupIndex = {
    val rows = k / bands
    val sig = minhashSignatures(df, idCol, textCol, k, shingleLen)
      .select(col(idCol).as("index_id"), col("sig"))
    val banded = sig
      .select(col("index_id"),
        explode(DF.bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("index_id"))
    DedupIndex(sig, banded)
  }

  /** Persist a [[DedupIndex]] under `path` in the delta-join-prunable
    * layout the index design promises:
    *
    *  - `bands/` is directory-partitioned by `band` AND `key_bucket`
    *    (= splitmix64(key) mod `keyBuckets`) — a catalog-free stand-in
    *    for hive bucketing that works on any path-based store: a delta
    *    join that derives the same bucket on its side prunes to
    *    1/`keyBuckets` of each band's files (statically for literal
    *    probes, dynamically via DPP for joins), and rows are sorted by
    *    `key` within each file;
    *  - `signatures/` is directory-partitioned by `id_shard`
    *    (= splitmix64(index_id) mod `idShards`) so point lookups and
    *    shard-local maintenance touch one directory.
    *
    * Each (band, key_bucket) group hash-partitions to exactly one task
    * before the write, so every leaf directory holds ONE file — at
    * 100 TB, raise `keyBuckets`/`idShards`, never the file-per-dir count.
    */
  def writeIndex(index: DedupIndex, path: String, keyBuckets: Int = 64,
      idShards: Int = 16): Unit = {
    index.bands
      .withColumn("key_bucket", keyBucketOf(col("key"), keyBuckets))
      .repartition(col("band"), col("key_bucket"))
      // the dynamic-partition writer REQUIRES its input ordered by the
      // partition columns and inserts its own (non-stable) sort when the
      // child doesn't provide one — sorting by `key` alone would be
      // destroyed by that inserted sort. Leading with the partition
      // columns satisfies the writer's required ordering as a prefix, so
      // THIS sort is the one the files are written in and the per-file
      // key order actually holds (asserted in DedupIndexPersistSpec).
      .sortWithinPartitions(col("band"), col("key_bucket"), col("key"))
      .write.mode("overwrite").partitionBy("band", "key_bucket")
      .parquet(s"$path/bands")
    index.signatures
      .withColumn("id_shard",
        pmod(HashExpressions.splitmix64(col("index_id").cast("long")),
          lit(idShards.toLong)).cast("int"))
      .repartition(col("id_shard"))
      .write.mode("overwrite").partitionBy("id_shard")
      .parquet(s"$path/signatures")
    // layout metadata rides WITH the index: a delta side must derive
    // key_bucket with the exact modulus used at write time — an
    // out-of-band mismatch would silently prune to the wrong bucket
    // (a silent-miss, not an error). The underscore prefix keeps every
    // parquet reader from picking the file up as data. Written through
    // the Hadoop FS API so it lands on the index's OWN filesystem
    // (hdfs/s3), not the driver's local disk.
    graft.sources.Sidecar.write(index.bands.sparkSession,
      s"$path/$MetaFile",
      s"""{"keyBuckets":$keyBuckets,"idShards":$idShards}""")
  }

  /** Fold a delta INTO a persisted index — the maintenance operation a
    * daily incremental pipeline needs: after [[incrementalDedup]] flags
    * today's batch against yesterday's index, the batch's fresh rows
    * must become part of the index or every later delta re-probes an
    * ever-staler corpus until a full rebuild. This appends the delta's
    * band/signature rows into the SAME bucket layout (moduli from the
    * index's own sidecar — a caller-supplied modulus could silently
    * shear the layout), so `readIndex(path)` afterwards ≡
    * `buildDedupIndex(old ∪ delta)` row-for-row and every pruning
    * property is unchanged.
    *
    * Each append lands ONE new file per touched (band, key_bucket) leaf
    * (same single-task repartition as [[writeIndex]]) — directory
    * partition pruning is untouched; a pruned probe now reads
    * 1 + #appends files per leaf instead of 1. That is the append/merge
    * trade every log-structured index makes: fold daily, and when the
    * per-leaf file count matters, compact by rewriting
    * (`writeIndex(readIndex(...), freshPath)`).
    *
    * The delta index must be built with the same signature parameters
    * (k, shingleLen, bands) as the original — the same contract
    * [[incrementalDedup]] already places on its caller; signatures of
    * different k would not even band-join. Ids already present in the
    * index are the caller's to avoid (re-appending an id duplicates its
    * rows, exactly as rebuilding with a duplicated corpus would).
    */
  def appendToIndex(delta: DedupIndex, path: String): Unit = {
    val spark = delta.bands.sparkSession
    val meta = readIndexMeta(spark, path) // layout from the sidecar ONLY
    delta.bands
      .withColumn("key_bucket", keyBucketOf(col("key"), meta.keyBuckets))
      .repartition(col("band"), col("key_bucket"))
      .sortWithinPartitions(col("band"), col("key_bucket"), col("key"))
      .write.mode("append").partitionBy("band", "key_bucket")
      .parquet(s"$path/bands")
    delta.signatures
      .withColumn("id_shard",
        pmod(HashExpressions.splitmix64(col("index_id").cast("long")),
          lit(meta.idShards.toLong)).cast("int"))
      .repartition(col("id_shard"))
      .write.mode("append").partitionBy("id_shard")
      .parquet(s"$path/signatures")
  }

  /** Rewrite a persisted index into the one-file-per-leaf layout at
    * `destPath` — the merge half of the append/merge trade
    * ([[appendToIndex]]'s Scaladoc): after N folds each pruned probe
    * reads 1 + N files per leaf; compaction restores one. Layout
    * moduli come from the source sidecar, so the rewrite is
    * bit-compatible with every existing delta derivation; rows are
    * untouched ([[writeIndex]] re-derives the same layout columns).
    */
  def compactIndex(spark: SparkSession, srcPath: String,
      destPath: String): Unit = {
    require(srcPath != destPath,
      "compactIndex reads srcPath lazily while overwriting destPath; " +
        "in-place compaction would destroy the source leaves mid-read — " +
        "write to a fresh path and swap")
    val idx = readIndex(spark, srcPath)
    val meta = idx.meta.get // readIndex always carries it
    writeIndex(
      DedupIndex(idx.signatures.select(col("index_id"), col("sig")),
        idx.bands.select(col("band"), col("key"), col("index_id"))),
      destPath, meta.keyBuckets, meta.idShards)
  }

  private val MetaFile = "_graft_index.json"

  /** Layout parameters a persisted index was written with. */
  final case class DedupIndexMeta(keyBuckets: Int, idShards: Int)

  /** Read and validate `_graft_index.json` — the ONLY sound source of
    * the bucket modulus for a delta-side [[keyBucketOf]] derivation.
    * Takes the caller's session explicitly: resolving via
    * `SparkSession.active` would read the sidecar through the wrong
    * Hadoop conf (credentials, fs overrides) under multiple sessions.
    */
  def readIndexMeta(spark: SparkSession, path: String): DedupIndexMeta = {
    val text = graft.sources.Sidecar
      .read(spark, s"$path/$MetaFile")
      .getOrElse(throw new IllegalArgumentException(
        s"no $MetaFile under $path - not a graft dedup index " +
          "(or written by a pre-metadata version; rewrite with writeIndex)"))
    def intField(name: String): Int =
      ("\"" + name + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(text)
        .map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(
          s"$MetaFile under $path lacks integer field '$name': $text"))
    DedupIndexMeta(intField("keyBuckets"), intField("idShards"))
  }

  /** The delta-side bucket column for a persisted index: reads the
    * modulus from the index's own metadata so the derivation can never
    * drift from the layout on disk.
    */
  def deltaKeyBucket(spark: SparkSession, indexPath: String,
      key: Column): Column =
    keyBucketOf(key, readIndexMeta(spark, indexPath).keyBuckets)

  /** Re-open a persisted [[DedupIndex]]. The layout columns (`key_bucket`,
    * `id_shard`) stay on the frames so filters/joins on them reach the
    * directory partitioning; the index consumers select the columns they
    * need, so the extras never travel through a shuffle.
    */
  def readIndex(spark: SparkSession, path: String): DedupIndex = {
    val meta = readIndexMeta(spark, path) // validate sidecar before data
    val bands = spark.read.parquet(s"$path/bands")
      .select(col("band").cast("int").as("band"), col("key"),
        col("index_id"), col("key_bucket").cast("int").as("key_bucket"))
    val sigs = spark.read.parquet(s"$path/signatures")
      .select(col("index_id"), col("sig"), col("id_shard"))
    DedupIndex(sigs, bands, Some(meta))
  }

  /** The bucket function `writeIndex` lays files out by — public so a
    * delta side can derive the same bucket and let the optimizer prune
    * band files instead of listing a whole band.
    */
  def keyBucketOf(key: Column, keyBuckets: Int): Column =
    pmod(HashExpressions.splitmix64(key), lit(keyBuckets.toLong)).cast("int")

  /** Incremental near-dup: flag `newDocs` that near-duplicate an indexed
    * corpus ([[buildDedupIndex]]) WITHOUT re-clustering it. Candidates
    * come from the band-key equi-join; the verify step is the MinHash
    * Jaccard ESTIMATE (fraction of equal signature slots) — signatures
    * travel in the index, so the existing corpus's text is never touched.
    * The estimate is quantized to 1/k steps; its error band is MEASURED
    * in IncrementalDedupEstimatorSpec (k = 16: mean abs error 0.085,
    * boundary precision/recall 0.78/0.83, and essentially no flips
    * outside ±2 sd of the threshold). When exactness matters more than
    * never re-reading corpus text, use [[incrementalDedupExact]].
    * Returns `newDocs` plus `is_dup` and `matched_id` (the smallest
    * colliding index id, null when fresh).
    */
  def incrementalDedup(newDocs: DataFrame, idCol: String, textCol: String,
      index: DedupIndex, threshold: Double, k: Int = 16,
      shingleLen: Int = 3, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val newBanded = minhashSignatures(newDocs, idCol, textCol, k, shingleLen)
      .select(col(idCol).as("new_id"), col("sig").as("new_sig"),
        explode(DF.bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("new_id"), col("new_sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    // est. Jaccard = |equal slots| / k (the MinHash estimator itself).
    // The signature join runs AFTER the band join has cut the corpus to
    // candidates only — (band,key) collisions — so the index's signature
    // side is touched once per candidate, not per band row.
    val estJaccard = size(filter(
      zip_with(col("new_sig"), col("sig"), (a, b) => a === b),
      x => x)).cast("double") / k
    // a disk-backed index joins on the layout column too: key_bucket is
    // functionally dependent on key (same splitmix64 modulus, from the
    // sidecar), so the result is unchanged — but the extra equi-key on
    // the PARTITION column is what lets DPP prune the bands scan to the
    // delta's buckets instead of listing every band directory
    val (probe, bandJoinKeys) = index.meta match {
      case Some(m) => (newBanded.withColumn("key_bucket",
          keyBucketOf(col("key"), m.keyBuckets)),
        Seq("band", "key_bucket", "key"))
      case None => (newBanded, Seq("band", "key"))
    }
    val matches = probe
      .join(index.bands, bandJoinKeys)
      .select(col("new_id"), col("new_sig"), col("index_id")).distinct()
      .join(index.signatures, Seq("index_id"))
      .withColumn("est_jaccard", estJaccard)
      .filter(col("est_jaccard") >= threshold)
      .groupBy(col("new_id"))
      .agg(min(col("index_id")).as("matched_id"))
    newDocs.join(matches.withColumnRenamed("new_id", idCol), Seq(idCol), "left")
      .withColumn("is_dup", col("matched_id").isNotNull)
  }

  /** [[incrementalDedup]] with EXACT verification — the trade the
    * estimator mode refuses: candidates still come from the index's band
    * join (no re-clustering), but instead of the k-slot MinHash estimate
    * (quantized to 1/k steps; error band measured in
    * IncrementalDedupEstimatorSpec) the candidates join back to the
    * corpus TEXT and verify with the same exact distinct-token Jaccard
    * the batch path ([[minhashNearDupPairs]]) uses — so incremental and
    * batch agree exactly on what a duplicate is.
    *
    * Cost: one extra equi-join that re-reads corpus text for CANDIDATE
    * ids only (LSH-sparse). At 100 TB keep the corpus id-partitioned so
    * the candidate join prunes; when even that scan is too dear, use the
    * estimator mode and accept the measured error band.
    */
  def incrementalDedupExact(newDocs: DataFrame, idCol: String,
      textCol: String, index: DedupIndex, corpus: DataFrame,
      corpusIdCol: String, corpusTextCol: String, threshold: Double,
      k: Int = 16, shingleLen: Int = 3, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val newBanded = minhashSignatures(newDocs, idCol, textCol, k, shingleLen)
      .select(col(idCol).as("new_id"),
        explode(DF.bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("new_id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
    // same meta-aware layout-column join as incrementalDedup (DPP)
    val (probe, bandJoinKeys) = index.meta match {
      case Some(m) => (newBanded.withColumn("key_bucket",
          keyBucketOf(col("key"), m.keyBuckets)),
        Seq("band", "key_bucket", "key"))
      case None => (newBanded, Seq("band", "key"))
    }
    val cands = probe.join(index.bands, bandJoinKeys)
      .select(col("new_id"), col("index_id")).distinct()
    val newToks = newDocs.select(col(idCol).as("new_id"),
      array_distinct(TF.tokens(col(textCol))).as("new_toks"))
    val corpToks = corpus.select(col(corpusIdCol).as("index_id"),
      array_distinct(TF.tokens(col(corpusTextCol))).as("idx_toks"))
    val matches = cands
      .join(newToks, "new_id")
      .join(corpToks, Seq("index_id")) // sparse: candidate ids only
      .withColumn("jaccard", DF.jaccard(col("new_toks"), col("idx_toks")))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("new_id"))
      .agg(min(col("index_id")).as("matched_id"))
    newDocs.join(matches.withColumnRenamed("new_id", idCol), Seq(idCol), "left")
      .withColumn("is_dup", col("matched_id").isNotNull)
  }

  /** Embedding near-dup pairs: cosine > `threshold`. `bucketed = true`
    * pre-buckets by hyperplane-LSH signature (the 100 TB path: candidate
    * pairs only within a bucket); `false` is the exact quadratic baseline
    * for small inputs / verification.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bucketed: Boolean = false,
      nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val prepped = VF.prepForPairs(df, idCol, vecCol)
    val base =
      if (!bucketed) {
        prepped.as("a").join(prepped.as("b"), col("a.id") < col("b.id"))
      } else {
        val planes = VF.deterministicPlanes(nPlanes, dim)
        val t = prepped.withColumn("bucket",
          VF.hyperplaneSignature(col("vd"), planes))
        t.as("a").join(t.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      }
    // norms precomputed per row; per pair only the tight-loop dot runs
    base
      .withColumn("cos",
        when(col("a.nrm") * col("b.nrm") === 0.0, lit(0.0))
          .otherwise(VF.fastDot(col("a.vd"), col("b.vd")) /
            (col("a.nrm") * col("b.nrm"))))
      .filter(col("cos") > threshold)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"), col("cos"))
  }

  /** Cross-split duplicate-leakage audit — the eval-hygiene check a
    * hash split does NOT give you: a random split scatters every
    * near-dup CLUSTER across train and test, so the test set silently
    * contains the training data and metrics inflate. Verified
    * near-dup pairs ([[minhashNearDupPairs]] — banded candidates,
    * exact Jaccard) classify by the caller's `inTest` flag; the
    * summary counts cross-split pairs and the DISTINCT test docs with
    * a train-side near-duplicate. Fix = split by CLUSTER (dedup
    * first, or key the split hash on the canonical id), then re-run
    * this audit to zero.
    */
  def crossSplitLeakage(df: DataFrame, idCol: String, textCol: String,
      inTest: Column, threshold: Double = 0.9): DataFrame = {
    val pairs = graft.CacheScope.register(
      minhashNearDupPairs(df, idCol, textCol, threshold).persist())
    val spl = df.select(col(idCol).as("__sid"), inTest.as("__t"))
    val cp = pairs
      .join(spl.select(col("__sid").as("a_id"), col("__t").as("__ta")),
        "a_id")
      .join(spl.select(col("__sid").as("b_id"), col("__t").as("__tb")),
        "b_id")
    val con = cp.filter(col("__ta") =!= col("__tb"))
      .select(when(col("__ta"), col("a_id")).otherwise(col("b_id"))
        .as("cid"))
      .distinct()
    val pairAgg = cp.agg(
      count(lit(1)).as("n_dup_pairs"),
      sum(when(col("__ta") =!= col("__tb"), 1L).otherwise(0L))
        .as("n_cross_pairs"))
    val splitAgg = spl.agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("n_test"))
    val conAgg = con.agg(count(lit(1)).as("n_contaminated"))
    pairAgg.crossJoin(splitAgg).crossJoin(conAgg)
      .select(col("n_dup_pairs"), col("n_cross_pairs"), col("n_test"),
        col("n_contaminated"),
        round(col("n_contaminated") / col("n_test").cast("double"), 6)
          .as("contamination_rate"))
  }
}
