package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration graph centrality over DataFrames — the Pregel-shaped
  * loop expressed as joins + aggregations so Catalyst/AQE size every
  * round (the idiomatic Spark form when the per-round logic is pure
  * relational algebra; an RDD Pregel buys nothing here).
  *
  * The pipeline use: PageRank over a document-similarity graph ranks
  * CENTRAL documents — templates, boilerplate hubs, mirror roots — that
  * pairwise dedup sees only as many independent pairs. High-rank nodes
  * are the "canonical sources" worth keeping (or the template spam worth
  * dropping wholesale, depending on the curation policy).
  */
object Graph {

  /** Scale-adaptive partition count for the iterative loops (§2:
    * derive from measured input, never a constant tuned for one
    * deployment): enough partitions to FILL the scheduler's
    * parallelism while each still holds ≥ 64k edge rows (below that,
    * per-task overhead beats the parallelism on a bounded round), and
    * beyond that grow by VOLUME at ~4M rows (~100 MB) per partition,
    * capped by the session's cluster-tuned shuffle width.
    */
  private def roundParts(spark: org.apache.spark.sql.SparkSession,
      rowCount: Long): Int = {
    val shufP = spark.conf
      .get("spark.sql.shuffle.partitions", "200").toLong
    val par = spark.sparkContext.defaultParallelism.toLong
    val byVolume = (rowCount + (4L << 20) - 1) / (4L << 20)
    val fill = math.min(par, (rowCount + (64L << 10) - 1) / (64L << 10))
    math.max(1L, math.min(shufP, math.max(byVolume, fill))).toInt
  }

  /** Standard damped PageRank over a DIRECTED edge list, fixed
    * iteration count (deterministic — no convergence test whose
    * trip point could differ across engines), uniform teleport, and
    * dangling mass redistributed uniformly each round:
    * `r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)/deg(u) + dangling/N)`.
    *
    * 100 TB shape: the degree-weighted edge table is built ONCE and
    * scope-cached; each round is one equi-join (edges ⋈ ranks on src —
    * the only row-grain shuffle), one partial-aggregating sum per dst,
    * a broadcast of the 1-row dangling-mass aggregate, and a left join
    * back to the node table. Each round's ranks are EAGERLY
    * local-checkpointed: round k+1 references round k twice (the
    * contribution join AND the dangling-mass aggregate), so a lazy
    * cache still doubles the logical plan every round — exponential
    * analysis cost by round ~10. Truncating lineage per round is the
    * textbook iterative-DataFrame requirement, not an optimization.
    * (On a cluster with flaky executors, swap for reliable
    * `checkpoint()` — localCheckpoint trades fault-tolerance for not
    * needing a checkpoint dir.)
    *
    * `nodes` must carry every vertex (isolated ones included — they
    * still receive teleport mass); N is its distinct count. Output:
    * (idCol, deg, pr) with pr unrounded — normalize/round downstream.
    */
  def pageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0, s"bad damping $damping")
    val n = nodes.select(countDistinct(col(idCol)).as("n"))
      .head().getLong(0)
    require(n > 0, "pageRank over an empty node set")
    // the caller's edge frame is often an expensive construction (gram
    // pair joins); it feeds BOTH the degree aggregate and the weighted
    // edge table, so pin it once — uncached it would run twice
    val e = graft.CacheScope.register(edges
      .select(col(srcCol).as("__pr_src"), col(dstCol).as("__pr_dst"))
      .persist())
    // SCALE-ADAPTIVE round partitioning (the §2 rule: derive the
    // loop's partition count from the measured input, never from a
    // constant tuned for local mode or for one cluster). The count
    // doubles as the cache materialization round 1 previously paid.
    // Every loop-invariant table (ew, nd) and every round's shuffle
    // then shares ONE hash layout sized so a partition holds ~4M edge
    // rows (~100 MB): a 10-round loop over a bounded graph stops
    // paying 32-task waves per tiny stage (q152 measured 90 jobs /
    // 2047 tasks / 151 core-sec for 17 MB of total shuffle — pure
    // per-task overhead), while a 100 TB edge table still fans out to
    // as many partitions as its volume demands, capped by the
    // session's cluster-tuned shuffle.partitions.
    val p = roundParts(e.sparkSession, e.count())
    val outDeg = e.groupBy(col("__pr_src").as("__pr_id"))
      .agg(count(lit(1)).as("deg"))
    val nd = graft.CacheScope.register(nodes
      .select(col(idCol).as("__pr_id")).distinct()
      .join(outDeg, Seq("__pr_id"), "left")
      .withColumn("deg", coalesce(col("deg"), lit(0L)))
      .repartition(p, col("__pr_id"))
      .persist())
    val ew = graft.CacheScope.register(e
      .join(nd.select(col("__pr_id").as("__pr_src"), col("deg")),
        Seq("__pr_src"))
      .repartition(p, col("__pr_src"))
      .persist())
    // ranks CARRY the (static) out-degree through every checkpoint:
    // the dangling-mass scalar is then a plain filter+sum over the
    // round's own materialized table — the previous form re-derived
    // "is this node dangling" per round with a ranks ⋈ nd left-semi
    // join, one extra shuffle-stage pair per round for a fact that
    // never changes (measured ~10 AQE stage-jobs/round on q152; the
    // semi join was ~2 of them). 8 bytes per node of checkpoint width
    // buys the join's removal; values are identical — same sum over
    // the same rows.
    var ranks = nd.select(col("__pr_id"), col("deg"),
      (lit(1.0) / n).as("pr"))
    // AQE OFF for the round loop only (restored after): each round's
    // plan is bounded and already sized by the adaptive partitioning
    // above, so AQE buys nothing in-round — but it turns every
    // exchange into its own stage-job (measured ~10 jobs/round on
    // q152; the scheduling floor of 10 rounds × job latency WAS the
    // query). Results are identical: AQE never changes values, only
    // scheduling. At 100 TB the loop's shuffles still fan out to the
    // adaptive p above; in-round skew handling is traded for a 5×
    // lower per-round floor (skewed graphs should salt the edge
    // table upstream — the §2.5 fix AQE's join splitting only
    // approximates).
    val sess = nodes.sparkSession
    val aqeWas = sess.conf.get("spark.sql.adaptive.enabled", "true")
    val shufWas = sess.conf.get("spark.sql.shuffle.partitions", "200")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    // in-round exchanges (the contrib aggregation, the node join)
    // inherit the SAME adaptive p — with AQE off, the static
    // shuffle.partitions would otherwise re-inflate every tiny round
    // stage back to cluster width (measured: 1646 tasks vs 758)
    sess.conf.set("spark.sql.shuffle.partitions", p.toString)
    try {
      for (_ <- 1 to iters) {
        val contrib = ew
          .join(ranks.select(col("__pr_id").as("__pr_src"), col("pr")),
            Seq("__pr_src"))
          .groupBy(col("__pr_dst").as("__pr_id"))
          .agg(sum(col("pr") / col("deg")).as("__pr_c"))
        // dangling mass as a DRIVER scalar: the identical filter+sum
        // the broadcast form ran (same frame, same agg plan — same
        // partials in the same order, so the same double), but the
        // value enters next round's plan as a literal instead of a
        // BroadcastExchange + crossJoin: one plan subtree and one
        // broadcast job fewer per round, for a 1-double fact
        val dang = ranks.filter(col("deg") === 0L)
          .agg(coalesce(sum(col("pr")), lit(0.0)))
          .head().getDouble(0)
        val next = nd.select(col("__pr_id"), col("deg"))
          .join(contrib, Seq("__pr_id"), "left")
          .select(col("__pr_id"), col("deg"),
            (lit((1 - damping) / n) + lit(damping) *
              (coalesce(col("__pr_c"), lit(0.0)) + lit(dang) / n))
              .as("pr"))
        // per-round lineage truncation: measured BETTER than batching
        // checkpoints every 3 rounds (28.7 s vs 37.9 s on q152 at
        // sf0.1 — stacked rounds re-analyze/re-codegen the whole join
        // prefix, which costs more than the one materialization job a
        // round-sized checkpoint pays)
        ranks = next.localCheckpoint(true)
      }
    } finally {
      sess.conf.set("spark.sql.adaptive.enabled", aqeWas)
      sess.conf.set("spark.sql.shuffle.partitions", shufWas)
    }
    // no closing join needed: every round's `next` is built FROM nd,
    // so the final checkpoint already carries exactly nd's node set
    // (deg included)
    ranks.select(col("__pr_id").as(idCol), col("deg"), col("pr"))
  }

  /** Triangle census of an UNDIRECTED graph: edges normalize to
    * `least < greatest` (duplicates and self-loops drop); the count
    * uses the COMPACT-FORWARD orientation — every edge re-oriented
    * from its lower-(degree, id) endpoint to its higher one, so each
    * triangle is counted exactly once at its lowest-order apex and,
    * crucially, out-degrees are bounded by O(√E): the apex pair join
    * `u→v ⋈ u→w` fans out per-node as outdeg², which the id
    * orientation lets hubs blow up (a degree-10⁴ hub contributes 10⁸
    * id-oriented wedges but only its √E-bounded forward wedges here —
    * the difference between minutes and seconds on a skewed graph,
    * and the standard triangle algorithm at scale). The closing edge
    * check is one equi-join back on the oriented table. The triangle
    * COUNT is orientation-invariant, so the oracle's simpler
    * id-oriented join replays the same number.
    *
    * One row out: (n_nodes, n_edges, n_triangles, n_wedges,
    * clustering_coeff), wedges = `Σ deg·(deg−1)/2` on the undirected
    * degrees, clustering = `3T / W`.
    */
  def triangleStats(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = graft.CacheScope.register(edges
      .select(least(col(srcCol), col(dstCol)).as("s"),
        greatest(col(srcCol), col(dstCol)).as("d"))
      .filter(col("s") < col("d")).distinct().persist())
    val deg = und.select(col("s").as("v"))
      .unionAll(und.select(col("d").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // orient low-(deg, id) -> high-(deg, id); carry the dst's order
    // key so the apex pair join can order its two out-neighbors
    val oriented = graft.CacheScope.register(und
      .join(deg.select(col("v").as("s"), col("deg").as("sdeg")), Seq("s"))
      .join(deg.select(col("v").as("d"), col("deg").as("ddeg")), Seq("d"))
      .select(
        when(col("sdeg") < col("ddeg") ||
          (col("sdeg") === col("ddeg") && col("s") < col("d")),
          col("s")).otherwise(col("d")).as("u"),
        when(col("sdeg") < col("ddeg") ||
          (col("sdeg") === col("ddeg") && col("s") < col("d")),
          col("d")).otherwise(col("s")).as("w"),
        when(col("sdeg") < col("ddeg") ||
          (col("sdeg") === col("ddeg") && col("s") < col("d")),
          col("ddeg")).otherwise(col("sdeg")).as("wdeg"))
      .persist())
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.u") === col("e2.u") &&
        (col("e1.wdeg") < col("e2.wdeg") ||
          (col("e1.wdeg") === col("e2.wdeg") &&
            col("e1.w") < col("e2.w"))))
      .join(oriented.as("e3"),
        col("e3.u") === col("e1.w") && col("e3.w") === col("e2.w"),
        "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val wedge = deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("deg")) / 2).cast("long").as("n_edges"),
      sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("n_wedges"))
    wedge.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("n_wedges"),
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 4))
          .as("clustering_coeff"))
  }

  /** HITS (Kleinberg) hubs and authorities over a DIRECTED edge list,
    * fixed iteration count, L2-normalized each round:
    * `a(v) = Σ_{u→v} h(u)` then `a ← a/‖a‖₂`, `h(u) = Σ_{u→v} a(v)`
    * then `h ← h/‖h‖₂`, from all-ones. On a bipartite src→dst graph
    * (buyers→products, docs→entities) the hub side scores "points at
    * the important things" and the authority side "pointed at by the
    * important pointers".
    *
    * Shape per round: two equi-joins on the cached edge table + two
    * partial-aggregating sums; the two norms are 1-double driver facts
    * (the k-means-centroid contract). Ranks are EAGERLY
    * local-checkpointed per round — the same lineage-truncation
    * requirement [[pageRank]] documents.
    *
    * Returns (id, side, score) for every node, side ∈ {hub,
    * authority}; nodes missing from a side score 0 there and are
    * omitted.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters $iters must be positive")
    val e = graft.CacheScope.register(edges
      .select(col(srcCol).as("s"), col(dstCol).as("d"))
      .distinct().persist())
    val spark = edges.sparkSession
    // the pageRank discipline, applied to the two-sided loop: size the
    // round layout from the measured edge count (scale-adaptive, §2),
    // pin the edge table in BOTH join layouts once (two bounded cache
    // copies buy the removal of two edge-grain shuffles per round —
    // the only corpus-grain exchanges the loop had), and run the
    // bounded round plans without AQE's per-exchange stage-jobs
    val shufWas = spark.conf.get("spark.sql.shuffle.partitions", "200")
    val p = roundParts(spark, e.count())
    val es = graft.CacheScope.register(
      e.repartition(p, col("s")).persist())
    val ed = graft.CacheScope.register(
      e.repartition(p, col("d")).persist())
    var h = es.select(col("s")).distinct()
      .withColumn("h", lit(1.0))
    var a = ed.select(col("d")).distinct()
      .withColumn("a", lit(1.0))
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", p.toString)
    try for (_ <- 0 until iters) {
      // checkpoint the RAW sums FIRST, then read the norm off the
      // materialized table: norm-before-checkpoint ran the edge
      // join+agg TWICE per half-round (once for the norm action, once
      // for the checkpoint — measured ~2x on q169). The normalized
      // table stays a lazy projection over the checkpoint; next
      // round's join re-reads the pinned rows, and the division by a
      // driver double is arithmetic-identical either side of the
      // materialization.
      val aRaw = es.join(h, Seq("s"))
        .groupBy(col("d")).agg(sum(col("h")).as("a"))
        .localCheckpoint(true)
      val aNorm = math.sqrt(
        aRaw.agg(sum(col("a") * col("a"))).head().getDouble(0))
      a = aRaw.select(col("d"), (col("a") / aNorm).as("a"))
      val hRaw = ed.join(a, Seq("d"))
        .groupBy(col("s")).agg(sum(col("a")).as("h"))
        .localCheckpoint(true)
      val hNorm = math.sqrt(
        hRaw.agg(sum(col("h") * col("h"))).head().getDouble(0))
      h = hRaw.select(col("s"), (col("h") / hNorm).as("h"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.shuffle.partitions", shufWas)
    }
    h.select(col("s").as("id"), lit("hub").as("side"),
        col("h").as("score"))
      .unionByName(a.select(col("d").as("id"),
        lit("authority").as("side"), col("a").as("score")))
  }

  /** Synchronous semi-supervised label propagation over an UNDIRECTED
    * graph: each round, every still-unlabeled node adjacent to at
    * least one labeled node takes the MAJORITY label among its labeled
    * neighbors (ties break to the lexicographically smallest label —
    * deterministic, engine-exact). Seeds keep their labels forever;
    * `round_assigned` records when each node was labeled (0 = seed).
    *
    * Shape per round: one equi-join of the symmetric edge table
    * against the labeled frontier, one anti-join to restrict to
    * unlabeled targets, one (node, label) count + one per-node window
    * at candidate grain. The labeled table is localCheckpointed per
    * round (it feeds two joins next round — the [[pageRank]] lineage
    * rule).
    */
  /** Bounded-hop BFS distance from a seed set — the frontier-expansion
    * primitive behind "how far is this node from the trusted core"
    * (crawl-frontier curation, fraud-ring proximity, feature hops).
    * Each round is ONE edge equi-join of the frontier plus an
    * anti-join against the settled set; lineage truncates per round
    * ([[pageRank]]'s localCheckpoint discipline — an iterative
    * DataFrame with uncut lineage doubles its plan every round), and
    * the loop exits early when a frontier empties (the per-round
    * count is the only driver action). Unreached nodes are simply
    * absent — no sentinel distances.
    */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 30, s"bad maxHops $maxHops")
    val e = graft.CacheScope.register(edges
      .select(col(srcCol).as("__bf_s"), col(dstCol).as("__bf_d"))
      .distinct().persist())
    // pageRank's scale-adaptive round layout + AQE-free bounded round
    // plans (§2): partition count from the measured edge count, the
    // hop join pinned to the edge table's layout
    val spark = edges.sparkSession
    val shufWas = spark.conf.get("spark.sql.shuffle.partitions", "200")
    val p = roundParts(spark, e.count())
    val es = graft.CacheScope.register(
      e.repartition(p, col("__bf_s")).persist())
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", p.toString)
    // Only the per-hop FRONTIER is ever checkpointed; the settled set
    // stays a lazy union of those checkpoints. The previous form
    // re-localCheckpointed `dist.union(next)` every hop — materializing
    // the WHOLE settled set again per round, O(V·hops) copied rows —
    // when the union of already-pinned frontiers is lineage-flat by
    // construction (each leaf is its own checkpoint; the plan grows by
    // one leaf per hop, bounded by maxHops <= 30).
    try {
      var dist = seeds.select(col(seedCol).as("node")).distinct()
        .withColumn("dist", lit(0)).localCheckpoint(true)
      var frontier = dist.select(col("node"))
      var h = 1
      var done = false
      while (h <= maxHops && !done) {
        val next = frontier.join(es, col("node") === col("__bf_s"))
          .select(col("__bf_d").as("node")).distinct()
          .join(dist.select(col("node")), Seq("node"), "left_anti")
          .withColumn("dist", lit(h))
          .localCheckpoint(true)
        if (next.isEmpty) done = true
        else {
          dist = dist.union(next)
          frontier = next.select(col("node"))
          h += 1
        }
      }
      dist
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.shuffle.partitions", shufWas)
    }
  }

  def propagateLabels(seeds: DataFrame, idCol: String, labelCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds $rounds must be positive")
    // pin the caller's (often expensive) edge frame before the
    // symmetric union reads it twice — the pageRank lesson
    val e0 = graft.CacheScope.register(
      edges.select(col(srcCol).as("s"), col(dstCol).as("d")).persist())
    val sym = graft.CacheScope.register(
      e0.unionByName(e0.select(col("d").as("s"), col("s").as("d")))
        .filter(col("s") =!= col("d")).distinct().persist())
    var labeled = seeds
      .select(col(idCol).as("id"), col(labelCol).as("label"),
        lit(0).as("round_assigned"))
      .localCheckpoint(true)
    for (r <- 1 to rounds) {
      val byNode = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id"))
        .orderBy(col("c").desc, col("label"))
      val fresh = sym
        .join(labeled.select(col("id").as("s"), col("label")), Seq("s"))
        .join(labeled.select(col("id").as("d")), Seq("d"), "left_anti")
        .groupBy(col("d").as("id"), col("label"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(byNode))
        .filter(col("rn") === 1)
        .select(col("id"), col("label"), lit(r).as("round_assigned"))
      labeled = labeled.unionByName(fresh).localCheckpoint(true)
    }
    labeled
  }
}
