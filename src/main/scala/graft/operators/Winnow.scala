package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.HashExpressions

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every character `k`-gram of
  * the canonicalized text, slide a `w`-gram window, and keep each
  * window's MINIMUM hash (rightmost position on ties — the "robust
  * winnowing" rule that makes selection depend on content, not
  * position). The selected set is ~`2/(w+1)` of the grams yet carries
  * the GUARANTEE the sparser schemes (our rolling-hash fingerprints,
  * MinHash) cannot give: any shared substring of length ≥ `w + k − 1`
  * between two documents surfaces as a shared selected hash —
  * detection is certain, not probabilistic.
  *
  * Scale shape: grams explode per document and the window min runs
  * KEYED by document in position order (per-doc sequential state —
  * never a corpus-grain window); matching is a distinct-hash
  * equi-join, the same candidate discipline as the MinHash bands.
  * Canonicalization (lowercase, alnum only) is one regexp pass;
  * hashing is the codegen'd FNV-1a expression.
  */
object Winnow {

  private def canon(c: org.apache.spark.sql.Column) =
    regexp_replace(lower(c), "[^a-z0-9]", "")

  /** Selected fingerprints: one row per (id, pos, hash) the winnow
    * keeps. Documents with fewer than `w` grams (but ≥ 1) fall back to
    * one truncated window, so every non-empty canonical text carries
    * at least one fingerprint. Documents with no grams emit nothing.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"bad k=$k w=$w")
    // Winnowing is a PURE PER-DOCUMENT function of the canonical
    // string, so it runs as one tight per-doc pass instead of the
    // previous gram explode + per-partition window sort + distinct
    // shuffle (three corpus-grain operators over ~2000 gram rows per
    // doc; q273 measured the explode/window/distinct chain at the top
    // of its job profile — guide §1.2: fix the distributed algorithm
    // before the per-task work). Semantics are replicated exactly:
    // FNV-1a over UTF-16 units of each k-gram (the Fnv1a64 expression
    // loop, char-for-char), window min by (hash asc, pos desc), only
    // complete windows unless the doc has fewer than w grams (then
    // the single truncated window at pos 1), per-doc distinct picks.
    // The canonicalization stays a Catalyst expression so lower() /
    // regexp_replace parity with every other call site is untouched.
    // parallel PRIMITIVE arrays (positions, hashes), not an array of
    // tuples: primitive arrays cross the UDF boundary via the
    // fromPrimitiveArray fast path — the tuple form paid a per-element
    // reflection conversion (measured ~3x on the fingerprint stage)
    val fpUdf = udf { (c: String) =>
      if (c == null) (Array.empty[Int], Array.empty[Long])
      else {
        val n = c.length - (k - 1)
        if (n <= 0) (Array.empty[Int], Array.empty[Long])
        else {
          val hs = new Array[Long](n)
          var i = 0
          while (i < n) {
            var h = 0xcbf29ce484222325L
            var j = i
            val end = i + k
            while (j < end) {
              h ^= (c.charAt(j) & 0xffffL)
              h *= 0x100000001b3L
              j += 1
            }
            hs(i) = h
            i += 1
          }
          val lastStart = math.max(n - w, 0)
          val outP = new Array[Int](lastStart + 1)
          val outH = new Array[Long](lastStart + 1)
          var m = 0
          var prevBest = -1
          var p = 0
          while (p <= lastStart) {
            var best = p
            var q = p + 1
            val wEnd = math.min(p + w, n)
            while (q < wEnd) {
              // min by (hash, -pos): smallest hash, rightmost tie
              if (hs(q) <= hs(best)) best = q
              q += 1
            }
            // adjacent windows re-pick the same gram; emitting only on
            // change IS the per-doc distinct (a pick can never recur
            // after a gap: window p's pick has pos >= p, so picks are
            // non-decreasing in pos and a repeat is always adjacent)
            if (best != prevBest) {
              outP(m) = best + 1
              outH(m) = hs(best)
              m += 1
              prevBest = best
            }
            p += 1
          }
          (java.util.Arrays.copyOf(outP, m),
            java.util.Arrays.copyOf(outH, m))
        }
      }
    }
    df.select(col(idCol), fpUdf(canon(col(textCol))).as("__fp"))
      .select(col(idCol),
        explode(arrays_zip(col("__fp._1").as("pos"),
          col("__fp._2").as("hash"))).as("__z"))
      .select(col(idCol), col("__z.pos"), col("__z.hash"))
  }

  /** Per-document fingerprint profile: gram/window/fingerprint counts,
    * the selection density (→ 2/(w+1) on random text), and the md5 of
    * the ordered `pos:hash` stream — the audit a fingerprint index
    * stores per document.
    */
  def profile(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    val fp = fingerprints(df, idCol, textCol, k, w)
    val base = df
      .select(col(idCol),
        greatest(length(canon(col(textCol))) - (k - 1), lit(0))
          .as("n_grams"))
      .filter(col("n_grams") > 0)
      .withColumn("n_windows",
        greatest(col("n_grams") - (w - 1), lit(1)))
    val agg = fp
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_fp"),
        md5(concat_ws(",", sort_array(collect_list(
          concat_ws(":", col("pos"), col("hash")))))).as("fp_md5"))
    base.join(agg, Seq(idCol))
      .select(col(idCol), col("n_grams").cast("long").as("n_grams"),
        col("n_windows").cast("long").as("n_windows"), col("n_fp"),
        round(col("n_fp") / col("n_windows").cast("double"), 4)
          .as("density"),
        col("fp_md5"))
  }

  /** Document pairs sharing ≥ `minShared` distinct selected hashes —
    * the plagiarism/near-dup readout. Candidates come ONLY from the
    * hash equi-join on per-doc DISTINCT hashes, and hashes present in
    * more than `maxDf` documents are dropped FIRST (the MOSS "ignore
    * ubiquitous fingerprints" rule): a boilerplate hash shared by f
    * documents would alone emit f² candidate pairs — the hot-shingle
    * skew that turns the join quadratic — while contributing no
    * discriminating signal. `n_shared` orders the report.
    */
  def matchPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, minShared: Int = 2,
      maxDf: Int = 1000): DataFrame = {
    val hs = fingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("__id"), col("hash")).distinct()
    val rare = hs.groupBy(col("hash"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("hash"))
    // The pair join's INPUT is small (per-doc distinct hashes) but its
    // OUTPUT fans out quadratically per shared hash — a fan-out the
    // planner cannot see from input bytes, so it broadcast-joined the
    // tiny b side and ran the whole candidate explosion in ONE
    // upstream task (q263 measured a 16 s single-task stage writing
    // 88 MB). Pin the layout at the session's shuffle width, persist
    // it once (both join sides read the same frame — unpersisted, the
    // fingerprint pass ran twice more), and force the shuffled-hash
    // strategy: both sides share the pinned hash layout, so the join
    // adds NO exchange and the explosion spreads across the width.
    val shufP = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val kept = graft.CacheScope.register(hs.join(rare, Seq("hash"))
      .repartition(shufP, col("hash")).persist())
    val a = kept.select(col("__id").as("a_id"), col("hash"))
    val b = kept.select(col("__id").as("b_id"), col("hash"))
    a.join(b.hint("shuffle_hash"), Seq("hash"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  private val MetaFile = "_graft_winnow.json"

  /** Persist a fingerprint frame (from [[fingerprints]]) as the
    * at-rest index: rows `(doc_id, pos, hash)` hash-bucketed on the
    * fingerprint (`pmod(hash, hashBuckets)` directories), so a probe
    * co-locates by deriving the same bucket — the
    * [[graft.operators.Dedup]] index discipline, fingerprint-shaped.
    * The modulus rides in a sidecar; a delta MUST reuse it (an
    * out-of-band modulus silently shears the layout).
    */
  def writeFingerprintIndex(fp: DataFrame, idCol: String, path: String,
      hashBuckets: Int = 64): Unit = {
    require(hashBuckets >= 1, s"bad hashBuckets $hashBuckets")
    fp.select(col(idCol).as("doc_id"), col("pos"), col("hash"))
      .withColumn("hash_bucket",
        pmod(col("hash"), lit(hashBuckets.toLong)).cast("int"))
      .repartition(col("hash_bucket"))
      .sortWithinPartitions(col("hash_bucket"), col("hash"),
        col("doc_id"))
      .write.mode("overwrite").partitionBy("hash_bucket")
      .parquet(s"$path/fingerprints")
    graft.sources.Sidecar.write(fp.sparkSession, s"$path/$MetaFile",
      s"""{"hashBuckets":$hashBuckets}""")
  }

  private def bucketsOf(spark: SparkSession, path: String): Int = {
    val meta = graft.sources.Sidecar.read(spark, s"$path/$MetaFile")
      .getOrElse(sys.error(s"$path is not a winnow index " +
        s"(missing $MetaFile)"))
    """"hashBuckets":(\d+)""".r.findFirstMatchIn(meta)
      .map(_.group(1).toInt)
      .getOrElse(sys.error(s"malformed $MetaFile: $meta"))
  }

  /** Fold a delta's fingerprints into the persisted index — the daily
    * incremental maintenance step: same bucket layout (modulus from
    * the index's OWN sidecar), append-mode write, so
    * `readFingerprintIndex` afterwards ≡ an index built on old ∪ delta
    * row-for-row.
    */
  def appendToFingerprintIndex(fpDelta: DataFrame, idCol: String,
      path: String): Unit = {
    val buckets = bucketsOf(fpDelta.sparkSession, path)
    fpDelta.select(col(idCol).as("doc_id"), col("pos"), col("hash"))
      .withColumn("hash_bucket",
        pmod(col("hash"), lit(buckets.toLong)).cast("int"))
      .repartition(col("hash_bucket"))
      .sortWithinPartitions(col("hash_bucket"), col("hash"),
        col("doc_id"))
      .write.mode("append").partitionBy("hash_bucket")
      .parquet(s"$path/fingerprints")
  }

  def readFingerprintIndex(spark: SparkSession,
      path: String): DataFrame = {
    bucketsOf(spark, path) // existence + shape check
    spark.read.parquet(s"$path/fingerprints")
  }

  /** Match PROBE documents against the persisted index: probe docs
    * winnow with the same (k, w), distinct hashes equi-join the
    * index's (the [[matchPairs]] discipline — `maxDf` counted on the
    * INDEX side, where the boilerplate lives), `minShared` floors the
    * report. Output: `(probe_id, index_id, n_shared)`.
    */
  def matchAgainstIndex(spark: SparkSession, path: String,
      probe: DataFrame, idCol: String, textCol: String, k: Int = 5,
      w: Int = 4, minShared: Int = 2, maxDf: Int = 1000): DataFrame = {
    val idx = readFingerprintIndex(spark, path)
      .select(col("doc_id").as("index_id"), col("hash")).distinct()
    val rare = idx.groupBy(col("hash"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("hash"))
    val probeFp = fingerprints(probe, idCol, textCol, k, w)
      .select(col(idCol).as("probe_id"), col("hash")).distinct()
    // same fan-out-blind-planner guard as matchPairs: pin BOTH join
    // sides at the session's shuffle width and force the shuffled-hash
    // strategy, so the probe×index candidate explosion runs across
    // the pinned layout instead of one broadcast-fed task
    val shufP = spark.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val idxRare = idx.join(rare, Seq("hash"))
      .repartition(shufP, col("hash"))
    probeFp.repartition(shufP, col("hash"))
      .join(idxRare.hint("shuffle_hash"), Seq("hash"))
      .groupBy(col("probe_id"), col("index_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
