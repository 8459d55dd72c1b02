package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental URL-keyed dedup — the production shape of
  * [[graft.functions.Urls.canonicalize]]'s batch dedup (q372): a web
  * pipeline does not re-shuffle the corpus per crawl; it holds a
  * canonical-URL INDEX and probes each new batch against it with one
  * equi-join (the [[CrossLingual.flagIncremental]] convention — same
  * three-piece surface: index builder, batch probe, and a streaming
  * form that joins the index as the static side of a stream-static
  * join, so batch and stream share one code path).
  *
  * NULL canonical keys (unparseable URLs) never index and never match
  * — unparseable inputs opt out of dedup loudly, exactly the
  * cross-lingual empty-fold contract.
  */
object UrlDedup {

  /** The corpus-side canonical-URL index: one row per distinct
    * canonical URL, `matched_id` = min id (the canonical document),
    * `n_variants` = raw-URL variety absorbed by the key.
    */
  def urlIndex(corpus: DataFrame, idCol: String,
      urlCol: String): DataFrame =
    corpus
      .select(graft.functions.Urls.canonicalize(col(urlCol))
        .as("curl"), col(idCol).as("__cid"), col(urlCol).as("__craw"))
      .filter(col("curl").isNotNull)
      .groupBy(col("curl"))
      .agg(min(col("__cid")).as("matched_id"),
        countDistinct(col("__craw")).as("n_variants"))

  /** Probe `delta` against a prebuilt [[urlIndex]] — ONE equi-join on
    * the derived key; works identically on a batch frame and on a
    * STREAMING delta (stream-static join, stateless on the stream
    * side). Output: one row per delta doc —
    * `(idCol, canonical_url, is_dup, matched_id)`; docs with
    * unparseable URLs carry a null key and `is_dup = false`.
    */
  def flagAgainstIndex(delta: DataFrame, index: DataFrame,
      idCol: String, urlCol: String): DataFrame =
    delta
      .select(col(idCol),
        graft.functions.Urls.canonicalize(col(urlCol)).as("curl"))
      .join(index.select(col("curl").as("__icurl"),
        col("matched_id")), col("curl") === col("__icurl"), "left")
      .select(col(idCol), col("curl").as("canonical_url"),
        col("matched_id").isNotNull.as("is_dup"), col("matched_id"))

  /** Convenience batch form: build the index from `corpus`, probe
    * `delta`.
    */
  def flagIncremental(delta: DataFrame, corpus: DataFrame,
      idCol: String, urlCol: String): DataFrame =
    flagAgainstIndex(delta, urlIndex(corpus, idCol, urlCol), idCol,
      urlCol)

  /** Per-host document cap — the anti-domination stage the published
    * web recipes run right after URL dedup (C4 and RefinedWeb both cap
    * per-domain contributions; Dolma caps URLs per registered domain):
    * without it a handful of mega-hosts — forums, wikis, mirror farms —
    * own the token budget and the trained distribution. Keeps the
    * `maxPerHost` BEST documents per host by (`scoreCol` desc, `idCol`
    * asc — deterministic ties); every input row survives with
    * `host_rank` (1-based within its host) and `is_kept`
    * (`host_rank <= maxPerHost`), so callers can either filter or
    * audit what the cap would drop. Rows with a NULL host opt OUT of
    * capping loudly — `host_rank` NULL, `is_kept` true — the null-key
    * law every dedup operator here follows.
    *
    * 100 TB shape: ONE window partitioned by host (one hash shuffle +
    * per-partition sort). Host-grain partitions are the natural unit;
    * the honest caveat is that AQE cannot split a window partition, so
    * a corpus where a single host's rows break executor memory needs a
    * pre-gate on per-host counts (the q389 host-profile table names
    * exactly those hosts) — that guard stays with the caller because
    * the cap must see every row of a host to rank it.
    */
  /** URL blocklist gate — the pre-fetch filter the published web
    * recipes run FIRST (RefinedWeb and C4 both gate on curated
    * URL/domain blocklists before spending a byte of fetch budget):
    * rules are `(host, path_prefix)` rows — `path_prefix = "/"`
    * blocks the whole host — matched against the CANONICAL key (so
    * case/`www.`/percent/dot-segment games cannot dodge a rule).
    * Every doc survives with `is_blocked`, the matched rule
    * (`blocked_prefix`, smallest matching prefix for determinism),
    * and its canonical host/path, so callers either filter or audit.
    * Unparseable URLs opt out loudly (never blocked) — the null-key
    * law.
    *
    * 100 TB shape: ONE equi-join on host (un-hinted — curated lists
    * broadcast under AQE, the multi-million-rule case degrades to a
    * shuffle join) fans each doc out only to ITS host's rules
    * (bounded per host), then one doc-grain aggregation folds the
    * verdict. Never a pattern × corpus cross.
    */
  def applyBlocklist(docs: DataFrame, blocklist: DataFrame,
      idCol: String, urlCol: String): DataFrame = {
    val canon = docs.select(col(idCol),
      graft.functions.Urls.canonicalize(col(urlCol)).as("canonical_url"))
      .withColumn("host",
        regexp_extract(col("canonical_url"), "^[a-z]+://([^/:?#]+)", 1))
      .withColumn("path",
        regexp_extract(col("canonical_url"),
          "^[a-z]+://[^/?#]*([^?#]*)", 1))
    canon
      .join(blocklist.select(col("host"),
        col("path_prefix").as("__pfx")), Seq("host"), "left")
      .withColumn("__hit",
        when(col("__pfx").isNotNull &&
          col("path").startsWith(col("__pfx")), col("__pfx")))
      .groupBy(col(idCol))
      // min/max, never first: all fanned-out rows of a doc carry the
      // same canonical/host, so min is the value — and deterministic
      .agg(min(col("canonical_url")).as("canonical_url"),
        min(col("host")).as("host"),
        min(col("__hit")).as("blocked_prefix"))
      .withColumn("is_blocked", col("blocked_prefix").isNotNull)
  }

  def capPerHost(docs: DataFrame, idCol: String, hostCol: String,
      scoreCol: String, maxPerHost: Int): DataFrame = {
    require(maxPerHost >= 1, s"bad maxPerHost $maxPerHost")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(hostCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    docs
      .withColumn("host_rank",
        when(col(hostCol).isNotNull, row_number().over(w)))
      .withColumn("is_kept",
        col(hostCol).isNull || col("host_rank") <= maxPerHost)
  }
}
