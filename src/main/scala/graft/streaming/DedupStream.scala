package graft.streaming

import java.sql.Timestamp

import graft.functions.{DedupFunctions => DF, TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection: the MinHash-LSH candidate
  * generation of [[graft.operators.Dedup]] lifted onto a continuous
  * document stream.
  *
  * Each arriving document is signed (one-pass MinHash) and exploded into
  * its LSH band keys; keyed state per band bucket remembers the ids seen
  * in that bucket within the watermark horizon. A document landing in a
  * non-empty bucket emits a [[Collision]] against the bucket's FIRST
  * (canonical) id — downstream either drops collided docs (streaming
  * dedup) or batch-verifies them with exact Jaccard, exactly like the
  * batch pipeline's verify stage.
  *
  * Scale/state design: state is per (band, key) bucket, bounded three
  * ways — the watermark evicts whole buckets via event-time timeout,
  * each bucket stores at most `maxBucketIds` ids, and band keys
  * distribute uniformly (they are hashes), so no hot key. The stream
  * never joins against itself; collision detection is O(new docs) per
  * batch.
  */
object DedupStream {

  case class Doc(doc_id: Long, text: String, ts: Timestamp)

  case class Collision(doc_id: Long, canonical_id: Long, band: Int,
      band_key: Long, ts: Timestamp)

  // not `private`: encoder-generated projections live outside this object
  // and cannot touch private classes
  case class BandRow(band: Int, key: Long, doc_id: Long, ts: Timestamp)

  case class BucketState(canonicalId: Long, ids: List[Long], lastTs: Long)

  /** Matches of a document STREAM against a STATIC corpus dedup index
    * ([[graft.operators.Dedup.buildDedupIndex]]) — the streaming half of
    * the incremental-dedup story: yesterday's corpus is indexed once
    * (signatures + band keys, text never re-read); today's docs arrive
    * as a stream and each is flagged the moment it lands.
    *
    * Plan shape: stream-side signatures + band explode, then a
    * STREAM-STATIC equi-join on (band, key) — Spark executes the static
    * side as a regular batch relation per micro-batch, no state, no
    * watermark needed for correctness (the join carries no streaming
    * state at all; at 100 TB the static side is the partition-pruned
    * index read, see buildDedupIndex). Verify = MinHash slot-equality
    * estimate, exactly the batch [[graft.operators.Dedup.incrementalDedup]]
    * semantics. Emits one row per (doc, matched index id, band) ≥
    * threshold — a doc matching an index entry in several bands emits
    * once per band (the join stays completely STATELESS; collapsing
    * per-band duplicates would need a dedup state store). Same
    * at-least-once contract as [[nearDupCollisions]]'s cap: consumers
    * dedup on (doc_id, index_id) or simply drop flagged docs.
    */
  def indexCollisions(docs: DataFrame,
      index: graft.operators.Dedup.DedupIndex, threshold: Double,
      k: Int = 16, shingleLen: Int = 3, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val banded = docs
      .withColumn("sig",
        DF.minhashFast(TF.tokens(col("text")), k, shingleLen))
      .select(col("doc_id"), col("ts"), col("sig"),
        explode(DF.bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("doc_id"), col("ts"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val est = size(filter(
      zip_with(col("sig"), col("index_sig"), (a, b) => a === b),
      x => x)).cast("double") / k
    // disk-backed index: include the layout partition column in the
    // stream-static join keys (functionally dependent on key) so the
    // static side's scan can prune — same device as incrementalDedup
    val (probe, bandJoinKeys) = index.meta match {
      case Some(m) => (banded.withColumn("key_bucket",
          graft.operators.Dedup.keyBucketOf(col("key"), m.keyBuckets)),
        Seq("band", "key_bucket", "key"))
      case None => (banded, Seq("band", "key"))
    }
    probe
      .join(index.bands, bandJoinKeys) // stream-static equi-join
      .join(index.signatures.withColumnRenamed("sig", "index_sig"),
        Seq("index_id"))
      .withColumn("est_jaccard", est)
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_id"), col("index_id"), col("band"),
        col("est_jaccard"), col("ts"))
  }

  /** Matches of a document STREAM against a PERSISTED span index
    * ([[graft.operators.SpanDedup.writeSpanIndex]]) — the
    * verbatim-passage half of the stream-vs-index story, the span
    * analogue of [[indexCollisions]]: each arriving document explodes
    * to its distinct span hashes (stateless, span length and bucket
    * modulus from the index's OWN sidecar), and a STREAM-STATIC
    * equi-join on (h_bucket, h) flags re-used passages the moment they
    * land. Emits one row per (doc, span hash, matched index doc);
    * completely stateless — no watermark needed. Consumers aggregate
    * per doc_id; the batch analogue with the hub cap and per-doc
    * accounting is
    * [[graft.operators.SpanDedup.incrementalSpanDedup]] — the cap
    * itself needs a span's full match set, which a stateless per-batch
    * join cannot see, so template-heavy corpora should drop hub spans
    * at INDEX BUILD time (filter the index rows by df) or aggregate
    * downstream.
    */
  def spanIndexCollisions(docs: DataFrame, indexPath: String): DataFrame = {
    val spark = docs.sparkSession
    val meta = graft.operators.SpanDedup.readSpanIndexMeta(spark, indexPath)
    val idx = graft.operators.SpanDedup.readSpanIndex(spark, indexPath)
    docs
      // tokens materialized BEFORE the shingle lambda (HOF re-eval trap)
      .withColumn("__sp_toks", TF.tokens(col("text")))
      .select(col("doc_id"), col("ts"),
        explode(TF.shinglesOf(col("__sp_toks"), meta.spanTokens))
          .as("span"))
      .select(col("doc_id"), col("ts"), xxhash64(col("span")).as("h"))
      .withColumn("h_bucket",
        graft.operators.Dedup.keyBucketOf(col("h"), meta.hashBuckets))
      .join(idx, Seq("h_bucket", "h")) // stream-static equi-join
      .select(col("doc_id"), col("index_id"), col("h"), col("ts"))
  }

  /** Collisions stream for `docs` (columns doc_id, text, ts). A doc
    * colliding in several bands emits one row per band; downstream
    * dedups on doc_id (or verifies once). `evictAfterMs` is the bucket
    * idle horizon — keep it >= the watermark delay so buckets outlive
    * the late-data window they guard.
    */
  def nearDupCollisions(docs: DataFrame, watermark: String = "1 hour",
      k: Int = 16, shingleLen: Int = 3, bands: Int = 4,
      maxBucketIds: Int = 64,
      evictAfterMs: Long = 60L * 60 * 1000): Dataset[Collision] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = k / bands
    val banded = docs
      .withColumn("sig",
        DF.minhashFast(TF.tokens(col("text")), k, shingleLen))
      .select(col("doc_id"), col("ts"),
        explode(DF.bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("doc_id"), col("ts"))
      .withWatermark("ts", watermark)
      .as[BandRow]
    bandCollisions(banded, maxBucketIds, evictAfterMs)
  }

  /** The bucket-state collision fold itself, generic over any banded id
    * stream — MinHash bands ([[nearDupCollisions]]), image aHash blocks
    * ([[MediaStream.imageNearDupCollisions]]), or any future signature
    * family that reduces to `(band, key)` bucket hits. `banded` must
    * already carry its event-time watermark; state/delivery semantics
    * are the object-level contract (bounded per-bucket ids,
    * at-least-once at the cap, wholesale eviction past the horizon).
    */
  def bandCollisions(banded: Dataset[BandRow], maxBucketIds: Int = 64,
      evictAfterMs: Long = 60L * 60 * 1000): Dataset[Collision] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (bk: (Int, Long), rs: Iterator[BandRow],
            state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rs.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var cur = state.getOption
            val out = Seq.newBuilder[Collision]
            sorted.foreach { r =>
              cur match {
                case Some(s) =>
                  val bumped = s.copy(lastTs = math.max(s.lastTs, r.ts.getTime))
                  if (!s.ids.contains(r.doc_id)) {
                    out += Collision(r.doc_id, s.canonicalId, bk._1, bk._2,
                      r.ts)
                    // at the cap the id is NOT remembered: a re-delivery
                    // of a capped id re-emits (at-least-once at the cap;
                    // consumers dedup on doc_id — see scaladoc). The cap
                    // bounds state for adversarial hot buckets.
                    val ids =
                      if (s.ids.size < maxBucketIds) r.doc_id :: s.ids
                      else s.ids
                    cur = Some(bumped.copy(ids = ids))
                  } else {
                    // STILL bump lastTs: leaving it stale lets the
                    // timeout below land before the advancing watermark,
                    // which Spark rejects (query-killing exception)
                    cur = Some(bumped)
                  }
                case None =>
                  cur = Some(BucketState(r.doc_id, List(r.doc_id),
                    r.ts.getTime))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + evictAfterMs)
            }
            out.result().iterator
          }
      }
  }
}
