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
