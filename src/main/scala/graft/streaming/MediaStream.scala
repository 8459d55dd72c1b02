package graft.streaming

import java.sql.Timestamp

import graft.operators.MediaDedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming image near-dup detection: [[graft.operators.MediaDedup]]'s
  * aHash-block banding lifted onto a continuous media stream and folded
  * through [[DedupStream.bandCollisions]] — the image analogue of the
  * MinHash collision stream, sharing its state machine, eviction, and
  * delivery contract verbatim.
  *
  * Each arriving image decodes ONCE (the batch hash core,
  * `MediaDedup.hashBytes`), its four 16-bit blocks become the bucket
  * keys, and a hit on a non-empty bucket flags the image against the
  * bucket's canonical id the moment it lands. By the 4-block pigeonhole
  * this catches every pair within Hamming ≤ 3 whose partner is still in
  * state — the batch recall law, minus whatever the watermark has
  * evicted (the bounded-state trade every streaming dedup makes).
  */
object MediaStream {

  /** Image media row on a stream: opaque bytes + event time. */
  case class MediaRow(media_id: Long, media: Array[Byte], ts: Timestamp)

  /** aHash-banded collisions for an image stream (columns `media_id`,
    * `media`, `ts`). Undecodable images produce no bucket rows (the
    * batch drop convention). Emits [[DedupStream.Collision]] rows with
    * `band` = block index 0..3 and `band_key` = the 16-bit block value;
    * a pair colliding in several blocks emits once per block —
    * consumers dedup on `doc_id` exactly as with the MinHash stream.
    */
  def imageNearDupCollisions(media: DataFrame, watermark: String = "1 hour",
      maxBucketIds: Int = 64,
      evictAfterMs: Long = 60L * 60 * 1000)
      : Dataset[DedupStream.Collision] =
    imageNearDupCollisionsBy(media, MediaDedup.hashBytes _, watermark,
      maxBucketIds, evictAfterMs)

  /** [[imageNearDupCollisions]] with a caller-chosen hash core — the
    * same banding, state machine, eviction, and delivery for any
    * 4-block 64-bit image hash: `MediaDedup.hashBytes` (aHash,
    * brightness layout), `MediaDedup.dHashBytes` (gradient — catches
    * the brightness-shifted dups aHash misses), `MediaDedup.pHashBytes`
    * (DCT frequency). MediaStreamSpec pins stream-vs-batch parity per
    * core.
    */
  def imageNearDupCollisionsBy(media: DataFrame,
      hasher: Array[Byte] => Option[(Array[Long], Int)],
      watermark: String = "1 hour", maxBucketIds: Int = 64,
      evictAfterMs: Long = 60L * 60 * 1000)
      : Dataset[DedupStream.Collision] = {
    val spark = media.sparkSession
    import spark.implicits._
    val banded = media.select(col("media_id").cast("long"), col("media"),
        col("ts"))
      .as[MediaRow]
      .flatMap { m =>
        hasher(m.media).toSeq.flatMap { case (blocks, _) =>
          blocks.iterator.zipWithIndex.map { case (bv, j) =>
            DedupStream.BandRow(j, bv, m.media_id, m.ts)
          }
        }
      }
      .withWatermark("ts", watermark)
    DedupStream.bandCollisions(banded, maxBucketIds, evictAfterMs)
  }
}
