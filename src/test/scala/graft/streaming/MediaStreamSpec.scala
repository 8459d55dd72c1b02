package graft.streaming

import java.sql.Timestamp

import graft.ingest.SparkSpec
import graft.operators.{MediaDedup, Multimodal}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming image near-dup detection: an arriving near-copy collides
  * against the bucket canonical in some aHash block, distinct images
  * pass silently, and the flagged pair set matches the batch banded
  * join on the same corpus.
  */
class MediaStreamSpec extends SparkSpec {

  import MediaStream.MediaRow

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  /** Real PNG bytes for a 64-pixel grayscale image. */
  private def pngBytes(rows: Seq[(Long, Seq[Double])]): Map[Long, Array[Byte]] = {
    val s = spark
    import s.implicits._
    Multimodal.encodePng(rows.toDF("id", "pixels"), "id", "pixels",
        side = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
  }

  test("an arriving near-copy collides against the canonical; distinct " +
      "images pass; the collision set matches the batch banded join") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(64)(rnd.nextInt(256).toDouble)
    val nearCopy = base.zipWithIndex.map { case (p, i) =>
      if (i % 16 == 0) math.min(255.0, p + 3) else p
    }
    val distinct = Seq.fill(64)(rnd.nextInt(256).toDouble)
    val bytes = pngBytes(Seq((1L, base), (2L, nearCopy), (3L, distinct)))

    val mem = MemoryStream[MediaRow]
    val q = MediaStream.imageNearDupCollisions(mem.toDF())
      .writeStream.format("memory").queryName("img_collisions")
      .outputMode(OutputMode.Append()).start()
    mem.addData(MediaRow(1L, bytes(1L), ts(0)),
      MediaRow(9L, "not an image".getBytes("UTF-8"), ts(0)))
    mem.addData(MediaRow(2L, bytes(2L), ts(1)),
      MediaRow(3L, bytes(3L), ts(1)))
    q.processAllAvailable()
    q.stop()

    val out = s.sql("SELECT * FROM img_collisions").collect()
    val pairs = out.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("canonical_id"))).toSet
    assert(pairs === Set((2L, 1L)),
      s"only the near-copy collides, against the canonical: ${out.toSeq}")

    // stream ≡ batch: the batch banded join finds exactly the same pair
    val media = Seq((1L, bytes(1L)), (2L, bytes(2L)), (3L, bytes(3L)))
      .toDF("media_id", "media")
    val batch = MediaDedup.nearDupPairs(
        MediaDedup.averageHash(media), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === Set((1L, 2L)))
  }

  test("re-delivery of a known id does not re-collide below the cap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val px = Seq.tabulate(64)(i => (i * 4).toDouble)
    val bytes = pngBytes(Seq((5L, px)))

    val mem = MemoryStream[MediaRow]
    val q = MediaStream.imageNearDupCollisions(mem.toDF())
      .writeStream.format("memory").queryName("img_redelivery")
      .outputMode(OutputMode.Append()).start()
    mem.addData(MediaRow(5L, bytes(5L), ts(0)))
    mem.addData(MediaRow(5L, bytes(5L), ts(2)))
    q.processAllAvailable()
    q.stop()
    assert(s.sql("SELECT * FROM img_redelivery").count() === 0)
  }

  test("imageNearDupCollisionsBy with the dHash core catches a " +
      "brightness-shifted copy that the aHash core flags differently; " +
      "each core's stream matches its batch pair set") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = Seq.tabulate(64)(i => ((i * 29) % 17) * 10.0 + 30.0)
    val brighter = base.map(p => math.min(p + 40.0, 255.0))
    val bytes = pngBytes(Seq((1L, base), (2L, brighter)))
    def run(name: String,
        hasher: Array[Byte] => Option[(Array[Long], Int)]): Set[(Long, Long)] = {
      val mem = MemoryStream[MediaStream.MediaRow]
      val q = MediaStream.imageNearDupCollisionsBy(mem.toDF(), hasher)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      mem.addData(MediaStream.MediaRow(1L, bytes(1L), ts(0)))
      mem.addData(MediaStream.MediaRow(2L, bytes(2L), ts(1)))
      q.processAllAvailable()
      q.stop()
      s.sql(s"SELECT * FROM $name").collect()
        .map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("canonical_id"))).toSet
    }
    // gradients unchanged under the uniform shift -> dHash collides
    val dPairs = run("dhash_collisions", MediaDedup.dHashBytes _)
    assert(dPairs === Set((2L, 1L)))
    // parity with the batch join per core
    val media = Seq((1L, bytes(1L)), (2L, bytes(2L)))
      .toDF("media_id", "media")
    val dBatch = MediaDedup.nearDupPairs(
        MediaDedup.differenceHash(media), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dBatch === Set((1L, 2L)))
    val pPairs = run("phash_collisions", MediaDedup.pHashBytes _)
    val pBatch = MediaDedup.nearDupPairs(
        MediaDedup.perceptualHash(media), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pPairs === pBatch.map { case (a, b) => (b, a) })
  }
}
