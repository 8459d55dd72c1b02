package graft.streaming

import java.sql.Timestamp

import graft.ingest.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming near-dup detection through a MemoryStream: an arriving copy
  * collides against the bucket canonical; distinct docs pass silently;
  * re-deliveries don't re-collide.
  */
class DedupStreamSpec extends SparkSpec {

  import DedupStream.Doc

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("stream-static index collisions flag arriving copies of an " +
      "indexed corpus, stateless") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val existing = Seq(
      (100L, "the quick brown fox jumps over the lazy dog every day"),
      (200L, "a completely different document about spark query planning")
    ).toDF("doc_id", "text")
    val index = graft.operators.Dedup
      .buildDedupIndex(existing, "doc_id", "text")
    index.signatures.persist(); index.bands.persist()

    val mem = MemoryStream[Doc]
    val q = DedupStream.indexCollisions(mem.toDF(), index, threshold = 0.5)
      .writeStream.format("memory").queryName("idx_collisions")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      Doc(1L, "the quick brown fox jumps over the lazy dog every day", ts(0)),
      Doc(2L, "entirely novel content matching nothing in the corpus", ts(0)))
    q.processAllAvailable()
    q.stop()

    val out = s.sql("SELECT * FROM idx_collisions").collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === Set(1L), s"only the copy flags: ${out.toSeq}")
    assert(byDoc(1L).forall(_.getAs[Long]("index_id") === 100L))
    // exact copy -> identical signature -> every band collides (4 rows,
    // the documented per-band at-least-once emission)
    assert(byDoc(1L).map(_.getAs[Int]("band")).toSet === Set(0, 1, 2, 3))
    assert(byDoc(1L).forall(_.getAs[Double]("est_jaccard") === 1.0))
    index.signatures.unpersist(); index.bands.unpersist()
  }

  test("stream-static SPAN-index collisions flag arriving passage reuse " +
      "against the persisted index, stateless and batch-identical") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val passage = "one two three four five six seven eight"
    val corpus = Seq(
      (100L, s"prefix words $passage suffix words here"),
      (200L, "a completely different document about spark query planning " +
        "with enough words")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-span-stream").toString
    graft.operators.SpanDedup.writeSpanIndex(corpus, "doc_id", "text",
      dir, spanTokens = 5)

    val arrivals = Seq(
      Doc(1L, s"fresh wrapper around $passage and trailing text", ts(0)),
      Doc(2L, "entirely novel content matching nothing in the corpus " +
        "at all today", ts(0)))
    val mem = MemoryStream[Doc]
    val q = DedupStream.spanIndexCollisions(mem.toDF(), dir)
      .writeStream.format("memory").queryName("span_collisions")
      .outputMode(OutputMode.Append()).start()
    mem.addData(arrivals: _*)
    q.processAllAvailable()
    q.stop()

    val out = s.sql("SELECT * FROM span_collisions").collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === Set(1L), s"only the reuse flags: ${out.toSeq}")
    assert(byDoc(1L).forall(_.getAs[Long]("index_id") === 100L))
    // the 8-token passage carries 4 intact 5-token spans
    assert(byDoc(1L).map(_.getAs[Long]("h")).toSet.size === 4)
    // statelessness: identical rows from the batch form of the same op
    val batch = DedupStream.spanIndexCollisions(
        arrivals.toDF().select($"doc_id", $"text", $"ts"), dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("index_id"),
        r.getAs[Long]("h"))).toSet
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("index_id"),
      r.getAs[Long]("h"))).toSet === batch)
  }

  test("copies collide with the first-seen canonical; distinct docs do not") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textC = "completely different content about distributed query engines"
    val mem = MemoryStream[Doc]
    val q = DedupStream.nearDupCollisions(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("collisions")
      .outputMode(OutputMode.Append()).start()

    mem.addData(Doc(1L, textA, ts(0)))
    q.processAllAvailable()
    // exact copy -> identical signature -> collides in EVERY band
    mem.addData(Doc(2L, textA, ts(1)), Doc(3L, textC, ts(1)))
    q.processAllAvailable()
    // same copy re-delivered: already in bucket state, no new collisions
    mem.addData(Doc(2L, textA, ts(2)))
    q.processAllAvailable()
    q.stop()

    val out = s.sql("SELECT * FROM collisions").collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === Set(2L))
    val hits = byDoc(2L)
    assert(hits.length === 4, s"copy should collide in all 4 bands: ${hits.toSeq}")
    assert(hits.forall(_.getAs[Long]("canonical_id") === 1L))
    assert(hits.map(_.getAs[Int]("band")).toSet === Set(0, 1, 2, 3))
  }
}
