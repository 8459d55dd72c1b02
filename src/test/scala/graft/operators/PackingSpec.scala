package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing: hand-verified span arithmetic, reconstruction and
  * fill invariants, and bucketing-independence of the prefix sum.
  */
class PackingSpec extends SparkSpec {

  test("packSequences: hand-computed spans across a boundary-straddling " +
      "doc, zero-token docs dropped") {
    val s = spark
    import s.implicits._
    // token stream (S = 5): doc1 |a b c| doc2 |d e f g| doc3 |h i|
    // seq0 = [a b c d e], seq1 = [f g h i]
    val docs = Seq(
      (1L, "a b c"),
      (2L, "d e f g"),
      (3L, "h i"),
      (4L, "")  // zero tokens: no rows
    ).toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "doc_id", "text", seqLen = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(t => (t._2, t._1))
    assert(out.toSeq === Seq(
      (1L, 0L, 0L, 3L, 0L), // doc1 fully in seq0 at offset 0
      (2L, 0L, 0L, 2L, 3L), // doc2 tokens [0,2) fill seq0's tail
      (2L, 1L, 2L, 4L, 0L), // doc2 tokens [2,4) open seq1
      (3L, 1L, 0L, 2L, 2L)  // doc3 follows at seq1 offset 2
    ), s"got ${out.toSeq}")
  }

  test("packSequences invariants: spans reconstruct every doc, every " +
      "sequence is full except the last, bucketing does not change " +
      "the packing") {
    val s = spark
    import s.implicits._
    // 40 docs with varying lengths 1..8 tokens
    val docs = (0L until 40L)
      .map(d => (d, (0 until (d % 8 + 1).toInt).map(k => s"t${d}_$k")
        .mkString(" ")))
      .toDF("doc_id", "text")
    val S = 7
    val packed = Packing.packSequences(docs, "doc_id", "text", S)
    val rows = packed.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))

    // per-doc reconstruction: spans are contiguous from 0 to n_tokens
    val byDoc = rows.groupBy(_._1)
    val nTok = docs.select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (d, spans) =>
      val sorted = spans.sortBy(_._2)
      assert(sorted.head._3 === 0L, s"doc $d must start at token 0")
      assert(sorted.last._4 === nTok(d), s"doc $d must end at its length")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 === b._3 && b._2 === a._2 + 1,
            s"doc $d spans must be contiguous across consecutive seqs")
        case _ => ()
      }
    }

    // per-sequence fill: exactly S tokens everywhere but the last
    val fill = Packing.sequenceFill(packed)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val lastSeq = fill.keys.max
    val total = nTok.values.sum
    fill.foreach { case (seq, t) =>
      if (seq < lastSeq) assert(t === S.toLong, s"seq $seq not full: $t")
    }
    assert(fill.values.sum === total)
    assert(fill(lastSeq) === (if (total % S == 0) S.toLong
      else total % S))

    // the packing is a function of (id order, lengths) only — the
    // bucketed prefix sum must be invisible at any bucketShift
    val alt = Packing.packSequences(docs, "doc_id", "text", S,
        bucketShift = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(alt.sorted.toSeq === rows.sorted.toSeq)
  }

  test("packSequencesBy: each group packs exactly as packSequences " +
      "would on that group alone, and sequences never mix groups") {
    val s = spark
    import s.implicits._
    val docs = (0L until 40L)
      .map(d => (d, if (d % 3 == 0) "ga" else "gb",
        (0 until (d % 6 + 1).toInt).map(k => s"w${d}_$k").mkString(" ")))
      .toDF("doc_id", "grp", "text")
    val grouped = Packing.packSequencesBy(docs, "doc_id", "grp", "text",
        seqLen = 7)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    Seq("ga", "gb").foreach { g =>
      val solo = Packing.packSequences(docs.filter(col("grp") === g),
          "doc_id", "text", seqLen = 7)
        .collect()
        .map(r => (g, r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(grouped.filter(_._1 == g).sorted.toSeq === solo.sorted.toSeq,
        s"group $g must pack as if alone")
    }
  }

  test("packedSequenceTexts: payloads are the concatenated stream, cut " +
      "exactly at sequence boundaries") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c"),
      (2L, "d e f g"),
      (3L, "h i")
    ).toDF("doc_id", "text")
    val out = Packing.packedSequenceTexts(docs, "doc_id", "text",
        seqLen = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[String](2))))
      .toMap
    assert(out === Map(
      0L -> ((5L, Seq("a", "b", "c", "d", "e"))),
      1L -> ((4L, Seq("f", "g", "h", "i")))))

    // stream identity on a larger corpus: sequences in order, flattened,
    // equal the documents' tokens in id order, flattened
    val big = (0L until 30L)
      .map(d => (d, (0 until (d % 7 + 1).toInt).map(k => s"w${d}_$k")
        .mkString(" ")))
      .toDF("doc_id", "text")
    val seqs = Packing.packedSequenceTexts(big, "doc_id", "text",
        seqLen = 11)
      .orderBy(col("seq_id")).collect()
      .flatMap(_.getSeq[String](2))
    val stream = big.orderBy(col("doc_id"))
      .select(graft.functions.TextFunctions.tokens(col("text")))
      .collect().flatMap(_.getSeq[String](0))
    assert(seqs.toSeq === stream.toSeq,
      "reassembled sequences must reproduce the exact token stream")
  }
}
