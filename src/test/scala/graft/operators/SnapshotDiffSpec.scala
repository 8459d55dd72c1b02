package graft.operators

import graft.ingest.SparkSpec

/** Snapshot diffing: every id classified exactly once, content changes
  * detected by hash, reprocess set = added + changed.
  */
class SnapshotDiffSpec extends SparkSpec {

  test("added/removed/changed/unchanged partition the id space") {
    val s = spark
    import s.implicits._
    val oldSnap = Seq(
      (1L, "stable content"), (2L, "will change"), (3L, "will vanish")
    ).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "stable content"), (2L, "has changed"), (4L, "brand new")
    ).toDF("doc_id", "text")
    val d = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    val re = SnapshotDiff.toReprocess(oldSnap, newSnap, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(re === Set(2L, 4L), "downstream re-processes added+changed only")
  }

  test("null text is a value, not absence: presence comes from the side") {
    val s = spark
    import s.implicits._
    val oldSnap = Seq(
      (1L, null.asInstanceOf[String]), // null in both -> unchanged
      (2L, null.asInstanceOf[String]), // null -> text: changed
      (3L, null.asInstanceOf[String])  // deleted null-text doc: removed
    ).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, "now has text")
    ).toDF("doc_id", "text")
    val d = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed"),
      s"null-text misclassification: $d")
  }
}
