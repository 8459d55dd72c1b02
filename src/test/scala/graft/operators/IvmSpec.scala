package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental view maintenance: fold ≡ whole, retraction
  * round-trips, zero-count rows vanish, on-disk fold invisible to
  * readers.
  */
class IvmSpec extends SparkSpec {

  private def facts = {
    val s = spark
    import s.implicits._
    Seq(("a", 1.25), ("a", 2.50), ("b", 4.00), ("b", 0.75),
      ("c", 9.00)).toDF("k", "v")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2))).sortBy(_._1).toSeq

  test("merge of split deltas == whole build; retraction inverts; " +
      "emptied keys vanish") {
    val f = facts
    val whole = Ivm.buildAggView(f, Seq("k"), "v")
    val p1 = f.filter(col("v") < 3)
    val p2 = f.filter(col("v") >= 3)
    val folded = Ivm.mergeViews(Seq("k"),
      Ivm.buildAggView(p1, Seq("k"), "v"),
      Ivm.buildAggView(p2, Seq("k"), "v"))
    assert(rows(folded) === rows(whole))
    // retract p2: back to p1's view; key c (only in p2) vanishes
    val retracted = Ivm.mergeViews(Seq("k"), whole,
      Ivm.buildAggView(p2, Seq("k"), "v", negate = true))
    assert(rows(retracted) === rows(Ivm.buildAggView(p1, Seq("k"),
      "v")))
    assert(!rows(retracted).exists(_._1 == "c"))
  }

  test("on-disk delta fold: appended deltas invisible to readers") {
    val s = spark
    val f = facts
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_ivm_spec").getAbsolutePath
    Ivm.writeView(Ivm.buildAggView(f.filter(col("v") < 3), Seq("k"),
      "v"), path)
    Ivm.appendDelta(Ivm.buildAggView(f.filter(col("v") >= 3),
      Seq("k"), "v"), path)
    val read = Ivm.readView(s, path, Seq("k"))
    assert(rows(read) === rows(Ivm.buildAggView(f, Seq("k"), "v")))
  }
}
