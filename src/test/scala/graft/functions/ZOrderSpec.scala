package graft.functions

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Morton interleaving: hand-checked bit layout, monotone-quadrant
  * ordering, and the measured layout claim — a 2-D box filter under
  * the z-range layout touches strictly fewer files than under a hash
  * scatter of the same rows.
  */
class ZOrderSpec extends SparkSpec {

  test("hand bits: a-bits land at even positions, b-bits at odd") {
    val s = spark
    import s.implicits._
    val rows = Seq((3L, 1L), (0L, 0L), (1L, 0L), (0L, 1L), (5L, 2L))
      .toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.interleave2(col("a"), col("b"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(rows((3L, 1L)) === 7L)   // 0b11 x 0b01 -> 0b0111
    assert(rows((0L, 0L)) === 0L)
    assert(rows((1L, 0L)) === 1L)
    assert(rows((0L, 1L)) === 2L)
    // a=0b101, b=0b010 -> z bits: a0@0=1, b0@1=0, a1@2=0, b1@3=1,
    // a2@4=1, b2@5=0 -> 0b010011? -> 1 + 8 + 16 = 25? positions:
    // 1<<0 | 1<<3 | 1<<4 = 25? no: a=5 bits {0,2}, b=2 bits {1}:
    // z = 1<<0 | 1<<(2*2) | 1<<(2*1+1) = 1 + 16 + 8 = 25
    assert(rows((5L, 2L)) === 25L)
  }

  test("z-range layout: the same 16x16 box filter touches strictly " +
      "fewer files than a hash scatter of the same rows") {
    val s = spark
    import s.implicits._
    val side = 140
    val pts = (0 until side * side)
      .map(i => (i.toLong, (i % side).toLong, (i / side).toLong))
      .toDF("id", "x", "y")
      .withColumn("z", ZOrder.interleave2(col("x"), col("y"), 8))
    val dirZ = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_zorder_layout").getAbsolutePath
    val dirH = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_hash_layout").getAbsolutePath
    pts.repartitionByRange(8, col("z")).write.mode("overwrite")
      .parquet(dirZ)
    pts.repartition(8).write.mode("overwrite").parquet(dirH)

    def filesTouched(dir: String): Long =
      s.read.parquet(dir)
        .filter(col("x") >= 32 && col("x") < 48 &&
          col("y") >= 32 && col("y") < 48)
        .select(input_file_name()).distinct().count()

    val zFiles = filesTouched(dirZ)
    val hFiles = filesTouched(dirH)
    assert(hFiles === 8L, s"hash scatter should hit every file: $hFiles")
    assert(zFiles < hFiles,
      s"z layout must localize the box: $zFiles vs $hFiles")
    assert(zFiles <= 3L, s"a 16x16 box spans few z runs: $zFiles")
  }
}
