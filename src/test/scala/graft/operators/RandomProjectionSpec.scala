package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {

  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._

  test("signMatrix: deterministic, ±1 only, not degenerate") {
    val a = RandomProjection.signMatrix(64, 16)
    val b = RandomProjection.signMatrix(64, 16)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(v => v == 1.0 || v == -1.0))
    // a constant row/column would make the coordinate useless; the
    // md5 parity mixes well enough that every row has both signs
    assert(a.forall(r => r.contains(1.0) && r.contains(-1.0)))
  }

  test("projectSigned: zero vector projects to exact zeros, " +
      "identical vectors to identical projections") {
    val df = Seq(
      (1L, Array.fill(8)(0.0f)),
      (2L, Array.tabulate(8)(i => i.toFloat / 8)),
      (3L, Array.tabulate(8)(i => i.toFloat / 8)))
      .toDF("vec_id", "embedding")
    val r = RandomProjection.projectSigned(df, "embedding", dIn = 8,
        dOut = 4)
      .orderBy(col("vec_id"))
      .collect().map(_.getSeq[Double](2))
    assert(r(0).forall(_ === 0.0))
    assert(r(1) === r(2))
    assert(r(1).size === 4)
  }

  test("projectSigned: hand-checked single coordinate — the fold is " +
      "the signed sum over the declared dIn range times 1/sqrt(dOut)") {
    val m = RandomProjection.signMatrix(4, 2)
    val v = Array(1.0f, 2.0f, 3.0f, 4.0f)
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
    val got = RandomProjection.projectSigned(df, "embedding", dIn = 4,
      dOut = 2).collect()(0).getSeq[Double](2)
    val want = (0 until 2).map { j =>
      val s = (0 until 4).foldLeft(0.0)((a, i) => a + v(i) * m(j)(i))
      graft.functions.Grid.snapD(s * (1.0 / math.sqrt(2.0)), 6)
    }
    assert(got === want)
  }

  test("JL property: distance ratios concentrate around 1 on a " +
      "structured corpus (loose bound — the gated audit measures it)") {
    val vecs = (0L until 64L).map { id =>
      (id, Array.tabulate(64)(i =>
        (math.sin(id * 0.7 + i * 1.3) * 0.5).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val proj = RandomProjection.projectSigned(df, "embedding",
      dIn = 64, dOut = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    val orig = vecs.toMap
    val ratios = (0L until 63L).map { id =>
      val (ea, eb) = (orig(id), orig(id + 1))
      val (pa, pb) = (proj(id), proj(id + 1))
      val dO = (0 until 64).foldLeft(0.0)((a, i) =>
        a + (ea(i) - eb(i)).toDouble * (ea(i) - eb(i)))
      val dP = (0 until 16).foldLeft(0.0)((a, i) =>
        a + (pa(i) - pb(i)) * (pa(i) - pb(i)))
      dP / dO
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.6 && mean < 1.6, s"mean ratio $mean")
    assert(ratios.count(r => r > 0.2 && r < 3.0) >= ratios.size * 3 / 4)
  }
}
