package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("pageRank: hand-computed round on a dangling graph; mass conserved") {
    val s = spark
    import s.implicits._
    // a -> b; b and c dangling
    val nodes = Seq("a", "b", "c").toDF("id")
    val edges = Seq(("a", "b")).toDF("src", "dst")
    graft.CacheScope.scoped {
      val r = Graph.pageRank(nodes, "id", edges, "src", "dst", iters = 1)
        .collect().map(x => x.getString(0) ->
          (x.getAs[Long]("deg"), x.getAs[Double]("pr"))).toMap
      val third = 1.0 / 3
      val dang = 2 * third // b + c
      val base = (1 - 0.85) / 3
      assert(math.abs(r("a")._2 - (base + 0.85 * (dang / 3))) < 1e-12)
      assert(math.abs(r("b")._2 -
        (base + 0.85 * (third + dang / 3))) < 1e-12)
      assert(r("c")._2 === r("a")._2)
      assert(r("a")._1 === 1L && r("b")._1 === 0L)
      assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-12)
    }
  }

  test("pageRank: the hub of a star out-ranks the leaves; sum stays 1") {
    val s = spark
    import s.implicits._
    val nodes = ("hub" +: (1 to 6).map(i => s"leaf$i")).toDF("id")
    // undirected star: hub <-> each leaf
    val e0 = (1 to 6).map(i => ("hub", s"leaf$i")).toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst"), col("src")))
    graft.CacheScope.scoped {
      val r = Graph.pageRank(nodes, "id", edges, "src", "dst", iters = 10)
        .collect().map(x => x.getString(0) -> x.getAs[Double]("pr")).toMap
      assert(r("hub") > r("leaf1") * 2)
      assert((1 to 6).forall(i => math.abs(r(s"leaf$i") - r("leaf1")) < 1e-12))
      assert(math.abs(r.values.sum - 1.0) < 1e-9)
    }
  }

  test("pageRank rejects empty nodes and bad parameters") {
    val s = spark
    import s.implicits._
    val nodes = Seq("a").toDF("id")
    val edges = Seq.empty[(String, String)].toDF("src", "dst")
    intercept[IllegalArgumentException](
      Graph.pageRank(nodes, "id", edges, "src", "dst", iters = 0))
    intercept[IllegalArgumentException](
      Graph.pageRank(nodes, "id", edges, "src", "dst", 5, damping = 1.0))
  }

  test("triangleStats: hand-built graph — K4 plus a pendant edge") {
    val s = spark
    import s.implicits._
    // K4 on {1,2,3,4} has C(4,3)=4 triangles, 6 edges; pendant 4-5
    // adds an edge and two wedges at node 4 but no triangle.
    // Unoriented/duplicate input rows must normalize away.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 4L), (1L, 2L), (3L, 3L) // reversed-only, duplicate, loop
    ).toDF("a", "b")
    val r = Graph.triangleStats(edges, "a", "b").head()
    assert(r.getAs[Long]("n_nodes") === 5L)
    assert(r.getAs[Long]("n_edges") === 7L)
    assert(r.getAs[Long]("n_triangles") === 4L)
    // degrees: 3,3,3,4,1 -> wedges 3+3+3+6+0 = 15
    assert(r.getAs[Long]("n_wedges") === 15L)
    assert(r.getAs[Double]("clustering_coeff") === 0.8) // 12/15
  }

  test("triangle-free graph scores zero; empty wedge set yields null") {
    val s = spark
    import s.implicits._
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r = Graph.triangleStats(path, "a", "b").head()
    assert(r.getAs[Long]("n_triangles") === 0L)
    assert(r.getAs[Double]("clustering_coeff") === 0.0)
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val e = Graph.triangleStats(empty, "a", "b").head()
    assert(e.getAs[Long]("n_triangles") === 0L)
    assert(e.isNullAt(e.fieldIndex("clustering_coeff")))
  }
}
