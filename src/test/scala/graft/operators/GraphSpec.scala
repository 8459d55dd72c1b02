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
}
