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

  test("hits: the shared target dominates authority, the busy source " +
      "dominates hubs, and both sides are unit-normalized") {
    val s = spark
    import s.implicits._
    val edges = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L), // everyone points at 10
      (1L, 11L)                        // 1 also points at 11
    ).toDF("src", "dst")
    val out = Graph.hits(edges, "src", "dst", iters = 5)
      .collect().map(r => (r.getAs[String]("side"), r.getAs[Long]("id"))
        -> r.getAs[Double]("score")).toMap
    val auth = out.filter(_._1._1 == "authority")
    val hubs = out.filter(_._1._1 == "hub")
    assert(auth.maxBy(_._2)._1._2 === 10L)
    assert(hubs.maxBy(_._2)._1._2 === 1L)
    // L2 norms are 1 after the final normalization
    assert(math.abs(auth.values.map(x => x * x).sum - 1.0) < 1e-9)
    assert(math.abs(hubs.values.map(x => x * x).sum - 1.0) < 1e-9)
    // hubs 2 and 3 are symmetric
    assert(math.abs(hubs(("hub", 2L)) - hubs(("hub", 3L))) < 1e-12)
  }

  test("propagateLabels: majority vote, lexicographic tie-break, " +
      "rounds tracked, seeds immutable, unreachable stay unlabeled") {
    val s = spark
    import s.implicits._
    // seeds: 1=en, 2=en, 3=fr. node 4 touches all three -> majority en.
    // node 5 touches 2(en) and 3(fr) -> tie -> 'en' (lexicographic).
    // node 6 only reaches the seeds through 5 -> round 2.
    // node 7 is isolated. seed 1 also neighbors seed 3 -> unchanged.
    val edges = Seq(
      (1L, 4L), (2L, 4L), (3L, 4L),
      (2L, 5L), (3L, 5L),
      (5L, 6L),
      (1L, 3L)
    ).toDF("a", "b")
    val seeds = Seq((1L, "en"), (2L, "en"), (3L, "fr"))
      .toDF("id", "lang")
    val out = Graph.propagateLabels(seeds, "id", "lang", edges, "a", "b",
        rounds = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("label"), r.getAs[Int]("round_assigned"))).toMap
    assert(out(1L) === (("en", 0)) && out(3L) === (("fr", 0)))
    assert(out(4L) === (("en", 1)))
    assert(out(5L) === (("en", 1)), "tie must break lexicographically")
    assert(out(6L) === (("en", 2)), "second hop labels in round 2")
    assert(!out.contains(7L))
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

  test("bfsDistances: shortest hop counts, hop cap, early exit, " +
      "unreachable nodes absent") {
    val s = spark
    import s.implicits._
    // 1->2->3->4 chain, a 1->3 shortcut, 5->1 (wrong direction from
    // the seed), 6 isolated via 7
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (5L, 1L),
      (6L, 7L)).toDF("s", "d")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val out = Graph.bfsDistances(edges, "s", "d", seeds, "node",
        maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // shortcut wins: 3 is 1 hop, 4 is 2; 5/6/7 unreachable forward
    assert(out === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    // hop cap stops the expansion
    val capped = Graph.bfsDistances(edges, "s", "d", seeds, "node",
        maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped === Map(1L -> 0, 2L -> 1, 3L -> 1))
  }
}
