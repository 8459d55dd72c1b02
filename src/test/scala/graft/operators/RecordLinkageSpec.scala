package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {

  private def entities() = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "acme corp"),
      (2L, "acme corp."),   // near-dup of 1
      (3L, "acme inc"),
      (4L, "zenith ltd"),   // alone in its block
      (5L, "bcme corp")     // blocks under 'b', never meets 1/2/3
    ).toDF("id", "name")
  }

  test("bestLinks picks the strongest in-block match, deterministically") {
    val best = RecordLinkage.bestLinks(entities(), "id", "name",
        n => substring(n, 1, 1), minSim = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // 1's best is 2 ("acme corp" vs "acme corp."), not 3
    assert(best(1L)._1 === 2L)
    assert(best(2L)._1 === 1L)
    assert(best(3L)._1 === 1L || best(3L)._1 === 2L)
    // 4 and 5 have no in-block candidate -> absent
    assert(!best.contains(4L) && !best.contains(5L))
    // symmetric pair scores agree
    assert(best(1L)._2 === best(2L)._2)
  }

  test("maxBlockRows drops quadratic blocks before the self-join") {
    val pairs = RecordLinkage.fuzzyPairs(entities(), "id", "name",
      n => substring(n, 1, 1), minSim = 0.0, maxBlockRows = Some(2))
    // the 'a' block (3 rows) is dropped; 'z' and 'b' blocks have no
    // pairs -> empty output
    assert(pairs.count() === 0)
    val kept = RecordLinkage.fuzzyPairs(entities(), "id", "name",
      n => substring(n, 1, 1), minSim = 0.0, maxBlockRows = Some(3))
    assert(kept.count() === 6) // 3 directed pairs in 'a', both directions
  }

  test("pair scores come from the codegen'd expression (parity with SQL)") {
    val s = spark
    import s.implicits._
    val got = RecordLinkage.fuzzyPairs(entities(), "id", "name",
        n => substring(n, 1, 1), minSim = 0.0)
      .filter(col("id") === 1L && col("match_id") === 2L)
      .select(col("jw")).head().getDouble(0)
    val want = Seq(("acme corp", "acme corp.")).toDF("a", "b")
      .selectExpr("graft_jaro_winkler(a, b) AS jw").head().getDouble(0)
    assert(got === want)
  }

  test("editDistanceJoin ≡ brute force at several distances, " +
      "including the short-string fallback channel") {
    val s = spark
    import s.implicits._
    val names = Seq(
      (1L, "small ring"), (2L, "small rng"), (3L, "smal ring"),
      (4L, "red widget"), (5L, "red widgets"), (6L, "blue bolt"),
      (7L, "ab"), (8L, "ac"), (9L, "b"), (10L, "abc"),
      (11L, "abcd") // bridges the short class to the gram class
    ).toDF("id", "s")
    for (d <- Seq(1, 2)) {
      val fast = RecordLinkage.editDistanceJoin(names, "id", "s", d)
        .select("a_id", "b_id", "dist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      val slow = names.as("a").join(names.as("b"),
          col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          levenshtein(col("a.s"), col("b.s")).as("dist"))
        .filter(col("dist") <= d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      assert(fast === slow, s"mismatch at d=$d")
      assert(fast.nonEmpty)
    }
  }

  test("editDistanceJoin finds pairs on real part names") {
    val parts = spark.read
      .parquet("/root/testdata/sf0.001/part.parquet")
      .groupBy(col("p_name")).agg(min(col("p_partkey")).as("id"))
      .select(col("id"), col("p_name"))
    val out = RecordLinkage.editDistanceJoin(parts, "id", "p_name", 2)
    assert(out.count() > 0)
  }
}
