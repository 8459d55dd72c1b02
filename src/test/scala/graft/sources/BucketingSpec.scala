package graft.sources

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** The plan law bucketing buys: a both-sides-bucketed equi-join plans
  * with ZERO shuffle exchanges (and no per-task sort), where the same
  * join over plain parquet pays two; results are row-identical.
  */
class BucketingSpec extends SparkSpec {

  private def tmp(name: String) =
    new java.io.File(sys.props("java.io.tmpdir"), name).getAbsolutePath

  test("both-sides-bucketed join: no exchange, no sort, same rows") {
    val s = spark
    import s.implicits._
    val a = (1L to 2000L).map(i => (i % 97, i, s"a$i"))
      .toDF("k", "ida", "pa")
    val b = (1L to 3000L).map(i => (i % 97, i, s"b$i"))
      .toDF("k", "idb", "pb")
    Bucketing.writeBucketed(a, "bk_a", tmp("graft_bk_a"), "k", 8)
    Bucketing.writeBucketed(b, "bk_b", tmp("graft_bk_b"), "k", 8)

    val joined = Bucketing.bucketedEquiJoin(s, "bk_a", "bk_b", "k")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected a SortMergeJoin:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$p")
    assert("Bucketed: true".r.findAllIn(p).size === 2,
      s"both scans must report the bucket layout:\n$p")

    // vs the plain parquet join: two exchanges
    val pa = tmp("graft_bk_plain_a"); val pb = tmp("graft_bk_plain_b")
    a.write.mode("overwrite").parquet(pa)
    b.write.mode("overwrite").parquet(pb)
    val plain = s.read.parquet(pa).hint("merge")
      .join(s.read.parquet(pb).hint("merge"), Seq("k"))
    assert("Exchange hashpartitioning".r.findAllIn(
        plain.queryExecution.executedPlan.toString).size >= 2,
      "the un-bucketed baseline should pay both shuffles")

    // row-identical results
    val got = joined.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = plain.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("keyed aggregation over a bucketed table also skips its " +
      "exchange") {
    val s = spark
    val agg = s.table("bk_a").groupBy(col("k"))
      .agg(count(lit(1)).as("c"))
    assert(!agg.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
      "groupBy on the bucket key must reuse the layout:\n" +
        agg.queryExecution.executedPlan)
  }
}
