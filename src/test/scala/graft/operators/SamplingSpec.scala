package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sampling: reproducible under re-execution and
  * repartitioning, rate-accurate, and stratification applies per-group
  * rates. (df.sample() guarantees none of these across repartitions.)
  */
class SamplingSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("sample is a pure function of the id: same rows every run, " +
      "any partitioning") {
    val a = Sampling.sample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.sample(docs.repartition(13), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("sampled fraction lands near the requested rate") {
    val n = docs.count().toDouble
    val k = Sampling.sample(docs, "doc_id", 0.3).count().toDouble
    assert(math.abs(k / n - 0.3) < 0.08, s"got ${k / n}, wanted ~0.3")
  }

  test("stratified rates apply per stratum; unlisted strata get the default") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0), defaultFraction = 0.2)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") === totals("en")) // rate 1.0 keeps everything
    assert(!byLang.contains("de")) // rate 0.0 keeps nothing
    val others = totals.keySet -- Set("en", "de")
    others.foreach { l =>
      val rate = byLang.getOrElse(l, 0L).toDouble / totals(l)
      assert(rate > 0.02 && rate < 0.5, s"stratum $l rate $rate not ~0.2")
    }
  }

  test("hash buckets split disjointly and cover everything (train/val/test)") {
    val b = Sampling.hashBucket(col("doc_id"))
    val train = docs.filter(b < 8000).count()
    val valid = docs.filter(b >= 8000 && b < 9000).count()
    val test = docs.filter(b >= 9000).count()
    assert(train + valid + test === docs.count())
  }
}
