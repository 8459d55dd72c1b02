package graft

import graft.ingest.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Cache-ownership contract: operator-persisted frames registered with an
  * active [[CacheScope]] are released when the scope closes (after the
  * caller's action), and are the CALLER's to release when no scope is
  * active. Round 3's bench measured q64 at 34.7 s in-bench vs 8.0 s in a
  * fresh session — almost entirely caches stranded by earlier queries —
  * so "no stranded InMemoryRelations after a sweep" is a tested
  * invariant, not a convention.
  */
class CacheScopeSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .filter(col("doc_id") < 100)

  // Compare RDD-id SETS, not counts: the ContextCleaner may release
  // other suites' GC'd checkpoint blocks at any moment, so "nothing NEW
  // remains" is the stable invariant — a shrinking background set is not.
  private def cachedIds = spark.sparkContext.getPersistentRDDs.keySet

  test("scoped releases dedupCorpus's persisted output after the action") {
    val before = cachedIds
    CacheScope.scoped {
      val out = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.9)
      assert(out.count() > 0)
      assert(cachedIds.diff(before).nonEmpty,
        "dedupCorpus's output should be cached while the scope is open")
    }
    assert(cachedIds.diff(before).isEmpty,
      "scope exit must release every operator-registered cache")
  }

  test("without a scope the caller owns the cache") {
    val before = cachedIds
    val out = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.9)
    assert(out.count() > 0)
    assert(cachedIds.diff(before).nonEmpty)
    out.unpersist(true)
    assert(cachedIds.diff(before).isEmpty)
  }

  test("scopes nest: inner registrations release at inner exit") {
    val before = cachedIds
    CacheScope.scoped {
      CacheScope.scoped {
        Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.9).count()
      }
      assert(cachedIds.diff(before).isEmpty,
        "inner scope must release its own registrations at its exit")
    }
  }
}
