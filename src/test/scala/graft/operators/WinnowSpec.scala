package graft.operators

import graft.functions.DedupFunctions
import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing fingerprints: equivalence with a brute-force reference,
  * the detection guarantee, density, short-doc fallback, matching.
  */
class WinnowSpec extends SparkSpec {

  private def brute(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val c = text.toLowerCase.replaceAll("[^a-z0-9]", "")
    val n = c.length - k + 1
    if (n <= 0) return Set.empty
    val hs = (1 to n).map(i =>
      i -> DedupFunctions.fnv1a64(c.substring(i - 1, i - 1 + k)))
    val starts = if (n < w) Seq(1) else 1 to (n - w + 1)
    starts.map { s =>
      hs.slice(s - 1, math.min(s - 1 + w, n))
        .minBy { case (p, h) => (h, -p) }
    }.toSet
  }

  test("fingerprints == brute-force winnow on assorted texts, " +
      "including the short-doc fallback and empty canon") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    val texts = Seq(
      "A do run run run, a do run run!",       // the paper's example
      "abc",                                    // < k grams after canon
      "ab",                                     // no grams at k=5
      "!!! ???",                                // empty canon
      "aaaaaaaaaaaaaaaa",                       // all-tie hashes
      rng.alphanumeric.take(200).mkString,
      rng.alphanumeric.take(60).mkString)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Winnow.fingerprints(docs, "doc_id", "text", k = 5, w = 4)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getInt(1), r.getLong(2))).toSet
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = brute(t, 5, 4)
      assert(got.getOrElse(i.toLong, Set.empty) === want,
        s"doc $i '$t'")
    }
  }

  test("guarantee: a shared substring of length >= w + k - 1 always " +
      "yields a shared fingerprint hash") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(23)
    val planted = rng.alphanumeric.take(8).mkString // w + k - 1 = 8
    val docs = (1 to 6).map { i =>
      val pre = rng.alphanumeric.take(30 + i).mkString
      val post = rng.alphanumeric.take(40).mkString
      (i.toLong, s"$pre$planted$post")
    }.toDF("doc_id", "text")
    val pairs = Winnow.matchPairs(docs, "doc_id", "text", k = 5, w = 4,
      minShared = 1).collect()
    // all 15 pairs must surface
    assert(pairs.length === 15, pairs.mkString(","))
  }

  test("fingerprint index: append fold == whole build, bucket layout " +
      "on disk, match == in-memory, non-index path fails fast") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(41)
    val docs = (1 to 40).map(i =>
      (i.toLong, rng.alphanumeric.take(120).mkString))
      .toDF("doc_id", "text")
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_winnow_idx_spec").getAbsolutePath
    val a = docs.filter(col("doc_id") <= 25)
    val b = docs.filter(col("doc_id") > 25)
    Winnow.writeFingerprintIndex(
      Winnow.fingerprints(a, "doc_id", "text"), "doc_id", path,
      hashBuckets = 8)
    Winnow.appendToFingerprintIndex(
      Winnow.fingerprints(b, "doc_id", "text"), "doc_id", path)
    // folded rows == one whole build
    val folded = Winnow.readFingerprintIndex(s, path)
      .select("doc_id", "pos", "hash").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val whole = Winnow.fingerprints(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(folded === whole)
    // layout: hash_bucket directories, modulus from the sidecar
    val dirs = new java.io.File(s"$path/fingerprints").listFiles()
      .filter(_.getName.startsWith("hash_bucket=")).map(_.getName)
    assert(dirs.nonEmpty && dirs.length <= 8)
    // match against the folded index == the in-memory join
    val probe = Seq((99L, docs.filter(col("doc_id") === 3L)
      .head().getString(1))).toDF("doc_id", "text")
    val viaIdx = Winnow.matchAgainstIndex(s, path, probe, "doc_id",
        "text", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(viaIdx.exists(_._2 == 3L),
      "a verbatim copy must match its original")
    val err = intercept[RuntimeException] {
      Winnow.readFingerprintIndex(s, path + "_nope")
    }
    assert(err.getMessage.contains("not a winnow index"))
  }

  test("profile: density near 2/(w+1) on random text, md5 stable") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(5)
    val docs = (1 to 20).map(i =>
      (i.toLong, rng.alphanumeric.take(500).mkString))
      .toDF("doc_id", "text")
    val prof = Winnow.profile(docs, "doc_id", "text", k = 5, w = 4)
      .collect()
    assert(prof.length === 20)
    val dens = prof.map(_.getAs[Double]("density"))
    // expected 2/(w+1) = 0.4 on random input
    assert(dens.forall(d => d > 0.25 && d < 0.55), dens.toSeq)
    // deterministic: same input, same md5
    val again = Winnow.profile(docs, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("fp_md5"))
      .toMap
    prof.foreach(r =>
      assert(again(r.getLong(0)) === r.getAs[String]("fp_md5")))
  }
}
