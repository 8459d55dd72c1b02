package graft.expressions

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** The native JaroWinkler expression: value parity with an independent
  * in-test reference implementation on random pairs, the classic
  * published examples, and the DuckDB-compatible edge semantics the q144
  * oracle relies on (either-empty -> 0.0, boost threshold 0.7).
  */
class StringSimilaritySpec extends SparkSpec {

  /** Straightforward textbook Jaro-Winkler, written independently of the
    * production code (per-index flag arrays, explicit transposition
    * walk) so the two can cross-check each other.
    */
  private def refJw(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val fa = Array.fill(a.length)(false)
    val fb = Array.fill(b.length)(false)
    for (i <- a.indices; j <- math.max(0, i - window) until
        math.min(b.length, i + window + 1)
        if !fa(i) && !fb(j) && a(i) == b(j)) { fa(i) = true; fb(j) = true }
    val m = fa.count(identity)
    if (m == 0) return 0.0
    val sa = a.indices.filter(fa).map(a(_))
    val sb = b.indices.filter(fb).map(b(_))
    val t = sa.zip(sb).count { case (x, y) => x != y } / 2
    val jaro = (m.toDouble / a.length + m.toDouble / b.length +
      (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val l = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  test("matches the published Winkler examples") {
    def jw(a: String, b: String): Double = {
      import org.apache.spark.unsafe.types.UTF8String
      JaroWinklerImpl.jaroWinkler(
        UTF8String.fromString(a), UTF8String.fromString(b))
    }
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    // no common prefix -> no bonus even above the threshold
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    // DuckDB-compatible empty semantics: either empty -> 0.0, including
    // both-empty (NOT the equal-strings shortcut)
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("", "") === 0.0)
    assert(jw("a", "b") === 0.0)
  }

  test("matches the independent reference on 3000 random pairs (codegen path)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    def rand(): String =
      (0 until rng.nextInt(11)).map(_ => ('a' + rng.nextInt(6)).toChar)
        .mkString
    val pairs = Seq.fill(3000)((rand(), rand()))
    val got = pairs.toDF("a", "b")
      .select(StringSimilarity.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0))
    pairs.zip(got).foreach { case ((a, b), g) =>
      assert(math.abs(g - refJw(a, b)) < 1e-12, s"'$a' vs '$b'")
    }
  }

  test("null-intolerant: NULL on either side -> NULL") {
    val r = spark.sql(
      "SELECT graft_jaro_winkler(CAST(NULL AS STRING), 'x') AS a, " +
        "graft_jaro_winkler('x', CAST(NULL AS STRING)) AS b").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("SQL surface rejects non-string arguments at analysis time") {
    val e = intercept[Exception](
      spark.sql("SELECT graft_jaro_winkler(1, 'x')").collect())
    assert(e.getMessage.contains("graft_jaro_winkler"))
  }
}
