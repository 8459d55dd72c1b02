package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Near-duplicate detection primitives: MinHash signatures + LSH banding,
  * SimHash bit-signatures, and n-gram Jaccard — the standard toolkit for
  * training-data dedup at scale.
  *
  * MinHash/banding are pure Column combinators (seeded `xxhash64` as the
  * hash family); SimHash packs sign-sums into a long via a small
  * deterministic UDF (an FNV-1a bit profile per token).
  */
object DedupFunctions {

  /** k-permutation MinHash signature of a shingle array: element i is
    * `min_s xxhash64(s, i)`. Empty shingle sets hash to Long.MaxValue.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    array((0 until k).map { i =>
      coalesce(array_min(transform(shingleCol, s => xxhash64(s, lit(i)))),
        lit(Long.MaxValue))
    }: _*)

  /** LSH band keys for a MinHash signature: `bands` hashes, each over a
    * contiguous run of `rowsPerBand` signature slots. Documents sharing any
    * band key become candidate pairs — an equi-join, never a cross join.
    */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(signature, b * rowsPerBand + 1, rowsPerBand))
          .as("key"))
    }: _*)

  /** Exact Jaccard similarity of two *distinct-element* arrays, computed on
    * an integer grid (|∩| / |∪|) — safe to compare across engines.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** Stable 64-bit FNV-1a hash (engine-independent, no JVM hashCode). */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= (s.charAt(i) & 0xffffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash of a token sequence: per bit, sum +1/-1 of each token's
    * hash bit; the sign vector packs into a long.
    */
  def simhash64(tokens: Seq[String]): Long = {
    if (tokens == null || tokens.isEmpty) return 0L
    val counts = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  private val simhashUdf = udf((toks: Seq[String]) => simhash64(toks))

  /** Column form: SimHash over a token array column. */
  def simhash(tokens: Column): Column = simhashUdf(tokens)

  /** Hamming distance between two packed 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
