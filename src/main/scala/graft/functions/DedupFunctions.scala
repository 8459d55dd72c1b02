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

  /** Jaccard CONTAINMENT of `a` in `b`: |a ∩ b| / |a| — the asymmetric
    * form that catches excerpt/wrapper duplication symmetric Jaccard
    * misses (a short quote inside a long page scores near 1 here but
    * near 0 on jaccard). Integer grid, same cross-engine safety.
    */
  def containment(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val na = size(a).cast("double")
    when(na === 0.0, lit(0.0)).otherwise(inter / na)
  }

  /** splitmix64 finalizer — cheap, well-mixed 64-bit permutation. Public:
    * it is the engine-independent hash shared by MinHash seeds and the
    * deterministic LSH hyperplanes (and mirrored in SQL by
    * [[graft.HashOracles]]).
    */
  def splitmix64(z0: Long): Long = mix64(z0)

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** One-pass MinHash over a token array: builds each `shingleLen`-word
    * shingle once and folds it into all `k` signature slots (hash family:
    * splitmix64 over per-slot seeds). The Column-combinator
    * [[minhashSignature]] re-evaluates the shingle expression per slot —
    * fine for correctness, 16× too slow for the bench path; this UDF is
    * the production signature.
    */
  def minhashSigFast(tokens: Seq[String], k: Int, shingleLen: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    if (tokens == null || tokens.isEmpty) return sig
    val seeds = Array.tabulate(k)(i => mix64(i.toLong * 0xff51afd7ed558ccdL))
    val nShingles = math.max(1, tokens.length - shingleLen + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      val end = math.min(tokens.length, i + shingleLen)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      val h = fnv1a64(sb.toString)
      var s = 0
      while (s < k) {
        val hv = mix64(h ^ seeds(s))
        if (hv < sig(s)) sig(s) = hv
        s += 1
      }
      i += 1
    }
    sig
  }

  private val minhashUdf =
    udf((toks: Seq[String], k: Int, len: Int) => minhashSigFast(toks, k, len))

  /** Column form of the one-pass MinHash signature. */
  def minhashFast(tokens: Column, k: Int, shingleLen: Int): Column =
    minhashUdf(tokens, lit(k), lit(shingleLen))

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
