package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss sign random projection — the cheap
  * dimensionality squeeze that runs BEFORE the expensive embedding
  * operators when 100 TB of vectors won't fit the ANN build budget:
  * `p = (1/√d')·Sᵀv` with `S ∈ {−1,+1}^{d×d'}` (Achlioptas 2003's
  * database-friendly JL family: ±1 entries satisfy the lemma with the
  * same distortion bound as Gaussian projections, JL 1984). Pairwise
  * distances are preserved within `1±ε` w.h.p. for
  * `d' = O(ε⁻²·log n)`, so IVF/LSH candidate generation can run in
  * the projected space and only the verify step pays full dimension.
  *
  * Determinism: the sign matrix is NOT runtime randomness — entry
  * `s(i,j)` is the parity of the first hex digit of `md5("i_j")`,
  * computed DRIVER-side once (the matrix is config-bounded,
  * `d×d' ≤ 64×64`) and embedded in the plan as a nested array
  * literal, the q364 DCT-table device. The projection itself is an
  * index-ORDERED left fold per output coordinate (`aggregate` over
  * `zip_with`), so any engine replays it bit-for-bit
  * (`list_reduce`/`list_prepend` in DuckDB).
  *
  * Scale shape: map-only — no shuffle, no UDF, one codegen'd
  * expression per row; cost is `d·d'` multiply-adds per vector.
  */
object RandomProjection {

  /** The deterministic ±1.0 sign matrix, indexed `[j][i]` (output
    * coordinate major): parity of `md5(s"${i}_${j}")`'s first hex
    * digit. Public definition so specs and oracles regenerate it.
    */
  def signMatrix(dIn: Int, dOut: Int): Array[Array[Double]] = {
    require(dIn >= 1 && dIn <= 64, s"bad dIn $dIn")
    require(dOut >= 1 && dOut <= 64, s"bad dOut $dOut")
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dOut) { j =>
      Array.tabulate(dIn) { i =>
        val h = md.digest(s"${i}_${j}".getBytes("UTF-8"))
        // first hex digit = high nibble of byte 0
        if (((h(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
      }
    }
  }

  /** The matrix as a nested array literal, one renderer per dialect
    * (Spark SQL spells list literals `array(...)`, DuckDB `[...]`) —
    * the VALUES are the identical ±1.0 text either way, so both
    * engines fold the same bits.
    */
  def signsSparkSql(m: Array[Array[Double]]): String =
    m.map(r => "array(" +
      r.map(v => if (v > 0) "1.0D" else "-1.0D").mkString(",") + ")")
      .mkString("array(", ",", ")")

  def signsDuckSql(m: Array[Array[Double]]): String =
    m.map(_.map(v => if (v > 0) "1.0e0" else "-1.0e0")
      .mkString("[", ",", "]")).mkString("[", ",", "]")

  /** `df` plus `projCol` = the `dOut`-dimensional signed projection of
    * `vecCol` (each coordinate snapped at 6 — projections are CARRIED
    * values, the snap is the grid handoff every downstream consumer
    * folds from). `vecCol` must hold arrays of length ≥ `dIn`; only
    * the first `dIn` coordinates project (the fold range is the
    * contract, mirroring the oracle's `range(dIn)`).
    */
  def projectSigned(df: DataFrame, vecCol: String, dIn: Int,
      dOut: Int, projCol: String = "proj"): DataFrame = {
    import graft.functions.Grid
    val m = signMatrix(dIn, dOut)
    val signs = signsSparkSql(m)
    val inv = Grid.lit17(1.0 / math.sqrt(dOut.toDouble))
    df.withColumn(projCol, expr(
      s"transform(sequence(0, ${dOut - 1}), j -> " +
        Grid.snapSql(
          s"aggregate(zip_with(slice(CAST($vecCol AS ARRAY<DOUBLE>)," +
            s" 1, $dIn), sequence(0, ${dIn - 1}), " +
            s"(v, i) -> v * element_at(element_at($signs, j + 1), " +
            "i + 1)), CAST(0.0 AS DOUBLE), (a, x) -> a + x) * " + inv,
          6) + ")"))
  }
}
