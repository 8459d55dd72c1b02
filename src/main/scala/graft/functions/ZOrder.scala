package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional layout key
  * [[graft.sources.Bucketing]] co-location can't give: bucketing
  * serves ONE equi-join key; range-partitioning the corpus by the
  * interleaved key clusters rows that are close in BOTH dimensions
  * into the same files, so a 2-D box predicate (customer range ×
  * date range) touches few files' row groups instead of scattering
  * across all of them. The standard lakehouse data-skipping device
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`), expressed here as a pure
  * Column so the layout write is one `repartitionByRange(zkey)` and
  * the key replays bit-exactly in any engine.
  *
  * ZOrderSpec measures the claim: the same box filter over the same
  * rows touches strictly fewer files under the z layout than under a
  * hash scatter.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative dimension
    * columns: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Pure long bit algebra (2·bits shift/and/or terms, fully
    * codegen'd — no UDF); values beyond `bits` bits contribute
    * nothing (callers bound or bucket their dimensions first, as any
    * z-layout does).
    */
  def interleave2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bad bits $bits")
    (0 until bits).map { i =>
      val ab = shiftleft(
        shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
      val bb = shiftleft(
        shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i + 1)
      ab.bitwiseOR(bb)
    }.reduce(_ bitwiseOR _)
  }
}
