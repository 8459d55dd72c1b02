package graft.operators

import graft.expressions.HashExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan 2005) over a token stream —
  * the sublinear frequency table for "how often does each of billions of
  * distinct items occur" when the exact table itself is the cost
  * problem. `depth` independent hash rows of `width` counters; an item's
  * estimate is the MINIMUM of its `depth` cells, always ≥ the true count
  * (one-sided error ≤ ε·N with ε = e/width at the usual depth ≈ ln 1/δ).
  *
  * The sketch is held AS A DATAFRAME of occupied cells (row, bucket, c),
  * not a driver array: build is one explode + one partial-agg shuffle
  * (the cell table is ≤ depth·width rows — a CONFIG bound, broadcast-
  * safe by construction); estimation is an equi-join on (row, bucket).
  * Sketches over different corpus shards MERGE by unioned cell-wise sum
  * ([[countMinMerge]]) — the property that makes the structure work on
  * a 1000-executor ingest: shard-local sketches, one tiny merge.
  *
  * Cell placement replays engine-exactly: row `j` of item `t` lives at
  * `splitmix64(fnv1a64(t) XOR j) mod width` (the [[Contamination]]
  * Bloom device, power-of-two width so unsigned-vs-signed mod agree).
  */
object Sketches {

  /** The row-`j` bucket of a token (width a power of two). */
  def cmsBucket(token: Column, row: Int, width: Int): Column =
    pmod(HashExpressions.splitmix64(
      HashExpressions.fnv1a64(token).bitwiseXOR(lit(row.toLong))),
      lit(width.toLong))

  private def checkParams(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"bad depth $depth")
    require(width > 0 && (width & (width - 1)) == 0,
      s"width $width must be a power of two (engine-exact mod)")
  }

  /** Build the occupied-cell table (row, bucket, c) from one item
    * column. One scan: each item row explodes to its `depth` cells via
    * a literal-array posexplode, then one partial-agg shuffle.
    */
  def countMinBuild(items: DataFrame, itemCol: String, depth: Int,
      width: Int): DataFrame = {
    checkParams(depth, width)
    items
      .select(posexplode(array(
        (0 until depth).map(j => cmsBucket(col(itemCol), j, width)): _*))
        .as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-query estimates for `queries`' distinct `itemCol` values:
    * (item, c_est) with `c_est = min_j cell(j, bucket_j(item))` —
    * ≥ the true count always, = for items whose every row is
    * collision-free. The cell table is broadcast (≤ depth·width rows,
    * a config bound).
    */
  def countMinEstimate(queries: DataFrame, itemCol: String,
      cms: DataFrame, depth: Int, width: Int): DataFrame = {
    checkParams(depth, width)
    queries.select(col(itemCol)).distinct()
      .select(col(itemCol), posexplode(array(
        (0 until depth).map(j => cmsBucket(col(itemCol), j, width)): _*))
        .as(Seq("row", "bucket")))
      .join(broadcast(cms), Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("c_est"))
  }

  /** Cell-wise sum of two sketches built with the SAME (depth, width) —
    * the shard-merge that makes per-executor sketching compose.
    */
  def countMinMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("c")).as("c"))
}
