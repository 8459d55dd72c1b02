package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair associations (support / confidence / lift) — the
  * co-occurrence miner, shaped for scale the same way the span/gram
  * candidate generators are:
  *
  *  - itemsets collapse to DISTINCT (basket, item) first, so pair
  *    counts are presence counts, not multiplicity products;
  *  - baskets larger than `maxBasketSize` are EXCLUDED from pair
  *    generation (the hub cap: a k-item basket fans out k², and a
  *    mega-basket's co-occurrences are near-meaningless anyway — the
  *    [[SpanDedup]] hub-cap rationale). The cap is part of the
  *    operator's declared semantics and the oracle applies it too;
  *  - the pair join is an EQUI-join on the basket key, never
  *    all-pairs across baskets.
  *
  * `lift(a,b) = (c_ab · n_baskets) / (c_a · c_b)` on capped-universe
  * counts, computed as one exact integer product ratio per pair, so a
  * second engine replays it bit-for-bit. Item supports count only
  * CAPPED baskets (n likewise), keeping support/confidence/lift
  * mutually consistent within the declared universe.
  */
object Basket {

  /** Pair-association table: item_a < item_b, with co-occurrence count,
    * support, confidence(a→b), and lift over the capped basket
    * universe. `minPairCount` prunes the long tail before the ratio
    * math.
    */
  def pairAssociations(df: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Int = 50, minPairCount: Long = 2): DataFrame = {
    require(maxBasketSize >= 2, s"maxBasketSize $maxBasketSize too small")
    val items = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val sizes = items.groupBy(col("b")).agg(count(lit(1)).as("sz"))
    val capped = graft.CacheScope.register(items
      .join(sizes.filter(col("sz") <= maxBasketSize).select(col("b")),
        Seq("b"))
      .persist())
    val nBaskets = capped.select(col("b")).distinct().count()
    val itemCnt = capped.groupBy(col("i"))
      .agg(count(lit(1)).as("c_item"))
    val pairs = capped.select(col("b"), col("i").as("ia"))
      .join(capped.select(col("b"), col("i").as("ib")), Seq("b"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minPairCount)
    pairs
      .join(itemCnt.select(col("i").as("ia"), col("c_item").as("c_a")),
        Seq("ia"))
      .join(itemCnt.select(col("i").as("ib"), col("c_item").as("c_b")),
        Seq("ib"))
      .select(col("ia").as("item_a"), col("ib").as("item_b"),
        col("c_ab"), col("c_a"), col("c_b"),
        (col("c_ab").cast("double") / nBaskets).as("support"),
        (col("c_ab").cast("double") / col("c_a")).as("confidence"),
        ((col("c_ab") * nBaskets).cast("double") /
          (col("c_a") * col("c_b"))).as("lift"))
  }

  /** "Customers also bought" — [[pairAssociations]] turned into the
    * operational per-item recommendation list: for every item, its
    * top-`k` co-purchased items by co-count (lift tie-broken on the
    * smaller partner id). Pairs orient BOTH ways here — the
    * recommendation table is asymmetric even though co-occurrence is
    * not — and the rank runs in a window keyed by the item over its
    * bounded partner set.
    */
  def alsoBought(df: DataFrame, basketCol: String, itemCol: String,
      k: Int = 5, maxBasketSize: Int = 50,
      minPairCount: Long = 2): DataFrame = {
    require(k >= 1, s"bad k $k")
    val pairs = pairAssociations(df, basketCol, itemCol,
      maxBasketSize, minPairCount)
    val both = pairs.select(col("item_a").as("item"),
        col("item_b").as("partner"), col("c_ab"), col("lift"))
      .unionByName(pairs.select(col("item_b").as("item"),
        col("item_a").as("partner"), col("c_ab"), col("lift")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item"))
      .orderBy(col("c_ab").desc, col("partner"))
    both
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("item"), col("rank"), col("partner"), col("c_ab"),
        round(col("lift"), 4).as("lift"))
  }
}
