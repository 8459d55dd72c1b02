package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity join via prefix filtering — the AllPairs /
  * PPJoin family (Bayardo et al., WWW 2007; Xiao et al., WWW 2008).
  * Finds every document pair whose n-gram-shingle Jaccard ≥ τ with NO
  * false negatives, without MinHash's probabilistic recall and without
  * the all-pairs cross join: if Jaccard(x, y) ≥ τ, then x and y must
  * share at least one element among each one's first
  * `p = |x| − ⌈τ·|x|⌉ + 1` elements under ANY global element order —
  * so candidates are an equi-join on prefix elements only.
  *
  * This is the exact production path for the quadratic Jaccard
  * baselines (q20/q43 keep their capped cross joins as declared
  * oracle baselines): where MinHash+LSH (q18) trades recall for speed,
  * prefix filtering keeps recall = 1.0 and trades only candidate count.
  *
  * Scale shape, stage by stage:
  *   1. (doc, shingle) explode — one pass, cached for the call (the
  *      tokenize-once contract: five later stages read it).
  *   2. element document-frequency — one partial-agg shuffle.
  *   3. global element order = (df ASC, elem ASC): rarest shingles
  *      first, so prefixes carry the most selective elements (the
  *      AllPairs ordering). Ranking is a per-DOC window (bounded
  *      partitions — never a global sort).
  *   4. prefix slice by the integer-exact length above; candidate
  *      equi-join ON THE PREFIX ELEMENT with the length filter
  *      τ·max(|x|,|y|) ≤ min(|x|,|y|) (cross-multiplied on the 1e-6
  *      integer grid — no float ceil/floor to disagree across engines).
  *   5. verify: exact intersection over each doc's (row-local) shingle
  *      array, O(candidates).
  *
  * Every join is an equi-join on a derived key; nothing all-pairs,
  * nothing driver-side. The df table joins UN-hinted (vocabulary
  * cardinality — AQE broadcasts when the runtime size fits).
  *
  * Threshold contract: `tauMicros` is τ on the 1e-6 grid (800000 =
  * 0.8). All threshold comparisons are integer cross-multiplications,
  * so a second engine replays membership bit-for-bit.
  */
object SetSimJoin {

  private val Scale = 1000000L

  /** All pairs (a_id < b_id) with shingle-set Jaccard ≥ tauMicros/1e6.
    * Output: (a_id, b_id, n_intersect, n_union, jac) — `jac` rounded to
    * 4 dp from identical-operand division (portable).
    *
    * `n` is the shingle width (whole-doc fallback below `n` tokens, the
    * [[TF.shinglesOf]] contract); `tokensCol` joins the tokenize-once
    * pipeline.
    */
  def jaccardJoin(corpus: DataFrame, idCol: String, textCol: String,
      tauMicros: Long, n: Int = 5,
      tokensCol: Option[String] = None): DataFrame = {
    require(tauMicros > 0 && tauMicros <= Scale,
      s"tauMicros must be in (0, $Scale], got $tauMicros")
    val toks = tokensCol.map(col)
      .getOrElse(TF.tokens(col(textCol)))
    // (id, elem): one row per DISTINCT shingle per doc. Tokens go
    // through their own projection first (the higher-order-function
    // re-evaluation trap — shinglesOf's lambda references the array).
    val el = graft.CacheScope.register(
      corpus.select(col(idCol).as("__id"), toks.as("__t"))
        .select(col("__id"),
          explode(TF.shinglesOf(col("__t"), n)).as("elem"))
        .persist())

    val dfT = el.groupBy(col("elem")).agg(count(lit(1)).as("__df"))
    val lens = el.groupBy(col("__id")).agg(count(lit(1)).as("__len"))

    // Global order (df ASC, elem ASC); rank per doc. Prefix length
    // p = len − ceil(τ·len) + 1 with integer ceil-division.
    val byDoc = Window.partitionBy(col("__id"))
      .orderBy(col("__df"), col("elem"))
    val prefix = el
      .join(dfT, Seq("elem"))
      .join(lens, Seq("__id"))
      .withColumn("__rn", row_number().over(byDoc))
      .filter(col("__rn") <=
        col("__len") - ((col("__len") * tauMicros + (Scale - 1))
          .cast("long") / lit(Scale)).cast("long") + 1)
      .select(col("__id"), col("elem"), col("__len"))

    // Candidate pairs: share a prefix element, pass the length filter.
    // distinct BEFORE verify — a pair sharing k prefix elements must
    // verify once, not k times.
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.elem") === col("b.elem") &&
          col("a.__id") < col("b.__id") &&
          greatest(col("a.__len"), col("b.__len")) * tauMicros <=
            least(col("a.__len"), col("b.__len")) * Scale)
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
        col("a.__len").as("__la"), col("b.__len").as("__lb"))
      .distinct()

    // Verify on each doc's row-local shingle array (exact intersection).
    val arr = el.groupBy(col("__id"))
      .agg(sort_array(collect_list(col("elem"))).as("__es"))
    cand
      .join(arr.as("x"), col("a_id") === col("x.__id"))
      .join(arr.as("y"), col("b_id") === col("y.__id"))
      .withColumn("n_intersect",
        size(array_intersect(col("x.__es"), col("y.__es"))).cast("long"))
      .withColumn("n_union",
        col("__la") + col("__lb") - col("n_intersect"))
      .filter(col("n_intersect") * Scale >= col("n_union") * tauMicros)
      .select(col("a_id"), col("b_id"), col("n_intersect"), col("n_union"),
        round(col("n_intersect").cast("double") / col("n_union"), 4)
          .as("jac"))
  }

  /** The quadratic reference: every pair's exact Jaccard via a cross
    * join — the correctness baseline [[jaccardJoin]] must reproduce
    * EXACTLY (prefix filtering admits no false negatives). Test-scale
    * only; never a production path.
    */
  def bruteForceJaccard(corpus: DataFrame, idCol: String, textCol: String,
      tauMicros: Long, n: Int = 5): DataFrame = {
    val t = corpus.select(col(idCol).as("__id"),
      TF.tokens(col(textCol)).as("__t"))
      .select(col("__id"), TF.shinglesOf(col("__t"), n).as("__es"))
    t.as("a").join(t.as("b"), col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
        size(array_intersect(col("a.__es"), col("b.__es"))).cast("long")
          .as("n_intersect"),
        (size(col("a.__es")) + size(col("b.__es"))).cast("long")
          .as("__tot"))
      .withColumn("n_union", col("__tot") - col("n_intersect"))
      .filter(col("n_intersect") * Scale >= col("n_union") * tauMicros)
      .select(col("a_id"), col("b_id"), col("n_intersect"), col("n_union"),
        round(col("n_intersect").cast("double") / col("n_union"), 4)
          .as("jac"))
  }
}
