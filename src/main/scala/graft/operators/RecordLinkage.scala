package graft.operators

import graft.expressions.StringSimilarity
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage: the standard two-phase shape
  * (BLOCK on a cheap key to bound the candidate space, then VERIFY each
  * candidate pair with an expensive string similarity) used to resolve
  * near-identical entity names — the string-side sibling of the MinHash
  * band→bucket→verify dedup pipeline in [[Dedup]].
  *
  * 100 TB shape: the only shuffle is the equi-join on the blocking key,
  * so the candidate-pair count — not the n² record count — bounds the
  * work. The verify step is [[graft.expressions.JaroWinkler]], a
  * codegen'd Catalyst expression, so the per-pair loop stays inside
  * whole-stage codegen. Skew is the classic failure mode (a stopword-ish
  * blocking key produces a quadratic block); `maxBlockRows` drops such
  * blocks BEFORE the self-join — one cheap count-aggregation pass, the
  * same guard production blocking systems apply.
  */
object RecordLinkage {

  /** Directed verified candidate pairs: records sharing a blocking key,
    * scored with Jaro–Winkler, kept at `minSim` and above. Both
    * directions (a,b) and (b,a) are emitted so per-record argmax
    * consumers need no mirror union. Output: idCol, name, match_id,
    * match_name, jw (unrounded).
    *
    * `blocker` must be SINGLE-VALUED (one key per record) — that is what
    * makes each candidate pair appear exactly once without a distinct
    * shuffle over the pair table. Multi-key blocking (e.g. per-token)
    * belongs to the explode→band→bucket pipeline in [[Dedup]] instead.
    */
  def fuzzyPairs(records: DataFrame, idCol: String, nameCol: String,
      blocker: Column => Column, minSim: Double,
      maxBlockRows: Option[Long] = None): DataFrame = {
    val base = records.select(col(idCol), col(nameCol))
      .withColumn("__rl_block", blocker(col(nameCol)))
    val blocked = maxBlockRows match {
      case Some(cap) =>
        // one count pass over the (small) distinct-block table, then a
        // broadcast semi-join keeps only survivable blocks — never a
        // row-level window over the full table
        val ok = base.groupBy(col("__rl_block"))
          .agg(count(lit(1)).as("__rl_n"))
          .filter(col("__rl_n") <= cap)
          .select(col("__rl_block"))
        base.join(broadcast(ok), Seq("__rl_block"), "left_semi")
      case None => base
    }
    val left = blocked
    val right = blocked
      .withColumnRenamed(idCol, "match_id")
      .withColumnRenamed(nameCol, "match_name")
    left.join(right, Seq("__rl_block"))
      .filter(col(idCol) =!= col("match_id"))
      .select(col(idCol), col(nameCol), col("match_id"), col("match_name"))
      .withColumn("jw",
        StringSimilarity.jaroWinkler(col(nameCol), col("match_name")))
      .filter(col("jw") >= minSim)
  }

  /** Best-link resolution: each record's single strongest fuzzy match
    * among its verified candidates — rank on the ROUNDED similarity
    * (4 decimals, the engine's replay grid) with the partner id as the
    * total tie-break, so the winner is deterministic and
    * oracle-replayable. Records with no candidate at `minSim` are
    * absent from the output (they resolved to themselves).
    * Output: idCol, match_id, jw (rounded 4).
    */
  def bestLinks(records: DataFrame, idCol: String, nameCol: String,
      blocker: Column => Column, minSim: Double,
      maxBlockRows: Option[Long] = None): DataFrame = {
    val pairs =
      fuzzyPairs(records, idCol, nameCol, blocker, minSim, maxBlockRows)
        .withColumn("jw", round(col("jw"), 4))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("jw").desc, col("match_id").asc)
    pairs
      .withColumn("__rl_rn", row_number().over(w))
      .filter(col("__rl_rn") === 1)
      .select(col(idCol), col("match_id"), col("jw"))
  }

  /** EXACT edit-distance similarity join with q-gram prefiltering
    * (Gravano et al., VLDB 2001): every pair within Levenshtein
    * distance ≤ `maxDist`, no false negatives, never an all-pairs
    * cross join. Two candidate channels, both equi-joins:
    *
    *   - strings of length ≥ 2·maxDist share at least one PADDED
    *     2-gram with any string within distance maxDist (each edit
    *     destroys ≤ q grams of the len+1 padded grams; the count
    *     bound stays ≥ 1 down to exactly that length) — candidates
    *     come from a distinct-gram equi-join;
    *   - shorter strings (a genuinely BOUNDED class: < 2·maxDist
    *     characters) pair within their own block.
    *
    * The length filter |len(a) − len(b)| ≤ maxDist applies to both
    * channels (an edit changes length by ≤ 1); survivors verify with
    * the real `levenshtein` — O(candidates), and both engines
    * implement the same classic DP.
    */
  def editDistanceJoin(records: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist $maxDist must be >= 1")
    val t = records
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("__len", length(col("__s")))
    val padded = concat(lit("#"), col("__s"), lit("#"))
    val grams = t
      .select(col("__id"), col("__s"), col("__len"),
        explode(array_distinct(transform(
          sequence(lit(1), col("__len") + 1),
          i => padded.substr(i, lit(2))))).as("__g"))
    val lenOk = abs(col("a.__len") - col("b.__len")) <= maxDist
    val longCand = grams.as("a").join(grams.as("b"),
        col("a.__g") === col("b.__g") &&
          col("a.__id") < col("b.__id") && lenOk)
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
        col("a.__s").as("a_str"), col("b.__s").as("b_str"))
      .distinct()
    // the gram-count bound needs min(len) ≥ 2·maxDist, so any pair
    // with a SHORT side (a bounded class) goes through the fallback
    // channel — short × all under the length filter, both orientations
    // so the canonical a_id < b_id pair always appears
    val short = t.filter(col("__len") < 2 * maxDist)
    val shortCand = short.as("a").join(t.as("b"),
        col("a.__id") < col("b.__id") && lenOk)
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
        col("a.__s").as("a_str"), col("b.__s").as("b_str"))
      .union(t.as("a").join(short.as("b"),
          col("a.__id") < col("b.__id") && lenOk)
        .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
          col("a.__s").as("a_str"), col("b.__s").as("b_str")))
    longCand.union(shortCand).distinct()
      .withColumn("dist", levenshtein(col("a_str"), col("b_str")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("a_str"), col("b_str"),
        col("dist"))
  }
}
