package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Memorization auditing — the Secret Sharer exposure metric (Carlini
  * et al. 2019, "The Secret Sharer: Evaluating and Testing Unintended
  * Memorization in Neural Networks"), run against the house n-gram LM
  * instead of a neural model: plant a canary sequence into the corpus
  * `r` times, train the LM, and measure the canary's RANK among `N`
  * hold-out candidates that differ only in the secret slot. Exposure =
  * log₂ N − log₂ rank: 0 bits when the secret is indistinguishable
  * from the decoys, log₂ N when the model ranks it first — the
  * dataset-side certificate a privacy review reads before releasing a
  * model trained on the corpus.
  *
  * Replay discipline: every per-gram log-probability snaps to integer
  * NANONATS (`floor(ln(·)·1e9 + ½)` — the q340 contract) and candidate
  * scores are EXACT integer sums of those, so ranks are bit-identical
  * on any engine. This matters here specifically: with r = 0 every
  * never-seen candidate scores the SAME grams, and a float sum would
  * leave the secret's rank to summation order.
  *
  * 100 TB shape: one LM train per insertion count (the standard two
  * count-table shuffles — the corpus is never collected); candidates
  * are a bounded table (≤ 256 rows of a few grams), their scoring join
  * is corpus-grain on the count tables, and the rank fold runs on the
  * ≤ 256 collected candidate scores (bounded fact).
  */
object Memorization {

  /** The candidate token template: `prefix ⧺ [slot] ⧺ suffix`. */
  private def candidateText(prefix: Seq[String], w: String,
      suffix: Seq[String]): String =
    (prefix ++ Seq(w) ++ suffix).mkString(" ")

  /** One row per insertion count: `(n_insert, rank, score_sc,
    * exposure)` — the canary's rank among `nDecoys + 1` candidates
    * under the trigram LM trained on the corpus plus `n_insert`
    * planted copies, its exact nanonat score, and the exposure bits
    * on the 1e-4 grid. Decoys are the `nDecoys` most frequent corpus
    * tokens (count DESC, token ASC — a total order) excluding the
    * secret; the candidate set is identical across insertion counts,
    * so the rank trajectory isolates the planting effect.
    */
  def canaryExposure(corpus: DataFrame, idCol: String, textCol: String,
      prefix: Seq[String], secret: String, suffix: Seq[String],
      nDecoys: Int, insertCounts: Seq[Int]): DataFrame = {
    require(nDecoys >= 1 && nDecoys <= 255, s"nDecoys $nDecoys")
    require(insertCounts.nonEmpty && insertCounts.size <= 16 &&
      insertCounts.forall(r => r >= 0 && r <= 64),
      s"insertCounts $insertCounts")
    require(prefix.size >= 2 && suffix.size >= 2,
      "prefix/suffix need >= 2 tokens each so the slot sits inside " +
        "full trigram context")
    val toks = (prefix ++ Seq(secret) ++ suffix)
    require(toks.forall(t => t.nonEmpty && t == t.toLowerCase &&
      !t.exists(_.isWhitespace)), s"canary tokens must be lowercase " +
      s"single tokens: $toks")
    val spark = corpus.sparkSession
    import spark.implicits._
    // bounded driver fact: the decoy slot values
    val decoys = corpus
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= secret)
      .groupBy(col("w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("w"))
      .limit(nDecoys)
      .collect().map(_.getString(0)).toSeq
    val candidates = (decoys :+ secret)
      .map(w => (w, candidateText(prefix, w, suffix)))
      .toDF("w", "text")
    val canaryText = candidateText(prefix, secret, suffix)
    val n = decoys.size + 1
    val rows = insertCounts.map { r =>
      val planted = (1 to r).map(i => (-i.toLong, canaryText))
        .toDF(idCol, textCol)
      val augmented = corpus.select(col(idCol).cast("long").as(idCol),
        col(textCol)).unionAll(planted)
      val lm = NgramLm.train(augmented, idCol, textCol, n = 3)
      val scores = NgramLm.scoredGrams(candidates, "w", "text", lm)
        .withColumn("__lp_sc",
          floor(col("lp") * 1e9 + 0.5).cast("long"))
        .groupBy(col("w")).agg(sum(col("__lp_sc")).as("s"))
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      val sSec = scores(secret)
      val rank = 1 + scores.count { case (w, s) =>
        s > sSec || (s == sSec && w < secret)
      }
      val exposure = graft.functions.Grid.snapD(
        math.log(n.toDouble / rank) / math.log(2.0), 4)
      (r, rank, sSec, exposure)
    }
    spark.createDataFrame(rows)
      .toDF("n_insert", "rank", "score_sc", "exposure")
  }
}
