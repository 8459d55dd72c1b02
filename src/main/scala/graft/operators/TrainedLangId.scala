package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TRAINED language identification — the fastText-langid recipe
  * (Joulin et al. 2017's bag of character n-grams, here with the
  * closed-form multinomial Naive Bayes decision rule instead of a
  * descent loop): train per-language char-3-gram counts on a labeled
  * split, predict the argmax class on held-out documents. This is the
  * production upgrade of the [[TF.langId]] stopword heuristic — it
  * covers every labeled language (the heuristic knows en/de/fr only)
  * and learns from data instead of a fixed word list.
  *
  * Replay discipline: every per-gram log-probability snaps ONCE to an
  * integer NANONAT grid (`floor(ln(·)·1e9 + ½)` — the survival-curve
  * 1e-9 ln-factor contract: libm ln agrees within an ulp across
  * engines, and after the snap all scoring is EXACT integer
  * arithmetic), so the per-document class scores and the argmax are
  * bit-identical on any engine. Smoothing is add-1: a gram unseen for
  * class c scores `ln(1/(T_c+V))` — the same value whether the gram
  * is out-of-vocabulary entirely or merely zero-count for c, which is
  * what lets scoring join only the PRESENT (gram, class) rows and
  * charge the rest as `(G − n_present)·oov_c`.
  *
  * Magnitude audit (100 TB): scores are sums of ~|ln p|·1e9 ≈ 3e10
  * per gram occurrence; a 10⁶-gram document scores ≈ 3e16 — inside
  * long range with 10² headroom. T_c and V are corpus-scale longs;
  * `T_c + V` enters only through a double division inside ln.
  *
  * 100 TB shape: training is ONE explode + (gram, lang) count shuffle
  * (the count table stays distributed — corpus-derived, so the
  * scoring join is un-hinted); driver facts are one row per CLASS
  * (priors, totals — bounded by `maxClasses`) plus the vocab size.
  * Scoring is one explode + one equi-join + one (doc, class)
  * aggregation + a bounded per-class cross; the argmax is a keyed
  * window over ≤ `maxClasses` rows per document.
  */
object TrainedLangId {

  /** A trained model: the per-(gram, lang) nanonat log-probability
    * table (distributed), and one bounded driver row per class
    * (lang, prior_sc, oov_sc) on the same grid.
    */
  final case class Model(lp: DataFrame,
    classes: Seq[(String, Long, Long)], vocab: Long)

  private def snap9(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong

  def train(labeled: DataFrame, textCol: String, langCol: String,
      n: Int = 3, maxClasses: Int = 100): Model = {
    val occ = labeled.select(col(langCol).as("lang"),
      explode(TF.charGrams(col(textCol), n)).as("g"))
    val cnt = graft.CacheScope.register(
      occ.groupBy(col("g"), col("lang"))
        .agg(count(lit(1)).as("n")).persist())
    val v = cnt.select(col("g")).distinct().count()
    // bounded driver facts: per-class gram totals and doc counts
    val tRows = cnt.groupBy(col("lang")).agg(sum(col("n")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(tRows.size >= 2 && tRows.size <= maxClasses,
      s"${tRows.size} classes out of [2, $maxClasses]")
    val dRows = labeled.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTrain = dRows.values.sum
    val classes = tRows.keys.toSeq.sorted.map { c =>
      (c, snap9(math.log(dRows(c).toDouble / nTrain)),
        snap9(math.log(1.0 / (tRows(c) + v))))
    }
    val spark = labeled.sparkSession
    val tDf = spark.createDataFrame(tRows.toSeq).toDF("lang", "t")
    val lp = cnt.join(broadcast(tDf), Seq("lang")) // class table: bounded
      .select(col("g"), col("lang"),
        floor(log((col("n") + 1).cast("double") /
          (col("t") + lit(v)).cast("double")) * 1e9 + 0.5)
          .cast("long").as("lp_sc"))
    Model(lp, classes, v)
  }

  /** A PRUNED model small enough to travel as a literal: per kept
    * gram, the per-class lp_sc vector aligned with `classes` order.
    * This is the fastText deployment story — the full gram table is
    * corpus-grain, but a few hundred high-frequency grams carry most
    * of the signal, and a config-bounded map literal lets scoring run
    * as a PURE COLUMN PROGRAM (codegen'd HOF fold, no join, no UDF),
    * which is also what makes it STREAM-capable
    * ([[graft.streaming.LangIdStream]]): per-row scoring with zero
    * state.
    */
  final case class CompactModel(lp: Map[String, Seq[Long]],
    classes: Seq[(String, Long, Long)])

  /** Keep the `topN` grams ranked by (max per-class lp_sc DESC, gram
    * ASC) — the largest lp marks the gram most frequent in its best
    * class, and the total order makes the kept set deterministic.
    * Grams dropped by the prune score through each class's OOV floor,
    * exactly like true out-of-vocabulary grams.
    */
  def prune(model: Model, topN: Int): CompactModel = {
    require(topN >= 1 && topN <= 65536, s"topN $topN out of [1, 65536]")
    val kept = model.lp
      .groupBy(col("g"))
      .agg(max(col("lp_sc")).as("__m"),
        map_from_arrays(collect_list(col("lang")),
          collect_list(col("lp_sc"))).as("__bylang"))
      .orderBy(col("__m").desc, col("g"))
      .limit(topN)
      .collect()
    val langs = model.classes.map(_._1)
    val lpMap = kept.map { r =>
      val by = r.getMap[String, Long](2)
      // absent (gram, class) rows take the class OOV floor — the
      // add-1 zero-count value, same as the full model's scoring
      r.getString(0) -> langs.zip(model.classes).map { case (l, c) =>
        by.getOrElse(l, c._3)
      }
    }.toMap
    CompactModel(lpMap, model.classes)
  }

  /** [[predict]] against a [[CompactModel]]: the identical integer-
    * nanonat scoring, but the gram lookup is a MAP LITERAL inside one
    * aggregate HOF per document — no explode, no join, no shuffle
    * beyond the input's own. `lang_pred` picks the max score (tie →
    * class name ascending) via the sorted-struct device.
    */
  def predictCompact(docs: DataFrame, textCol: String,
      cm: CompactModel, n: Int = 3): DataFrame =
    docs.withColumn("lang_pred", predictExpr(col(textCol), cm, n))

  /** The per-row prediction Column shared by [[predictCompact]] and
    * the streaming form.
    */
  def predictExpr(text: org.apache.spark.sql.Column, cm: CompactModel,
      n: Int = 3): org.apache.spark.sql.Column = {
    val grams = TF.charGrams(text, n)
    val lpLit = typedLit(cm.lp)
    val scored = cm.classes.zipWithIndex.map {
      case ((lang, prior, oov), k) =>
        val s = aggregate(grams, lit(prior),
          (acc, g) => acc +
            coalesce(element_at(element_at(lpLit, g), k + 1), lit(oov)))
        struct((-s).as("neg"), lit(lang).as("lang"))
    }
    // ascending sort on (−score, lang): max score first, name tiebreak
    array_sort(array(scored: _*)).getItem(0).getField("lang")
  }

  /** Sidecar filename for the persisted model layout (underscore
    * prefix so parquet readers skip it as data).
    */
  val LangIdMetaFile = "_graft_langid.json"

  /** Persist a trained model: the (gram, lang, lp_sc) table as parquet
    * (corpus-grain — stays distributed at rest) plus a sidecar with
    * the bounded per-class facts and vocab size. Integers serialize
    * exactly in JSON, so the round trip is bit-lossless — what lets a
    * daily scoring job read yesterday's model instead of retraining
    * ([[graft.operators.SpanDedup.writeSpanIndex]]'s layout story for
    * the classifier artifact).
    */
  def writeModel(model: Model, path: String): Unit = {
    val spark = model.lp.sparkSession
    model.lp.write.mode("overwrite").parquet(s"$path/lp")
    val body = model.classes.map { case (c, p, o) =>
      s"""{"lang":"$c","prior_sc":$p,"oov_sc":$o}"""
    }.mkString("[", ",", "]")
    graft.sources.Sidecar.write(spark, s"$path/$LangIdMetaFile",
      s"""{"vocab":${model.vocab},"classes":$body}""")
  }

  /** Re-open a persisted model. The sidecar is the only sound source
    * of the class facts (a caller-supplied table could drift from the
    * lp grid — the SpanIndexMeta rule).
    */
  def readModel(spark: org.apache.spark.sql.SparkSession,
      path: String): Model = {
    val text = graft.sources.Sidecar
      .read(spark, s"$path/$LangIdMetaFile")
      .getOrElse(throw new IllegalArgumentException(
        s"no $LangIdMetaFile under $path - not a graft langid model"))
    val vocab = "\"vocab\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(text)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(
        s"$LangIdMetaFile lacks integer field 'vocab': $text"))
    val cls = ("""\{"lang":"([^"]+)","prior_sc":(-?\d+),""" +
      """"oov_sc":(-?\d+)\}""").r
      .findAllMatchIn(text)
      .map(m => (m.group(1), m.group(2).toLong, m.group(3).toLong))
      .toSeq
    require(cls.nonEmpty, s"$LangIdMetaFile carries no classes: $text")
    Model(spark.read.parquet(s"$path/lp"), cls, vocab)
  }

  /** Per-document argmax prediction: every `docs` row plus
    * `lang_pred`. Ties on the integer score break by class name
    * ascending (deterministic, engine-exact).
    */
  def predict(docs: DataFrame, idCol: String, textCol: String,
      model: Model, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val base = docs.select(col(idCol).as("__id"),
        TF.charGrams(col(textCol), n).as("__gs"))
      .withColumn("__G", size(col("__gs")).cast("long"))
    val present = base
      .select(col("__id"), explode(col("__gs")).as("g"))
      .join(model.lp, Seq("g")) // un-hinted: gram table is corpus-grain
      .groupBy(col("__id"), col("lang"))
      .agg(sum(col("lp_sc")).as("__s"), count(lit(1)).as("__np"))
    val clsDf = spark.createDataFrame(model.classes)
      .toDF("lang", "__prior", "__oov")
    val scored = base.select(col("__id"), col("__G"))
      .crossJoin(broadcast(clsDf)) // bounded ≤ maxClasses-row cross
      .join(present, Seq("__id", "lang"), "left")
      .withColumn("__score", col("__prior") +
        coalesce(col("__s"), lit(0L)) +
        (col("__G") - coalesce(col("__np"), lit(0L))) * col("__oov"))
    // best class per doc as a min_by AGGREGATION instead of a
    // row_number window (guide §2: same exchange on __id, no
    // per-partition sort, and the map side collapses the ≤ classes
    // rows per doc before the shuffle). __score is an exact scaled
    // LONG (snap9 grid), so (__score desc, lang asc) is precisely
    // min of (-__score, lang) — no float-negation caveats.
    val best = scored
      .groupBy(col("__id"))
      .agg(min_by(col("lang"),
        struct(negate(col("__score")), col("lang"))).as("lang_pred"))
    docs.join(best, docs(idCol) === best("__id")).drop("__id")
  }
}
