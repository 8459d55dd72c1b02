package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse (TF-IDF) document similarity over an inverted index — the
  * term-space complement of the dense-embedding pipeline in
  * [[Similarity]]: cosine over n-gram TF-IDF vectors, with the
  * AllPairs/PPJoin-style DF-capped candidate generation that makes the
  * quadratic self-join survivable at corpus scale.
  *
  * 100 TB shape: the inverted index (gram → postings) is the shuffle
  * key everywhere. Candidate pairs are generated ONLY from grams with
  * `df ≤ dfCap` — a gram shared by half the corpus would alone emit a
  * quadratic pair explosion while contributing near-zero IDF weight to
  * any cosine; capping df bounds per-gram pair fan-out at dfCap² and is
  * exactly the pruning the published all-pairs similarity joins apply.
  * The EXACT cosine (all shared grams, common ones included) is then
  * computed only for the surviving candidates via two hash joins
  * against the full vector table. A pair is missed only if ALL its
  * shared grams have df > dfCap — at trigram order such a pair shares
  * only boilerplate and its TF-IDF cosine is noise by construction.
  */
object SparseSimilarity {

  /** Per-(id, gram) TF-IDF weights `w = tf · ln(N / df)` plus the
    * per-id L2 norm, at n-gram order `n`. Two aggregations (tf per
    * (id, gram), df per gram) and one scalar doc count; the df table
    * joins back on the gram — plain equi-join, AQE broadcasts when it
    * fits.
    */
  def tfidfVectors(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val tf = docs
      .select(col(idCol),
        explode(TF.ngramsOf(TF.tokens(col(textCol)), n)).as("gram"))
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(countDistinct(col(idCol)).as("n_docs"))
    tf.join(df, Seq("gram"))
      .crossJoin(broadcast(nDocs))
      .withColumn("w", col("tf") * log(col("n_docs") / col("df")))
      .select(col(idCol), col("gram"), col("df"), col("w"))
  }

  /** Global top-`k` most similar document pairs by TF-IDF cosine, with
    * DF-capped candidate generation and exact verification. Output:
    * `a, b, n_shared` (shared grams counted over ALL grams, not just
    * rare ones), `cosine` (rounded 4; ranked on the rounded grid with
    * (a, b) tie-breaks so the LIMIT boundary replays).
    */
  def cosineTopK(docs: DataFrame, idCol: String, textCol: String,
      n: Int, dfCap: Int, k: Int): DataFrame = {
    val vecs = graft.CacheScope.register(
      tfidfVectors(docs, idCol, textCol, n).persist())
    val norms = vecs.groupBy(col(idCol))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    // the exact dot splits at the dfCap boundary: the RARE-gram part
    // is the gram-keyed self-join whose support IS the candidate set
    // (per-gram fan-out ≤ dfCap², the AllPairs bound — and ~100×
    // smaller than joining every candidate against its FULL vector,
    // the shape this replaced); the DENSE-gram remainder joins only
    // the few df > dfCap postings per candidate pair. Same exact
    // cosine, both halves bounded.
    val rare = graft.CacheScope.register(vecs
      .filter(col("df") <= dfCap)
      .select(col(idCol), col("gram"), col("w"))
      .persist())
    val dotsRare = rare
      .select(col(idCol).as("a"), col("gram"), col("w").as("wa"))
      .join(rare.select(col(idCol).as("b"), col("gram"),
        col("w").as("wb")), Seq("gram"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_rare"), sum(col("wa") * col("wb"))
        .as("dot_rare"))
    val dense = vecs.filter(col("df") > dfCap)
    val denseA = dense.select(col(idCol).as("a"), col("gram"),
      col("w").as("wa"))
    val denseB = dense.select(col(idCol).as("b"), col("gram"),
      col("w").as("wb"))
    val dotsDense = dotsRare.select(col("a"), col("b"))
      .join(denseA, Seq("a"))
      .join(denseB, Seq("b", "gram"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_dense"), sum(col("wa") * col("wb"))
        .as("dot_dense"))
    val dots = dotsRare.join(dotsDense, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        (col("n_rare") + coalesce(col("n_dense"), lit(0L)))
          .as("n_shared"),
        (col("dot_rare") + coalesce(col("dot_dense"), lit(0.0)))
          .as("dot"))
    dots
      .join(norms.select(col(idCol).as("a"), col("nrm").as("na")), Seq("a"))
      .join(norms.select(col(idCol).as("b"), col("nrm").as("nb")), Seq("b"))
      .select(col("a"), col("b"), col("n_shared"),
        round(col("dot") / (col("na") * col("nb")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Okapi BM25 top-`k` retrieval for ONE query against the corpus —
    * the query→document direction [[cosineTopK]]'s pair mining
    * doesn't cover, and the lexical half of a hybrid
    * (BM25 + dense-ANN, fused by [[RankFusion]]) retrieval stack.
    * Robertson/Spärck Jones weights, the standard parameterization:
    *
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with `idf(t) = ln(1 + (N−df+0.5)/(df+0.5))` (the Lucene form —
    * positive for any df ≤ N).
    *
    * 100 TB shape: the query terms broadcast; ONLY their postings
    * (tf rows, an inverted-index equi-join) are touched past the
    * per-doc length table — never a corpus-wide score; df for the
    * query terms aggregates from those same postings; the top-k is a
    * heap (TakeOrderedAndProject), not a global sort. Corpus stats
    * (N, avgdl) are one broadcast row. Output: `(doc, dl,
    * n_hit_terms, score)` rounded 4, (score desc, doc) tie-broken so
    * the LIMIT boundary replays; unordered double addition over the
    * ≤|query| per-doc terms is the q149 dot-sum portability
    * precedent.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    require(k >= 1, s"k $k must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs.select(col(idCol).as("doc"),
      explode(TF.tokens(col(textCol))).as("tok"))
    val dl = tok.groupBy(col("doc")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val qt = queryTerms.distinct.toDF("tok")
    val postings = tok.join(broadcast(qt), Seq("tok"))
      .groupBy(col("doc"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dft = postings.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
    postings
      .join(dft, Seq("tok"))
      .join(dl, Seq("doc"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5))))
      .withColumn("term_score",
        col("idf") * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc"), col("dl"))
      .agg(count(lit(1)).as("n_hit_terms"),
        round(sum(col("term_score")), 4).as("score"))
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
  }
}
