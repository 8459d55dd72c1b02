package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call SQL registration of the engine's scalar functions, for users
  * working in `spark.sql(...)` instead of the Column API:
  *
  * {{{
  * GraftFunctions.registerAll(spark)
  * spark.sql("SELECT graft_slugify(name) FROM docs")
  * }}}
  *
  * (The codegen'd `graft_dot` expression is registered separately via
  * `spark.sql.extensions=graft.GraftExtensions` — it is an Expression,
  * not a UDF.)
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("graft_slugify",
      (s: String) => Slugify.slugify(s))
    spark.udf.register("graft_simhash",
      (toks: Seq[String]) => DedupFunctions.simhash64(toks))
    spark.udf.register("graft_minhash",
      (toks: Seq[String], k: Int, shingleLen: Int) =>
        DedupFunctions.minhashSigFast(toks, k, shingleLen))
    spark.udf.register("graft_upload_filename",
      (hash: String, name: String, suffix: String, prefix: String) =>
        // null-safe like the rest of the suite: any NULL arg -> NULL
        if (hash == null || name == null || suffix == null || prefix == null)
          null
        else FileNames.createFileNameForUpload(hash, name, suffix, prefix))
    spark.udf.register("graft_content_type",
      (content: Array[Byte], url: String, header: String) =>
        ContentTypes.determine(content, url, header))
  }
}
