package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the incremental-pipeline bookkeeping step:
  * given two versions of a corpus (yesterday's crawl and today's),
  * classify every id as `added` / `removed` / `changed` / `unchanged`
  * by content hash, so downstream stages (tokenize, embed, index,
  * dedup-delta) re-process ONLY the changed partition of the data.
  *
  * 100 TB shape: one full-outer equi-join on the id with md5 content
  * hashes computed scan-side (both inputs are read once, hashes are
  * codegen'd, the join is the only shuffle). At petabyte scale both
  * sides would be bucketed by id on write, making this join
  * shuffle-free; the diff output partitioned by `status` lets the
  * "changed + added" re-process read exactly two partitions.
  */
object SnapshotDiff {

  /** (id, status, old_hash, new_hash) for every id in either snapshot;
    * status ∈ added | removed | changed | unchanged.
    *
    * Presence comes from EXPLICIT side markers, not hash nullability — a
    * null-text row hashes to null, and inferring "missing" from a null
    * hash would misclassify it (a deleted null-text doc would report
    * 'added'). Null texts compare as: null ↔ null unchanged, null ↔
    * text changed.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol),
      md5(col(textCol).cast("binary")).as("old_hash"),
      lit(true).as("__in_old"))
    val n = newSnap.select(col(idCol),
      md5(col(textCol).cast("binary")).as("new_hash"),
      lit(true).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("old_hash").isNull && col("new_hash").isNull,
            "unchanged")
          .when(col("old_hash").isNull || col("new_hash").isNull,
            "changed")
          .when(col("old_hash") === col("new_hash"), "unchanged")
          .otherwise("changed"))
      .select(col(idCol), col("status"), col("old_hash"), col("new_hash"))
  }

  /** The ids downstream must (re-)process: added + changed. */
  def toReprocess(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      textCol: String): DataFrame =
    diff(oldSnap, newSnap, idCol, textCol)
      .filter(col("status").isin("added", "changed"))
      .select(col(idCol), col("status"))
}
