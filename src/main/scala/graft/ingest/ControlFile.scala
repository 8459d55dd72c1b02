package graft.ingest

import graft.model.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Control-file source (SURVEY.md §2 S1–S4): one JSON document announcing
  * new documents (array) and updates (map document_id → update list),
  * normalized into two DataFrames.
  *
  * The polymorphic `Update.s3_value`/`db_value` (string | object | null,
  * reference fixture `new_and_updated_documents.json:786-1030`) are read
  * as `VariantType` and re-serialized to canonical JSON strings, keeping
  * the schema fixed while values stay faithful (SURVEY.md §1.2).
  *
  * Known canonicalization nuance: variant parsing normalizes
  * integer-valued decimals, so a literal `10000000.0` inside a
  * polymorphic value re-serializes as `10000000` (Python's json round
  * trip would keep the `.0`). Semantically equal; byte-parity holds for
  * every value shape in the reference corpus.
  */
object ControlFile {

  /** Read schema: `PipelineUpdates` (reference `base/utils.py:30-31`). */
  val pipelineUpdatesSchema: StructType = StructType(Seq(
    StructField("new_documents", ArrayType(Schemas.backendDocumentSchema)),
    StructField("updated_documents", MapType(StringType, ArrayType(
      StructType(Seq(
        StructField("type", StringType),
        StructField("s3_value", VariantType),
        StructField("db_value", VariantType)
      )))))
  ))

  /** Load + validate the control file (S1/S2). FAILFAST ≈ the reference's
    * strict `PipelineUpdates.model_validate` (`utils.py:31`).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("multiLine", true)
      .option("mode", "FAILFAST")
      .schema(pipelineUpdatesSchema)
      .json(path)

  /** S3: one row per new BackendDocument. */
  def newDocuments(control: DataFrame): DataFrame =
    control
      .select(explode(col("new_documents")).as("doc"))
      .select(col("doc.*"))

  /** S4: one row per updated document id, the update list kept grouped
    * (per-document sequential action semantics, SURVEY.md §2 U1) with the
    * polymorphic values as JSON strings.
    */
  def updatedDocuments(control: DataFrame): DataFrame =
    control
      .select(explode(col("updated_documents")).as(Seq("document_id", "updates")))
      .select(col("document_id"), transform(col("updates"), u => struct(
        u.getField("type").as("type"),
        to_json(u.getField("s3_value")).as("s3_value"),
        to_json(u.getField("db_value")).as("db_value")
      )).as("updates"))
}
