package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.cdc.CdcPipeline

/** Transport seam for the CDC envelope stream (R1). The reference ingests
  * Debezium CDC over Kafka into cloud storage (README.md:12,16); this
  * environment has no Kafka jar, so the shipped implementation is the
  * file-JSONL source — but everything downstream (per-table filter, flatten,
  * typed cast, merge, evolution) is transport-agnostic and consumes this
  * interface only. A Kafka implementation is the one class a deployment
  * swaps in: `readStream.format("kafka")` + `from_json(value, schema)` for
  * [[stream]], a bounded `read.format("kafka")` (startingOffsets earliest,
  * endingOffsets latest) for [[batch]].
  */
trait CdcSource {

  /** Envelope schema discovered from data the source currently holds — the
    * reference also infers from data, never declares (SURVEY §1.1).
    */
  def inferSchema(spark: SparkSession): StructType

  /** The unbounded streaming envelope frame under `schema`. */
  def stream(spark: SparkSession, schema: StructType): DataFrame

  /** Bounded replay of everything the source currently holds — backfill and
    * schema-evolution catch-up run the SAME transform over this frame.
    */
  def batch(spark: SparkSession): DataFrame
}

/** File-JSONL transport: a watched directory of newline-delimited envelope
  * documents (the staged-to-cloud-storage layout of README.md:12).
  */
final case class FileJsonlSource(inputDir: String) extends CdcSource {
  override def inferSchema(spark: SparkSession): StructType =
    graft.engine.JsonSchemaCache.schemaOf(spark, inputDir)
  override def stream(spark: SparkSession, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(inputDir)
  override def batch(spark: SparkSession): DataFrame =
    CdcPipeline.readBatch(spark, inputDir)
}
