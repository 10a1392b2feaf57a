package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.streaming.ExtractStream

/** Interleaved-corpus readers for the formats a real ingestion edge
  * produces — all return the canonical `(doc_id, spans[])` shape the
  * extraction job consumes, schema pinned explicitly (never inferred:
  * schema inference scans the data twice and can mistype empty
  * columns at 10^12 scale).
  *
  *  - parquet: the native columnar layout (ExtractCli gen / tables);
  *  - jsonl: one JSON document per line — the classic crawler dump
  *    (`{"doc_id": ..., "spans": [{"kind": ...}, ...]}`);
  *  - csv+jsonSpans: flat CSV with the span array as an embedded JSON
  *    string column — the lowest-common-denominator export shape.
  *
  * Each reader works for BOTH batch (`spark.read`) and streaming
  * (`spark.readStream`) since the schema is explicit.
  */
object CorpusSource {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(ExtractStream.inputSchema).parquet(path)

  def jsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(ExtractStream.inputSchema).json(path)

  /** ORC — the other columnar interchange format warehouses hand over
    * (Spark ships the reader; nested span structs round-trip like
    * parquet). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(ExtractStream.inputSchema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** CSV with columns (doc_id, spans_json) where spans_json is the
    * span array serialized as JSON (quoted/escaped by the CSV layer). */
  def csvJsonSpans(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val flat = StructType(Seq(
      StructField("doc_id", StringType), StructField("spans_json", StringType)))
    spark.read.schema(flat).option("header", "true").csv(path)
      .select(col("doc_id"),
        from_json(col("spans_json"),
          ExtractStream.inputSchema("spans").dataType).as("spans"))
  }

  /** Write a parquet corpus out as jsonl / csv for round-trip tests
    * and downstream consumers. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeCsvJsonSpans(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    df.select(col("doc_id"), to_json(col("spans")).as("spans_json"))
      .write.mode("overwrite").option("header", "true").csv(path)
  }
}
