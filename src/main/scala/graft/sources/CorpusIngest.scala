package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingestion — the raw entry path of a training-data
  * pipeline: line-delimited JSON documents, schema-enforced, with
  * malformed lines QUARANTINED instead of failing the job or silently
  * vanishing (the corpus analog of the RC pipeline's E1 dead-letter
  * rule: at 100 TB there is always a torn line somewhere, and a
  * pipeline that dies on it never finishes, while one that drops it
  * silently can't be audited).
  *
  * Spark shape: one PERMISSIVE-mode json scan with a
  * `_corrupt_record` capture column; good rows flow on with the typed
  * schema, bad lines land in a quarantine frame carrying the raw line.
  * Both frames come from the SAME scan definition, split by a
  * null-test on the capture column — no second pass over the input.
  * Works identically via `readStream` for continuous ingest (the
  * documents land in micro-batches, quarantine goes to its own sink).
  */
object CorpusIngest {

  /** The documents-table schema (TESTDATA.md contract). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val Corrupt = "_corrupt_record"

  private def withCapture(schema: StructType): StructType =
    schema.add(StructField(Corrupt, StringType))

  /** Batch JSONL read → (good, quarantine). `good` carries exactly
    * `schema`'s columns; `quarantine` carries the raw offending line.
    * The parsed frame is cached: Spark (correctly) refuses a filter
    * that references ONLY the corrupt column against a lazy json scan
    * — the capture column exists per-parse, not per-file — so the
    * split must read the materialized parse, and callers consume both
    * halves anyway. Caller unpersists via the returned frames' shared
    * lineage (`good.unpersist()` is a no-op; use `release`).
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType = docSchema): (DataFrame, DataFrame) = {
    val parsed = spark.read
      .schema(withCapture(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)
      .cache()
    val good = parsed.filter(col(Corrupt).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val quarantine = parsed.filter(col(Corrupt).isNotNull)
      .select(col(Corrupt).as("raw_line"))
    (good, quarantine)
  }

  /** Release the shared scan cache behind a [[readJsonl]] pair. */
  def release(spark: SparkSession, path: String,
      schema: StructType = docSchema): Unit = {
    spark.read.schema(withCapture(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path).unpersist()
    ()
  }

  /** Streaming JSONL ingest of a directory (files appear over time —
    * the landing-zone pattern). Returns the parsed stream WITH the
    * capture column so the caller can route good/quarantine inside one
    * `foreachBatch` (a streaming filter-only-on-corrupt-column hits
    * the same analyzer guard as batch; splitting per micro-batch frame
    * is the supported shape).
    */
  def streamJsonl(spark: SparkSession, dir: String,
      schema: StructType = docSchema): DataFrame =
    spark.readStream
      .schema(withCapture(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(dir)

  /** Split a (micro-)batch frame from [[streamJsonl]]. */
  def splitBatch(parsed: DataFrame,
      schema: StructType = docSchema): (DataFrame, DataFrame) = (
    parsed.filter(col(Corrupt).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*),
    parsed.filter(col(Corrupt).isNotNull).select(col(Corrupt).as("raw_line"))
  )
}
