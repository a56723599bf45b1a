package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Warc

/** WARC crawl-archive ingestion — the web-scale entry path of a
  * training-data pipeline (Common Crawl ships each crawl as ~100 TB of
  * per-record-gzip `.warc.gz` segment files). Built on the
  * [[graft.operators.Warc]] codec; this file is only the Spark
  * plumbing.
  *
  * Spark shape and the 100 TB argument: the `binaryFile` source gives
  * one task per segment file — exactly the parallelism the format
  * admits, because per-record gzip members cannot be split mid-file
  * without a sync index, and crawls ship as MANY files (tens of
  * thousands of ~1 GB segments per crawl), so file-count parallelism
  * saturates any executor fleet. Record explode, HTTP split, and HTML
  * text extraction are all map-side on the same task — zero shuffles
  * from raw bytes to a typed record row. Memory: one segment file is
  * held inflated per task (bounded by [[Warc.MaxInflatedBytes]]);
  * size executors for inflated-segment × cores-per-executor, the same
  * budget every WARC processor (warcio, Spark-CC) runs with. If a job
  * must start from FEW giant files, `repartition` after this ingest —
  * not before, where it cannot help.
  */
object WarcIngest {

  /** Every record of every WARC file under `dir` (plain `.warc` or
    * per-record-gzip `.warc.gz`, detected by magic bytes) as typed
    * rows:
    *
    *   - `path`, `record_idx` — provenance (file + record ordinal);
    *   - `record_type`, `record_id`, `warc_date`, `target_uri` — the
    *     WARC headers every downstream filter keys on;
    *   - `http_status`, `content_type` — from the embedded HTTP
    *     response (null for non-response records);
    *   - `entity` — the raw HTTP entity bytes (binary; multimodal
    *     payloads route to the codec family from here);
    *   - `text` — visible text via `html_to_text` when the response is
    *     HTML, else null.
    *
    * A file that is not a well-formed WARC yields ZERO rows here and
    * one row in [[quarantine]] — the dead-letter discipline of
    * [[CorpusIngest]]: at crawl scale there is always a torn segment,
    * and a job that dies on it never finishes.
    */
  def readWarcRecords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        Warc.decodeWarc(bytes).zipWithIndex.map { case (rec, idx) =>
          val http =
            if (rec.recordType == "response") Warc.parseHttpResponse(rec.body)
            else None
          val isHtml = http.exists(_.contentType.exists(_.toLowerCase
            .startsWith("text/html")))
          (path, idx, rec.recordType, rec.recordId, rec.date,
            rec.targetUri.orNull,
            http.map(_.status), http.flatMap(_.contentType).orNull,
            http.map(_.entity).getOrElse(rec.body),
            if (isHtml)
              graft.functions.TextExpressions.htmlToTextString(
                new String(http.get.entity, java.nio.charset.StandardCharsets.UTF_8))
            else null)
        }
      }
      .toDF("path", "record_idx", "record_type", "record_id", "warc_date",
        "target_uri", "http_status", "content_type", "entity", "text")
  }

  /** Files under `dir` that failed to parse as WARC — the auditable
    * dead-letter side. A healthy crawl ingest leaves this empty; a
    * non-empty result names exactly which segments to refetch.
    */
  def quarantine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("length"), col("content"))
      .as[(String, Long, Array[Byte])]
      .flatMap { case (path, len, bytes) =>
        if (Warc.decodeWarc(bytes).isEmpty) Some((path, len)) else None
      }
      .toDF("path", "length")
  }
}
