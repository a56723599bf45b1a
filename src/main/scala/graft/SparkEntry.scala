package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.RcOps
import graft.queries.{AnalyticsQueries, ExtensionQueries, ParityQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query: the reference's full per-event pipeline
    * (`scanner.py:120-175`) as ONE declarative DataFrame chain on
    * sf0.001 — streamfilter → edit-count broadcast join → threshold →
    * first-per-key dedup → text join → multi-regex matched-set →
    * message/partition-key projections. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val filtered = RcOps.streamFilter(ev, Map("event_type" -> Seq("click", "purchase", "view")))
    val enriched = RcOps.withEditCount(filtered)
      .filter(RcOps.countUnderMax(Some(1000L)))
    val deduped = RcOps.firstPerKey(enriched, Seq("user_id", "event_type"), "ts", "event_id")
    val withText = RcOps.withDocText(deduped, Tables.documents(spark, dir))
    val matched = withText
      .withColumn("matched", RcOps.matchedPatterns(col("text"), ParityQueries.watchPatterns))
      .filter(size(col("matched")) > 0)
    matched.select(
      col("event_id"), col("user_id"), col("event_type"), col("doc_id"),
      concat_ws(",", col("matched")).as("matched"),
      RcOps.matchMessage(col("matched"),
        concat(lit("doc://"), col("doc_id").cast("string"))).as("message"),
      RcOps.eventDateFolder(col("ts")).as("folder"),
      RcOps.sanitizedFilename(col("user_id"), col("event_id")).as("filename"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ AnalyticsQueries.queries ++ ExtensionQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * One deliberate exception to "equivalent SQL":
    * `sim_recall_report_trained`'s oracle is a constant CONTRACT table
    * (the expected per-rung health bits), not a computation replay —
    * the trained rungs' learned float codebooks are not
    * SQL-expressible, and the contract oracle exists so a trained-path
    * recall regression flips the driver's hash gate instead of hiding
    * in a spec run. Its DuckDB time is therefore ~0 and NOT a fair
    * perf denominator (the Spark side measures six real rungs, once
    * per corpus version via the store lifecycle).
    */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ AnalyticsQueries.oracleSql ++ ExtensionQueries.oracleSql
}
