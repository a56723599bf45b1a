package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.schema.ChangeSchema
import graft.streaming.{RcSinks, RcStreaming}

/** Executable example: SSE source -> Change parse -> full streaming
  * pipeline -> K1-K4 sink fan-out, end to end. Mirrors running the
  * reference as `python scanner.py example` against a recorded stream.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // A recorded SSE stream: 6 events, two on the same title.
    val sse = Files.createTempFile("rc", ".sse")
    def ev(id: Long, title: String, user: String, rev: Long, bot: Boolean = false) =
      s"""data: {"comment":"c","wiki":"enwiki","type":"edit","server_name":"en.wikipedia.org","server_script_path":"/w","namespace":2,"title":"$title","bot":$bot,"server_url":"https://en.wikipedia.org","length":{"old":1,"new":2},"meta":{"domain":"en.wikipedia.org","partition":0,"uri":"https://en.wikipedia.org/wiki/$title","offset":$id,"topic":"rc","request_id":"r","schema_uri":"s","dt":"2026-08-12T09:15:0${id % 10}Z","id":"m$id"},"user":"$user","timestamp":1786612500,"patrolled":false,"id":$id,"minor":false,"revision":{"old":${rev - 1},"new":$rev}}"""
    Files.writeString(sse, Seq(
      ev(1, "User:A", "alice", 101), ev(2, "User:A", "alice", 102),
      ev(3, "User:B", "bob", 103), ev(4, "User:C", "cara", 104),
      ev(5, "User:D", "dan", 105), ev(6, "User:E", "eve", 106, bot = true)
    ).mkString("\n"))

    val users = Seq(("alice", 10L), ("bob", 500L), ("cara", 1L), ("dan", 2L), ("eve", 3L))
      .toDF("user", "editcount")
    val revisions = Seq((101L, "has a userbox inside"), (102L, "userbox too"),
      (103L, "userbox again"), (105L, "plain text"), (106L, "userbox"))
      .toDF("revid", "text")

    val changes = spark.readStream.format("sse").option("path", sse.toString).load()
      .select(from_json(col("value"), ChangeSchema.change).as("c")).select("c.*")

    val spec = RcStreaming.FilterSpec(
      streamfilter = Map("type" -> Seq("edit", "create"), "bot" -> Seq(false),
        "namespace" -> Seq(2)),
      maxEdits = Some(100L), skipRepeats = true,
      regexes = Seq("(?i)\\buserbox(e[ns])?\\b"))

    val outDir = Files.createTempDirectory("rc_out").toString
    val sinks = RcSinks(outDir, logLevel = 3, filterName = "example", echoConsole = true)
    val q = RcStreaming.pipeline(changes, users, revisions, spec)
      .writeStream
      .foreachBatch((b: DataFrame, id: Long) => sinks.writeBatch(b, id))
      .option("checkpointLocation", s"$outDir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    println("== revid log (K2):")
    spark.read.text(s"$outDir/revids").show(false)
    println("== flag log (K3):")
    spark.read.parquet(s"$outDir/flaglog")
      .select("filter", "change.title", "change.user", "log.folder", "log.file").show(false)
    println("== content files (K4), partitioned by event_date:")
    spark.read.parquet(s"$outDir/changes").show(false)
    spark.stop()
  }
}
