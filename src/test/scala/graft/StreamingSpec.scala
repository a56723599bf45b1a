package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.schema.ChangeSchema
import graft.streaming.{RcSinks, RcStreaming}

/** Streaming-semantics tests (SURVEY.md §5.4): the Change pipeline as a
  * real Structured Streaming query over a JSON file source, fanned out
  * through the K1-K4 sinks; first-occurrence dedup; E1 null-text skip.
  */
class StreamingSpec extends SparkSpec {

  private def changeJson(id: Long, title: String, user: String, rev: Long,
      ns: Int = 2, bot: Boolean = false, typ: String = "edit",
      dt: String = "2026-08-12T09:15:00Z"): String =
    s"""{"comment":"c","wiki":"enwiki","type":"$typ","server_name":"en.wikipedia.org",
       |"server_script_path":"/w","namespace":$ns,"title":"$title","bot":$bot,
       |"server_url":"https://en.wikipedia.org","length":{"old":1,"new":2},
       |"meta":{"domain":"en.wikipedia.org","partition":0,"uri":"https://x/$title",
       |"offset":$id,"topic":"rc","request_id":"r","schema_uri":"s","dt":"$dt","id":"m$id"},
       |"user":"$user","timestamp":1786612500,"patrolled":false,"id":$id,
       |"minor":false,"revision":{"old":${rev - 1},"new":$rev}}""".stripMargin.replaceAll("\n", "")

  test("streaming pipeline: F1+J1+F2+D1+J2+R1 end-to-end with sink fan-out") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("changes").toString
    val outDir = Files.createTempDirectory("sinks").toString
    Files.writeString(java.nio.file.Path.of(s"$inDir/batch0.json"), Seq(
      changeJson(1, "User:A", "alice", 101), // match: text has userbox
      changeJson(2, "User:A", "alice", 102), // dup title -> dropped by D1
      changeJson(3, "User:B", "bob", 103),   // bob over edit-count max -> F2 drop
      changeJson(4, "User:C", "cara", 104),  // revision 104 missing -> E1 skip
      changeJson(5, "User:D", "dan", 105),   // no regex match
      changeJson(6, "User:E", "eve", 106, bot = true) // F1 drop (bot)
    ).mkString("\n"))

    val users = Seq(("alice", 10L), ("bob", 500L), ("cara", 1L), ("dan", 2L), ("eve", 3L))
      .toDF("user", "editcount")
    val revisions = Seq((101L, "has a userbox inside"), (102L, "userbox too"),
      (103L, "userbox again"), (105L, "plain text"), (106L, "userbox"))
      .toDF("revid", "text")

    val changes = spark.readStream.schema(ChangeSchema.change).json(inDir)
    val spec = RcStreaming.FilterSpec(
      streamfilter = Map("type" -> Seq("edit", "create"), "bot" -> Seq(false),
        "namespace" -> Seq(2)),
      maxEdits = Some(100L), skipRepeats = true,
      regexes = Seq("(?i)\\buserbox(e[ns])?\\b"))
    val out = RcStreaming.pipeline(changes, users, revisions, spec)

    val sinks = RcSinks(outDir, logLevel = 3, filterName = "example")
    val q = out.writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) => sinks.writeBatch(b, id))
      .option("checkpointLocation", s"$outDir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // Only change id=1 survives every gate.
    val revids = spark.read.text(s"$outDir/revids")
      .select("value").as[String].collect().toSeq
    assert(revids === Seq("101"))
    val flaglog = spark.read.parquet(s"$outDir/flaglog")
    assert(flaglog.count() === 1)
    val row = flaglog.select("filter", "change.title", "log.folder", "log.file").head()
    assert(row.getString(0) === "example")
    assert(row.getString(1) === "User:A")
    assert(row.getString(2) === "changes/2026-08-12")
    assert(row.getString(3) === "alice_101")
    // K4: date-partitioned content files
    val content = spark.read.parquet(s"$outDir/changes")
    assert(content.select("event_date").as[java.sql.Date].head().toString === "2026-08-12")
  }

  test("D1 dedups against MATCHED titles only (filter_.py:90-102 semantics)") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("changesdm").toString
    // same title: first a NON-matching edit, then a matching one —
    // the reference's flag log contains only matches, so the second
    // edit must still be flagged.
    Files.writeString(java.nio.file.Path.of(s"$inDir/b.json"), Seq(
      changeJson(1, "User:X", "alice", 201, dt = "2026-08-12T09:00:00Z"),
      changeJson(2, "User:X", "alice", 202, dt = "2026-08-12T09:01:00Z"),
      changeJson(3, "User:X", "alice", 203, dt = "2026-08-12T09:02:00Z")
    ).mkString("\n"))
    val users = Seq(("alice", 10L)).toDF("user", "editcount")
    val revisions = Seq((201L, "plain text"), (202L, "has a userbox"),
      (203L, "userbox again")).toDF("revid", "text")
    val spec = RcStreaming.FilterSpec(Map("type" -> Seq("edit")), None,
      skipRepeats = true, regexes = Seq("userbox"))
    val got = RcStreaming.pipeline(
      spark.read.schema(ChangeSchema.change).json(inDir), users, revisions, spec)
    // rev 201: no match (not a "repeat"); rev 202: FIRST match -> kept;
    // rev 203: repeat of a flagged title -> deduped.
    assert(got.select("revid").as[Long].collect().toSeq === Seq(202L))
  }

  test("failed edit-count lookup is a race-skip, not a silent 3VL drop") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("changesec").toString
    Files.writeString(java.nio.file.Path.of(s"$inDir/b.json"), Seq(
      changeJson(1, "User:A", "alice", 101),
      changeJson(2, "User:B", "ghost", 102) // not in users dim
    ).mkString("\n"))
    val users = Seq(("alice", 10L)).toDF("user", "editcount")
    val revisions = Seq((101L, "a userbox"), (102L, "userbox too")).toDF("revid", "text")
    val spec = RcStreaming.FilterSpec(Map("type" -> Seq("edit")), Some(100L),
      skipRepeats = false, regexes = Seq("userbox"))
    val batch = spark.read.schema(ChangeSchema.change).json(inDir)
    // without dead-letter: ghost silently skipped, alice flagged
    val got = RcStreaming.pipeline(batch, users, revisions, spec)
    assert(got.select("user").as[String].collect().toSeq === Seq("alice"))
    // with dead-letter: the failed lookup is observable
    val dl = RcStreaming.pipeline(batch, users, revisions, spec, emitDeadLetter = true)
    assert(dl.filter(col("dead_letter")).select("user").as[String].collect().toSeq === Seq("ghost"))
  }

  test("sink replay is idempotent: rewriting a batch id does not duplicate") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("changesrp").toString
    val outDir = Files.createTempDirectory("sinksrp").toString
    Files.writeString(java.nio.file.Path.of(s"$inDir/b.json"),
      changeJson(1, "User:A", "alice", 101))
    val users = Seq(("alice", 10L)).toDF("user", "editcount")
    val revisions = Seq((101L, "a userbox")).toDF("revid", "text")
    val spec = RcStreaming.FilterSpec(Map("type" -> Seq("edit")), None,
      skipRepeats = false, regexes = Seq("userbox"))
    val out = RcStreaming.pipeline(
      spark.read.schema(ChangeSchema.change).json(inDir), users, revisions, spec)
    val sinks = RcSinks(outDir, logLevel = 2, filterName = "example")
    sinks.writeBatch(out, 7L)
    sinks.writeBatch(out, 7L) // at-least-once replay of the SAME batch
    assert(spark.read.text(s"$outDir/revids").select("value").count() === 1)
    assert(spark.read.parquet(s"$outDir/flaglog").count() === 1)
  }

  test("K4 exact parity: one file per match with the 4-section body") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("changespe").toString
    val outDir = Files.createTempDirectory("sinkspe").toString
    Files.writeString(java.nio.file.Path.of(s"$inDir/b.json"),
      changeJson(1, "User:A", "alice", 101))
    val users = Seq(("alice", 10L)).toDF("user", "editcount")
    val revisions = Seq((101L, "a userbox here")).toDF("revid", "text")
    val spec = RcStreaming.FilterSpec(Map("type" -> Seq("edit")), None,
      skipRepeats = false, regexes = Seq("userbox"))
    val out = RcStreaming.pipeline(
      spark.read.schema(ChangeSchema.change).json(inDir), users, revisions, spec)
    RcSinks(outDir, logLevel = 3, filterName = "example").writePerEventFiles(out)
    val f = java.nio.file.Path.of(s"$outDir/changes_files/2026-08-12/alice_101")
    assert(Files.exists(f))
    val content = Files.readString(f)
    val sections = content.split("\n\n", -1)
    assert(sections.length === 4)
    assert(sections(0) === "example")
    assert(sections(1).startsWith("***MATCH*** with regex"))
    assert(sections(2).contains("\"title\":\"User:A\"")) // row payload as JSON
    assert(sections(3) === "a userbox here")             // wikitext
  }

  test("E1 dead-letter route: missing enrichment lands in the side sink") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("changesdl").toString
    val outDir = Files.createTempDirectory("sinksdl").toString
    Files.writeString(java.nio.file.Path.of(s"$inDir/b.json"), Seq(
      changeJson(1, "User:A", "alice", 101),  // match
      changeJson(4, "User:C", "cara", 104)    // revision 104 missing -> dead letter
    ).mkString("\n"))
    val users = Seq(("alice", 10L), ("cara", 1L)).toDF("user", "editcount")
    val revisions = Seq((101L, "a userbox here")).toDF("revid", "text")
    val spec = RcStreaming.FilterSpec(Map("type" -> Seq("edit")), None,
      skipRepeats = false, regexes = Seq("userbox"))
    val batch = spark.read.schema(ChangeSchema.change).json(inDir)
    val out = RcStreaming.pipeline(batch, users, revisions, spec, emitDeadLetter = true)
    RcSinks(outDir, logLevel = 2, filterName = "example").writeBatch(out, 0L)
    val dead = spark.read.parquet(s"$outDir/dead_letter")
    assert(dead.select("title").as[String].collect().toSeq === Seq("User:C"))
    val flagged = spark.read.parquet(s"$outDir/flaglog")
    assert(flagged.select("change.title").as[String].collect().toSeq === Seq("User:A"))
  }

  test("malformed stream rows are dropped, not fatal (declared-schema parse)") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("changesbad").toString
    Files.writeString(java.nio.file.Path.of(s"$inDir/b.json"), Seq(
      changeJson(1, "User:A", "alice", 101),
      """{"this is not a change": tru""", // truncated garbage
      changeJson(2, "User:B", "bob", 102)
    ).mkString("\n"))
    val users = Seq(("alice", 10L), ("bob", 2L)).toDF("user", "editcount")
    val revisions = Seq((101L, "a userbox"), (102L, "another userbox")).toDF("revid", "text")
    val spec = RcStreaming.FilterSpec(Map("type" -> Seq("edit")), None,
      skipRepeats = false, regexes = Seq("userbox"))
    // PERMISSIVE (default) parse nulls out the bad row; the streamfilter
    // then drops it (null type fails the equality) — pipeline completes.
    val batch = spark.read.schema(ChangeSchema.change).json(inDir)
    val got = RcStreaming.pipeline(batch, users, revisions, spec)
    assert(got.select("user").as[String].collect().sorted.toSeq === Seq("alice", "bob"))
  }

  test("typed surface: Dataset[Change] binds the declared schema") {
    val inDir = Files.createTempDirectory("changest").toString
    Files.writeString(java.nio.file.Path.of(s"$inDir/b.json"),
      changeJson(7, "User:T", "tess", 201))
    val ds = graft.schema.Change.asDataset(
      spark.read.schema(ChangeSchema.change).json(inDir))
    val c = ds.head()
    assert(c.title === "User:T" && c.revision.new_rev.contains(201L)
      && c.meta.domain === "en.wikipedia.org")
  }

  test("batch/stream unification: same pipeline runs on a batch DataFrame") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("changesb").toString
    Files.writeString(java.nio.file.Path.of(s"$inDir/b.json"),
      changeJson(1, "User:A", "alice", 101))
    val users = Seq(("alice", 10L)).toDF("user", "editcount")
    val revisions = Seq((101L, "a userbox here")).toDF("revid", "text")
    val spec = RcStreaming.FilterSpec(Map("type" -> Seq("edit")), None,
      skipRepeats = false, regexes = Seq("userbox"))
    val batch = spark.read.schema(ChangeSchema.change).json(inDir)
    val got = RcStreaming.pipeline(batch, users, revisions, spec)
    assert(got.count() === 1)
    assert(got.select("matched").as[String].head() === "userbox")
  }
}
