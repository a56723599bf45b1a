package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.schema.ChangeSchema

/** Custom V2 SSE source: micro-batch delivery, offset continuity, and
  * checkpoint resume (reference E2 restart, `scanner.py:82-88`, becomes
  * exactly-once offset recovery).
  */
class SseSourceSpec extends SparkSpec {

  private def sseFrame(id: Long): String =
    s"""event: message
       |id: [{"topic":"rc","partition":0,"offset":$id}]
       |data: {"type":"edit","title":"T$id","id":$id}
       |""".stripMargin

  test("sse source replays SSE-framed events as micro-batches") {
    import spark.implicits._
    val f = Files.createTempFile("events", ".sse")
    Files.writeString(f, (1L to 5L).map(sseFrame).mkString("\n"))
    val out = Files.createTempDirectory("sseout").toString

    val q = spark.readStream.format("sse").option("path", f.toString).load()
      .writeStream.format("memory").queryName("sse_t1")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val rows = spark.sql("SELECT value, offset FROM sse_t1 ORDER BY offset")
      .as[(String, Long)].collect()
    assert(rows.length === 5)
    assert(rows.map(_._2).toSeq === (0L to 4L))
    // payload is valid JSON parseable with the declared Change subset
    val parsed = spark.sql("SELECT value FROM sse_t1")
      .select(from_json(col("value"), ChangeSchema.change).as("c"))
      .select("c.title").as[String].collect().toSet
    assert(parsed === (1 to 5).map(i => s"T$i").toSet)
  }

  test("checkpoint resume: appended events are picked up, no replay") {
    import spark.implicits._
    val f = Files.createTempFile("events2", ".sse")
    Files.writeString(f, (1L to 3L).map(sseFrame).mkString("\n"))
    val out = Files.createTempDirectory("sseout2").toString
    val sink = Files.createTempDirectory("ssesink2").toString

    def runOnce(): Unit = {
      val q = spark.readStream.format("sse").option("path", f.toString).load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    runOnce()
    assert(spark.read.parquet(sink).count() === 3)
    // connection "drops"; three more events arrive; restart resumes at 3
    Files.writeString(f, "\n" + (4L to 6L).map(sseFrame).mkString("\n"),
      java.nio.file.StandardOpenOption.APPEND)
    runOnce()
    val offsets = spark.read.parquet(sink).select("offset").as[Long].collect().sorted
    assert(offsets.toSeq === (0L to 5L)) // each offset exactly once
  }
}
