package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream equi-join with watermarks on both sides (bounded join
  * state) — the streaming twin of the enrichment joins when the
  * dimension side is itself a live stream (e.g. revision-create events
  * joined to recentchange events).
  */
class StreamStreamJoinSpec extends SparkSpec {

  test("watermarked stream-stream join matches events within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val edits = MemoryStream[(Long, Timestamp)]
    val creates = MemoryStream[(Long, Timestamp)]
    def t(s: String) = Timestamp.valueOf(s)

    val l = edits.toDF().toDF("rev", "ts_e").withWatermark("ts_e", "10 minutes")
    val r = creates.toDF().toDF("rev", "ts_c").withWatermark("ts_c", "10 minutes")
    val joined = l.join(r,
      l("rev") === r("rev") &&
        r("ts_c") >= l("ts_e") - expr("INTERVAL 5 MINUTES") &&
        r("ts_c") <= l("ts_e") + expr("INTERVAL 5 MINUTES"))
      .select(l("rev"), col("ts_e"), col("ts_c"))

    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      edits.addData((1L, t("2026-08-12 10:00:00")), (2L, t("2026-08-12 10:01:00")))
      creates.addData((1L, t("2026-08-12 10:02:00")), // within 5 min of edit 1
        (2L, t("2026-08-12 10:30:00")))               // outside the interval
      q.processAllAvailable()
      // advance both watermarks so results finalize
      edits.addData((99L, t("2026-08-12 11:00:00")))
      creates.addData((98L, t("2026-08-12 11:00:00")))
      q.processAllAvailable()
      val got = spark.table("ssj").as[(Long, Timestamp, Timestamp)].collect()
      assert(got.map(_._1).toSeq === Seq(1L)) // only rev 1 paired in-window
    } finally q.stop()
  }
}
