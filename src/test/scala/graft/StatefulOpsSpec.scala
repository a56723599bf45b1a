package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{UserEvent, UserTotal}

/** Custom stateful op: state must accumulate across micro-batches. */
class StatefulOpsSpec extends SparkSpec {

  test("flatMapGroupsWithState accumulates per-user totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[UserEvent]
    val q = StatefulOps.runningTotals(in.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(UserEvent(1, 5), UserEvent(1, 2), UserEvent(2, 1))
      q.processAllAvailable()
      in.addData(UserEvent(1, 3), UserEvent(3, 4))
      q.processAllAvailable()
      val last = spark.table("totals").as[UserTotal].collect()
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.batches) }
      assert(last(1L) === UserTotal(1, 10, 2)) // 7 in batch 1, +3 in batch 2
      assert(last(2L) === UserTotal(2, 1, 1))
      assert(last(3L) === UserTotal(3, 4, 1))
    } finally q.stop()
  }
}
