package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators via the typed
  * KeyValueGroupedDataset API — the engine's escape hatch when
  * dropDuplicates / windowed aggs can't express the state machine
  * (SURVEY.md §2.2 "streaming: stateful ops").
  *
  * State is per-key in the state store (RocksDB in production):
  * hash-partitioned across executors, checkpointed, no driver state —
  * the scalable replacement for the reference's read-the-whole-log
  * feedback loop (`flaglog.py:27-34`).
  */
object StatefulOps {

  case class UserEvent(user_id: Long, n: Long)
  case class UserTotal(user_id: Long, total: Long, batches: Long)

  implicit private val ueEnc: Encoder[UserEvent] = Encoders.product[UserEvent]
  implicit private val utEnc: Encoder[UserTotal] = Encoders.product[UserTotal]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Running per-user totals across micro-batches: state survives
    * between batches and across checkpoint restarts.
    */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserTotal] =
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[UserEvent], state: GroupState[UserTotal]) => {
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0L))
          val add = it.map(_.n).sum
          val next = UserTotal(user, prev.total + add, prev.batches + 1)
          state.update(next)
          Iterator(next)
        })
}
