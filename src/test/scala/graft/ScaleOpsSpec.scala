package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.operators.RcOps

/** Scale-mechanics tests: salted skew joins and bucketed co-located
  * joins — the two manual levers when AQE alone isn't enough at 100 TB.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join on the enrichment lookup") {
    val ev = Tables.events(spark, sf0001)
    val dim = RcOps.editCountDim(ev)
    val plain = RcOps.withEditCount(ev)
      .select("event_id", "editcount").orderBy("event_id").collect()
    val salted = RcOps.saltedJoin(ev, dim, Seq("user_id"), buckets = 7)
      .select("event_id", "editcount").orderBy("event_id").collect()
    assert(plain.sameElements(salted))
  }

  test("bucketed tables co-locate: sort-merge join with zero shuffles") {
    val wh = Files.createTempDirectory("wh").toString
    val s2 = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      Tables.orders(s2, sf0001).write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_b")
      Tables.lineitem(s2, sf0001).write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").mode("overwrite").saveAsTable("lineitem_b")
      val joined = s2.table("lineitem_b")
        .join(s2.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected co-located bucketed join, found ${shuffles.size} shuffles")
      assert(joined.count() === Tables.lineitem(s2, sf0001).count())
    } finally {
      s2.sql("DROP TABLE IF EXISTS orders_b")
      s2.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
