package graft

/** The frame-memo lifecycle contract (r20 verdict item 8 / advice item
  * 1): `Tables.load` memoizes constructed DataFrames per session, and
  * the r20 implementation keyed a WeakHashMap on the SparkSession —
  * but the cached frames strongly reference their session, so the key
  * could never become weakly reachable and every stopped session's
  * frames were pinned for JVM life. The fix keys on `sessionUUID` and
  * evicts via a SparkListener on application end; this spec drives
  * that listener END TO END through the real listener bus (a synthetic
  * ApplicationEnd via the bridge — stopping the suite-shared context
  * would kill every other suite).
  */
class TablesMemoSpec extends SparkSpec {
  import spark.implicits._

  test("a session's frame-memo entry is evicted on application end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-memo-spec-").toString
    Seq((0L, "alpha"), (1L, "beta")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val uuid = Tables.sessionKey(spark)
    assert(Tables.documents(spark, dir).count() === 2L)
    assert(Tables.frameMemoHas(uuid),
      "Tables.load must memoize the constructed frame for the live session")
    // memo HIT must return the identical frame object (the whole point:
    // no re-list + footer re-read per call)
    val a = Tables.load(spark, dir, "documents")
    val b = Tables.load(spark, dir, "documents")
    assert(a eq b, "second load of an unchanged path must hit the memo")
    org.apache.spark.sql.graft.bridge.postApplicationEnd(spark.sparkContext)
    org.apache.spark.sql.graft.bridge.drainListenerBus(spark.sparkContext, 10000)
    assert(!Tables.frameMemoHas(uuid),
      "application end must evict the session's frame-memo entry " +
        "(stopped sessions may not pin their frames for JVM life)")
    // the memo re-populates transparently on the next load
    assert(Tables.documents(spark, dir).count() === 2L)
    assert(Tables.frameMemoHas(uuid))
  }
}
