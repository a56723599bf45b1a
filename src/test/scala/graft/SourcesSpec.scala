package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: JSON, CSV, ORC
  * round-trips with declared schemas (never inferSchema — SURVEY §1.2).
  */
class SourcesSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  private def roundtrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"rt_$fmt").toString
    docs.write.mode("overwrite").format(fmt).save(dir)
    val back = spark.read.schema(docs.schema).format(fmt).load(dir)
    assert(back.count() === docs.count())
    val a = docs.orderBy("doc_id").collect()
    val b = back.orderBy("doc_id").collect()
    assert(a.sameElements(b), s"$fmt roundtrip mismatch")
  }

  test("json roundtrip with declared schema")(roundtrip("json"))
  test("csv roundtrip with declared schema") {
    val dir = Files.createTempDirectory("rt_csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(docs.schema).option("header", "true").csv(dir)
    assert(back.orderBy("doc_id").collect()
      .sameElements(docs.orderBy("doc_id").collect()))
  }
  test("orc roundtrip with declared schema")(roundtrip("orc"))

  test("partitioned parquet sink prunes partitions on read") {
    val dir = Files.createTempDirectory("rt_part").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    val scans = one.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    // the lang predicate must arrive as a partition filter (pruning),
    // not a post-scan row filter
    assert(scans.nonEmpty && scans.head.partitionFilters.nonEmpty)
    assert(one.count() === docs.filter(col("lang") === "en").count())
  }
}
