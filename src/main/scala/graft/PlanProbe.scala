package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    Tables.documents(spark, dir).cache().count()
    for (q <- Seq("crawl_pipeline", "warc_ingest")) {
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).count()
        (System.nanoTime()-t0)/1e9
      }
      println(f"TIME $q min=${ts.min}%.2f")
    }
    spark.stop()
  }
}
