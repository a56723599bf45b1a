package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-timing probe for perf work. Not part of the engine. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).cache()
    docs.count()
    Tables.embeddings(spark, sfDir).cache().count()

    def t(name: String)(body: => Long): Unit = {
      val rs = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); val n = body; (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"PROBE $name%-28s min=${rs.map(_._1).min}%7.3f s rows=${rs.head._2}")
    }

    // ---- round-9 probes: pq scan cost, url canon HOF cost, image pairing ----
    t("pq_full_query") { SparkEntry.queries("sim_pq_topk")(spark, sfDir).count() }
    val pqPrebuilt = SparkEntry.queries("sim_pq_topk")(spark, sfDir)
    t("pq_prebuilt_rerun") { pqPrebuilt.count() }
    t("url_canon_full") { SparkEntry.queries("crawl_url_canon")(spark, sfDir).count() }
    t("image_phash_full") { SparkEntry.queries("dedup_image_phash")(spark, sfDir).count() }
    t("audio_shingle_full") { SparkEntry.queries("dedup_audio_shingle")(spark, sfDir).count() }

    // url construction WITHOUT canonicalization: the floor under the query
    val g = expr("doc_id div 4")
    val hostBase = concat(lit("w"), (g % 97).cast("string"), lit(".example.org"))
    val url = concat(
      when(col("doc_id") % 3 === 0, lit("HTTPS")).otherwise(lit("https")),
      lit("://"),
      when(col("doc_id") % 2 === 1, upper(hostBase)).otherwise(hostBase),
      when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
      when(col("doc_id") % 11 === 0, lit("/%70/")).otherwise(lit("/p/")),
      g.cast("string"),
      when(col("doc_id") % 7 === 0, lit("/")).otherwise(lit("")),
      lit("?"),
      when(col("doc_id") % 3 === 1, lit("utm_source=feed&a=1&b=2"))
        .otherwise(when(col("doc_id") % 2 === 0, lit("b=2&a=1"))
          .otherwise(lit("a=1&b=2"))),
      when(col("doc_id") % 2 === 0, lit("&c=x%2fy")).otherwise(lit("&c=x%2Fy")),
      when(col("doc_id") % 4 === 1,
        concat(lit("#s"), col("doc_id").cast("string"))).otherwise(lit("")))
    t("url_no_canon_floor") {
      docs.select(col("doc_id"), url.as("raw_url"))
        .groupBy(col("raw_url")).agg(count(lit(1)).as("n"))
        .orderBy(col("raw_url")).count()
    }
    t("url_percent_only") {
      docs.select(graft.operators.UrlOps.normalizePercent(url).as("u"))
        .groupBy(col("u")).agg(count(lit(1)).as("n")).count()
    }
    spark.stop()
  }
}
