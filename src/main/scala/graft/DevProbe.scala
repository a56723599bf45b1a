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
      .config("spark.sql.session.timeZone", "UTC")
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

    // ---- round-10 probes: new-query costs vs scan floor ----
    t("phrase_full") { SparkEntry.queries("search_phrase")(spark, sfDir).count() }
    t("phrase_floor_split") {
      docs.select(size(split(col("text"), " ")).as("n"))
        .agg(sum(col("n"))).count()
    }
    t("phrase_contains_floor") {
      docs.filter(col("text").contains("key agg")).count()
    }
    t("profile_full") { SparkEntry.queries("profile_columns")(spark, sfDir).count() }
    t("q29b_full") { SparkEntry.queries("q29b_equidepth_global")(spark, sfDir).count() }
    t("q31_topk_full") { SparkEntry.queries("q31_topk_per_group")(spark, sfDir).count() }
    t("text_hapax_full") { SparkEntry.queries("text_hapax")(spark, sfDir).count() }
    t("sample_rank_weighted") { SparkEntry.queries("sample_rank_weighted")(spark, sfDir).count() }
    spark.stop()
  }
}
