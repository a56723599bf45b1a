package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextOps

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

    def t(name: String)(body: => Long): Unit = {
      val rs = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); val n = body; (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"PROBE $name%-28s min=${rs.map(_._1).min}%7.3f s rows=${rs.head._2}")
    }

    // ---- dedup_ngram_jaccard stage decomposition ----
    val nP = spark.sessionState.conf.numShufflePartitions
    def sh: DataFrame = docs
      .select(col("doc_id"),
        explode(TextOps.distinctShingleStructsOfText(col("text"), 5)).as("e"))
      .select(xxhash64(col("e.s")).as("s"),
        (shiftleft(col("doc_id"), 32) + col("e.n")).as("dn"))
    def winFiltered: DataFrame = sh
      .repartition(nP, col("s"))
      .withColumn("df", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("s"))))
      .filter(col("df") >= 2 && col("df") <= TextOps.MaxBucket)
    def buckets: DataFrame = winFiltered
      .groupBy(col("s")).agg(collect_list(col("dn")).as("ids"))
    def pairs: DataFrame = buckets
      .select(explode(TextOps.pairCombinations(col("ids"))).as("p0"))
      .select(least(col("p0.a"), col("p0.b")).as("pa"),
        greatest(col("p0.a"), col("p0.b")).as("pb"))
      .filter(col("pa") < col("pb"))
    def pairAgg: DataFrame = pairs
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("i"))

    t("p0_posting_scan") { sh.count() }
    t("p1_repart_window_filter") { winFiltered.count() }
    t("p2_collect_buckets") { buckets.count() }
    t("p3_explode_pairs") { pairs.count() }
    t("p4_pair_agg") { pairAgg.count() }
    t("p5_full_query") {
      SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).count()
    }

    // Variant B: no window — collect every bucket (incl. df=1) and
    // filter on size after the aggregate
    t("vB_agg_then_size_filter") {
      sh.groupBy(col("s")).agg(collect_list(col("dn")).as("ids"))
        .filter(size(col("ids")) >= 2 && size(col("ids")) <= TextOps.MaxBucket)
        .select(explode(TextOps.pairCombinations(col("ids"))).as("p0"))
        .select(least(col("p0.a"), col("p0.b")).as("pa"),
          greatest(col("p0.a"), col("p0.b")).as("pb"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("i"))
        .count()
    }

    // Variant C: self-join the posting stream on s (no bucket arrays)
    t("vC_self_join_pairs") {
      val l = sh.select(col("s"), col("dn").as("a"))
      val r = sh.select(col("s"), col("dn").as("b"))
      l.join(r, Seq("s"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("i"))
        .count()
    }

    spark.stop()
  }
}
