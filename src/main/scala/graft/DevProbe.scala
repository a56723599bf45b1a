package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Throwaway stage-timing probe for perf work. Not part of the engine. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).cache()
    docs.count()

    def t(name: String)(body: => Long): Unit = {
      val r1 = { val t0 = System.nanoTime(); val n = body; (System.nanoTime() - t0) / 1e9 -> n }
      val r2 = { val t0 = System.nanoTime(); val n = body; (System.nanoTime() - t0) / 1e9 -> n }
      println(f"PROBE $name%-24s min=${math.min(r1._1, r2._1)}%7.3f s rows=${r2._2}")
    }

    val sh = docs
      .select(col("doc_id"),
        explode(TextOps.distinctShingleStructsOfText(col("text"), 5)).as("e"))
      .select(col("doc_id"), col("e.n").as("n"),
        substring(md5(col("e.s")), 1, 16).as("s"))

    t("native_eq_hof") {
      docs.select(col("doc_id"))
        .where(not(TextOps.shinglesOfText(col("text"), 5) ===
          TextOps.shingles(TextOps.tokens(col("text")), 5))).count()
    }
    t("native_distinct_eq") {
      docs.select(col("doc_id"))
        .where(not(TextOps.distinctShinglesOfText(col("text"), 5) ===
          array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 5)))).count()
    }
    t("explode_md5_forced") {
      sh.agg(sum(length(col("s"))), sum(col("n"))).head(); docs.count()
    }
    t("bucket_agg_list") {
      sh.groupBy(col("s"))
        .agg(collect_list(struct(col("doc_id"), col("n"))).as("ids"))
        .filter(size(col("ids")) > 1 && size(col("ids")) <= TextOps.MaxBucket).count()
    }
    val packed = sh.select(col("s"),
      (shiftleft(col("doc_id"), 32) + col("n")).as("dn"))
    t("bucket_agg_packed") {
      packed.groupBy(col("s")).agg(collect_list(col("dn")).as("ids"))
        .filter(size(col("ids")) > 1 && size(col("ids")) <= TextOps.MaxBucket).count()
    }
    t("full_packed") {
      packed.groupBy(col("s")).agg(collect_list(col("dn")).as("ids"))
        .filter(size(col("ids")) > 1 && size(col("ids")) <= TextOps.MaxBucket)
        .select(explode(TextOps.pairCombinations(col("ids"))).as("p0"))
        .select(least(col("p0.a"), col("p0.b")).as("pa"),
          greatest(col("p0.a"), col("p0.b")).as("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("i"))
        .select(shiftright(col("pa"), 32).as("a_id"),
          shiftright(col("pb"), 32).as("b_id"),
          (col("pa").bitwiseAND(lit(0xffffffffL))).as("na"),
          (col("pb").bitwiseAND(lit(0xffffffffL))).as("nb"),
          col("i"))
        .withColumn("jaccard", round(col("i") / (col("na") + col("nb") - col("i")), 6))
        .filter(col("jaccard") >= 0.2)
        .select(col("a_id"), col("b_id"), col("jaccard"))
        .orderBy(col("a_id"), col("b_id")).count()
    }
    val packedXx = docs
      .select(col("doc_id"),
        explode(TextOps.distinctShingleStructsOfText(col("text"), 5)).as("e"))
      .select(xxhash64(col("e.s")).as("s"),
        (shiftleft(col("doc_id"), 32) + col("e.n")).as("dn"))
    t("full_packed_xx") {
      packedXx.groupBy(col("s")).agg(collect_list(col("dn")).as("ids"))
        .filter(size(col("ids")) > 1 && size(col("ids")) <= TextOps.MaxBucket)
        .select(explode(TextOps.pairCombinations(col("ids"))).as("p0"))
        .select(least(col("p0.a"), col("p0.b")).as("pa"),
          greatest(col("p0.a"), col("p0.b")).as("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("i"))
        .select(shiftright(col("pa"), 32).as("a_id"),
          shiftright(col("pb"), 32).as("b_id"),
          (col("pa").bitwiseAND(lit(0xffffffffL))).as("na"),
          (col("pb").bitwiseAND(lit(0xffffffffL))).as("nb"),
          col("i"))
        .withColumn("jaccard", round(col("i") / (col("na") + col("nb") - col("i")), 6))
        .filter(col("jaccard") >= 0.2)
        .select(col("a_id"), col("b_id"), col("jaccard"))
        .orderBy(col("a_id"), col("b_id")).count()
    }
    t("full_query") {
      graft.queries.ExtensionQueries.queries("dedup_ngram_jaccard")(spark, sfDir).count()
    }
    t("full_minhash") {
      graft.queries.ExtensionQueries.queries("dedup_minhash")(spark, sfDir).count()
    }
    // plan shape of the unigram scorer: the token explode feeds both the
    // vocab aggregate and the scoring join on the same shuffle key —
    // look for ReusedExchange (AQE off to see the static plan)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println(graft.queries.ExtensionQueries
      .queries("text_unigram_logprob")(spark, sfDir)
      .queryExecution.executedPlan.toString.take(6000))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
