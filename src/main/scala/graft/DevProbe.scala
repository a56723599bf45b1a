package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{TextOps, VectorOps}

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
    val emb = Tables.embeddings(spark, sfDir).cache()
    emb.count()

    def t(name: String)(body: => Long): Unit = {
      val rs = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); val n = body; (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"PROBE $name%-28s min=${rs.map(_._1).min}%7.3f s rows=${rs.head._2}")
    }

    // ---- sim_ivf_topk: old (full assignment on probe side) vs new ----
    val embN = emb.withColumn("v", col("embedding"))
      .withColumn("nv", VectorOps.norm2(col("embedding")))
    val cents = embN.filter(col("vec_id") < 32)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nv").as("ncv"))
    def assign(vecs: DataFrame): DataFrame =
      vecs.select(col("vec_id"), col("v"), col("nv"))
        .crossJoin(broadcast(cents))
        .withColumn("cs",
          round(VectorOps.dot(col("v"), col("cv")) / sqrt(col("nv") * col("ncv")), 6))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cid"), struct(col("cs"), (-col("cid")).as("nc"))).as("cell"),
          first(col("v")).as("v"), first(col("nv")).as("nv"))
    def scoreCell(withCell: DataFrame, qCell: DataFrame): DataFrame =
      withCell.crossJoin(broadcast(qCell))
        .filter(col("cell") === col("qcell") && col("vec_id") =!= 42)
        .select(col("vec_id"),
          round(VectorOps.dot(col("qv"), col("v")) / sqrt(col("nq") * col("nv")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(5)
    t("ivf_old_full_probe") {
      val withCell = assign(embN)
      val q = withCell.filter(col("vec_id") === 42)
        .select(col("v").as("qv"), col("nv").as("nq"), col("cell").as("qcell"))
      scoreCell(withCell, q).count()
    }
    t("ivf_new_point_probe") {
      val q = assign(embN.filter(col("vec_id") === 42))
        .select(col("v").as("qv"), col("nv").as("nq"), col("cell").as("qcell"))
      scoreCell(assign(embN), q).count()
    }

    // ---- dedup_ngram_jaccard pairing strategies ----
    val sh = docs
      .select(col("doc_id"),
        explode(TextOps.distinctShingleStructsOfText(col("text"), 5)).as("e"))
      .select(xxhash64(col("e.s")).as("s"),
        (shiftleft(col("doc_id"), 32) + col("e.n")).as("dn"))
    def finish(pairs: DataFrame): DataFrame =
      pairs
        .select(shiftright(col("pa"), 32).as("a_id"),
          shiftright(col("pb"), 32).as("b_id"),
          col("pa").bitwiseAND(lit(0xffffffffL)).as("na"),
          col("pb").bitwiseAND(lit(0xffffffffL)).as("nb"),
          col("i"))
        .withColumn("jaccard", round(col("i") / (col("na") + col("nb") - col("i")), 6))
        .filter(col("jaccard") >= 0.2)
        .select(col("a_id"), col("b_id"), col("jaccard"))
    // the ONE posting pipeline under probe (window df filter -> bucket
    // lists -> canonicalized pair counts) — every variant below feeds a
    // differently-partitioned `src` through this same body so a change
    // to the pair canonicalization can't silently diverge per probe
    def pairCounts(src: DataFrame): DataFrame =
      src.withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("s"))))
        .filter(col("df") >= 2 && col("df") <= TextOps.MaxBucket)
        .groupBy(col("s"))
        .agg(collect_list(col("dn")).as("ids"))
        .select(explode(TextOps.pairCombinations(col("ids"))).as("p0"))
        .select(least(col("p0.a"), col("p0.b")).as("pa"),
          greatest(col("p0.a"), col("p0.b")).as("pb"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("i"))

    t("jacc_current_list") {
      val p = sh.groupBy(col("s"))
        .agg(collect_list(col("dn")).as("ids"))
        .filter(size(col("ids")) > 1 && size(col("ids")) <= TextOps.MaxBucket)
        .select(explode(TextOps.pairCombinations(col("ids"))).as("p0"))
        .select(least(col("p0.a"), col("p0.b")).as("pa"),
          greatest(col("p0.a"), col("p0.b")).as("pb"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("i"))
      finish(p).count()
    }
    val df2 = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= TextOps.MaxBucket)
      .select(col("s"))
    def dfPrefilterPlan(): DataFrame = {
      val p = sh.join(broadcast(df2), Seq("s"))
        .groupBy(col("s"))
        .agg(collect_list(col("dn")).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(TextOps.pairCombinations(col("ids"))).as("p0"))
        .select(least(col("p0.a"), col("p0.b")).as("pa"),
          greatest(col("p0.a"), col("p0.b")).as("pb"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("i"))
      finish(p)
    }
    t("jacc_df_prefilter_list") { dfPrefilterPlan().count() }
    t("jacc_df_selfjoin") {
      val p0 = sh.join(broadcast(df2), Seq("s"))
      val a = p0.select(col("s"), col("dn").as("pa"))
      val b = p0.select(col("s"), col("dn").as("pb"))
      val p = a.join(b, Seq("s"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("i"))
      finish(p).count()
    }
    t("jacc_window_fused") { finish(pairCounts(sh)).count() }
    // second placement of the same plan: measures run-order effects only
    t("jacc_df_prefilter_rep2") { dfPrefilterPlan().count() }
    t("df2_size") { df2.count() }
    t("sh_size") { sh.count() }

    // ---- jaccard stage breakdown: which stage dominates? ----
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("s"))
    val filtered = sh.withColumn("df", count(lit(1)).over(w))
      .filter(col("df") >= 2 && col("df") <= TextOps.MaxBucket)
    t("stage_explode_only") { sh.count() }
    t("stage_window_filter") { filtered.count() }
    t("stage_collect_list") {
      filtered.groupBy(col("s")).agg(collect_list(col("dn")).as("ids")).count()
    }
    t("stage_pair_explode") {
      filtered.groupBy(col("s")).agg(collect_list(col("dn")).as("ids"))
        .select(explode(TextOps.pairCombinations(col("ids"))).as("p0")).count()
    }
    t("stage_pair_count_agg") {
      filtered.groupBy(col("s")).agg(collect_list(col("dn")).as("ids"))
        .select(explode(TextOps.pairCombinations(col("ids"))).as("p0"))
        .select(least(col("p0.a"), col("p0.b")).as("pa"),
          greatest(col("p0.a"), col("p0.b")).as("pb"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("i")).count()
    }
    // shuffle-partition sensitivity: the bucket exchange moves ~1.4M
    // 16-byte rows; 8 partitions may under-parallelize the window sort
    for (sp <- Seq("8", "16", "32")) {
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      t(s"jacc_window_sp$sp") { finish(pairCounts(sh)).count() }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    // AQE coalesces the ~4MB posting exchange to 1 partition => the
    // window sort runs single-threaded. An explicit repartition(N, s)
    // is not coalescible: does restored parallelism beat the extra
    // scheduling?
    for (np <- Seq(8, 32)) {
      t(s"jacc_repart$np") { finish(pairCounts(sh.repartition(np, col("s")))).count() }
    }
    // and the full query as shipped (orderBy included), for the bench gap
    t("jacc_shipped_full") {
      queries.ExtensionQueries.queries("dedup_ngram_jaccard")(spark, sfDir).count()
    }

    spark.stop()
  }
}
