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
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf: must be set before the first session exists.
      // Default = Spark's default (100); the codegen probe A/Bs it.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // partial corpora (ScaleCorpus table-group builds) may lack a table
    val docs = Tables.documents(spark, sfDir).cache()
    docs.count()
    try Tables.embeddings(spark, sfDir).cache().count()
    catch { case _: Throwable => () }

    def t(name: String)(body: => Long): Unit = {
      val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "7").toInt
      val rs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = body; (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"PROBE $name%-28s min=${rs.map(_._1).min}%7.3f s rows=${rs.head._2}")
    }

    // ---- generic named-query probe: SPARK_GRAFT_PROBE_Q=q1,q2 times
    // the named serving paths (min-of-REPS) against SPARK_GRAFT_SF_DIR
    // and exits — the single-row SCALE.md pairing tool ----
    sys.env.get("SPARK_GRAFT_PROBE_Q").foreach { qs =>
      qs.split(",").filter(_.nonEmpty).foreach { qn =>
        t(s"q_$qn") { SparkEntry.queries(qn)(spark, sfDir).count() }
      }
      // optional build/plan/exec split for the same run (r21): the
      // standalone SPLIT path below is unreachable under PROBE_Q's
      // early exit, and pairing both in ONE JVM keeps denominators
      // same-session (the repo's measurement rule)
      sys.env.getOrElse("SPARK_GRAFT_SPLIT", "").split(",")
        .filter(_.nonEmpty).foreach { qn =>
          (1 to 3).foreach { _ =>
            val t0 = System.nanoTime()
            val df = SparkEntry.queries(qn)(spark, sfDir)
            val tBuild = (System.nanoTime() - t0) / 1e9
            val t1 = System.nanoTime()
            df.queryExecution.executedPlan
            val tPlan = (System.nanoTime() - t1) / 1e9
            val t2 = System.nanoTime()
            df.count()
            val tExec = (System.nanoTime() - t2) / 1e9
            println(f"PROBE split_$qn build=$tBuild%.2fs plan=$tPlan%.2fs exec=$tExec%.2fs")
          }
        }
      spark.stop(); return
    }

    // ---- round-21 probe: dedup_substring stage ladder — where does
    // the exec second go? (ingest scan, anchor explode+hash, bucket
    // agg, in-row pairs, diag window, full) ----
    if (sys.env.contains("SPARK_GRAFT_PROBE_R21S")) {
      import graft.queries.ExtensionQueries
      val ing = ExtensionQueries.substringIngestProbe(spark, sfDir)
      t("sub_ingest_noop") {
        ing.write.format("noop").mode("overwrite").save(); 0L }
      val g = ing.filter(size(split(col("text"), " ")) >= 8)
        .select(col("doc_id"),
          posexplode(graft.operators.TextOps.shinglesOfText(col("text"), 8))
            .as(Seq("pos", "gram")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          xxhash64(col("gram")).as("h"))
      t("sub_anchors_noop") {
        g.write.format("noop").mode("overwrite").save(); 0L }
      val b = g.groupBy(col("h"))
        .agg(collect_list(col("doc_id") * lit(1048576L) + col("pos")).as("ms"))
        .filter(size(col("ms")) <= 512)
      t("sub_buckets_noop") {
        b.write.format("noop").mode("overwrite").save(); 0L }
      val p = b.select(explode(expr(
          "flatten(transform(ms, x -> transform(" +
            "filter(ms, y -> y div 1048576 != x div 1048576), " +
            "y -> struct(x div 1048576 as a, y div 1048576 as b, " +
            "x % 1048576 as pa, x % 1048576 - y % 1048576 as diag))))")).as("pr"))
      t("sub_pairs_noop") {
        p.write.format("noop").mode("overwrite").save(); 0L }
      t("sub_full") { SparkEntry.queries("dedup_substring")(spark, sfDir).count() }
      spark.stop(); return
    }

    // ---- round-21 probe: FIRST-CALL vs memo-hit cost for every
    // memoized-artifact query (r20 verdict item 7 — the quoted A/Bs
    // were memo-hit numbers; this prints the cold-JVM first invocation
    // beside the warm min in one run). The JVM itself is warmed on two
    // non-memoized queries first so `first=` isolates the ARTIFACT
    // build (store write / driver constant), not Spark cold start. ----
    if (sys.env.contains("SPARK_GRAFT_PROBE_R21M")) {
      Seq("q2_join_agg", "q9_datetime").foreach { qn =>
        try SparkEntry.queries(qn)(spark, sfDir).count()
        catch { case _: Throwable => () }
      }
      Seq("sim_recall_report", "q29b_equidepth_global", "crawl_pagerank",
          "crawl_ppr", "dedup_image_phash", "dedup_audio_shingle",
          "search_bm25_topk", "dedup_embedding", "crawl_link_graph").foreach { qn =>
        val t0 = System.nanoTime()
        SparkEntry.queries(qn)(spark, sfDir).count()
        val first = (System.nanoTime() - t0) / 1e9
        var mn = Double.MaxValue
        (1 to 6).foreach { _ =>
          val t1 = System.nanoTime()
          SparkEntry.queries(qn)(spark, sfDir).count()
          mn = math.min(mn, (System.nanoTime() - t1) / 1e9)
        }
        println(f"PROBE memo_$qn%-28s first=$first%.3f s warm_min=$mn%.3f s")
      }
      spark.stop(); return
    }

    // ---- round-21 probe: job-floor lower bounds for the smallest-
    // denominator analytics rows (r20 verdict item 9). Each floor is
    // the cheapest formulation of the query's ESSENTIAL distributed
    // step over the same scan; full ~= floor pins the row as
    // scheduling-floor class, not a plan defect. ----
    if (sys.env.contains("SPARK_GRAFT_PROBE_R21F")) {
      val ev = Tables.events(spark, sfDir)
      val ord = Tables.orders(spark, sfDir)
      t("q24_full") { SparkEntry.queries("q24_retention")(spark, sfDir).count() }
      t("q24_floor_window_agg") {
        // one user window + one two-key aggregate — the retention
        // essentials with no cohort arithmetic
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
        ev.select(col("user_id"), to_date(col("ts")).as("d"))
          .withColumn("c", min(col("d")).over(w))
          .groupBy(col("c")).agg(count_distinct(col("user_id"))).count()
      }
      t("q46_full") { SparkEntry.queries("q46_equiwidth_hist")(spark, sfDir).count() }
      t("q46_floor_two_pass") {
        // the two-pass histogram essentials: one min/max aggregate +
        // one 10-row rollup over the same scan
        val o = ord.select(round(col("o_totalprice") * 100).cast("long").as("c"))
        val mm = o.agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
        o.crossJoin(broadcast(mm))
          .groupBy((col("c") % 10).as("b")).agg(count(lit(1))).count()
      }
      t("q6_full") { SparkEntry.queries("q6_setops")(spark, sfDir).count() }
      t("q6_floor_distinct") {
        // the setops essentials: one distinct over the filtered scan
        ev.filter(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_type")).distinct().count()
      }
      t("reciprocity_full") { SparkEntry.queries("crawl_reciprocity")(spark, sfDir).count() }
      spark.stop(); return
    }

    // ---- round-20 probes: HNSW append lifecycle rows (r19 verdict
    // items 1 + 5). Builds a base index over 4/5 of SPARK_GRAFT_SF_DIR's
    // vectors, streams the held-out 1/5 in as single-file micro-batches
    // (maxFilesPerTrigger=1), and prints: build wall, append wall per
    // batch (the celled-candidate cost — run at 1x and 10x dirs to pin
    // "bounded by cell size, not corpus size"), probe latency at delta
    // layer counts {0, B1, B1+B2}, and probe latency after compactIndex
    // (plus a reachability check on an appended qid at each stage).
    // B1/B2 via SPARK_GRAFT_PROBE_R20H_BATCHES (default "10,40").
    if (sys.env.contains("SPARK_GRAFT_PROBE_R20H")) {
      import spark.implicits._
      import graft.operators.{Hnsw, VectorOps}
      val emb = Tables.embeddings(spark, sfDir)
      val n = Tables.parquetRowCount(spark, s"$sfDir/embeddings.parquet")
      val cut = n * 4 / 5
      val Array(b1, b2) = sys.env.getOrElse("SPARK_GRAFT_PROBE_R20H_BATCHES", "10,40")
        .split(",").map(_.toInt)
      val dir = java.nio.file.Files.createTempDirectory("r20h-idx").toString
      val tb0 = System.nanoTime()
      Hnsw.buildIndex(spark, emb.filter(col("vec_id") < cut), dir, nHint = cut)
      println(f"PROBE r20h_build                 min=${(System.nanoTime() - tb0) / 1e9}%7.3f s rows=$cut")
      def qvec(id: Long): Array[Double] = emb.filter(col("vec_id") === id)
        .select(VectorOps.toDouble(col("embedding"))).as[Array[Double]].head()
      val qvBase = qvec(42L)
      val qidNew = cut + 50
      val qvNew = qvec(qidNew)
      t("r20h_probe_delta0") { Hnsw.probe(spark, dir, qvBase, 10).count() }
      // append the held-out tail as ONE FILE PER MICRO-BATCH: the per-
      // batch wall is the append cost the celled candidate read bounds
      def appendBatches(ids: org.apache.spark.sql.Column, nb: Int, tag: String): Unit = {
        val stage = java.nio.file.Files.createTempDirectory(s"r20h-$tag").toString
        emb.filter(ids).repartition(nb).write.parquet(s"$stage/in")
        val ta0 = System.nanoTime()
        val ok = Hnsw.appendToIndex(spark,
          spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$stage/in"),
          dir, s"$stage/ckpt").awaitTermination(1800000)
        val wall = (System.nanoTime() - ta0) / 1e9
        require(ok, s"r20h append $tag timed out")
        println(f"PROBE r20h_append_$tag%-15s min=$wall%7.3f s rows=$nb" +
          f" per_batch=${wall / nb}%.3f")
      }
      val mid = cut + (n - cut) / 2
      appendBatches(col("vec_id") >= cut && col("vec_id") < mid, b1, "b1")
      // On a replica corpus, qidNew's vector has MANY exact copies with
      // lower ids (the base corpus holds ~8 per 10 replicas), and the
      // top-k tiebreak (-cos, id) ranks those first — asserting the
      // appended id itself at rank 1 is impossible by construction.
      // The navigability claim is top-1 cosine == 1.0: the probe found
      // the query's duplicate family across the grown graph.
      def reach(stage: String): Unit = {
        val head = Hnsw.probe(spark, dir, qvNew, 10)
          .as[(Long, Double)].head()
        require(head._2 == 1.0, s"$stage: probe missed the cos-1.0 family: $head")
      }
      reach("after b1")
      t("r20h_probe_delta_b1") { Hnsw.probe(spark, dir, qvNew, 10).count() }
      appendBatches(col("vec_id") >= mid, b2, "b2")
      reach("after b2")
      t("r20h_probe_delta_b1b2") { Hnsw.probe(spark, dir, qvNew, 10).count() }
      val tc0 = System.nanoTime()
      require(Hnsw.compactIndex(spark, dir), "no delta to compact?")
      println(f"PROBE r20h_compact               min=${(System.nanoTime() - tc0) / 1e9}%7.3f s rows=$n")
      reach("after compact")
      t("r20h_probe_compacted") { Hnsw.probe(spark, dir, qvNew, 10).count() }
      spark.stop(); return
    }

    // ---- round-20 probe: whole-suite codegen-cache churn. Bench's
    // warmup pass exists so the timed reps "hit the whole-stage-codegen
    // class cache" (Bench.scala) — but CodeGenerator.cache is a STATIC
    // 100-entry Guava cache (spark.sql.codegen.cache.maxEntries) and
    // the suite cycles 236 queries x several codegen units through it,
    // so by the time a query's second rep runs, its classes were
    // evicted ~everything-else ago and Janino recompiles the whole
    // query. This probe runs the full oracled set for N passes and
    // prints per-pass wall + the Janino compile count/time delta
    // (CodegenMetrics), under SPARK_GRAFT_CODEGEN_CACHE entries —
    // A/B 100 (Spark default) vs a suite-sized value.
    if (sys.env.contains("SPARK_GRAFT_PROBE_CODEGEN")) {
      import org.apache.spark.metrics.source.CodegenMetrics
      val names = SparkEntry.oracleSql.keys.toSeq.sorted
      Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings").foreach { t =>
        try Tables.load(spark, sfDir, t).cache().count()
        catch { case _: Throwable => () }
      }
      for (pass <- 1 to sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "3").toInt) {
        val h = CodegenMetrics.METRIC_COMPILATION_TIME
        val c0 = h.getCount
        // mean*count over an exponentially-decaying reservoir is NOT
        // cumulative compile time (r20 ADVICE item 3) — the compile
        // COUNT delta is exact; the ms figure is a rough reservoir
        // estimate and is labeled as such.
        val m0 = h.getSnapshot.getMean * c0
        val t0 = System.nanoTime()
        names.foreach { n =>
          try SparkEntry.queries(n)(spark, sfDir).count()
          catch { case e: Throwable => System.err.println(s"[codegen-probe] $n: $e") }
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val c1 = h.getCount
        val m1 = h.getSnapshot.getMean * c1
        println(f"CODEGEN pass=$pass wall=$wall%.1f s compiles=${c1 - c0} approxCompileMsDelta=${m1 - m0}%.0f (reservoir estimate, not cumulative) cacheEntries=${spark.conf.get("spark.sql.codegen.cache.maxEntries", "default")}")
      }
      spark.stop(); return
    }

    // ---- round-20 probe: bm25 pivot lower bound (r19 verdict item 4).
    // The shipped lexPivotFrame already IS a conditional-aggregation
    // pivot with map-side partial agg; what's left to prove is that its
    // exchange is at the floor. bm25_pivot_minimal runs the cheapest
    // possible pivot over the SAME matched posting rows (one column, no
    // per-term conditionals) — if minimal ~= full, the pivot cost is
    // its exchange, not the conditional aggregates, and the remaining
    // DuckDB gap is the constant per-exchange floor, not a plan defect.
    if (sys.env.contains("SPARK_GRAFT_PROBE_R20B")) {
      import graft.queries.ExtensionQueries
      val terms = ExtensionQueries.Bm25Terms
      t("bm25_full") { SparkEntry.queries("search_bm25_topk")(spark, sfDir).count() }
      t("bm25_store_probe") { ExtensionQueries.postingProbeFloor(spark, sfDir) }
      t("bm25_pivot_minimal") {
        ExtensionQueries.postingFrame(spark, sfDir)
          .filter(col("term").isin(terms: _*))
          .groupBy(col("doc_id")).agg(max(col("dl")).as("dl")).count()
      }
      t("bm25_pivot_full") {
        ExtensionQueries.lexPivotFrame(
          ExtensionQueries.postingFrame(spark, sfDir)
            .filter(col("term").isin(terms: _*))).count()
      }
      spark.stop(); return
    }

    // ---- round-18 probes: rank-store promotion A/B (verdict item 1)
    // — sample_rank_weighted/crawl_pagerank serving (store scan) vs
    // the r17 per-call fixed-point shapes replayed verbatim ----
    if (sys.env.contains("SPARK_GRAFT_PROBE_R18")) {
      def r17Pagerank(): DataFrame = {
        val nodes = Tables.documents(spark, sfDir).select(col("doc_id").as("i"))
        val nFrame = nodes.agg(count(lit(1)).as("nn"))
        def targets = array(
          (col("i") * 31 + 7) % col("nn"),
          (col("i") * 17 + 3) % col("nn"),
          (col("i") * 13 + 11) % col("nn"))
        var ranks = nodes.select(col("i"), lit(1000000L).as("r"))
        for (_ <- 1 to 5) {
          val contribs = ranks.crossJoin(broadcast(nFrame))
            .select(explode(targets).as("i"), expr("r div 3").as("c"))
          ranks = contribs.union(nodes.select(col("i"), lit(0L).as("c")))
            .groupBy(col("i")).agg(sum(col("c")).as("sc"))
            .select(col("i"), expr("CAST(150000 + (85 * sc) div 100 AS BIGINT)").as("r"))
        }
        ranks.select(col("i").as("doc_id"), col("r").as("rank_ppm"))
          .orderBy(col("doc_id"))
      }
      // warm the store once so the serve probes measure steady state
      SparkEntry.queries("crawl_pagerank")(spark, sfDir).count()
      t("r18_pagerank_store_serve") {
        SparkEntry.queries("crawl_pagerank")(spark, sfDir).count() }
      t("r18_pagerank_r17_inline") { r17Pagerank().count() }
      t("r18_rankweighted_store") {
        SparkEntry.queries("sample_rank_weighted")(spark, sfDir).count() }
      t("r18_rankweighted_r17") {
        val coin = pmod(graft.operators.TextOps.portableHash32(concat(lit("rw|"),
          col("doc_id").cast("string"))), lit(1000000L))
        r17Pagerank()
          .withColumn("coin", coin)
          .filter(col("coin") < expr("rank_ppm div 4"))
          .select(col("doc_id"), col("rank_ppm"), col("coin"))
          .orderBy(col("doc_id")).count()
      }
      spark.stop(); return
    }

    // ---- round-18 scale probes (verdict items 4 + 5): the iterative
    // graph family's STORE-BUILD side + the heavy-family set, timed at
    // whatever SPARK_GRAFT_SF_DIR points at (1x / 10x / 100x) with
    // SPARK_GRAFT_PROBE_REPS controlling min-of-N ----
    if (sys.env.contains("SPARK_GRAFT_PROBE_R18G")) {
      import graft.queries.ExtensionQueries
      // graph family: builds bypass the store memo so every rep pays
      // the real fixed point / closure
      t("g_pagerank_build") { ExtensionQueries.pagerankBuildFrame(spark, sfDir).count() }
      t("g_ppr_build") { ExtensionQueries.pprBuildFrame(spark, sfDir).count() }
      t("g_pagerank_edges_build") { ExtensionQueries.pagerankEdgesBuildFrame(spark, sfDir).count() }
      t("g_triangles") { SparkEntry.queries("crawl_triangles")(spark, sfDir).count() }
      t("g_communities") { SparkEntry.queries("crawl_communities")(spark, sfDir).count() }
      t("g_hits") { SparkEntry.queries("crawl_hits")(spark, sfDir).count() }
      // sim_source_centroids rewrite A/B: one 64-sum aggregate after a
      // row-level join (shipped) vs the r17 exploded-component join
      t("sc_new_one_agg") {
        SparkEntry.queries("sim_source_centroids")(spark, sfDir).count() }
      t("sc_r17_explode") {
        val src = Tables.documents(spark, sfDir)
          .select(col("doc_id").as("vec_id"), col("source"))
        val comp = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
          .select(col("vec_id"), col("i"),
            round(col("x").cast("double") * 1000000.0).cast("long").as("xi"))
        val cent = comp.join(src, Seq("vec_id"))
          .groupBy(col("source"), col("i"))
          .agg(floor(sum(col("xi")).cast("double") / count(lit(1)))
            .cast("long").as("ci"), count(lit(1)).as("cn"))
        val ca = cent.groupBy(col("source"))
          .agg(expr("transform(sort_array(collect_list(struct(i, ci))), " +
            "p -> cast(p.ci as double))").as("cv"), max(col("cn")).as("n_vecs"))
        val a = ca.select(col("source").as("source_a"), col("cv").as("va"),
          col("n_vecs").as("n_a"))
        val b = ca.select(col("source").as("source_b"), col("cv").as("vb"),
          col("n_vecs").as("n_b"))
        a.join(b, col("source_a") < col("source_b"))
          .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
            round(graft.operators.VectorOps.dot(col("va"), col("vb")) /
              sqrt(graft.operators.VectorOps.norm2(col("va")) *
                graft.operators.VectorOps.norm2(col("vb"))), 6)
              .as("centroid_cos"))
          .count()
      }
      if (!sys.env.contains("SPARK_GRAFT_PROBE_R18G_ONLY")) {
        // heavy-family set (the SCALE.md 100x decade): serving paths,
        // min-of-N warm — store builds amortize into the first rep
        val heavy = Seq("dedup_substring", "dedup_minhash_verified",
          "dedup_ngram_jaccard", "corpus_keyphrases", "cluster_silhouette",
          "search_bm25_topk", "corpus_burstiness", "q36_mad_robust",
          "dq_drift", "sim_recall_report", "dedup_cdc_chunks")
        heavy.foreach { q =>
          t(s"h_$q") { SparkEntry.queries(q)(spark, sfDir).count() }
        }
      }
      spark.stop(); return
    }

    // ---- round-16 probes: cdc native-vs-HOF A/B + crawl_pipeline
    // regression isolation (run first; SPARK_GRAFT_PROBE_R16_ONLY=1
    // exits after them) ----
    t("cdc_native_full") { SparkEntry.queries("dedup_cdc_chunks")(spark, sfDir).count() }
    t("cdc_hof_full") {
      // the chain the native expression replaced, verbatim
      val ws = graft.operators.TextOps.tokens(col("text"))
      val chunks = Tables.documents(spark, sfDir)
        .select(col("doc_id"), ws.as("ws"))
        .withColumn("n", size(col("ws")))
        .withColumn("bs", expr(
          """filter(transform(
             |  CASE WHEN n >= 8 THEN sequence(1, n - 7) ELSE array() END,
             |  i -> CASE WHEN i + 7 < n AND
             |    substring(md5(concat_ws(' ', slice(ws, i, 8))), 1, 1) = '0'
             |    THEN i + 7 END),
             |  x -> x IS NOT NULL)""".stripMargin))
        .withColumn("bb", expr("concat(array(0), bs, array(n))"))
        .withColumn("chunk", explode(expr(
          """transform(sequence(1, size(bb) - 1), k ->
             |  concat_ws(' ', slice(ws, element_at(bb, k) + 1,
             |    element_at(bb, k + 1) - element_at(bb, k))))""".stripMargin)))
        .select(col("doc_id"), md5(col("chunk")).as("ch"))
      val dupes = chunks.groupBy(col("ch"))
        .agg(count_distinct(col("doc_id")).as("nd"))
      chunks.join(dupes, Seq("ch"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum((col("nd") >= 2).cast("long")).as("n_dup_chunks"))
        .count()
    }
    t("crawl_pipeline_full") { SparkEntry.queries("crawl_pipeline")(spark, sfDir).count() }
    if (sys.env.contains("SPARK_GRAFT_PROBE_R16_ONLY")) { spark.stop(); return }

    // ---- round-17 probes: corpus_burstiness 382 -> 1733 ms isolation
    // (the r16 verdict's one weak mark). Pairs the query with the
    // posting-store serving floor and a layout A/B: if the full query
    // tracks the bare store scan, the LAYOUT (term-clustered range
    // partition, r15) is the suspect; if the unclustered twin is as
    // slow, the aggregate is; if all are fast, r16 was box noise.
    if (sys.env.contains("SPARK_GRAFT_PROBE_R17")) {
      import graft.queries.ExtensionQueries
      t("r17_posting_floor") { ExtensionQueries.postingProbeFloor(spark, sfDir) }
      t("r17_store_scan") { ExtensionQueries.postingStoreScan(spark, sfDir) }
      t("r17_burstiness_full") { SparkEntry.queries("corpus_burstiness")(spark, sfDir).count() }
      t("r17_burstiness_unclustered") {
        ExtensionQueries.burstinessOver(
          ExtensionQueries.postingFrameUnclustered(spark, sfDir)).count()
      }
      t("r17_bm25_indexed") { SparkEntry.queries("search_bm25_indexed")(spark, sfDir).count() }
      t("r17_rm3_expand") { SparkEntry.queries("search_rm3_expand")(spark, sfDir).count() }
      t("r17_hybrid_rrf") { SparkEntry.queries("search_hybrid_rrf")(spark, sfDir).count() }
      // href-only anchor-walk A/B (r16 advice): the decoded HTML is
      // checkpointed once so both arms time EXTRACTION only —
      // extract_links (collectText=false: no per-anchor StringBuilder
      // / entity decode / ws collapse) vs extract_anchors + project
      // href (what outlinkEdges paid pre-r17).
      import spark.implicits._
      val linkedHtml = Tables.documents(spark, sfDir)
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val rec = graft.operators.Warc.decodeWarc(
              graft.operators.Warc.syntheticLinkedWarcContainer(id)).head
            val http = graft.operators.Warc.parseHttpResponse(rec.body).get
            (id, new String(http.entity, java.nio.charset.StandardCharsets.UTF_8))
          }
        }.toDF("doc_id", "html").localCheckpoint()
      t("r17_links_hrefonly") {
        linkedHtml.select(posexplode(
          graft.functions.TextExpressions.extract_links(col("html")))).count()
      }
      t("r17_links_via_anchor") {
        linkedHtml.select(posexplode(
          graft.functions.TextExpressions.extract_anchors(col("html")))
          .as(Seq("link_idx", "la")))
          .select(col("la.href")).count()
      }
      spark.stop(); return
    }

    // ---- round-19 probes (verdict items 2+3): the fold-only
    // q36/dq_drift rewrites vs the r18 shapes replayed verbatim, plus
    // the two "watch" single-aggregate rows (bm25/burstiness) at the
    // same SF for the exponent table ----
    if (sys.env.contains("SPARK_GRAFT_PROBE_R19")) {
      import org.apache.spark.sql.expressions.Window
      def asInt(c: org.apache.spark.sql.Column, scale: Long) =
        round(c * scale).cast("long")
      def jobs(name: String)(body: => Long): Unit = {
        val n = new java.util.concurrent.atomic.AtomicInteger(0)
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            n.incrementAndGet()
        }
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime(); body
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graft.bridge.drainListenerBus(spark.sparkContext, 10000)
        spark.sparkContext.removeSparkListener(l)
        println(f"PROBE jobs_$name%-22s n_jobs=${n.get}%3d wall=$wall%.2fs")
      }
      def q36R18(): Long = {
        val counts = Tables.events(spark, sfDir)
          .select(col("event_type"), asInt(col("value"), 100L).as("vc"))
          .groupBy(col("event_type"), col("vc")).agg(count(lit(1)).as("c"))
        val tot = counts.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
        def leastAtHalf(dist: DataFrame, valueCol: String, out: String): DataFrame =
          dist.withColumn("cum", sum(col("c")).over(
              Window.partitionBy(col("event_type")).orderBy(col(valueCol))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .join(broadcast(tot), Seq("event_type"))
            .filter(col("cum") >= expr("(n + 1) div 2"))
            .groupBy(col("event_type")).agg(min(col(valueCol)).as(out))
        val med = leastAtHalf(counts, "vc", "med_vc")
        val devDist = counts.join(broadcast(med), Seq("event_type"))
          .groupBy(col("event_type"), abs(col("vc") - col("med_vc")).as("dv"))
          .agg(sum(col("c")).as("c"))
        val mad = leastAtHalf(devDist, "dv", "mad_vc")
        tot.join(broadcast(med), Seq("event_type"))
          .join(broadcast(mad), Seq("event_type"))
          .select(col("event_type"), col("n"),
            (col("med_vc") / 100.0).as("median_value"),
            (col("mad_vc") / 100.0).as("mad_value"))
          .orderBy(col("event_type")).count()
      }
      def driftR18(): Long = {
        val joined = Tables.events(spark, sfDir)
          .select(col("event_type"),
            when(dayofmonth(col("ts")) <= 15, lit(1L)).otherwise(lit(0L))
              .as("isref"),
            expr("CAST(round(value * 100) AS BIGINT) div 2500").as("bin"))
          .groupBy(col("event_type"), col("bin"))
          .agg(sum(col("isref")).as("cr"),
            sum(lit(1L) - col("isref")).as("cc"))
          .localCheckpoint()
        val tot = joined.groupBy(col("event_type"))
          .agg(sum(col("cr")).as("nr"), sum(col("cc")).as("nc"),
            count(lit(1)).as("b"))
        joined.join(broadcast(tot), Seq("event_type"))
          .withColumn("p", (col("cr") + 1) / (col("nr") + col("b")))
          .withColumn("q", (col("cc") + 1) / (col("nc") + col("b")))
          .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
          .groupBy(col("event_type"))
          .agg(min(col("nr")).as("n_ref"), min(col("nc")).as("n_cur"),
            min(col("b")).as("n_bins"),
            sort_array(collect_list(struct(col("bin"), col("term")))).as("ts0"))
          .withColumn("psi", round(expr(
            "aggregate(ts0, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"), 6))
          .orderBy(col("event_type")).count()
      }
      jobs("q36_fold") { SparkEntry.queries("q36_mad_robust")(spark, sfDir).count() }
      jobs("q36_r18") { q36R18() }
      t("q36_fold") { SparkEntry.queries("q36_mad_robust")(spark, sfDir).count() }
      t("q36_r18") { q36R18() }
      jobs("drift_fold") { SparkEntry.queries("dq_drift")(spark, sfDir).count() }
      jobs("drift_r18") { driftR18() }
      t("drift_fold") { SparkEntry.queries("dq_drift")(spark, sfDir).count() }
      t("drift_r18") { driftR18() }
      t("bm25_topk") { SparkEntry.queries("search_bm25_topk")(spark, sfDir).count() }
      t("burstiness") { SparkEntry.queries("corpus_burstiness")(spark, sfDir).count() }
      // bm25 stage split: store probe alone vs the indexed twin vs the
      // full query — locates the 100x cost (scan? pivot? floor?)
      t("bm25_store_probe") {
        graft.queries.ExtensionQueries.postingProbeFloor(spark, sfDir) }
      t("bm25_indexed") { SparkEntry.queries("search_bm25_indexed")(spark, sfDir).count() }
      jobs("bm25_topk") { SparkEntry.queries("search_bm25_topk")(spark, sfDir).count() }
      jobs("bm25_indexed") { SparkEntry.queries("search_bm25_indexed")(spark, sfDir).count() }
      // hnsw SCALE row (r18 verdict: "needs its own SCALE row"): the
      // layered build (once per corpus version) and the bounded-read
      // probe, timed separately at this corpus size
      locally {
        import graft.operators.{Hnsw, VectorOps}
        import spark.implicits._
        val emb = Tables.embeddings(spark, sfDir)
        val n = emb.count()
        val hdir = java.nio.file.Files.createTempDirectory("hnswscale").toString
        val tb0 = System.nanoTime()
        Hnsw.buildIndex(spark, emb, hdir, nHint = n)
        println(f"PROBE hnsw_build                   min=${(System.nanoTime() - tb0) / 1e9}%7.3f s rows=$n")
        val qv = emb.filter(col("vec_id") === 42)
          .select(VectorOps.toDouble(col("embedding"))).as[Array[Double]].head()
        t("hnsw_probe") { Hnsw.probe(spark, hdir, qv, topK = 11).count() }
        jobs("hnsw_probe") { Hnsw.probe(spark, hdir, qv, topK = 11).count() }
      }
      spark.stop(); return
    }

    // ---- round-19 HNSW recall sweep (verdict item 5): measured
    // overlap of the probe top-10 vs brute top-10/top-20 across query
    // ids and (ef, efRounds) settings — picks the new defaults + the
    // honest SimilaritySpec pin ----
    if (sys.env.contains("SPARK_GRAFT_PROBE_R19H")) {
      import graft.operators.{Hnsw, VectorOps}
      import spark.implicits._
      val emb = Tables.embeddings(spark, sfDir)
      val n = emb.count()
      val dir = java.nio.file.Files.createTempDirectory("hnswsweep").toString
      Hnsw.buildIndex(spark, emb, dir, nHint = n)
      val qids = Seq(42L, 7L, 123L, 299L, 400L)
      for (qid <- qids; (ef, rounds) <- Seq((16, 3), (32, 3), (32, 4), (48, 4))) {
        val qv = emb.filter(col("vec_id") === qid)
          .select(VectorOps.toDouble(col("embedding"))).as[Array[Double]].head()
        val got = Hnsw.probe(spark, dir, qv, topK = 11, ef = ef,
          efRounds = rounds).as[(Long, Double)].collect()
          .filter(_._1 != qid).take(10).map(_._1)
        val brute = emb.filter(col("vec_id") =!= qid)
          .crossJoin(broadcast(emb.filter(col("vec_id") === qid)
            .select(col("embedding").as("qv"))))
          .select(col("vec_id"),
            round(VectorOps.cosine(col("qv"), col("embedding")), 6).as("cs"))
          .orderBy(col("cs").desc, col("vec_id")).limit(20)
          .as[(Long, Double)].collect().map(_._1)
        val in10 = got.count(brute.take(10).toSet)
        val in20 = got.count(brute.toSet)
        println(s"HNSW qid=$qid ef=$ef rounds=$rounds overlap10=$in10 overlap20=$in20")
      }
      spark.stop(); return
    }

    // ---- round-17b probes: bench-tail rewrites A/B ----
    // q36_mad_robust / dq_drift: production (one events scan + bounded
    // count-table folds) vs the r16 shapes replayed verbatim; plus a
    // q2_join_agg decomposition (pre-agg lineitem by orderkey before
    // the orders join vs the shipped direct join).
    if (sys.env.contains("SPARK_GRAFT_PROBE_R17B")) {
      def asInt(c: org.apache.spark.sql.Column, scale: Long) =
        round(c * scale).cast("long")
      // per-shape job census: on sub-second queries the scheduling
      // floor IS the cost model — count jobs, not rows
      def jobs(name: String)(body: => Long): Unit = {
        val n = new java.util.concurrent.atomic.AtomicInteger(0)
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            n.incrementAndGet()
        }
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime(); body
        val wall = (System.nanoTime() - t0) / 1e9
        // drain the ASYNC listener bus before reading the counter —
        // trailing onJobStart events would otherwise be missed and the
        // census would undercount (r17 advice)
        org.apache.spark.sql.graft.bridge.drainListenerBus(spark.sparkContext, 10000)
        spark.sparkContext.removeSparkListener(l)
        println(f"PROBE jobs_$name%-22s n_jobs=${n.get}%3d wall=$wall%.2fs")
      }
      jobs("q36_production") { SparkEntry.queries("q36_mad_robust")(spark, sfDir).count() }
      t("q36_production") { SparkEntry.queries("q36_mad_robust")(spark, sfDir).count() }
      t("q36_r16_two_pass") {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(spark, sfDir)
          .select(col("event_type"), asInt(col("value"), 100L).as("vc"))
        val tot = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        def leastAtHalf(df: DataFrame, valueCol: String, out: String): DataFrame =
          df.groupBy(col("event_type"), col(valueCol)).agg(count(lit(1)).as("c"))
            .withColumn("cum", sum(col("c")).over(
              Window.partitionBy(col("event_type")).orderBy(col(valueCol))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .join(broadcast(tot), Seq("event_type"))
            .filter(col("cum") >= expr("(n + 1) div 2"))
            .groupBy(col("event_type")).agg(min(col(valueCol)).as(out))
        val med = leastAtHalf(ev, "vc", "med_vc")
        val dev = ev.join(broadcast(med), Seq("event_type"))
          .select(col("event_type"), abs(col("vc") - col("med_vc")).as("dv"))
        val mad = leastAtHalf(dev, "dv", "mad_vc")
        tot.join(broadcast(med), Seq("event_type"))
          .join(broadcast(mad), Seq("event_type"))
          .select(col("event_type"), col("n"),
            (col("med_vc") / 100.0).as("median_value"),
            (col("mad_vc") / 100.0).as("mad_value"))
          .orderBy(col("event_type")).count()
      }
      t("q36_new_nockpt") {
        import org.apache.spark.sql.expressions.Window
        val counts = Tables.events(spark, sfDir)
          .select(col("event_type"), asInt(col("value"), 100L).as("vc"))
          .groupBy(col("event_type"), col("vc")).agg(count(lit(1)).as("c"))
        val tot = counts.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
        def leastAtHalf(dist: DataFrame, valueCol: String, out: String): DataFrame =
          dist.withColumn("cum", sum(col("c")).over(
              Window.partitionBy(col("event_type")).orderBy(col(valueCol))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .join(broadcast(tot), Seq("event_type"))
            .filter(col("cum") >= expr("(n + 1) div 2"))
            .groupBy(col("event_type")).agg(min(col(valueCol)).as(out))
        val med = leastAtHalf(counts, "vc", "med_vc")
        val devDist = counts.join(broadcast(med), Seq("event_type"))
          .groupBy(col("event_type"), abs(col("vc") - col("med_vc")).as("dv"))
          .agg(sum(col("c")).as("c"))
        val mad = leastAtHalf(devDist, "dv", "mad_vc")
        tot.join(broadcast(med), Seq("event_type"))
          .join(broadcast(mad), Seq("event_type"))
          .select(col("event_type"), col("n"),
            (col("med_vc") / 100.0).as("median_value"),
            (col("mad_vc") / 100.0).as("mad_value"))
          .orderBy(col("event_type")).count()
      }
      jobs("q36_r16_two_pass") {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(spark, sfDir)
          .select(col("event_type"), asInt(col("value"), 100L).as("vc"))
        val tot = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        def leastAtHalf(df: DataFrame, valueCol: String, out: String): DataFrame =
          df.groupBy(col("event_type"), col(valueCol)).agg(count(lit(1)).as("c"))
            .withColumn("cum", sum(col("c")).over(
              Window.partitionBy(col("event_type")).orderBy(col(valueCol))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .join(broadcast(tot), Seq("event_type"))
            .filter(col("cum") >= expr("(n + 1) div 2"))
            .groupBy(col("event_type")).agg(min(col(valueCol)).as(out))
        val med = leastAtHalf(ev, "vc", "med_vc")
        val dev = ev.join(broadcast(med), Seq("event_type"))
          .select(col("event_type"), abs(col("vc") - col("med_vc")).as("dv"))
        val mad = leastAtHalf(dev, "dv", "mad_vc")
        tot.join(broadcast(med), Seq("event_type"))
          .join(broadcast(mad), Seq("event_type"))
          .select(col("event_type"), col("n")).orderBy(col("event_type")).count()
      }
      t("dq_drift_production") { SparkEntry.queries("dq_drift")(spark, sfDir).count() }
      t("dq_drift_r16_fouter") {
        val ev = Tables.events(spark, sfDir)
          .withColumn("period",
            when(dayofmonth(col("ts")) <= 15, "ref").otherwise("cur"))
          .withColumn("bin", expr("CAST(round(value * 100) AS BIGINT) div 2500"))
        val c = ev.groupBy(col("event_type"), col("period"), col("bin"))
          .agg(count(lit(1)).as("c"))
        val ref = c.filter(col("period") === "ref")
          .select(col("event_type"), col("bin"), col("c").as("cr"))
        val cur = c.filter(col("period") === "cur")
          .select(col("event_type"), col("bin"), col("c").as("cc"))
        val joined = ref.join(cur, Seq("event_type", "bin"), "full_outer")
          .select(col("event_type"), col("bin"),
            coalesce(col("cr"), lit(0L)).as("cr"),
            coalesce(col("cc"), lit(0L)).as("cc"))
        val tot = joined.groupBy(col("event_type"))
          .agg(sum(col("cr")).as("nr"), sum(col("cc")).as("nc"),
            count(lit(1)).as("b"))
        joined.join(broadcast(tot), Seq("event_type"))
          .withColumn("p", (col("cr") + 1) / (col("nr") + col("b")))
          .withColumn("q", (col("cc") + 1) / (col("nc") + col("b")))
          .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
          .groupBy(col("event_type"))
          .agg(min(col("nr")).as("n_ref"), min(col("nc")).as("n_cur"),
            min(col("b")).as("n_bins"),
            sort_array(collect_list(struct(col("bin"), col("term")))).as("ts0"))
          .withColumn("psi", round(expr(
            "aggregate(ts0, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"), 6))
          .orderBy(col("event_type")).count()
      }
      t("q2_production") { SparkEntry.queries("q2_join_agg")(spark, sfDir).count() }
      t("q2_preagg_orderkey") {
        val li = Tables.lineitem(spark, sfDir)
          .groupBy(col("l_orderkey"))
          .agg(sum(asInt(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 100L))
            .as("rev_c"), count(lit(1)).as("n_items"))
        val o = Tables.orders(spark, sfDir)
        val c = Tables.customer(spark, sfDir)
        val n = Tables.nation(spark, sfDir)
        val r = Tables.region(spark, sfDir)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg((sum(col("rev_c")) / 100.0).as("revenue"),
            sum(col("n_items")).as("n_items"))
          .orderBy(col("r_name")).count()
      }
      t("q2_scan_floor") { Tables.lineitem(spark, sfDir).count() +
        Tables.orders(spark, sfDir).count() }
      t("q6_production") { SparkEntry.queries("q6_setops")(spark, sfDir).count() }
      t("q6_r16_four_scans") {
        val ev = Tables.events(spark, sfDir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id")).distinct()
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct()
        clicks.except(buys).select(lit("click_only").as("segment"), col("user_id"))
          .unionByName(clicks.intersect(buys)
            .select(lit("click_and_buy").as("segment"), col("user_id")))
          .orderBy(col("segment"), col("user_id")).count()
      }
      t("q28_production") { SparkEntry.queries("q28_snapshot_diff")(spark, sfDir).count() }
      // the REJECTED pivot shape, preserved for the SCALE.md
      // adjudication: union + groupBy(k) max(when side) — loses to the
      // shipped full-outer join at 10x because k is unique per
      // snapshot (partial aggregation combines nothing)
      t("q28_pivot_variant") {
        val now = Tables.orders(spark, sfDir)
          .select(col("o_orderkey").as("k"), asInt(col("o_totalprice"), 100L).as("v_new"))
        val old = Tables.orders(spark, sfDir)
          .filter(col("o_orderkey") % 7 =!= 0)
          .select(col("o_orderkey").as("k"),
            (asInt(col("o_totalprice"), 100L) +
              when(col("o_orderkey") % 5 === 0, lit(1000L)).otherwise(lit(0L))).as("v_old"))
          .unionByName(
            Tables.orders(spark, sfDir).filter(col("o_orderkey") % 11 === 0)
              .select((col("o_orderkey") + 10000000L).as("k"),
                asInt(col("o_totalprice"), 100L).as("v_old")))
        now.select(col("k"), col("v_new"), lit(null).cast("long").as("v_old"))
          .unionByName(old.select(col("k"), lit(null).cast("long").as("v_new"),
            col("v_old")))
          .groupBy(col("k"))
          .agg(max(col("v_new")).as("v_new"), max(col("v_old")).as("v_old"))
          .withColumn("status",
            when(col("v_old").isNull, "added")
              .when(col("v_new").isNull, "removed")
              .when(col("v_new") =!= col("v_old"), "changed")
              .otherwise("unchanged"))
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"),
            sum(coalesce(col("v_new"), lit(0L)) - coalesce(col("v_old"), lit(0L)))
              .as("delta_cents"))
          .orderBy(col("status")).count()
      }
      t("q27_production") { SparkEntry.queries("q27_sketch_rollup")(spark, sfDir).count() }
      t("doremi_weights") { SparkEntry.queries("sample_doremi_weights")(spark, sfDir).count() }
      t("quality_calibration") { SparkEntry.queries("quality_calibration")(spark, sfDir).count() }
      spark.stop(); return
    }

    // ---- round-16 probes: dedup_multimodal_rollup 10x blowup ----
    // At /tmp/scale10x the rollup is ~51 s while its three component
    // arms total ~5.4 s warm. Isolate: arms alone, join tail over
    // materialized arms, and the one-DAG composition.
    if (sys.env.contains("SPARK_GRAFT_PROBE_MM")) {
      t("mm_img_arm") { SparkEntry.queries("dedup_image_phash")(spark, sfDir).count() }
      t("mm_aud_arm") { SparkEntry.queries("dedup_audio_fingerprint")(spark, sfDir).count() }
      t("mm_vid_arm") { SparkEntry.queries("dedup_video_phash")(spark, sfDir).count() }
      val img = SparkEntry.queries("dedup_image_phash")(spark, sfDir)
        .withColumnRenamed("hamming", "image_hamming").localCheckpoint()
      val aud = SparkEntry.queries("dedup_audio_fingerprint")(spark, sfDir)
        .withColumnRenamed("hamming", "audio_hamming").localCheckpoint()
      val vid = SparkEntry.queries("dedup_video_phash")(spark, sfDir)
        .select(col("a_id"), col("b_id"), col("min_hamming").as("video_min_hamming"))
        .localCheckpoint()
      t("mm_join_ckpt_arms") {
        img.join(aud, Seq("a_id", "b_id"), "full_outer")
          .join(vid, Seq("a_id", "b_id"), "full_outer")
          .count()
      }
      t("mm_rollup_full") { SparkEntry.queries("dedup_multimodal_rollup")(spark, sfDir).count() }
      spark.stop(); return
    }

    // ---- round-12 probes: corpus_keywords job-count A/B ----
    // The round-11 rewire left corpus_keywords at ~5.7x DuckDB; the
    // residue is SERIALIZED JOBS each paying the local job floor, not
    // per-row work. Variants isolate each job-elimination step.
    import org.apache.spark.sql.DataFrame
    def kwVariant(useCkpt: Boolean, footerN: Boolean): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val terms0 = Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          explode(graft.functions.TextExpressions.term_count_structs(col("text")))
            .as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      val terms = if (useCkpt) terms0.localCheckpoint() else terms0
      val dfFrame = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored0 = terms.join(broadcast(dfFrame), Seq("term"))
      val scored =
        if (footerN) {
          val n = Tables.parquetRowCount(spark, s"$sfDir/documents.parquet")
          scored0.withColumn("tfidf",
            round(col("tf") * log(lit(n).cast("double") / col("df")), 6))
        } else {
          val stats = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n"))
          scored0.crossJoin(broadcast(stats))
            .withColumn("tfidf",
              round(col("tf") * log(col("n").cast("double") / col("df")), 6))
        }
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"), col("tfidf"))
        .orderBy(col("doc_id"), col("rk"))
    }
    def kwTerms: DataFrame = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(graft.functions.TextExpressions.term_count_structs(col("text")))
          .as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
    t("kw_piece_explode") { kwTerms.count() }
    t("kw_piece_dfagg") { kwTerms.groupBy(col("term")).agg(count(lit(1)).as("df")).count() }
    t("kw_piece_join_nowin") {
      val n = Tables.parquetRowCount(spark, s"$sfDir/documents.parquet")
      val dfFrame = kwTerms.groupBy(col("term")).agg(count(lit(1)).as("df"))
      kwTerms.join(broadcast(dfFrame), Seq("term"))
        .withColumn("tfidf", round(col("tf") * log(lit(n).cast("double") / col("df")), 6))
        .count()
    }
    def kwVariantR(useCkpt: Boolean): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val docs0 = Tables.documents(spark, sfDir)
      val para = spark.sparkContext.defaultParallelism
      val docs = if (docs0.rdd.getNumPartitions < para) docs0.repartition(para) else docs0
      val terms0 = docs
        .select(col("doc_id"),
          explode(graft.functions.TextExpressions.term_count_structs(col("text")))
            .as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      val terms = if (useCkpt) terms0.localCheckpoint() else terms0
      val n = Tables.parquetRowCount(spark, s"$sfDir/documents.parquet")
      val dfFrame = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      terms.join(broadcast(dfFrame), Seq("term"))
        .withColumn("tfidf", round(col("tf") * log(lit(n).cast("double") / col("df")), 6))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"), col("tfidf"))
        .orderBy(col("doc_id"), col("rk"))
    }
    t("kw_repart_rescan") { kwVariantR(useCkpt = false).count() }
    t("kw_repart_ckpt") { kwVariantR(useCkpt = true).count() }
    t("kw_production") { SparkEntry.queries("corpus_keywords")(spark, sfDir).count() }
    t("kw_ckpt_countjob") { kwVariant(useCkpt = true, footerN = false).count() }
    t("kw_ckpt_footer_n") { kwVariant(useCkpt = true, footerN = true).count() }
    t("kw_rescan_footer_n") { kwVariant(useCkpt = false, footerN = true).count() }
    // HOF baseline the native expression replaced (the round-11 A/B),
    // committed so the Scaladoc's complexity claim stays reproducible
    t("kw_hof_baseline") {
      import org.apache.spark.sql.expressions.Window
      val ws = graft.operators.TextOps.tokens(col("text"))
      val terms = Tables.documents(spark, sfDir)
        .select(col("doc_id"), ws.as("ws"))
        .select(col("doc_id"), col("ws"), explode(array_distinct(col("ws"))).as("term"))
        .withColumn("tf", size(filter(col("ws"), x => x === col("term"))).cast("long"))
        .drop("ws").localCheckpoint()
      val stats = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n"))
      val dfFrame = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
      terms.join(broadcast(dfFrame), Seq("term")).crossJoin(broadcast(stats))
        .withColumn("tfidf", round(col("tf") * log(col("n").cast("double") / col("df")), 6))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3).count()
    }

    t("sim_recall_report") { SparkEntry.queries("sim_recall_report")(spark, sfDir).count() }

    // ---- round-13 probes: LPA argmax formulations ----
    // production = packed-long hash-agg argmax. The window and
    // struct-max variants pin WHY: struct-max falls to SortAggregate
    // (measured ~2.1 s vs ~1.3 s at sf0.1); window ties the packed
    // form here because the query is JOB-COUNT bound (4 rounds x 2
    // exchanges), but pays a per-node sort the hash agg doesn't at
    // scale.
    def lpaVariant(argmax: DataFrame => DataFrame): Long = {
      val n = Tables.parquetRowCount(spark, s"$sfDir/documents.parquet")
      val hubs = math.min(16L, n)
      val nodes = Tables.documents(spark, sfDir).select(col("doc_id").as("v"))
      val edges = nodes.select(col("v").as("src"))
        .select(col("src"), explode(array(
          (col("src") * 31 + 7) % n, col("src") % hubs,
          (col("src") * 13 + 11) % n)).as("dst"))
      val und = edges.select(col("src").as("v"), col("dst").as("u"))
        .unionByName(edges.select(col("dst").as("v"), col("src").as("u")))
        .unionByName(nodes.select(col("v"), col("v").as("u")))
      var labels = nodes.select(col("v").as("u"), col("v").as("lbl"))
      for (_ <- 1 to 4) {
        val counted = und.join(labels, Seq("u"))
          .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("c"))
        labels = argmax(counted)
      }
      labels.count()
    }
    t("lpa_production") { SparkEntry.queries("crawl_communities")(spark, sfDir).count() }
    t("lpa_window_variant") {
      import org.apache.spark.sql.expressions.Window
      lpaVariant { counted =>
        val w = Window.partitionBy(col("v")).orderBy(col("c").desc, col("lbl").asc)
        counted.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).select(col("v").as("u"), col("lbl"))
      }
    }
    t("lpa_structmax_variant") {
      // SortAggregate fallback: the struct buffer is non-primitive
      lpaVariant { counted =>
        counted.groupBy(col("v"))
          .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
          .select(col("v").as("u"), (-col("m.nl")).as("lbl"))
      }
    }
    t("lpa_packed_variant") {
      // the production argmax in isolation (production also pays the
      // edge store read + the sizes join + the output sort)
      lpaVariant { counted =>
        counted.groupBy(col("v"))
          .agg(max(shiftleft(col("c"), 32) +
            (lit(0xffffffffL) - col("lbl"))).as("m"))
          .select(col("v").as("u"),
            (lit(0xffffffffL) - col("m").bitwiseAND(lit(0xffffffffL))).as("lbl"))
      }
    }

    // ---- round-13 probes: BM25 scan-scoring vs index probe A/B ----
    // bm25_scan_baseline reproduces the round-12 shape (corpus scan +
    // native struct lookup per term + one-row stats agg); the
    // production query now probes the posting store with a pushed
    // term IN filter. Warm the store first (first build pays the
    // tokenizer once per corpus version).
    t("bm25_store_warm") { SparkEntry.queries("search_postings")(spark, sfDir).count() }
    t("bm25_production") { SparkEntry.queries("search_bm25_topk")(spark, sfDir).count() }
    t("bm25_scan_baseline") {
      val ws = graft.operators.TextOps.tokens(col("text"))
      val terms = Seq("vector", "stream", "window")
      val base = Tables.documents(spark, sfDir)
        .select(col("doc_id"), size(ws).cast("long").as("dl"),
          graft.functions.TextExpressions.term_count_structs(col("text")).as("tcs"))
        .select(col("doc_id") +: col("dl") +:
          terms.zipWithIndex.map { case (tm, i) =>
            coalesce(
              try_element_at(filter(col("tcs"), x => x.getField("term") === tm),
                lit(1)).getField("tf"),
              lit(0L)).as(s"tf$i") }: _*)
      val stats = base.agg(
        count(lit(1)).as("n"), sum(col("dl")).as("sumdl"),
        sum((col("tf0") > 0).cast("long")).as("df0"),
        sum((col("tf1") > 0).cast("long")).as("df1"),
        sum((col("tf2") > 0).cast("long")).as("df2"))
      val avgdl = col("sumdl").cast("double") / col("n")
      def termScore(i: Int) = {
        val tf = col(s"tf$i").cast("double")
        val df = col(s"df$i").cast("double")
        val idf = log(lit(1.0) + (col("n") - df + 0.5) / (df + 0.5))
        idf * (tf * lit(2.2)) /
          (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
      }
      base.crossJoin(broadcast(stats))
        .select(col("doc_id"),
          round(termScore(0) + termScore(1) + termScore(2), 6).as("bm25"))
        .filter(col("bm25") > 0)
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20).count()
    }

    // ---- round-12 probes: trained-model serving costs (warm memos) ----
    t("km_full") { SparkEntry.queries("cluster_kmeans")(spark, sfDir).count() }
    t("km_balanced") { SparkEntry.queries("sample_cluster_balanced")(spark, sfDir).count() }
    t("dsir_full") { SparkEntry.queries("sample_dsir")(spark, sfDir).count() }

    // ---- round-12 probes: recall-report decomposition ----
    // where the report's wall-clock goes: each rung standalone (warm
    // memoized banks) vs the assembled union
    for (rung <- Seq("sim_cosine_topk", "sim_ivf_topk", "sim_sq8_topk",
        "sim_pq_topk", "sim_ivfpq_topk", "sim_ivfpq_multiprobe_topk",
        "sim_ivfpq_residual_topk", "sim_pq_rerank_topk"))
      t(s"rr_rung_$rung") { SparkEntry.queries(rung)(spark, sfDir).count() }

    // ---- round-14 probes: q38b rewrite A/B ----
    // production (round 14): native session_window spans (narrow
    // 2-column scan, no session_seq bookkeeping), ONE map-side explode
    // emitting both sweep boundary rows, no user_id sort tiebreak
    // (prefix-sum multiset is tie-order invariant), coalesce(1) final
    // sort instead of a range exchange. The baseline replays the
    // round-13 shape (lag/cumsum sessionIntervals + union of two full
    // projections of `segs` + orderBy). Measured here (sf0.1, idle
    // box, min-of-7): baseline ~0.75 s -> production ~0.40-0.45 s vs
    // DuckDB 0.125-0.18 s. FLOOR NOTE: q38b_scan_floor (a bare count
    // of the events input) measures ~0.157 s — MORE than DuckDB's
    // whole query — so any multi-stage Spark formulation on this input
    // is bounded below by the local job floor, not by plan quality;
    // q38b_hof_variant (per-day sort_array+aggregate sweep, one fewer
    // exchange) was measured ~0.40 s and rejected: ~10% gain for a
    // per-day array materialization the spillable sort-window doesn't
    // pay at scale.
    t("q38b_scan_floor") { Tables.events(spark, sfDir).count() }
    t("q38b_production") { SparkEntry.queries("q38b_concurrency_sweep_midnight")(spark, sfDir).count() }
    t("q38b_hof_variant") {
      val dayUs = 86400000000L
      val segs = Tables.events(spark, sfDir)
        .select(col("user_id"), col("ts"))
        .groupBy(col("user_id"),
          session_window(col("ts"), "1800000001 microseconds").as("sw"))
        .agg(min(unix_micros(col("ts"))).as("s_us"),
          max(unix_micros(col("ts"))).as("e_us"))
        .select(col("s_us"), col("e_us"))
        .withColumn("d", explode(sequence(
          to_date(timestamp_micros(col("s_us"))),
          to_date(timestamp_micros(col("e_us"))))))
        .withColumn("day_s_us", unix_micros(col("d").cast("timestamp")))
        .withColumn("seg_s", greatest(col("s_us"), col("day_s_us")))
        .withColumn("seg_e", least(col("e_us"), col("day_s_us") + lit(dayUs - 1L)))
      // boundary packed into one long: t_us*2 + (start ? 1 : 0) sorts
      // as (t_us asc, delta asc) — ends (-1) before starts at equal t
      segs.select(col("d"),
          explode(array(col("seg_s") * 2L + 1L, (col("seg_e") + 1L) * 2L)).as("enc"))
        .groupBy(col("d"))
        .agg(sort_array(collect_list(col("enc"))).as("encs"))
        .select(col("d"),
          aggregate(col("encs"),
            struct(lit(0L).as("active"), lit(0L).as("peak"),
              lit(0L).as("ov"), lit(0L).as("ns")),
            (acc, e) => {
              val isStart = e % 2L === 1L
              val na = acc.getField("active") + when(isStart, 1L).otherwise(-1L)
              struct(na.as("active"),
                greatest(acc.getField("peak"), na).as("peak"),
                (acc.getField("ov") + when(isStart, na - 1L).otherwise(0L)).as("ov"),
                (acc.getField("ns") + when(isStart, 1L).otherwise(0L)).as("ns"))
            }).as("r"))
        .select(col("d"), col("r.peak").as("peak_concurrency"),
          col("r.ov").as("overlap_pairs"), col("r.ns").as("n_sessions"))
        .coalesce(1).sortWithinPartitions(col("d")).count()
    }
    t("q38b_union_baseline") {
      import org.apache.spark.sql.expressions.Window
      val dayUs = 86400000000L
      // exact replica of the private sessionIntervals helper
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, 0)
      val sess = Tables.events(spark, sfDir)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("is_new")).over(run))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("s_us"),
          max(unix_micros(col("ts"))).as("e_us"))
      val segs = sess
        .withColumn("d", explode(sequence(
          to_date(timestamp_micros(col("s_us"))),
          to_date(timestamp_micros(col("e_us"))))))
        .withColumn("day_s_us", unix_micros(col("d").cast("timestamp")))
        .withColumn("seg_s", greatest(col("s_us"), col("day_s_us")))
        .withColumn("seg_e", least(col("e_us"), col("day_s_us") + lit(dayUs - 1L)))
      val bounds = segs.select(col("d"), col("seg_s").as("t_us"),
          lit(1L).as("delta"), col("user_id"))
        .unionByName(segs.select(col("d"), (col("seg_e") + 1L).as("t_us"),
          lit(-1L).as("delta"), col("user_id")))
      val sweep = Window.partitionBy(col("d"))
        .orderBy(col("t_us"), col("delta"), col("user_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      bounds
        .withColumn("active", sum(col("delta")).over(sweep))
        .groupBy(col("d"))
        .agg(max(col("active")).as("peak_concurrency"),
          sum(when(col("delta") === 1L, col("active") - 1L).otherwise(0L))
            .as("overlap_pairs"),
          sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_sessions"))
        .orderBy(col("d")).count()
    }

    // ---- round-14 probes: keyphrases native-run A/B ----
    // production = native PhraseRuns byte scan + fused dedup-scoring;
    // the baseline replays the round-13 shape (posexplode of the full
    // token stream + per-doc cumulative-stopword window + collect_list
    // + separate distinct() before the top-3 window)
    t("kp_production") { SparkEntry.queries("corpus_keyphrases")(spark, sfDir).count() }
    t("kp_window_baseline") {
      import org.apache.spark.sql.expressions.Window
      val stopEn = Seq("the", "a", "of")
      val tok = Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val runs = tok
        .withColumn("st", col("w").isin(stopEn: _*))
        .withColumn("run", sum(col("st").cast("long")).over(wDoc))
        .filter(!col("st"))
      val ph = runs.groupBy(col("doc_id"), col("run"))
        .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("pws"),
          count(lit(1)).as("len"))
        .select(col("doc_id"), col("run"), col("len"),
          expr("array_join(transform(pws, x -> x.w), ' ')").as("phrase"))
      val pw = ph.select(col("doc_id"), col("run"), col("len"), col("phrase"),
        explode(split(col("phrase"), " ")).as("w"))
      val wstats = pw.groupBy(col("w"))
        .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
      val psc = pw.join(broadcast(wstats), Seq("w"))
        .withColumn("sppm", expr("(deg * 1000000) div freq"))
        .groupBy(col("doc_id"), col("run"), col("phrase"))
        .agg(sum(col("sppm")).as("score_ppm"))
      val dist = psc.select(col("doc_id"), col("phrase"), col("score_ppm")).distinct()
      val wTop = Window.partitionBy(col("doc_id"))
        .orderBy(col("score_ppm").desc, col("phrase"))
      dist.withColumn("rk", row_number().over(wTop).cast("long"))
        .filter(col("rk") <= 3).count()
    }

    // ---- round-15 probes: corpus_cms_counts A/B ----
    // r14 judge: 5.9x isolated — double corpus explode + 3 re-hashing
    // broadcast joins. A = the old shape; B = the shipped rewrite
    // (one corpus tokenize, cells derived from the vocab-sized exact
    // frame, single broadcast map probe).
    t("cms_old_triple_join") {
      import graft.operators.TextOps
      val toks = Tables.documents(spark, sfDir)
        .select(explode(TextOps.tokens(col("text"))).as("term"))
        .filter(length(col("term")) > 0)
      def cell(j: Int, tc: org.apache.spark.sql.Column) =
        pmod(TextOps.portableHash32(concat(lit(s"cms$j|"), tc)), lit(128L))
      val cells = toks
        .select(explode(array((0 until 3).map(j =>
          struct(lit(j).as("j"), cell(j, col("term")).as("c"))): _*)).as("jc"))
        .select(col("jc.j").as("j"), col("jc.c").as("c"))
        .groupBy(col("j"), col("c")).agg(count(lit(1)).as("n"))
      val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("exact_count"))
      (0 until 3).foldLeft(exact.withColumn("est", lit(Long.MaxValue))) { (df, j) =>
        df.join(broadcast(cells.filter(col("j") === j)
            .select(col("c").as(s"c$j"), col("n").as(s"n$j"))),
            cell(j, col("term")) === col(s"c$j"))
          .withColumn("est", least(col("est"), col(s"n$j")))
          .drop(s"c$j", s"n$j")
      }.count()
    }
    t("cms_new_full") { SparkEntry.queries("corpus_cms_counts")(spark, sfDir).count() }

    // ndcg arm sharing: the shipped query localCheckpoints the 20-row
    // bm25 frame + the gains frame so the rrf arm stops recomputing
    // the lexical subtree (r14: 7.5x at the 10x point)
    t("ndcg_full") { SparkEntry.queries("search_eval_ndcg")(spark, sfDir).count() }
    t("ndcg_arm_rrf_alone") { SparkEntry.queries("search_hybrid_rrf")(spark, sfDir).count() }
    t("ndcg_arm_cosine_alone") { SparkEntry.queries("sim_cosine_topk")(spark, sfDir).count() }
    t("ndcg_store_scan_floor") {
      graft.queries.ExtensionQueries.postingProbeFloor(spark, sfDir)
    }
    // job-count accounting: how many Spark jobs one ndcg evaluation
    // schedules (the local job floor is ~0.1s/job — stage count IS
    // the cost model on sub-second queries)
    locally {
      val durs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          durs.put(j.jobId, (j.time, 0L))
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = Option(durs.get(j.jobId)).map(_._1).getOrElse(0L)
          durs.put(j.jobId, (s, j.time))
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      SparkEntry.queries("search_eval_ndcg")(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(l)
      import scala.jdk.CollectionConverters._
      val rows = durs.asScala.toSeq.sortBy(_._1)
        .map { case (id, (s, e)) => f"j$id=${(e - s) / 1e3}%.2fs" }
      println(f"PROBE ndcg_jobs wall=$wall%.2fs ${rows.mkString(" ")}")
    }
    // build/plan/exec split for any queries named in SPARK_GRAFT_SPLIT
    // (comma-separated) — where does a sub-second query's wall go?
    sys.env.getOrElse("SPARK_GRAFT_SPLIT", "search_eval_ndcg").split(",")
      .filter(_.nonEmpty).foreach { qn =>
        (1 to 3).foreach { _ =>
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(qn)(spark, sfDir)
          val tBuild = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan
          val tPlan = (System.nanoTime() - t1) / 1e9
          val t2 = System.nanoTime()
          df.count()
          val tExec = (System.nanoTime() - t2) / 1e9
          println(f"PROBE split_$qn build=$tBuild%.2fs plan=$tPlan%.2fs exec=$tExec%.2fs")
        }
      }
    t("ndcg_arm_ql_alone") { SparkEntry.queries("search_ql_dirichlet")(spark, sfDir).count() }
    t("ndcg_arm_bm25_alone") { SparkEntry.queries("search_bm25_topk")(spark, sfDir).count() }

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
