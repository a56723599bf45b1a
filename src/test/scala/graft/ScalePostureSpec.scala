package graft

import org.apache.spark.sql.functions._

/** Machine-checked proofs of the two scale techniques the design
  * notes claim but no oracled query can express (they are PHYSICAL
  * layout/runtime properties, invisible in results):
  *
  *  - BUCKETING: two tables bucketed on the join key join with ZERO
  *    shuffle exchange — the co-located-join contract that makes a
  *    repeated 100 TB fact-fact join pay its partitioning once at
  *    write time instead of on every query.
  *  - AQE SKEW SPLIT: a pathologically skewed join is re-planned at
  *    runtime into split subpartitions — the fallback that saves the
  *    one-hot-key join no static plan can fix.
  *
  * Both are asserted against actual plans, not configuration, so a
  * regression (bucket info dropped on read, AQE accidentally disabled
  * by a conf interaction) fails CI.
  */
class ScalePostureSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("text index probe prunes the file listing to the probed term buckets") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.operators.TextIndex
    import graft.queries.ExtensionQueries.{Bm25Terms, textIndexDir}
    // the driver-side bucket hash must BE Spark's xxhash64 — recompute
    // through the engine and compare (a drift here would silently
    // probe the wrong directories and return an empty frame)
    val viaSpark = spark.range(1)
      .select(Bm25Terms.map(t =>
        pmod(xxhash64(lit(t)), lit(TextIndex.NumBuckets.toLong)).as(t)): _*)
      .head()
    Bm25Terms.zipWithIndex.foreach { case (t, i) =>
      assert(TextIndex.bucketOf(t) === viaSpark.getLong(i),
        s"driver bucketOf('$t') drifted from Spark's xxhash64") }
    // the probe's file scan must carry a partition filter and list
    // ONLY the probed buckets' directories
    val probed = TextIndex.probe(spark, textIndexDir(spark, sf0001), Bm25Terms)
    val scans = probed.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "postings scan lost its partition filter")
    val want = Bm25Terms.map(TextIndex.bucketOf).distinct.length
    assert(scans.head.selectedPartitions.partitionCount === want,
      s"probe read ${scans.head.selectedPartitions.partitionCount} bucket dirs, wanted $want")
    // and the served result equals the memoized-store path exactly
    val a = SparkEntry.queries("search_bm25_indexed")(spark, sf0001).collect().toSeq
    val b = SparkEntry.queries("search_bm25_topk")(spark, sf0001).collect().toSeq
    assert(a === b, "indexed serving drifted from the store path")
  }

  test("posting-store serving plans never re-tokenize the corpus") {
    // The build/serve lifecycle contract (r16 verdict item 8): the
    // inverted-index store is BUILT once per corpus version (at 100 TB
    // a scheduled job, here the materializedFrame memo) and every
    // lexical serving query SCANS it — no serving plan may contain the
    // tokenizer, or a store-miss regression would silently re-pay a
    // full-corpus tokenize per query. Same discipline the IVF index
    // pins via saveIndex/probeIndex.
    Seq("search_bm25_topk", "corpus_burstiness", "corpus_keywords")
      .foreach { q =>
        val frame = SparkEntry.queries(q)(spark, sf0001)
        val plan = frame.queryExecution.executedPlan.toString
        Seq("term_count_structs", "term_count", "word_shingles",
          "distinct_shingle").foreach { tok =>
          assert(!plan.toLowerCase.contains(tok),
            s"$q serving plan re-tokenizes (found $tok) — the store " +
              "lifecycle is broken")
        }
        assert(plan.contains("FileScan parquet") || plan.contains("Scan parquet"),
          s"$q serving plan does not scan the materialized store")
      }
  }

  test("bucketed tables join with zero shuffle exchange (co-located join)") {
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    Tables.orders(spark, sf0001)
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    Tables.customer(spark, sf0001)
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
      val j = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      // the join itself must consume the bucketed layout directly; the
      // only legal exchange is the groupBy's (keyed on c_mktsegment)
      val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(exchanges.forall(_.contains("c_mktsegment")),
        s"join shuffled despite bucketing:\n${exchanges.mkString("\n")}\n$p")
      // and the result must equal the unbucketed formulation
      val expect = Tables.orders(spark, sf0001)
        .join(Tables.customer(spark, sf0001),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(j.as[(String, Long)].collect().toMap === expect)
    }
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
  }

  test("z-order layout shrinks per-partition bounding boxes vs id layout") {
    // the data-skipping claim behind export_zorder, measured: range-
    // partition the same rows by zval vs by event_id and compare the
    // total (a, b) bounding-box area per partition — the proxy for how
    // much a min/max footer filter on EITHER column could prune
    val a = pmod(col("user_id"), lit(256L))
    val b = pmod(floor(col("value")).cast("long"), lit(256L))
    val z = (0 until 8).map { i =>
      shiftleft(shiftright(col("a"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(col("b"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    val rows = Tables.events(spark, sf0001)
      .select(col("event_id"), a.as("a"), b.as("b"))
      .withColumn("zval", z)
    def totalArea(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("p", spark_partition_id())
        .groupBy(col("p"))
        .agg(((max(col("a")) - min(col("a")) + 1) *
          (max(col("b")) - min(col("b")) + 1)).as("area"))
        .agg(sum(col("area"))).as[Long](spark.implicits.newLongEncoder).head()
    val zArea = totalArea(rows.repartitionByRange(8, col("zval")))
    val idArea = totalArea(rows.repartitionByRange(8, col("event_id")))
    assert(zArea * 2 <= idArea,
      s"z-order area $zArea not better than id layout $idArea")
  }

  test("z-ordered parquet: REAL footer stats prune row groups on a two-column box") {
    // the skipping claim measured on the actual read path, not a
    // proxy: write the same rows z-range-partitioned and
    // id-range-partitioned, read every row group's (a, b) min/max
    // straight from the parquet FOOTERS, and count the groups a
    // two-column box predicate can drop. The id layout cannot skip
    // (every file spans the full a/b domain); the z layout must skip
    // most groups, because each z-range slice covers a bounded
    // rectangle of (a, b) space.
    import scala.jdk.CollectionConverters._
    val a = pmod(col("user_id"), lit(256L))
    val b = pmod(floor(col("value")).cast("long"), lit(256L))
    val z = (0 until 8).map { i =>
      shiftleft(shiftright(col("a"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(col("b"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    val rows = Tables.events(spark, sf0001)
      .select(col("event_id"), a.as("a"), b.as("b"))
      .withColumn("zval", z)
    val dir = java.nio.file.Files.createTempDirectory("zskip").toString
    rows.repartitionByRange(8, col("zval")).sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(s"$dir/z")
    rows.repartitionByRange(8, col("event_id")).sortWithinPartitions(col("event_id"))
      .write.mode("overwrite").parquet(s"$dir/id")

    def rowGroupBoxes(path: String): Seq[(Long, Long, Long, Long)] = {
      val conf = spark.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(conf)
      fs.listStatus(root).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
        .flatMap { f =>
          val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
          try rdr.getFooter.getBlocks.asScala.toSeq.map { blk =>
            def mm(name: String): (Long, Long) = {
              val c = blk.getColumns.asScala
                .find(_.getPath.toDotString == name)
                .getOrElse(sys.error(s"no column $name in footer"))
              val st = c.getStatistics
              assert(st != null && !st.isEmpty, s"footer lacks $name min/max stats")
              (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
            }
            val (alo, ahi) = mm("a"); val (blo, bhi) = mm("b")
            (alo, ahi, blo, bhi)
          } finally rdr.close()
        }
    }
    val (lo, hi) = (10L, 20L) // the two-column range predicate's box
    def surviving(gs: Seq[(Long, Long, Long, Long)]): Int =
      gs.count { case (alo, ahi, blo, bhi) =>
        !(ahi < lo || alo > hi || bhi < lo || blo > hi)
      }
    val zGroups = rowGroupBoxes(s"$dir/z")
    val idGroups = rowGroupBoxes(s"$dir/id")
    val zSurv = surviving(zGroups)
    val idSurv = surviving(idGroups)
    assert(zGroups.size >= 8 && idGroups.size >= 8, "expected >=8 row groups per layout")
    assert(zGroups.size - zSurv > 0,
      s"z layout skipped nothing: $zSurv of ${zGroups.size} groups survive")
    assert(zSurv * 2 <= idSurv || idSurv == idGroups.size,
      s"z layout ($zSurv/${zGroups.size}) not better than id layout ($idSurv/${idGroups.size})")

    // and Spark's reader pushes this exact predicate down to those
    // footers — plan shows the pushed range filters, results match a
    // post-scan filter bit for bit
    val pred = col("a").between(lo, hi) && col("b").between(lo, hi)
    val q = spark.read.parquet(s"$dir/z").filter(pred)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThanOrEqual(a,10)"),
      s"range predicate not pushed to the parquet scan:\n$scan")
    assert(q.count() === rows.filter(pred).count())
  }

  test("frontier-delta BFS: deep rounds stay linear-plan, early-exit, round-capped") {
    import graft.operators.Clustering
    import org.apache.spark.sql.catalyst.plans.logical.Join
    // chain 0 -> 1 -> ... -> 39 plus a shortcut 0 -> 20: distances must
    // take the SHORTER path through the shortcut (exact BFS, not just
    // reachability), across 3 checkpoint boundaries
    val n = 40
    val edges = spark.range(0, n - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
      .unionByName(Seq((0L, 20L)).toDF("src", "dst"))
    val seeds = Seq(0L).toDF("v")
    // drive the DISTRIBUTED loop directly: the public entry's adaptive
    // probe (the connectedComponents precedent) would route a 40-edge
    // graph to the driver and never exercise the lineage machinery
    val deep = Clustering.distributedBfsLayers(spark, edges, seeds,
      maxRounds = 64, checkpointEvery = 8)
    val m = deep.as[(Long, Long)].collect().toMap
    assert(m.size === n)
    (0 until n).foreach { v =>
      val expect = if (v >= 20) math.min(v, 1 + (v - 20)) else v
      assert(m(v.toLong) === expect.toLong, s"wrong hop distance for node $v")
    }
    // LINEAR PLAN: every round's frontier is an RDD-backed leaf, so the
    // final visited set must be a flat union — ZERO joins in its tree
    // (the naive dist = f(dist) recurrence doubles its tree per round).
    // EARLY EXIT: the graph's eccentricity from node 0 is 20, so the
    // r=24 boundary probe sees an empty frontier and stops — far fewer
    // than maxRounds=64 leaves despite the over-provisioned cap.
    val plan = deep.queryExecution.analyzed
    assert(plan.collect { case j: Join => j }.isEmpty,
      s"visited set is not a flat union of checkpointed leaves:\n$plan")
    val leaves = plan.collectLeaves().length
    assert(leaves <= 27,
      s"expected early exit at the first empty boundary (~25 leaves), got $leaves")
    // ROUND-CAP CONTRACT: maxRounds=5 returns exactly the <=5-hop ball —
    // chain nodes 0..5 plus shortcut nodes 20..24 — and nothing farther
    // (public entry = the adaptive LOCAL path for this bounded graph)
    val capped = Clustering.bfsLayers(spark, edges, seeds,
      maxRounds = 5, checkpointEvery = 8)
      .as[(Long, Long)].collect().toMap
    assert(capped === (0 to 5).map(v => (v.toLong, v.toLong)).toMap ++
      (20 to 24).map(v => (v.toLong, (v - 19).toLong)).toMap)
    // PARITY with the naive min-agg recurrence (the pre-r16 formulation
    // of crawl_bfs_layers) on a hub-skewed multi-seed graph — pins the
    // rewired query's hash-green guarantee
    val hubEdges = spark.range(0, 200).select(col("id").as("src"),
      explode(array((col("id") * 31 + 7) % 200, (col("id") * 13 + 11) % 200)).as("dst"))
    val hubSeeds = spark.range(0, 200).filter(col("id") % 50 === 0)
      .select(col("id").as("v"))
    var ref = hubSeeds.select(col("v"), lit(0L).as("d"))
    for (r <- 1 to 6) {
      val nxt = ref.filter(col("d") === (r - 1).toLong)
        .join(hubEdges, col("v") === col("src"))
        .select(col("dst").as("v"), lit(r.toLong).as("d"))
      ref = ref.unionByName(nxt).groupBy(col("v")).agg(min(col("d")).as("d"))
    }
    val refSet = ref.as[(Long, Long)].collect().toSet
    val local = Clustering.bfsLayers(spark, hubEdges, hubSeeds, maxRounds = 6)
      .as[(Long, Long)].collect().toSet
    assert(local === refSet,
      "adaptive-local BFS drifted from the min-agg recurrence")
    val distributed = Clustering.distributedBfsLayers(spark,
      hubEdges.toDF("src", "dst"), hubSeeds, maxRounds = 6, checkpointEvery = 8)
      .as[(Long, Long)].collect().toSet
    assert(distributed === refSet,
      "distributed frontier-delta BFS drifted from the min-agg recurrence")
  }

  test("AQE splits the skewed side of a pathological join at runtime") {
    // 100k rows, 95% on ONE key, joined to a small-but-not-broadcast
    // dim; with the skew thresholds lowered to test scale, AQE must
    // mark the sort-merge join as skew-handled after execution
    withConf(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val left = spark.range(0, 100000)
        .select((when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 97))
          .as("k"), col("id").as("payload"))
      val right = spark.range(0, 97).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("tag"))
      val j = left.join(right, Seq("k"))
      // execute THIS dataframe's own query execution (count() would
      // plan a different query and leave j's adaptive plan unresolved)
      assert(j.collect().length === 100000)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the join as skew-split:\n$p")
    }
  }
}
