package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over near-dup candidate pairs —
  * the stage that turns pairwise matches into dedup groups (keeper =
  * min doc_id per component).
  *
  * Algorithm: min-label propagation accelerated with path halving
  * (each round a node takes the min of its own label, its neighbors'
  * labels, AND its label's label — the pointer-jumping trick from the
  * MapReduce-CC literature). Labels decrease monotonically and are
  * bounded by the component minimum, so the label SUM is a convergence
  * certificate: an unchanged sum is a fixpoint, no per-round diff join
  * needed. Pure propagation needs diameter rounds; halving needs
  * O(log diameter) — a 1M-node chain converges in ~20 rounds instead
  * of 1M.
  *
  * Fault tolerance: each round's labels are checkpointed to truncate
  * lineage (else round r re-derives rounds 0..r-1). By default this is
  * `localCheckpoint` (executor-local blocks — fast, NOT resilient to
  * executor loss). For production set `spark.graft.cc.checkpointDir`
  * on the session: rounds then use reliable `checkpoint()` into that
  * directory and survive executor failure. Each round writes into its
  * own `cc-round-N` subdirectory and round N-1's subdirectory is
  * deleted as soon as round N has materialized (the eager checkpoint
  * is self-contained, so nothing re-reads the older files) — a long
  * run keeps at most two rounds on the reliable store instead of
  * leaking every round (Spark only auto-cleans checkpoints with
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, off by
  * default). The FINAL round's subdirectory backs the returned
  * DataFrame and intentionally survives; callers own the configured
  * directory's lifecycle.
  */
object Clustering {

  /** (node, label) for every node appearing in `pairs` (a_id, b_id);
    * label = min node id of the connected component.
    *
    * ADAPTIVE strategy (the AQE philosophy applied to an iterative
    * operator): near-dup candidate graphs are usually tiny relative to
    * the corpus — a handful of edges per duplicate cluster — and a
    * distributed round costs several jobs (join, aggregate, halving
    * join, checkpoint, certificate action). Below
    * `spark.graft.cc.localEdgeLimit` edges (default 65536 — a bounded
    * ~1 MB collect), the labels are computed by driver-side union-find
    * with path compression in microseconds; above it, the distributed
    * path-halving loop runs. Identical output by construction: union
    * always roots at the SMALLER id, so each root is its component's
    * minimum — the same label the min-propagation fixpoint converges
    * to (ClusteringPropertySpec pins the two against each other).
    *
    * Throws IllegalStateException if the distributed fixpoint is not
    * certified within `maxRounds` — partial labels are never returned
    * silently (a silent cap would emit wrong clusters for a graph whose
    * diameter exceeds it). With halving, 30 rounds covers diameters
    * beyond any physical graph (~2^29).
    */
  def connectedComponents(spark: SparkSession, pairs: DataFrame,
      maxRounds: Int = 30): DataFrame = {
    val localLimit = spark.conf
      .get("spark.graft.cc.localEdgeLimit", (1 << 16).toString).toLong
    if (pairs.count() <= localLimit) localConnectedComponents(spark, pairs)
    else distributedConnectedComponents(spark, pairs, maxRounds)
  }

  /** Driver-side union-find (path compression + min-root union) for
    * graphs under the local edge limit. O(edges α(n)) time, one bounded
    * collect — the documented exception to the no-driver-collect rule,
    * same class as the O(k x dim) centroid fetches.
    */
  private[operators] def localConnectedComponents(spark: SparkSession,
      pairs: DataFrame): DataFrame = {
    import spark.implicits._
    val es = pairs.select(col("a_id").cast("long"), col("b_id").cast("long"))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      // min-root union: the root of every tree is its component's
      // smallest id, so find(n) IS the label contract
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    parent.keys.toSeq.map(n => (n, find(n))).toDF("node", "label")
  }

  private def distributedConnectedComponents(spark: SparkSession,
      pairs: DataFrame, maxRounds: Int): DataFrame = {
    val ckDir = spark.conf.getOption("spark.graft.cc.checkpointDir")
    var roundIdx = 0
    var prevRoundDir: Option[String] = None
    def deleteDir(dir: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
    def persistRound(df: DataFrame): DataFrame = ckDir match {
      case Some(base) =>
        val roundDir = s"$base/cc-round-$roundIdx"
        spark.sparkContext.setCheckpointDir(roundDir)
        val out = df.checkpoint() // eager: materialized before we return
        prevRoundDir.foreach(deleteDir)
        prevRoundDir = Some(roundDir)
        roundIdx += 1
        out
      case None => df.localCheckpoint()
    }

    val edges = pairs.select(col("a_id"), col("b_id"))
      .unionByName(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
    // Round 0 fused into init: label = min(node, neighbors) in the same
    // aggregate that builds the node set (pairs are already distinct
    // per direction, so this is one shuffle).
    var labels = persistRound(
      edges.groupBy(col("a_id"))
        .agg(min(col("b_id")).as("mnb"))
        .select(col("a_id").as("node"), least(col("a_id"), col("mnb")).as("label")))
    def labelSum(): Long =
      labels.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
    var prevSum = labelSum()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("node", "b_id")
          .withColumnRenamed("label", "nl"), Seq("b_id"))
        .groupBy(col("a_id").as("node")).agg(min(col("nl")).as("cand"))
      val stepped = labels.join(viaNeighbor, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("cand"), col("label"))).as("label"))
      // Path halving: label <- label(label). Every label value is itself
      // a node (labels start as node ids and only min-combine), so the
      // self-join is total; left join guards the root (label = itself).
      val halved = stepped.join(
          stepped.select(col("node").as("lnode"), col("label").as("ll")),
          col("label") === col("lnode"), "left")
        .select(col("node"), least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
      labels = persistRound(halved)
      val s = labelSum()
      converged = s == prevSum
      prevSum = s
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not certify a fixpoint in $maxRounds rounds " +
        "(graph diameter > 2^rounds — raise maxRounds); refusing to return partial labels")
    labels
  }
}
