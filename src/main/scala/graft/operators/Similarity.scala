package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorAgg

/** IVF index construction: Lloyd's k-means over the embedding corpus.
  *
  * Spark-idiomatic iterative refinement (the MLlib KMeans shape):
  * per iteration one distributed assign (broadcast centroids, map-side
  * argmin) + one distributed re-center (the typed MeanVector
  * Aggregator, map-side combined). Only the k x dim centroid matrix
  * ever reaches the driver — collecting it is O(k*dim), independent of
  * corpus size, which is what makes the loop legal at 100 TB.
  *
  * The resulting `cells` assignment is the coarse quantizer used by
  * `sim_ivf_topk` / `dedup_embedding` (there seeded with fixed vectors
  * so the DuckDB oracle can replay it; this trainer is the production
  * path where centroids are learned, not seeded).
  */
object Similarity {

  case class TrainedIndex(centroids: Array[Array[Double]], cost: Double)

  /** Squared-L2 assign + mean re-center, `iters` rounds. Deterministic:
    * initial centroids are the first k vectors by vec_id; ties in
    * assignment break toward the lower centroid id.
    */
  def trainIvf(spark: SparkSession, emb: DataFrame, k: Int, iters: Int,
      dim: Int = 64): TrainedIndex = {
    import spark.implicits._
    val vecs = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Array[Double])].cache()

    var centroids: Array[Array[Double]] =
      vecs.sortWithinPartitions("vec_id").orderBy("vec_id").take(k).map(_._2)
    var cost = Double.MaxValue

    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assigned = vecs.map { case (id, v) =>
        val cs = bc.value
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          var d = 0.0; var i = 0
          val cv = cs(c)
          while (i < v.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        (best, v, bestD)
      }.toDF("cell", "v", "d2").cache()

      cost = assigned.agg(sum(col("d2"))).head().getDouble(0)
      val mv = new VectorAgg.MeanVector(dim)
      val next = assigned.select(col("cell"), col("v"))
        .as[(Int, Array[Double])]
        .groupByKey(_._1)
        .mapValues(_._2.map(_.toFloat))
        .agg(mv.toColumn.name("c"))
        .collect().toMap
      assigned.unpersist()
      centroids = (0 until k).map(c => next.getOrElse(c, centroids(c))).toArray
    }
    vecs.unpersist()
    TrainedIndex(centroids, cost)
  }
}
