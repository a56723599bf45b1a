package graft

import graft.operators.Similarity

/** k-means IVF trainer: cost must be non-increasing and the index
  * deterministic for fixed data.
  */
class SimilaritySpec extends SparkSpec {

  test("trainIvf converges: cost non-increasing over iterations") {
    val emb = Tables.embeddings(spark, sf0001)
    val c1 = Similarity.trainIvf(spark, emb, k = 8, iters = 1)
    val c3 = Similarity.trainIvf(spark, emb, k = 8, iters = 3)
    val c6 = Similarity.trainIvf(spark, emb, k = 8, iters = 6)
    assert(c3.cost <= c1.cost)
    assert(c6.cost <= c3.cost)
    assert(c6.centroids.length === 8)
    assert(c6.centroids.forall(_.length === 64))
  }

  test("trainIvf is deterministic") {
    val emb = Tables.embeddings(spark, sf0001)
    val a = Similarity.trainIvf(spark, emb, k = 4, iters = 2)
    val b = Similarity.trainIvf(spark, emb, k = 4, iters = 2)
    assert(a.cost === b.cost)
    assert(a.centroids.map(_.toSeq).toSeq === b.centroids.map(_.toSeq).toSeq)
  }
}
