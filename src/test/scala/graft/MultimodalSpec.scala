package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The multimodal plumbing is real even though the decode kernel is a
  * stub: schema, bucketed partitioning, batch shape, and determinism.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("feature extraction: fixed width, normalized, deterministic") {
    val f1 = Multimodal.features(spark, sf0001, buckets = 8)
    val f2 = Multimodal.features(spark, sf0001, buckets = 8)
    val rows = f1.orderBy("asset_id").collect()
    assert(rows.length === 500)
    assert(rows.forall(_.getAs[scala.collection.Seq[Float]]("features").length === Multimodal.FeatureDim))
    // histogram of a non-empty payload sums to ~1
    val sums = f1.select(aggregate(col("features"),
      lit(0.0f), (a, x) => a + x).as("s")).as[Float].collect()
    assert(sums.forall(s => math.abs(s - 1.0f) < 1e-3))
    // deterministic across runs
    assert(f1.orderBy("asset_id").collect().map(_.getAs[scala.collection.Seq[Float]]("features"))
      .sameElements(f2.orderBy("asset_id").collect().map(_.getAs[scala.collection.Seq[Float]]("features"))))
  }

  test("bucketing spreads assets across partitions by content hash") {
    val f = Multimodal.features(spark, sf0001, buckets = 8)
    val perBucket = f.groupBy("bucket").count().as[(Int, Long)].collect().toMap
    assert(perBucket.keys.forall(b => b >= 0 && b < 8))
    assert(perBucket.size === 8) // all buckets populated at 500 assets
    assert(perBucket.values.max < 500) // no single-bucket collapse
  }

  test("decode stub: empty payload yields zero vector, not NaN") {
    val z = Multimodal.decodeStub(Array.emptyByteArray)
    assert(z.forall(_ == 0f) && z.length === Multimodal.FeatureDim)
  }
}
