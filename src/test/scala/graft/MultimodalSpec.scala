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

  test("resize: fixed output size, typed dims, deterministic") {
    val assets = Multimodal.assetsFromDocuments(spark, sf0001).limit(50)
    val resized = Multimodal.resize(assets, w = 8, h = 4).collect()
    assert(resized.length === 50)
    assert(resized.forall(r => r.payload.length === 32 && r.width === 8 && r.height === 4))
    val again = Multimodal.resize(assets, w = 8, h = 4).collect()
    assert(resized.map(_.payload.toSeq).toSeq === again.map(_.payload.toSeq).toSeq)
  }

  test("frame sampling fans one asset into strided frame rows") {
    val one = Multimodal.assetsFromDocuments(spark, sf0001)
      .filter(col("asset_id") === 1)
    val payloadLen = one.collect().head.payload.length
    val frames = Multimodal.sampleFrames(one, frameBytes = 16, stride = 2)
      .orderBy("frame_idx").collect()
    val total = (payloadLen + 15) / 16
    assert(frames.forall(_.n_frames_total === total))
    assert(frames.map(_.frame_idx).toSeq === (0 until total by 2))
    // every kept frame is byte-exact the corresponding payload slice
    val payload = one.collect().head.payload
    frames.foreach { f =>
      val expect = payload.slice(f.frame_idx * 16, math.min((f.frame_idx + 1) * 16, payload.length))
      assert(f.frame.toSeq === expect.toSeq)
    }
  }
}
