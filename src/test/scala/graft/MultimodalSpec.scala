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

  test("PGM codec: encode/decode round-trip with known pixels; quirky headers parse") {
    val img = Multimodal.PgmImage(4, 2, 255,
      Array[Byte](0, 10, 20, 30, 40, 50, 60, 70))
    val back = Multimodal.decodePgm(Multimodal.encodePgm(img)).get
    assert(back.width === 4 && back.height === 2 && back.maxVal === 255)
    assert(back.pixels.toSeq === img.pixels.toSeq)
    assert(back.pixel(2, 1) === 60)
    // comment- and whitespace-tolerant header per the netpbm spec
    val quirky = "P5 # a comment\n 2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](7, 9)
    val q = Multimodal.decodePgm(quirky).get
    assert(q.width === 2 && q.height === 1 && q.pixels.toSeq === Seq[Byte](7, 9))
    // truncated raster / non-PGM bytes are rejected, not mangled
    assert(Multimodal.decodePgm("P5\n3 3\n255\nxy".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodePgm("hello world".getBytes("US-ASCII")).isEmpty)
    // a CRLF separator (Windows writers) is consumed as a pair — the
    // raster must come back unshifted, not starting at the '\n'
    val crlf = "P5\r\n2 1\r\n255\r\n".getBytes("US-ASCII") ++ Array[Byte](7, 9)
    val c = Multimodal.decodePgm(crlf).get
    assert(c.width === 2 && c.pixels.toSeq === Seq[Byte](7, 9))
    // junk header/raster separator -> reject (stub fallback), never a
    // one-byte-shifted raster; digits glued to the magic are not a width
    assert(Multimodal.decodePgm(
      "P5\n2 1\n255X".getBytes("US-ASCII") ++ Array[Byte](7, 9, 0)).isEmpty)
    assert(Multimodal.decodePgm(
      "P512 1\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](12)(1)).isEmpty)
  }

  test("PGM resize operates on real pixels end-to-end through the Dataset op") {
    // 4x4 gradient 0..15; nearest-neighbor to 2x2 keeps rows 0,2 and
    // cols 0,2 -> exactly pixels 0, 2, 8, 10
    val src = Multimodal.PgmImage(4, 4, 255, Array.tabulate(16)(_.toByte))
    val assets = Seq(Multimodal.Asset(1L, "image",
      Multimodal.encodePgm(src), "s")).toDS()
    val out = Multimodal.resize(assets, w = 2, h = 2).collect().head
    val outImg = Multimodal.decodePgm(out.payload).get
    assert(outImg.width === 2 && outImg.height === 2)
    assert(outImg.pixels.toSeq === Seq[Byte](0, 2, 8, 10))
  }

  test("PGM features: luminance histogram over pixels, not header bytes") {
    val img = Multimodal.PgmImage(2, 2, 255, Array[Byte](0, 0, -1, -1)) // 0,0,255,255
    val f = Multimodal.decodeFeatures(Multimodal.encodePgm(img))
    assert(f(0) === 0.5f && f(Multimodal.FeatureDim - 1) === 0.5f)
    assert(f.sum === 1.0f)
  }

  test("PGM container frame sampling splits at real image boundaries") {
    val frames = (0 until 3).map(i =>
      Multimodal.PgmImage(2, 1, 255, Array[Byte]((10 * i).toByte, (10 * i + 1).toByte)))
    val container = frames.map(Multimodal.encodePgm).reduce(_ ++ _)
    val assets = Seq(Multimodal.Asset(7L, "video", container, "s")).toDS()
    val got = Multimodal.sampleFrames(assets, frameBytes = 16, stride = 2)
      .orderBy("frame_idx").collect()
    assert(got.map(_.frame_idx).toSeq === Seq(0, 2))
    assert(got.forall(_.n_frames_total === 3))
    got.foreach { fr =>
      val img = Multimodal.decodePgm(fr.frame).get
      assert(img.pixels.toSeq === frames(fr.frame_idx).pixels.toSeq)
    }
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
