package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media
  * payloads are opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs partition-batched over the payload bytes.
  *
  * The decode kernel itself is a STUB (deterministic byte statistics —
  * no image/audio codecs exist in this container); everything around it
  * is real and tested: the asset schema, content-hash bucketing for
  * balanced partitions, the partition-batched execution shape (one
  * decoder instantiation per partition, NOT per row — the same shape a
  * vectorized/Arrow UDF would use), and the typed feature output.
  *
  * 100 TB notes: payloads never shuffle uncompacted — bucketing happens
  * on the 8-byte content hash, and features (small, fixed-width) are
  * what flows downstream; `spark.sql.files.maxPartitionBytes` governs
  * scan-side batch size for large media files.
  */
object Multimodal {

  case class Asset(asset_id: Long, modality: String, payload: Array[Byte],
      source: String)
  case class AssetFeatures(asset_id: Long, modality: String, n_bytes: Long,
      bucket: Int, features: Array[Float])

  val FeatureDim = 16

  /** STUB decoder: a real build plugs an image/audio codec in here; the
    * contract (bytes in, fixed-width float features out, pure, batched
    * per partition) is what the pipeline depends on. Current impl: a
    * 16-bin byte histogram normalized by length — deterministic and
    * fast, so the plumbing is testable.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) % FeatureDim) += 1f; i += 1 }
    if (payload.length > 0) {
      var j = 0
      while (j < FeatureDim) { hist(j) /= payload.length.toFloat; j += 1 }
    }
    hist
  }

  /** Documents table -> binary assets (text bytes as the opaque payload;
    * stands in for a real media table with identical plumbing).
    */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id"), lit("text").as("modality"),
        col("text").cast("binary").as("payload"), col("source"))
      .as[Asset]
  }

  /** Bucket by content hash (not by id — id ranges skew under append
    * workloads; content hash is uniform) then decode partition-batched.
    */
  def extractFeatures(assets: Dataset[Asset], buckets: Int): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets
      .withColumn("bucket", pmod(xxhash64(col("payload")), lit(buckets)).cast("int"))
      .repartition(col("bucket"))
      .as[(Long, String, Array[Byte], String, Int)]
      .mapPartitions { it =>
        // per-partition setup happens HERE (decoder/codec init once):
        it.map { case (id, modality, payload, _, bucket) =>
          AssetFeatures(id, modality, payload.length.toLong, bucket, decodeStub(payload))
        }
      }
  }

  /** DataFrame facade used by the query surface. */
  def features(spark: SparkSession, dir: String, buckets: Int = 32): DataFrame =
    extractFeatures(assetsFromDocuments(spark, dir), buckets).toDF()

  // ---- Resize / frame-sample plumbing ---------------------------------

  case class ResizedAsset(asset_id: Long, modality: String, width: Int,
      height: Int, payload: Array[Byte])
  case class Frame(asset_id: Long, frame_idx: Int, n_frames_total: Int,
      frame: Array[Byte])

  /** STUB resize kernel: deterministic byte-stride downsample to exactly
    * w*h bytes (a real build calls the image codec here). Pure
    * bytes-in/bytes-out — the contract the pipeline depends on.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (payload.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = payload((i.toLong * payload.length / out.length).toInt)
        i += 1
      }
    }
    out
  }

  /** Partition-batched resize: one kernel/codec instantiation per
    * partition, payload-to-payload, metadata typed alongside. Output
    * payloads are fixed-size, so downstream batch shapes are uniform —
    * exactly what a training loader wants.
    */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[ResizedAsset] = {
    // driver-side validation: fail at plan build, not as a bare
    // ArithmeticException inside a distributed task
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue,
      s"resize dims must be positive and w*h must fit an Int, got ${w}x$h")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // codec init would happen here, once per partition
      it.map(a => ResizedAsset(a.asset_id, a.modality, w, h,
        resizeStub(a.payload, w, h)))
    }
  }

  /** Frame sampling: split the payload into fixed-size frames, keep
    * every `stride`-th — ONE asset row fans out to N frame rows
    * (flatMap, the Spark shape of a video frame sampler). Frame index
    * and total ride along so downstream ops can reconstruct order
    * without re-reading the source.
    */
  def sampleFrames(assets: Dataset[Asset], frameBytes: Int,
      stride: Int): Dataset[Frame] = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val frames = a.payload.grouped(frameBytes).toArray
      frames.indices.collect {
        case i if i % stride == 0 => Frame(a.asset_id, i, frames.length, frames(i))
      }
    }
  }
}
