package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index for the retrieval family — the text twin
  * of [[Similarity.saveIndex]]/[[Similarity.probeIndex]]: posting rows
  * land in parquet PARTITIONED BY TERM BUCKET, so a bounded query
  * probes only its terms' bucket directories (partition pruning at the
  * file listing — asserted in ScalePostureSpec) and the pushed
  * `term IN (...)` filter cuts the survivors inside each bucket. At
  * 100 TB this is how posting lists actually serve: a query touches a
  * few directories of a term-sharded store, never the corpus and never
  * even the whole index.
  *
  * Bucket key = `xxhash64(term) mod NumBuckets` — computed by Spark's
  * own hash at WRITE time and replayed DRIVER-side at probe time via
  * the same catalyst `XxHash64Function` (seed 42, the SQL `xxhash64`
  * seed), so probe-set resolution costs zero jobs. 64 buckets keeps
  * per-directory file counts sane at test scale; a production store
  * sizes buckets to its vocabulary (the cell-count analog of the IVF
  * index).
  */
object TextIndex {
  val NumBuckets = 64

  /** Spark's xxhash64(term) % NumBuckets, on the driver. Negative
    * hashes follow SQL `pmod` semantics (result in [0, NumBuckets)).
    */
  def bucketOf(term: String): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(term),
      org.apache.spark.sql.types.StringType, 42L)
    val m = h % NumBuckets
    if (m < 0) m + NumBuckets else m
  }

  /** Persist a posting frame (doc_id, term, tf, df, dl, ...) bucketed
    * by term hash. One shuffle-free pass over the postings: the bucket
    * is a map-side projection and partitionBy splits the write.
    */
  def save(postings: DataFrame, dir: String): Unit =
    postings
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(NumBuckets.toLong)))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/postings")

  /** Read ONLY the probed terms' buckets, then the exact term filter.
    * The `bucket IN (...)` predicate is a partition filter (directory
    * listing prunes to the probe set); `term IN (...)` pushes into the
    * surviving parquet scans.
    */
  def probe(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame = {
    val buckets = terms.map(bucketOf).distinct
    spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("term").isin(terms: _*))
      .drop("bucket")
  }
}
