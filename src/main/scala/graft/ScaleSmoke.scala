package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress smoke: replicate the sf0.1 documents corpus 10x (50k
  * docs, distinct doc_ids, shared content => heavy duplicate pressure)
  * and run the dedup operator family end to end. Exercises exactly the
  * pressure points the 100 TB design claims to handle: duplicate-heavy
  * LSH buckets, hot shingles, pair-expansion volume.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val big = (0 until 10).map(k =>
        base.withColumn("doc_id", col("doc_id") + lit(k * 1000000L)))
      .reduce(_.unionByName(_))
    val dir = java.nio.file.Files.createTempDirectory("big").toString
    big.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    println(s"corpus: ${spark.read.parquet(s"$dir/documents.parquet").count()} docs")

    for (q <- Seq("dedup_exact", "dedup_minhash", "dedup_simhash_pairs",
        "dedup_ngram_jaccard", "dedup_clusters", "dedup_gram_coverage",
        "text_fingerprint", "text_pack", "sample_stratified", "sample_mixture",
        "decon_ngram_overlap", "decon_bloom_prefilter", "decon_minhash_neardup",
        "text_pii_scrub", "corpus_hot_ngrams", "export_shard_stats",
        "text_unigram_logprob", "text_chunks", "corpus_stats")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"$q%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   $n%10d rows")
    }
    spark.stop()
  }
}
