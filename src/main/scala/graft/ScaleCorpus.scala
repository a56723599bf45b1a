package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: materialize the ScaleSmoke 10x replica corpus to a FIXED
  * directory (args(0), default /tmp/scale10x) so the same files can be
  * read by BOTH engines for the SCALE.md same-scale pairing —
  * ScaleSmoke's own replica lives in a run-private temp dir and runs
  * the smoke suite, not a bench. Construction is ScaleSmoke's exactly:
  * 10 replicas with id shifts of 1e6 (docs/vectors) and distinct users
  * + shifted event ids (events). Not part of the engine surface.
  *
  * PERTURBED-REPLICA MODE (args(1) = substitution rate in ppm,
  * default 0 = verbatim replicas): replica k > 0 rewrites each token
  * with probability rate via a deterministic hash coin on
  * (doc_id, k, position), appending a replica-unique suffix — so the
  * 10x corpus carries ORGANIC near-dup rates (high-but-not-1 Jaccard)
  * instead of byte-exact clones, separating a dedup family's workload
  * growth (pair volume) from its plan cost in the SCALE.md pairing.
  */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/scale10x")
    val perturbPpm = args.drop(1).headOption.map(_.toLong).getOrElse(0L)
    // args(2): replica count (default 10) — 100 builds the second
    // SCALE.md decade (r17 verdict item 5); id strides leave room for
    // any replica count below 1000
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.documents(spark, src)
    (0 until reps).map { k =>
        val shifted = base.withColumn("doc_id", col("doc_id") + lit(k * 1000000L))
        if (k == 0 || perturbPpm <= 0) shifted
        else shifted.withColumn("text",
          concat_ws(" ", expr(
            s"""transform(split(text, ' '), (w, i) ->
               |  CASE WHEN pmod(xxhash64(concat(cast(doc_id AS string), '|$k|',
               |    cast(i AS string))), 1000000L) < ${perturbPpm}L
               |  THEN concat(w, '~$k') ELSE w END)""".stripMargin)))
      }
      .reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val embBase = Tables.embeddings(spark, src)
    (0 until reps).map(k =>
        embBase.withColumn("vec_id", col("vec_id") + lit(k * 1000000L)))
      .reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val evBase = Tables.events(spark, src)
    (0 until reps).map(k =>
        evBase.withColumn("event_id", col("event_id") + lit(k * 10000000L))
          .withColumn("user_id", col("user_id") + lit(k * 1000000L)))
      .reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    // fact tables for the TPC-H-ish analytics family: orders/lineitem
    // replicate with CONSISTENT orderkey shifts (the join key must
    // keep matching across replicas); dimension tables (customer/
    // nation/region/supplier) stay 1x — facts grow, dims don't, the
    // realistic 100 TB shape. Callers read dims from the source dir.
    // stride 100M, NOT 10M: q28_snapshot_diff synthesizes "added" keys
    // at real_key + 10M, so a 10M replica stride aliased ~9/10 synthetic
    // keys onto real replica-(k+1) keys at 10x — duplicate keys in the
    // old snapshot fanned out the full-outer join and changed what the
    // 10x adjudication measured (r17 advice). 100M clears the synthetic
    // range for any replica count below 10 while staying far from
    // bigint overflow.
    val ordBase = Tables.orders(spark, src)
    (0 until reps).map(k =>
        ordBase.withColumn("o_orderkey", col("o_orderkey") + lit(k * 100000000L)))
      .reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    val liBase = Tables.lineitem(spark, src)
    (0 until reps).map(k =>
        liBase.withColumn("l_orderkey", col("l_orderkey") + lit(k * 100000000L)))
      .reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    for (dim <- Seq("customer", "supplier", "nation", "region", "part"))
      spark.read.parquet(s"$src/$dim.parquet")
        .write.mode("overwrite").parquet(s"$out/$dim.parquet")
    println(s"SCALE_CORPUS $out docs=" +
      spark.read.parquet(s"$out/documents.parquet").count() + " vectors=" +
      spark.read.parquet(s"$out/embeddings.parquet").count() + " events=" +
      spark.read.parquet(s"$out/events.parquet").count())
    spark.stop()
  }
}
