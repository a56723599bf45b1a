package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries by name (args), min of `reps`
  * (env SPARK_GRAFT_REPS, default 2), same session shape as Bench.
  * Not part of the engine surface — iteration harness only.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      // match Bench's suite-sized codegen cache so isolated numbers
      // are comparable to in-run rows
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    Seq("documents", "embeddings", "events", "lineitem", "orders").foreach { t =>
      try Tables.load(spark, sfDir, t).cache().count()
      catch { case _: Throwable => () }
    }
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"$n%-28s min=${times.map(_._1).min}%8.3f s  all=${times.map(t => f"${t._1}%.3f").mkString(",")}  rows=${times.head._2}")
    }
    spark.stop()
  }
}
