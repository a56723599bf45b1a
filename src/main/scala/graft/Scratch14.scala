package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.TextOps
object Scratch14 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(body: => Long): Unit = {
      val rs = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); val n = body; ((System.nanoTime()-t0)/1e9, n)
      }
      println(f"P $name%-24s min=${rs.map(_._1).min}%7.3f rows=${rs.head._2}")
    }
    val docs = Tables.documents(spark, sfDir)
    def bigrams = docs
      .filter(size(TextOps.tokens(col("text"))) >= 2)
      .select(col("doc_id"), explode(TextOps.shinglesOfText(col("text"), 2)).as("bg"))
    t("docs_scan") { docs.count() }
    t("bigram_explode") { bigrams.count() }
    t("c2_build") { bigrams.groupBy(col("bg")).agg(count(lit(1)).as("c2")).count() }
    t("kn_full") { SparkEntry.queries("text_bigram_kn")(spark, sfDir).count() }
    t("bigram_logprob") { SparkEntry.queries("text_bigram_logprob")(spark, sfDir).count() }
    // variant: score via per-(doc,bg) counts folded into the SAME exchange? no —
    // variant A: per-doc agg via dot product on (doc_id,bg,cnt) partial:
    t("kn_docbg_partial") {
      val dbg = bigrams.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("k"))
      dbg.count()
    }
    SparkEntry.queries("text_bigram_kn")(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
