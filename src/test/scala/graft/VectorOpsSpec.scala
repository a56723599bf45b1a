package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps
import graft.functions.VectorExpressions

/** The native codegen'd DotProduct must be bit-identical to the
  * higher-order-fold reference formulation on real embedding data.
  */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct == fold formulation, bit for bit, on all embeddings") {
    val emb = Tables.embeddings(spark, sf0001)
      .withColumn("v", VectorOps.toDouble(col("embedding")))
    val q = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val both = emb.crossJoin(broadcast(q))
      .select(VectorOps.dot(col("qv"), col("v")).as("native"),
        VectorOps.dotFold(col("qv"), col("v")).as("fold"))
      .withColumn("eq", col("native") === col("fold"))
    assert(both.filter(!col("eq")).count() === 0)
  }

  test("DotProduct handles nulls and length mismatch") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 9.0))), // min-length semantics
      (None, Some(Seq(1.0)))
    ).toDF("a", "b")
    val got = df.select(VectorOps.dot(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) === 11.0)
    assert(got(1).isNullAt(0))
  }

  test("dot_product is SQL-registrable") {
    VectorExpressions.register(spark)
    assert(spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) v")
      .head().getDouble(0) === 11.0)
  }
}
