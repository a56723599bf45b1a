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

  test("scalar quantization: pinned codes, constant-dim fallback, exact integer dot") {
    // known ranges: dim0 [0,1], dim1 [-2,2], dim2 constant (mn == mx)
    val df = Seq(
      (1L, Array(0.0f, -2.0f, 5.0f)),
      (2L, Array(0.5f, 0.0f, 5.0f)),
      (3L, Array(1.0f, 2.0f, 5.0f))
    ).toDF("vec_id", "embedding")
      .withColumn("mns", array(lit(0.0), lit(-2.0), lit(5.0)))
      .withColumn("mxs", array(lit(1.0), lit(2.0), lit(5.0)))
      .withColumn("q", VectorOps.quantizeSq8(col("embedding"), col("mns"), col("mxs")))
    val got = df.select(col("vec_id"), col("q")).as[(Long, Array[Long])]
      .collect().sortBy(_._1).map(_._2.toSeq)
    // floor((x-mn)*255/(mx-mn)+0.5): 0 -> 0, 0.5 -> 128 (127.5+0.5),
    // 1 -> 255; -2 -> 0, 0 -> 128, 2 -> 255; constant dim -> 0 always
    assert(got(0) === Seq(0L, 0L, 0L))
    assert(got(1) === Seq(128L, 128L, 0L))
    assert(got(2) === Seq(255L, 255L, 0L))
    // integer dot is exact BIGINT algebra
    val d = df.filter(col("vec_id") === 2)
      .crossJoin(df.filter(col("vec_id") === 3).select(col("q").as("q2")))
      .select(VectorOps.dotSq8(col("q"), col("q2")))
      .as[Long].head()
    assert(d === 128L * 255 + 128L * 255)
    // codes never leave the 0..255 codebook on real data
    val emb = Tables.embeddings(spark, sf0001)
    val mm = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("i"), col("mn"), col("mx")))).as("a"))
      .select(transform(col("a"), m => m.getField("mn")).as("mns"),
        transform(col("a"), m => m.getField("mx")).as("mxs"))
    val bad = emb.crossJoin(broadcast(mm))
      .select(VectorOps.quantizeSq8(col("embedding"), col("mns"), col("mxs")).as("q"))
      .filter(exists(col("q"), c => c < 0 || c > 255))
      .count()
    assert(bad === 0L)
  }

  test("Sq8Reconstruct == the HOF quantize+reconstruct chain, bit for bit") {
    // the native fused pass must be indistinguishable from the
    // reference formulation on real data (the DotProduct-vs-fold
    // contract, applied to the sq8 round trip)
    val emb = Tables.embeddings(spark, sf0001)
    val mm = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("i"), col("mn"), col("mx")))).as("a"))
      .select(transform(col("a"), m => m.getField("mn")).as("mns"),
        transform(col("a"), m => m.getField("mx")).as("mxs"))
    val both = emb.crossJoin(broadcast(mm))
      .select(VectorOps.sq8Approx(col("embedding"), col("mns"), col("mxs")).as("native"),
        VectorOps.reconstructSq8(
          VectorOps.quantizeSq8(col("embedding"), col("mns"), col("mxs")),
          col("mns"), col("mxs")).as("fold"))
      .withColumn("eq", col("native") === col("fold"))
    assert(both.filter(!col("eq")).count() === 0)
    // constant-dim fallback and SQL registration
    graft.functions.VectorExpressions.register(spark)
    val one = Seq((Array(1.0f, 5.0f), Array(0.0, 5.0), Array(2.0, 5.0)))
      .toDF("v", "mns", "mxs").createOrReplaceTempView("sq8_t")
    val got = spark.sql("SELECT sq8_reconstruct(v, mns, mxs) FROM sq8_t")
      .as[Array[Double]].head()
    // dim0: code = floor(1*255/2 + 0.5) = 128 -> 0 + 128*2/255; dim1 constant -> mn
    assert(got(0) === 128.0 * 2 / 255 && got(1) === 5.0)
  }

  test("sq8 clamps out-of-range values to the codebook edge (unseen-query case)") {
    // a query quantized against a PREVIOUSLY-trained codebook routinely
    // falls outside the learned per-dim range; codes must saturate at
    // 0/255, never leave int8 storage range — in the HOF quantizer AND
    // the fused native round trip
    val df = Seq((Array(-3.0f, 9.0f, 0.5f)))
      .toDF("v")
      .withColumn("mns", array(lit(0.0), lit(0.0), lit(0.0)))
      .withColumn("mxs", array(lit(1.0), lit(1.0), lit(1.0)))
    val codes = df.select(VectorOps.quantizeSq8(col("v"), col("mns"), col("mxs")))
      .as[Array[Long]].head()
    assert(codes.toSeq === Seq(0L, 255L, 128L))
    val recon = df.select(VectorOps.sq8Approx(col("v"), col("mns"), col("mxs")))
      .as[Array[Double]].head()
    assert(recon.toSeq === Seq(0.0, 1.0, 128.0 / 255))
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

  test("round6 replicates Spark's round(x, 6) bit for bit (fuzz + edges)") {
    // SeededCellArgmax bakes the rounding INTO the expression; if an
    // upstream Spark release changes RoundBase's double branch this
    // must fail rather than silently diverge from the SQL twin.
    val rnd = new scala.util.Random(0xC0FFEE)
    val edge = Seq(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 0.1234565, -0.1234565, 0.9999995, 1e-7,
      -1e-7, 0.45, 1.0, -1.0)
    val xs = edge ++ Seq.fill(5000)(rnd.nextDouble() * 2 - 1) ++
      Seq.fill(1000)(java.lang.Double.longBitsToDouble(rnd.nextLong()))
        .filterNot(d => d.isNaN || d.isInfinite).map(d => d % 10)
    val got = xs.toDF("x").select(col("x"), round(col("x"), 6).as("spark"))
      .collect()
    for (r <- got) {
      val mine = graft.functions.SeededCellArgmax.round6(r.getDouble(0))
      val spark = r.getDouble(1)
      assert(java.lang.Double.doubleToLongBits(mine) ===
        java.lang.Double.doubleToLongBits(spark),
        s"round6(${r.getDouble(0)}) = $mine but Spark rounds to $spark")
    }
  }

  test("compareRounded6 == the exact round-then-compare, incl. sub-quantum near-ties") {
    // the margin fast path must never disagree with the formulation it
    // shortcuts: compare(round6(a), round6(b)) with == catching the
    // -0.0/0.0 tie. Deltas are concentrated around the 1e-6 quantum
    // and the 2e-6 margin where a fast-path bug would hide.
    def exact(a: Double, b: Double): Int = {
      val ra = graft.functions.SeededCellArgmax.round6(a)
      val rb = graft.functions.SeededCellArgmax.round6(b)
      if (ra == rb) 0 else java.lang.Double.compare(ra, rb)
    }
    val rnd = new scala.util.Random(0xD15C0)
    val specials = Seq(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.0, -1.0, 0.9999995, -0.9999995)
    val pairs =
      (for (a <- specials; b <- specials) yield (a, b)) ++
      Seq.fill(20000) {
        val a = rnd.nextDouble() * 2 - 1
        val delta = rnd.nextInt(4) match {
          case 0 => (rnd.nextDouble() * 2 - 1) * 1e-6   // inside the margin
          case 1 => (rnd.nextDouble() * 2 - 1) * 4e-6   // straddles the margin
          case 2 => (rnd.nextDouble() * 2 - 1) * 1e-3   // clear fast path
          case _ => 0.0                                  // exact tie
        }
        (a, a + delta)
      }
    for ((a, b) <- pairs) {
      val got = graft.functions.SeededCellArgmax.compareRounded6(a, b)
      val want = exact(a, b)
      assert(Integer.signum(got) === Integer.signum(want),
        s"compareRounded6($a, $b) = $got but exact comparison says $want")
    }
  }

  test("SeededCellArgmax == the crossJoin + max_by SQL formulation on all embeddings") {
    // The native map-side assignment must agree row for row with the
    // declarative plan it replaced (which is ALSO the DuckDB oracle's
    // formulation): n x 32 expansion, round-6 cosine, max_by tie to
    // the lower cid.
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").as("v"),
        VectorOps.norm2(col("embedding")).as("nv"))
    val cents = emb.filter(col("vec_id") < 32)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nv").as("ncv"))
    val sql = emb.crossJoin(broadcast(cents))
      .withColumn("cs",
        round(VectorOps.dot(col("v"), col("cv")) / sqrt(col("nv") * col("ncv")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("cs"), (-col("cid")).as("nc"))).as("cell"))
    val rows = cents.collect()
    val bank = new graft.functions.CentroidBank(
      rows.map(_.getLong(0)),
      rows.map(_.getSeq[Float](1).toArray),
      rows.map(_.getDouble(2)))
    val native = emb.select(col("vec_id"),
      VectorExpressions.seeded_cell_argmax(bank, col("v"), col("nv")).as("cell"))
    val diff = native.as("n").join(sql.as("s"), Seq("vec_id"))
      .filter(col("n.cell") =!= col("s.cell"))
    assert(diff.count() === 0, s"cell assignment diverged:\n${diff.take(5).mkString("\n")}")
  }

  test("CentroidBank is content-equal and sorts by cid; argmax ties go to the lower cid") {
    val a = new graft.functions.CentroidBank(
      Array(3L, 1L), Array(Array(1f, 0f), Array(0f, 1f)), Array(1.0, 1.0))
    val b = new graft.functions.CentroidBank(
      Array(1L, 3L), Array(Array(0f, 1f), Array(1f, 0f)), Array(1.0, 1.0))
    assert(a === b, "bank equality must not depend on input order")
    assert(a.hashCode === b.hashCode)
    assert(a.cids.toSeq === Seq(1L, 3L))
    // two identical centroids => identical scores => lower cid wins
    val tie = new graft.functions.CentroidBank(
      Array(7L, 2L), Array(Array(1f, 1f), Array(1f, 1f)), Array(2.0, 2.0))
    val got = Seq((Seq(1f, 1f), 2.0)).toDF("v", "nv")
      .select(VectorExpressions.seeded_cell_argmax(tie, col("v"), col("nv")))
      .head().getLong(0)
    assert(got === 2L)
  }

  test("ResidualArgminL2 == a driver-side reference on random subvectors (fuzz + ties)") {
    // the residual-PQ assignment's contract, re-derived independently:
    // r = (double)v - centroidSub, dist = sequential sum of squares,
    // round6 BEFORE the argmin, ties to the LOWER cid
    val rnd = new scala.util.Random(0xBEEF)
    val dsub = 8
    val cids = Array.tabulate(16)(_.toLong)
    val codewords = Array.fill(16)(Array.fill(dsub)(rnd.nextDouble() * 2 - 1))
    // include an exact duplicate codeword pair so the tie path fires
    codewords(9) = codewords(4).clone()
    val centroid = Array.fill(dsub)(rnd.nextDouble() * 2 - 1)
    val bank = new graft.functions.ResidualPqBank(cids, codewords, centroid)
    val vecs = Seq.tabulate(200)(_ => Array.fill(dsub)(rnd.nextFloat() * 2 - 1))
    def ref(v: Array[Float]): Long = {
      val scored = cids.indices.map { j =>
        var s = 0.0; var i = 0
        while (i < dsub) {
          val d = (v(i).toDouble - centroid(i)) - codewords(j)(i)
          s += d * d; i += 1
        }
        (graft.functions.SeededCellArgmax.round6(s), cids(j))
      }
      scored.minBy(identity)._2 // (dist, cid) lexicographic = tie to lower cid
    }
    val got = vecs.map(_.toSeq).toDF("v")
      .select(VectorExpressions.residual_argmin_l2(bank, col("v")))
      .collect().map(_.getLong(0))
    assert(got.toSeq === vecs.map(ref))
    // force a near-tie: a query sitting (modulo float rounding) on the
    // duplicated codeword — cids 4 and 9 score equal after round6 and
    // the LOWER cid must win in both the expression and the reference
    val tieVec = codewords(4).zip(centroid).map { case (c, m) => (c + m).toFloat }
    val tieGot = Seq(tieVec.toSeq).toDF("v")
      .select(VectorExpressions.residual_argmin_l2(bank, col("v")))
      .head().getLong(0)
    assert(tieGot === ref(tieVec), "duplicate-codeword tie must follow the reference")
  }
}
