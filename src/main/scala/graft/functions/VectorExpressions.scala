package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for the similarity-search hot path.
  *
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is correct but every
  * higher-order function is CodegenFallback — per-row closure dispatch,
  * no whole-stage codegen, boxed accumulators. A brute-force ANN scan
  * is exactly the place the task's preference order says to drop to a
  * custom `Expression` with `doGenCode`: this compiles to a tight
  * primitive `double` loop inside the generated code, keeping the
  * whole scoring stage in one WholeStageCodegen span.
  *
  * Semantics match the fold exactly: sequential left-to-right IEEE
  * summation over min(len(a), len(b)) elements (so results stay
  * bit-identical to the previous formulation and the DuckDB oracle
  * modulo the query-level rounding). Null if either side is null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) |
         ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<double|float|bigint> inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // float/long inputs are widened per element — IEEE float->double
  // widening is exact, and long->double is exact below 2^53 (the sq8
  // quantized-code caller tops out at 255, and its per-product bound is
  // 255^2 with <= dim summands, all integer-exact in a double), so
  // results are bit-identical to casting the array first (and to the
  // DuckDB oracle's CAST(x AS DOUBLE)). Accepting these natively keeps
  // the scoring projection free of the higher-order `transform` cast,
  // which would otherwise break whole-stage codegen.
  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lt = elemType(left); val rt = elemType(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv: Double = lt match {
        case FloatType => x.getFloat(i).toDouble
        case LongType => x.getLong(i).toDouble
        case _ => x.getDouble(i)
      }
      val yv: Double = rt match {
        case FloatType => y.getFloat(i).toDouble
        case LongType => y.getLong(i).toDouble
        case _ => y.getDouble(i)
      }
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def getter(t: DataType, v: String): String = t match {
        case FloatType => s"(double) $v.getFloat($i)"
        case LongType => s"(double) $v.getLong($i)"
        case _ => s"$v.getDouble($i)"
      }
      val getA = getter(elemType(left), a)
      val getB = getter(elemType(right), b)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $getA * $getB;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** The int8-SQ quantize-then-reconstruct round trip in ONE native
  * pass: per dimension, `code = floor((x - mn) * 255 / (mx - mn) +
  * 0.5)` (0 when the dim is constant) CLAMPED to [0, 255] — values
  * outside the learned range (unseen queries against a trained
  * codebook, the normal deployment case) must land on the codebook
  * edge, not on an out-of-codebook code — and `value = mn + code *
  * (mx - mn) / 255`. The HOF formulation — `reconstructSq8(
  * quantizeSq8(v))`, a zip_with-of-zip_with chain twice over — is
  * CodegenFallback per element; this compiles to a primitive double
  * loop, keeping the sq8 scoring projection (the corpus-scan hot
  * stage of `sim_sq8_topk`) inside one WholeStageCodegen span.
  * Arithmetic is pinned IDENTICAL to the HOF chain (VectorOpsSpec
  * asserts bit-for-bit equality on real embeddings), so the DuckDB
  * oracle replay is unchanged. Output length = min of the three
  * array lengths; null if any input is null.
  */
case class Sq8Reconstruct(vec: Expression, mns: Expression, mxs: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = mns
  override def third: Expression = mxs

  private def vecOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def rangeOk(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(vec.dataType) && rangeOk(mns.dataType) && rangeOk(mxs.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq8_reconstruct requires (array<float|double>, array<double>, " +
        s"array<double>), got ${vec.dataType.sql} / ${mns.dataType.sql} / " +
        s"${mxs.dataType.sql}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq8_reconstruct"

  private def vecIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, lo: Any, hi: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val mn = lo.asInstanceOf[ArrayData]
    val mx = hi.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), math.min(mn.numElements(), mx.numElements()))
    val out = new Array[Double](n)
    val f = vecIsFloat
    var i = 0
    while (i < n) {
      val xv = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      val l = mn.getDouble(i)
      val h = mx.getDouble(i)
      out(i) = if (h == l) l
        else l + Math.min(255.0, Math.max(0.0,
          Math.floor((xv - l) * 255 / (h - l) + 0.5))) * (h - l) / 255
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, lo, hi) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val xv = ctx.freshName("xv")
      val l = ctx.freshName("lo")
      val h = ctx.freshName("hi")
      val getX = if (vecIsFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($v.numElements(),
         |  java.lang.Math.min($lo.numElements(), $hi.numElements()));
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $getX;
         |  double $l = $lo.getDouble($i);
         |  double $h = $hi.getDouble($i);
         |  $out[$i] = ($h == $l) ? $l :
         |    $l + java.lang.Math.min(255.0, java.lang.Math.max(0.0,
         |      java.lang.Math.floor(($xv - $l) * 255 / ($h - $l) + 0.5))) * ($h - $l) / 255;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, mns = newSecond, mxs = newThird)
}

/** Content-equal holder for a small centroid bank riding in a plan —
  * the [[graft.functions.StringSet]] pattern for vectors: bare arrays
  * in a case-class Expression compare by reference, which would block
  * Catalyst canonicalization/CSE for any plan that assigns cells twice
  * (e.g. an IVF probe side + corpus side sharing one bank). Centroids
  * are re-sorted by ascending cid so the argmax loop's first-wins rule
  * IS the ties-to-the-lower-cid contract.
  *
  * Driver-bounded by construction (O(k x dim) floats — 32 x 64 here);
  * corpus-scale relations belong in a join, not an expression.
  */
final class CentroidBank(cids0: Array[Long], vecs0: Array[Array[Float]],
    norms0: Array[Double]) extends Serializable {
  require(cids0.length == vecs0.length && cids0.length == norms0.length
      && cids0.nonEmpty,
    s"centroid bank shape mismatch: ${cids0.length}/${vecs0.length}/${norms0.length}")
  private val order: Array[Int] =
    cids0.indices.sortBy(cids0(_)).toArray
  val cids: Array[Long] = order.map(cids0)
  val vecs: Array[Array[Float]] = order.map(vecs0)
  val norms: Array[Double] = order.map(norms0)

  override def equals(o: Any): Boolean = o match {
    case b: CentroidBank =>
      java.util.Arrays.equals(cids, b.cids) &&
        java.util.Arrays.equals(norms, b.norms) &&
        vecs.length == b.vecs.length &&
        vecs.indices.forall(i => java.util.Arrays.equals(vecs(i), b.vecs(i)))
    case _ => false
  }
  private val hc: Int = {
    var h = java.util.Arrays.hashCode(cids)
    h = 31 * h + java.util.Arrays.hashCode(norms)
    vecs.foreach(v => h = 31 * h + java.util.Arrays.hashCode(v))
    h
  }
  override def hashCode: Int = hc
  override def toString: String = s"<centroid bank of ${cids.length}>"
}

/** Map-side argmax-cosine cell assignment against a plan-carried
  * [[CentroidBank]]: one row in, one row out, ZERO exchange — replaces
  * a `crossJoin(broadcast(centroids))` n x k row expansion followed by
  * a `max_by` hash aggregate (one full shuffle of the corpus) with a
  * single per-row loop over the k centroids.
  *
  * Bit-compatible with the SQL formulation it replaces, term by term:
  *   - dot product: sequential left-to-right IEEE sum widening floats
  *     per element — the same order as [[DotProduct]];
  *   - score: `round(dot / sqrt(nv * ncv), 6)` where round replicates
  *     Spark's `RoundBase` double branch exactly (NaN/Inf pass
  *     through, else scala BigDecimal HALF_UP at scale 6);
  *   - argmax: SQL double ordering (`max_by(cid, struct(cs, -cid))`
  *     semantics) — `==` first so -0.0 ties 0.0 and the lower cid
  *     wins, then `Double.compare` so NaN ranks above all numbers.
  */
case class SeededCellArgmax(vec: Expression, norm: Expression, bank: CentroidBank)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = norm

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) if norm.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"seeded_cell_argmax requires (array<float>, double), got " +
        s"${vec.dataType.sql} / ${norm.dataType.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "seeded_cell_argmax"

  /** Row-level entry point shared by eval and generated code. */
  def assign(v: ArrayData, nv: Double): Long = {
    var best = 0L
    var bestRaw = 0.0
    var first = true
    var j = 0
    while (j < bank.cids.length) {
      val c = bank.vecs(j)
      val n = java.lang.Math.min(v.numElements(), c.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getFloat(i).toDouble * c(i).toDouble; i += 1 }
      val raw = s / java.lang.Math.sqrt(nv * bank.norms(j))
      // ROUNDED SQL double ordering via the margin comparator (== tie
      // keeps the earlier = lower cid, NaN ranks above numbers); the
      // exact BigDecimal round only runs on sub-quantum near-ties
      if (first || SeededCellArgmax.compareRounded6(raw, bestRaw) > 0) {
        bestRaw = raw; best = bank.cids(j); first = false
      }
      j += 1
    }
    best
  }

  override def nullSafeEval(v: Any, n: Any): Any =
    assign(v.asInstanceOf[ArrayData], n.asInstanceOf[Double])

  // One virtual call per row against a plan-level reference object —
  // the assignment projection stays inside whole-stage codegen.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellArgmax", this, classOf[SeededCellArgmax].getName)
    defineCodeGen(ctx, ev, (v, n) => s"$ref.assign($v, $n)")
  }

  override def toString: String = s"seeded_cell_argmax($vec, $norm, $bank)"

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, norm = r)
}

object SeededCellArgmax {
  /** Spark's `round(x, 6)` double semantics, verbatim (decompiled
    * `RoundBase.nullSafeEval`, DoubleType branch): NaN/Infinity pass
    * through untouched; everything else rounds via scala BigDecimal
    * (shortest-decimal `Double.toString` representation) HALF_UP at
    * scale 6. Pinned against Spark's own Round by a fuzz test
    * (VectorOpsSpec) so an upstream semantics change fails CI.
    */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Rank `round6(a)` against `round6(b)` in SQL double order (>0 when
    * a's rounded score ranks above, 0 when they tie — incl. the
    * -0.0/0.0 and Inf/Inf ties — <0 otherwise) WITHOUT paying the
    * BigDecimal rounding on the common path: round6 is monotone and
    * moves a finite value by at most half a quantum (5e-7) plus an
    * ulp, so when |a - b| > 2e-6 the raw difference already decides
    * the rounded comparison; only near-tie pairs (within one rounding
    * quantum of each other) fall through to the exact rounding. This
    * is the argmax/argmin hot-loop cost: a 256-codeword PQ assignment
    * was paying 256 BigDecimal rounds per subspace per row — with the
    * margin test, near-ties are the only rounds left (~none: rounded
    * cosine/L2 scores are far coarser spaced than 1e-6).
    *
    * Margin validity needs ulp(x) << 1e-6, i.e. |x| << 2^52 x 5e-7 ~
    * 1e9 — every caller's score domain (cosines in [-1, 1], squared
    * L2 of bounded embeddings) sits orders of magnitude below. The
    * special values route themselves to the exact path: a NaN operand
    * makes both margin tests false (NaN comparisons are false), and
    * same-sign infinities subtract to NaN.
    */
  def compareRounded6(a: Double, b: Double): Int = {
    // Guard the margin precondition in code, not just the Scaladoc: at
    // |x| >= 1e9 the ulp approaches the 1e-6 quantum and the fast path
    // could disagree with round6-then-compare, so large magnitudes
    // take the exact path. Every current caller is orders below this.
    if (math.abs(a) >= 1e9 || math.abs(b) >= 1e9) {
      val ra = round6(a)
      val rb = round6(b)
      return if (ra == rb) 0 else java.lang.Double.compare(ra, rb)
    }
    val d = a - b
    if (d > 2e-6) 1
    else if (d < -2e-6) -1
    else {
      val ra = round6(a)
      val rb = round6(b)
      if (ra == rb) 0 else java.lang.Double.compare(ra, rb)
    }
  }
}

/** Content-equal holder for one subspace of a RESIDUAL product
  * quantizer: the 256 codewords (residual subvectors of the seed
  * vectors, in exact double arithmetic) plus the PROBE CELL's centroid
  * subvector — candidate residuals are computed against it inside the
  * expression, so the caller hands in the raw float subvector and the
  * whole residual-subtract + 256-codeword argmin runs in one per-row
  * loop. Same canonicalization rationale as [[CentroidBank]] (bare
  * arrays compare by reference and would block CSE); codewords
  * re-sorted by ascending cid so first-wins IS ties-to-the-lower-cid.
  * Driver-bounded by construction: 256 x 8 doubles per subspace.
  */
final class ResidualPqBank(cids0: Array[Long], vecs0: Array[Array[Double]],
    val centroidSub: Array[Double]) extends Serializable {
  require(cids0.length == vecs0.length && cids0.nonEmpty,
    s"residual bank shape mismatch: ${cids0.length}/${vecs0.length}")
  private val order: Array[Int] = cids0.indices.sortBy(cids0(_)).toArray
  val cids: Array[Long] = order.map(cids0)
  val vecs: Array[Array[Double]] = order.map(vecs0)

  override def equals(o: Any): Boolean = o match {
    case b: ResidualPqBank =>
      java.util.Arrays.equals(cids, b.cids) &&
        java.util.Arrays.equals(centroidSub, b.centroidSub) &&
        vecs.length == b.vecs.length &&
        vecs.indices.forall(i => java.util.Arrays.equals(vecs(i), b.vecs(i)))
    case _ => false
  }
  private val hc: Int = {
    var h = java.util.Arrays.hashCode(cids)
    h = 31 * h + java.util.Arrays.hashCode(centroidSub)
    vecs.foreach(v => h = 31 * h + java.util.Arrays.hashCode(v))
    h
  }
  override def hashCode: Int = hc
  override def toString: String = s"<residual pq bank of ${cids.length}>"
}

/** Map-side argmin-squared-L2 codeword assignment for residual PQ:
  * takes the raw float SUBVECTOR, subtracts the bank's probe-cell
  * centroid subvector (exact float->double widening, the oracle's
  * CAST arithmetic), and returns the cid of the nearest codeword —
  * squared L2 summed sequentially left-to-right, `round(d, 6)` BEFORE
  * the argmin (Spark RoundBase double semantics via
  * [[SeededCellArgmax.round6]]), ties to the LOWER cid (first-wins on
  * strict less-than). The L2 twin of [[SeededCellArgmax]]: one row
  * in, one row out, zero exchange, whole-stage-codegen friendly via
  * one virtual call per row.
  */
case class ResidualArgminL2(vec: Expression, bank: ResidualPqBank)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def child: Expression = vec

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"residual_argmin_l2 requires array<float>, got ${vec.dataType.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "residual_argmin_l2"

  /** Row-level entry point shared by eval and generated code. */
  def assign(v: ArrayData): Long = {
    var best = 0L
    var bestD = 0.0
    var first = true
    var j = 0
    while (j < bank.cids.length) {
      val cw = bank.vecs(j)
      val n = java.lang.Math.min(
        java.lang.Math.min(v.numElements(), bank.centroidSub.length), cw.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = (v.getFloat(i).toDouble - bank.centroidSub(i)) - cw(i)
        s += d * d
        i += 1
      }
      // argmin of round6(s) via the margin comparator — exact rounding
      // only on sub-quantum near-ties (see compareRounded6)
      if (first || SeededCellArgmax.compareRounded6(s, bestD) < 0) {
        bestD = s; best = bank.cids(j); first = false
      }
      j += 1
    }
    best
  }

  override def nullSafeEval(v: Any): Any = assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("resArgmin", this, classOf[ResidualArgminL2].getName)
    defineCodeGen(ctx, ev, v => s"$ref.assign($v)")
  }

  override def toString: String = s"residual_argmin_l2($vec, $bank)"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(vec = newChild)
}

object VectorExpressions {

  /** Column facade: `dot_product(a, b)` over array<double> columns. */
  def dot_product(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  /** Column facade: map-side argmax-cosine cell id (bigint) of `vec`
    * (array<float>, with its precomputed norm) against `bank`. Build
    * the bank ONCE per plan and share it across call sites so the
    * expressions canonicalize equal.
    */
  def seeded_cell_argmax(bank: CentroidBank, vec: Column, norm: Column): Column =
    bridge.column(SeededCellArgmax(bridge.expression(vec), bridge.expression(norm), bank))

  /** Column facade: residual-PQ codeword id (bigint) of the raw float
    * subvector `vecSub` against `bank` (probe-cell centroid + 256
    * residual codewords) — argmin of round6(squared L2), ties lower.
    */
  def residual_argmin_l2(bank: ResidualPqBank, vecSub: Column): Column =
    bridge.column(ResidualArgminL2(bridge.expression(vecSub), bank))

  /** name -> builder, shared by [[register]] and
    * [[graft.GraftExtensions]] (same contract as
    * `TextExpressions.functionBuilders`).
    */
  /** Column facade: the int8-SQ round trip (quantize + reconstruct)
    * of `v` under per-dim ranges `mns`/`mxs`, as one codegen'd pass.
    */
  def sq8_reconstruct(v: Column, mns: Column, mxs: Column): Column =
    bridge.column(Sq8Reconstruct(bridge.expression(v),
      bridge.expression(mns), bridge.expression(mxs)))

  def functionBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> (exprs => DotProduct(exprs.head, exprs(1))),
    "sq8_reconstruct" -> (exprs => Sq8Reconstruct(exprs.head, exprs(1), exprs(2))))

  /** Optional SQL registration: `SELECT dot_product(a, b)`. */
  def register(spark: SparkSession): Unit =
    functionBuilders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
