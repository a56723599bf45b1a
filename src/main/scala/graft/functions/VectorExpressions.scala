package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<double|float> inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // float inputs are widened per element — IEEE float->double widening is
  // exact, so results are bit-identical to casting the array first (and to
  // the DuckDB oracle's CAST(x AS DOUBLE)). Accepting floats natively keeps
  // the scoring projection free of the higher-order `transform` cast, which
  // would otherwise break whole-stage codegen.
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left); val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv: Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv: Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
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
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
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

object VectorExpressions {

  /** Column facade: `dot_product(a, b)` over array<double> columns. */
  def dot_product(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  /** name -> builder, shared by [[register]] and
    * [[graft.GraftExtensions]] (same contract as
    * `TextExpressions.functionBuilders`).
    */
  def functionBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> (exprs => DotProduct(exprs.head, exprs(1))))

  /** Optional SQL registration: `SELECT dot_product(a, b)`. */
  def register(spark: SparkSession): Unit =
    functionBuilders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
