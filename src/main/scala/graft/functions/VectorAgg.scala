package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the element-wise mean of embedding
  * vectors — the "train the coarse quantizer" half of IVF (per-cell /
  * per-label centroids). A mutable (sum[], count) buffer merges
  * associatively: map-side partial aggregation keeps the shuffle at one
  * buffer per (group x partition) regardless of row count — the correct
  * 100 TB shape for sketch-style aggregates (SURVEY §7.2's
  * custom-Aggregator slot).
  */
object VectorAgg {

  case class MeanBuf(sums: Array[Double], n: Long)

  class MeanVector(dim: Int) extends Aggregator[Array[Float], MeanBuf, Array[Double]] {
    override def zero: MeanBuf = MeanBuf(new Array[Double](dim), 0L)

    override def reduce(b: MeanBuf, v: Array[Float]): MeanBuf = {
      val s = b.sums
      var i = 0
      val m = math.min(dim, v.length)
      while (i < m) { s(i) += v(i); i += 1 }
      MeanBuf(s, b.n + 1)
    }

    override def merge(a: MeanBuf, b: MeanBuf): MeanBuf = {
      val s = a.sums.clone()
      var i = 0
      while (i < dim) { s(i) += b.sums(i); i += 1 }
      MeanBuf(s, a.n + b.n)
    }

    override def finish(b: MeanBuf): Array[Double] =
      if (b.n == 0) new Array[Double](dim) else b.sums.map(_ / b.n)

    override def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  case class MeanCostBuf(sums: Array[Double], n: Long, d2: Double)

  /** Fused k-means re-center + cost: the element-wise mean of the
    * assigned vectors AND the sum of their squared assignment distances
    * in ONE pass — one shuffle and one action per training iteration
    * instead of two (the separate `sum(d2)` action re-ran the cached
    * assignment purely to produce a Double). Values are exact: each
    * input is a widened float, so double summation reproduces the
    * two-pass result bit-for-bit.
    */
  class MeanVectorWithCost(dim: Int)
      extends Aggregator[(Array[Double], Double), MeanCostBuf, (Array[Double], Double)] {
    override def zero: MeanCostBuf = MeanCostBuf(new Array[Double](dim), 0L, 0.0)

    override def reduce(b: MeanCostBuf, in: (Array[Double], Double)): MeanCostBuf = {
      val s = b.sums
      val v = in._1
      var i = 0
      val m = math.min(dim, v.length)
      while (i < m) { s(i) += v(i); i += 1 }
      MeanCostBuf(s, b.n + 1, b.d2 + in._2)
    }

    override def merge(a: MeanCostBuf, b: MeanCostBuf): MeanCostBuf = {
      val s = a.sums.clone()
      var i = 0
      while (i < dim) { s(i) += b.sums(i); i += 1 }
      MeanCostBuf(s, a.n + b.n, a.d2 + b.d2)
    }

    override def finish(b: MeanCostBuf): (Array[Double], Double) =
      (if (b.n == 0) new Array[Double](dim) else b.sums.map(_ / b.n), b.d2)

    override def bufferEncoder: Encoder[MeanCostBuf] = Encoders.product[MeanCostBuf]
    override def outputEncoder: Encoder[(Array[Double], Double)] =
      Encoders.tuple(
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
        Encoders.scalaDouble)
  }
}
