package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch — the classic
  * bottom-k estimator (Bar-Yossef et al.; see PAPERS.md): keep the k
  * smallest DISTINCT hash values of a stream; if fewer than k were
  * seen the count is exact, else estimate = (k-1) * 2^32 / h_k where
  * h_k is the k-th smallest 32-bit hash. Bounded O(k) buffer with an
  * associative merge => map-side partial aggregation: the sketch shape
  * of COUNT(DISTINCT) at 100 TB (one k-array per group per partition
  * on the wire).
  *
  * Why this exists next to `approx_count_distinct` (q12): HLL sketches
  * are implementation-specific, so that query can only be rows-checked.
  * KMV over md5-derived hashes is ENGINE-PORTABLE — DuckDB can compute
  * the identical k-th smallest hash with a window function — so the
  * ESTIMATE itself is oracle-checkable bit-for-bit, closing the
  * "sketches can't be oracled" gap with a sketch that can.
  */
object SketchAgg {

  /** `vals`: sorted ascending, distinct, length <= k. */
  case class KmvBuf(vals: Array[Long])

  class KMinValues(k: Int) extends Aggregator[Long, KmvBuf, Double] {
    require(k >= 2, "KMV needs k >= 2")

    override def zero: KmvBuf = KmvBuf(Array.empty[Long])

    override def reduce(b: KmvBuf, h: Long): KmvBuf = {
      val v = b.vals
      if (v.length == k && h >= v(v.length - 1)) b
      else {
        val idx = java.util.Arrays.binarySearch(v, h)
        if (idx >= 0) b // hash already kept: distinct semantics
        else {
          // ins < k always: the full-buffer guard above already
          // returned for any h that would land past the kept range
          val ins = -idx - 1
          val newLen = math.min(v.length + 1, k)
          val out = new Array[Long](newLen)
          System.arraycopy(v, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(v, ins, out, ins + 1, newLen - ins - 1)
          KmvBuf(out)
        }
      }
    }

    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      val x = a.vals; val y = b.vals
      val out = new Array[Long](math.min(x.length + y.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < x.length || j < y.length)) {
        val take =
          if (j >= y.length || (i < x.length && x(i) <= y(j))) { val t = x(i); i += 1; t }
          else { val t = y(j); j += 1; t }
        if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
      }
      KmvBuf(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
    }

    override def finish(b: KmvBuf): Double =
      if (b.vals.length < k) b.vals.length.toDouble
      else (k - 1) * 4294967296.0 / math.max(b.vals(k - 1), 1L)

    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Sketch-output twin of [[KMinValues]]: same bounded buffer, same
    * reduce/merge, but FINISHES with the sorted k-minimum hash array
    * instead of the estimate — the shape a sketch STORE serves (per-
    * group sketches roll up to coarser scopes by re-merging arrays,
    * never re-scanning rows). KMV's merge is EXACT: the k smallest of
    * a union of per-group k-smallest sets IS the k smallest of the
    * union — so an estimate derived from merged sketches equals the
    * directly-computed one bit-for-bit (q27_sketch_rollup pins this
    * through the oracle gate).
    */
  class KMinValuesSketch(k: Int) extends Aggregator[Long, KmvBuf, Array[Long]] {
    private val inner = new KMinValues(k)
    override def zero: KmvBuf = inner.zero
    override def reduce(b: KmvBuf, h: Long): KmvBuf = inner.reduce(b, h)
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = inner.merge(a, b)
    override def finish(b: KmvBuf): Array[Long] = b.vals
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** One top-k entry: ranked by `score` DESC, ties to the LOWER `id`. */
  case class TopKRow(score: Long, id: Long, payload: Long)
  case class TopKBuf(rows: Array[TopKRow])

  /** Bounded exact top-k by (score desc, id asc) — the aggregation-
    * state twin of TakeOrderedAndProject for GROUPED top-k: the buffer
    * never holds more than k rows (collect_list-then-slice would buffer
    * the whole group), reduce is an insertion into a k-array, and the
    * merge is associative — so map-side partial aggregation ships at
    * most k rows per group per partition, the property that makes
    * per-group top-k a one-exchange operator at any scale.
    */
  class TopK(k: Int) extends Aggregator[TopKRow, TopKBuf, Seq[TopKRow]] {
    require(k >= 1, "TopK needs k >= 1")

    // (score desc, id asc): r1 before r2?
    private def before(r1: TopKRow, r2: TopKRow): Boolean =
      r1.score > r2.score || (r1.score == r2.score && r1.id < r2.id)

    override def zero: TopKBuf = TopKBuf(Array.empty)

    override def reduce(b: TopKBuf, r: TopKRow): TopKBuf = {
      val v = b.rows
      if (v.length == k && !before(r, v(v.length - 1))) b
      else {
        var ins = 0
        while (ins < v.length && before(v(ins), r)) ins += 1
        val newLen = math.min(v.length + 1, k)
        val out = new Array[TopKRow](newLen)
        System.arraycopy(v, 0, out, 0, ins)
        out(ins) = r
        System.arraycopy(v, ins, out, ins + 1, newLen - ins - 1)
        TopKBuf(out)
      }
    }

    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      val x = a.rows; val y = b.rows
      val out = new Array[TopKRow](math.min(x.length + y.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length) {
        val take =
          if (j >= y.length || (i < x.length && before(x(i), y(j)))) { val t = x(i); i += 1; t }
          else { val t = y(j); j += 1; t }
        out(n) = take; n += 1
      }
      TopKBuf(out)
    }

    override def finish(b: TopKBuf): Seq[TopKRow] = b.rows.toSeq
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[TopKRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKRow]]()
  }
}
