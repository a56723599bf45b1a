package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchAgg.{KMinValues, KmvBuf}

/** KMV sketch unit semantics, driven directly through the Aggregator
  * contract (zero/reduce/merge/finish) — the Spark wiring is covered by
  * the oracled q12b query.
  */
class SketchAggSpec extends AnyFunSuite {

  private def hash(x: Long): Long = {
    // same scheme as the query: first 8 md5 hex chars as uint32
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(x.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }

  private def sketch(k: Int, xs: Seq[Long]): Double = {
    val a = new KMinValues(k)
    a.finish(xs.map(hash).foldLeft(a.zero)(a.reduce))
  }

  test("exact count below k, duplicates collapse") {
    assert(sketch(64, Seq(1L, 2L, 3L)) === 3.0)
    assert(sketch(64, Seq(1L, 2L, 3L, 2L, 1L, 1L)) === 3.0)
    assert(sketch(64, Seq.empty) === 0.0)
  }

  test("merge of partitioned reduces equals the sequential reduce") {
    val a = new KMinValues(16)
    val xs = (1L to 1000L)
    val sequential = xs.map(hash).foldLeft(a.zero)(a.reduce)
    val merged = xs.grouped(137).toSeq
      .map(part => part.map(hash).foldLeft(a.zero)(a.reduce))
      .reduce(a.merge)
    assert(sequential.vals.toSeq === merged.vals.toSeq)
    assert(merged.vals.length === 16)
    assert(merged.vals.toSeq === merged.vals.toSeq.sorted.distinct,
      "buffer contract: sorted ascending, distinct")
  }

  test("merge with an empty buffer is identity") {
    val a = new KMinValues(8)
    val b = (1L to 50L).map(hash).foldLeft(a.zero)(a.reduce)
    assert(a.merge(b, a.zero).vals.toSeq === b.vals.toSeq)
    assert(a.merge(a.zero, b).vals.toSeq === b.vals.toSeq)
  }

  test("estimate lands within KMV error bounds on 10k distinct values") {
    val n = 10000
    val est = sketch(64, (1L to n.toLong))
    // std error ~ 1/sqrt(k-2) ~ 12.7% at k=64; 4 sigma as the hard gate
    assert(math.abs(est - n) / n < 0.51, s"estimate $est too far from $n")
  }

  test("sketch rollup is exact: merged per-group arrays == the direct global sketch") {
    // the q27_sketch_rollup property at the aggregator level: split a
    // stream into arbitrary groups, sketch each, merge the sketches —
    // the result must be the IDENTICAL array the one-pass sketch
    // produces (KMV merge-exactness, not just estimate-closeness)
    val agg = new graft.functions.SketchAgg.KMinValuesSketch(16)
    val hashes = (1L to 500L).map(hash)
    val direct = hashes.foldLeft(agg.zero)(agg.reduce)
    (2 to 7).foreach { parts =>
      val merged = hashes.grouped(hashes.length / parts + 1)
        .map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged).toSeq === agg.finish(direct).toSeq,
        s"$parts-way merge diverged from the sequential sketch")
    }
  }

  test("TopK: bounded buffer, exact selection, split-merge invariance") {
    import graft.functions.SketchAgg.{TopK, TopKRow}
    val agg = new TopK(3)
    // deterministic pseudo-stream with score ties (id breaks them)
    val rows = (1L to 200L).map(i => TopKRow(score = (i * 37) % 50, id = i, payload = i * 2))
    val expected = rows.sortBy(r => (-r.score, r.id)).take(3)
    val direct = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(direct) === expected)
    // the buffer NEVER exceeds k at any point of the fold
    rows.scanLeft(agg.zero)(agg.reduce).foreach(b => assert(b.rows.length <= 3))
    // arbitrary split + merge = the sequential result (associative
    // merge is what licenses map-side partials)
    (2 to 7).foreach { parts =>
      val merged = rows.grouped(rows.length / parts + 1)
        .map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) === expected, s"$parts-way merge diverged")
    }
  }
}
