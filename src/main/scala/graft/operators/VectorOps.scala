package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives for the similarity-search extensions.
  * Arrays of float are widened to double BEFORE any arithmetic so both
  * engines compute identical IEEE products; cross-engine sum-order
  * differences are absorbed by rounding at the query layer (round 6).
  *
  * All of these are per-row array expressions — the brute-force top-k
  * is a map-side score + a single top-k (TakeOrderedAndProject), the
  * honest 100 TB baseline; the IVF variant prunes the scan to one
  * centroid cell before scoring.
  */
object VectorOps {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-fold dot product — deterministic order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))
}
