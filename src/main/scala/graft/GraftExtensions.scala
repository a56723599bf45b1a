package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-driven installation of graft's native expressions — the
  * deployment path for pure-SQL surfaces (spark-sql shell, Thrift/
  * Connect servers, notebook clusters) where no Scala code runs to
  * call `TextExpressions.register`:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * injects every native function (`word_shingles`, `distinct_shingles`,
  * `distinct_shingle_structs`, `simhash32`, `minhash_slices`,
  * `top_gram_frac`, `word_chunks`, `dot_product`) into each new
  * session's registry at build time. The builders are the SAME lists the session-level
  * `register` helpers use (`TextExpressions.functionBuilders` /
  * `VectorExpressions.functionBuilders`), so the two installation paths
  * expose one definition per function.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    (graft.functions.TextExpressions.functionBuilders ++
        graft.functions.VectorExpressions.functionBuilders)
      .foreach { case (name, builder) =>
        ext.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo(classOf[GraftExtensions].getName, name),
          builder))
      }
}
