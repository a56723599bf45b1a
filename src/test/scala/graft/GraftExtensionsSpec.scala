package graft

import org.apache.spark.sql.SparkSession

/** The config-driven extensions path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must expose every
  * native function on its SQL surface without any Scala-side register
  * call — and the results must match the session-registered path.
  */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtensionsSession[A](body: SparkSession => A): A = {
    val base = spark // force the shared fixture session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // Same JVM + same SparkContext, but a FRESH SparkSession built
      // through the extensions hook. `withExtensions` drives the same
      // injection entry point the static `spark.sql.extensions` conf
      // does in a real deployment (that conf is read from the
      // SparkContext at its creation, so it cannot be exercised against
      // a context another suite already started).
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      body(s)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("extensions session exposes every native function via pure SQL") {
    withExtensionsSession { s =>
      val row = s.sql(
        """SELECT
          |  word_shingles('a b c d e f', 5) AS sh,
          |  size(distinct_shingles('a b a b a b', 2)) AS nd,
          |  simhash32('alpha beta gamma') AS sim,
          |  minhash_slices('a b c d e f', 5) AS mh,
          |  top_gram_frac('a b a b a b', 2) AS tg,
          |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
          |  term_count_structs('a b a') AS tc,
          |  phrase_runs('x y the z', 'the,a,of') AS pr
          |""".stripMargin).head()
      assert(row.getSeq[String](0) === Seq("a b c d e", "b c d e f"))
      assert(row.getInt(1) === 2) // distinct 2-grams: "a b", "b a"
      assert(row.getSeq[String](3).length === 8)
      assert(row.getDouble(5) === 11.0)
      val tc = row.getSeq[org.apache.spark.sql.Row](6)
      assert(tc.map(r => (r.getString(0), r.getLong(1))) === Seq("a" -> 2L, "b" -> 1L))
      val pr = row.getSeq[org.apache.spark.sql.Row](7)
      assert(pr.map(r => (r.getString(0), r.getLong(1))) === Seq("x y" -> 2L, "z" -> 1L))
    }
  }

  test("extensions results match the session-registered builders exactly") {
    graft.functions.TextExpressions.register(spark)
    val viaRegister = spark.sql(
      "SELECT simhash32('one two three four') AS x, " +
        "word_shingles('one two three four', 3) AS y").head()
    withExtensionsSession { s =>
      val viaExtensions = s.sql(
        "SELECT simhash32('one two three four') AS x, " +
          "word_shingles('one two three four', 3) AS y").head()
      assert(viaExtensions === viaRegister)
    }
  }

  test("session-level register() still installs after the builder-list refactor") {
    graft.functions.TextExpressions.register(spark)
    assert(spark.sql("SELECT size(word_shingles('a b c', 2)) AS n").head().getInt(0) === 2)
  }
}
