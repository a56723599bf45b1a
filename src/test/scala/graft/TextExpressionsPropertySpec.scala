package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

import org.apache.spark.sql.functions._

import graft.functions.TextExpressions
import graft.operators.TextOps

/** Property armor for the native text expressions: each one's only
  * spec is "identical to the declarative formulation it replaced", so
  * fuzz that equality over adversarial strings — empty tokens from
  * doubled/leading/trailing spaces, unicode, single-char docs — where a
  * byte-scan boundary bug would hide. Corpus-level equality is pinned
  * separately in ExtensionInvariantsSpec; this is the edge-case net.
  */
class TextExpressionsPropertySpec extends SparkSpec {
  import spark.implicits._

  // words over a tiny alphabet (forces gram collisions) + unicode +
  // empty words (doubled spaces when joined)
  private val genWord: Gen[String] = Gen.frequency(
    6 -> Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString)),
    2 -> Gen.oneOf("héllo", "日本", "ø"),
    2 -> Gen.const("")) // "" between delimiters = consecutive spaces
  private val genText: Gen[String] = for {
    n <- Gen.choose(1, 12)
    ws <- Gen.listOfN(n, genWord)
  } yield ws.mkString(" ")

  private def declarativeEqual(texts: Seq[String]): Boolean = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val ws = split(col("text"), " ")
    // word_shingles twin: concat_ws over sliced token windows
    val nSh = greatest(size(ws) - lit(4), lit(1))
    val declShingles = transform(sequence(lit(1), nSh),
      i => concat_ws(" ", slice(ws, i, lit(5))))
    // top_gram_frac(2) twin: quadratic count over the 2-gram list
    val grams = zip_with(slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
      slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val declTop2 = when(size(grams) > 0,
      aggregate(grams, lit(0),
        (acc, g) => greatest(acc, size(filter(grams, x => x === g))))
        .cast("double") / size(grams)).otherwise(lit(0.0))
    // word_chunks(4, 3) twin: strided slice windows with the shared
    // closed-form chunk count (ceil((len-size)/stride)+1, floored at 1)
    val nCh = when(size(ws) <= 4, lit(1))
      .otherwise(ceil((size(ws) - lit(4)) / lit(3.0)).cast("int") + 1)
    val declChunks = transform(sequence(lit(1), nCh),
      i => concat_ws(" ", slice(ws, (i - 1) * 3 + 1, lit(4))))
    // phrase_count twin: the HOF lambda-filter it replaced (adjacent
    // ("a", "b") pairs, overlap-counting), guarded for <2-token docs
    val declPhrase = when(size(ws) < 2, lit(0L))
      .otherwise(size(filter(sequence(lit(1), size(ws) - 1),
        i => element_at(ws, i.cast("int")) === "a" &&
          element_at(ws, i.cast("int") + 1) === "b")).cast("long"))
    // term_count_structs twin: the exact explode(array_distinct) +
    // size(filter) formulation it replaced in search_postings /
    // corpus_keywords (empty tokens from doubled spaces INCLUDED —
    // split-on-single-space semantics), as an array so per-doc
    // first-occurrence ORDER is pinned too, not just the multiset
    val declTc = transform(array_distinct(ws),
      t => struct(t.as("term"),
        size(filter(ws, x => x === t)).cast("long").as("tf")))
    val cmp = docs.select(
      (TextExpressions.phrase_count(col("text"), "a", "b") === declPhrase).as("ph_eq"),
      (TextExpressions.term_count_structs(col("text")) === declTc).as("tc_eq"),
      (TextOps.shinglesOfText(col("text"), 5) === declShingles).as("sh_eq"),
      (TextExpressions.word_chunks(col("text"), 4, 3) === declChunks).as("ch_eq"),
      (abs(TextExpressions.top_gram_frac(col("text"), 2) - declTop2) < 1e-12).as("tg_eq"),
      // simhash/minhash declarative twins are heavy; their corpus-level
      // equality specs exist — here just pin total determinism across
      // two evaluations of the native expressions
      (TextExpressions.simhash32_col(col("text")) ===
        TextExpressions.simhash32_col(col("text"))).as("sim_det"),
      (TextExpressions.minhash_slices(col("text"), 5) ===
        TextExpressions.minhash_slices(col("text"), 5)).as("mh_det"))
      .collect()
    cmp.forall(r => (0 to 6).forall(r.getBoolean))
  }

  test("native expressions equal their declarative twins on adversarial strings") {
    val prop = Prop.forAll(Gen.listOfN(8, genText))(texts => declarativeEqual(texts))
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("known hostile fixtures: empty, single space, all-space, trailing space") {
    assert(declarativeEqual(Seq("", " ", "   ", "a ", " a", "a  b", "ab")))
  }

  test("word_chunks rejects gapped windows (stride > size) at construction") {
    // stride > size silently drops tokens AND the closed-form chunk
    // count would index past the last token — must fail loudly, not
    // produce a partial chunking (reachable from SQL via word_chunks)
    val e = intercept[IllegalArgumentException] {
      TextExpressions.word_chunks(col("text"), 2, 5)
    }
    assert(e.getMessage.contains("stride"))
    // stride == size (gapless partition) stays legal
    val parts = Seq((1L, "a b c d e")).toDF("doc_id", "text")
      .select(TextExpressions.word_chunks(col("text"), 2, 2).as("c"))
      .as[Seq[String]].head()
    assert(parts === Seq("a b", "c d", "e"))
  }
}
