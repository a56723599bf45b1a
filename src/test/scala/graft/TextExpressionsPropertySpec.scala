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
    // term_count twin: the size(filter(...)) HOF it replaces on the
    // standing-query gate's hot path; the empty term exercises the
    // consecutive-space empty-token semantics
    val declTermA = size(filter(ws, x => x === "a")).cast("long")
    val declTermEmpty = size(filter(ws, x => x === "")).cast("long")
    val cmp = docs.select(
      (TextExpressions.phrase_count(col("text"), "a", "b") === declPhrase).as("ph_eq"),
      (TextExpressions.term_count(col("text"), "a") === declTermA).as("t1_eq"),
      (TextExpressions.term_count(col("text"), "") === declTermEmpty).as("t2_eq"),
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
    cmp.forall(r => (0 to 8).forall(r.getBoolean))
  }

  test("native expressions equal their declarative twins on adversarial strings") {
    val prop = Prop.forAll(Gen.listOfN(8, genText))(texts => declarativeEqual(texts))
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("known hostile fixtures: empty, single space, all-space, trailing space") {
    assert(declarativeEqual(Seq("", " ", "   ", "a ", " a", "a  b", "ab")))
  }

  test("cdc_chunk_hashes equals the filter/transform/slice/md5 HOF chain") {
    // the declarative twin dedup_cdc_chunks shipped with (and the
    // DuckDB oracle still replays): coin = md5 of the w-token window
    // opens with hex '0', boundary after token i+w-1 iff interior,
    // chunk hashes between consecutive boundaries
    def equal(texts: Seq[String], w: Int): Boolean = {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val cmp = docs
        .withColumn("ws", split(col("text"), " "))
        .withColumn("n", size(col("ws")))
        .withColumn("bs", expr(
          s"""filter(transform(
             |  CASE WHEN n >= $w THEN sequence(1, n - ${w - 1}) ELSE array() END,
             |  i -> CASE WHEN i + ${w - 1} < n AND
             |    substring(md5(concat_ws(' ', slice(ws, i, $w))), 1, 1) = '0'
             |    THEN i + ${w - 1} END),
             |  x -> x IS NOT NULL)""".stripMargin))
        .withColumn("bb", expr("concat(array(0), bs, array(n))"))
        .withColumn("decl", expr(
          """transform(sequence(1, size(bb) - 1), k ->
             |  md5(concat_ws(' ', slice(ws, element_at(bb, k) + 1,
             |    element_at(bb, k + 1) - element_at(bb, k)))))""".stripMargin))
        .select(
          (TextExpressions.cdc_chunk_hashes(col("text"), w) === col("decl")).as("eq"))
        .collect()
      cmp.forall(_.getBoolean(0))
    }
    // longer docs than genText's 12 tokens so boundaries actually fire
    // (p = 1/16 per window); w=3 makes them dense, w=8 is the query's
    val genLongText = for {
      n <- Gen.choose(1, 40)
      ws <- Gen.listOfN(n, genWord)
    } yield ws.mkString(" ")
    val prop = Prop.forAll(Gen.listOfN(6, genLongText)) { texts =>
      equal(texts, 3) && equal(texts, 8)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
    // hostile fixtures: empty, all-space, sub-window, exactly window,
    // window+1 (the interiority guard's edge)
    assert(equal(Seq("", " ", "a b c", "a b c d e f g h", "a b c d e f g h i"), 8))
  }

  test("phrase_runs equals the window/collect_list formulation on adversarial strings") {
    // the exact shape corpus_keyphrases replaced: posexplode -> per-doc
    // cumulative stopword count -> filter -> collect_list join. "a" is
    // in the stop list AND the fuzz alphabet, so run breaks at every
    // boundary class; "" (doubled spaces) must stay a NON-stopword.
    val stop = Seq("the", "a", "of")
    import org.apache.spark.sql.expressions.Window
    def declarative(docs: org.apache.spark.sql.DataFrame) = {
      val tok = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      tok.withColumn("st", col("w").isin(stop: _*))
        .withColumn("run", sum(col("st").cast("long")).over(wDoc))
        .filter(!col("st"))
        .groupBy(col("doc_id"), col("run"))
        .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("pws"),
          count(lit(1)).as("len"))
        .select(col("doc_id"),
          expr("array_join(transform(pws, x -> x.w), ' ')").as("phrase"),
          col("len"))
    }
    def native(docs: org.apache.spark.sql.DataFrame) =
      docs.select(col("doc_id"),
          explode(TextExpressions.phrase_runs(col("text"), stop)).as("pr"))
        .select(col("doc_id"), col("pr.phrase").as("phrase"), col("pr.len").as("len"))
    def equal(texts: Seq[String]): Boolean = {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, String, Long)].collect().toSeq.sorted
      rows(declarative(docs)) == rows(native(docs))
    }
    val prop = Prop.forAll(Gen.listOfN(8, genText))(equal)
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
    // hostile fixtures: all-stopword doc (no runs), leading/trailing
    // stopwords, doubled spaces inside a run, single token
    assert(equal(Seq("the a of", "a b b a", "b  b", "of x of", "x", "", " ")))
  }

  test("phrase_runs with an empty stop list keeps empty tokens as non-stopwords") {
    // an empty stop CSV (or a trailing comma) must NOT insert "" into
    // the stop set: doubled spaces yield empty tokens that stay part
    // of the run, exactly like isin() over an empty list. The whole
    // doc is then one run whose phrase round-trips the raw text.
    def oneRun(text: String): Seq[(String, Long)] =
      spark.range(1).select(
          explode(TextExpressions.phrase_runs(lit(text), Seq.empty)).as("pr"))
        .select(col("pr.phrase"), col("pr.len"))
        .as[(String, Long)].collect().toSeq
    assert(oneRun("a  b") == Seq(("a  b", 3L)))
    assert(oneRun("the a of") == Seq(("the a of", 3L)))
    assert(oneRun(" x ") == Seq((" x ", 3L)))
    // SQL registration path with a literal trailing comma: "the" stops,
    // the empty entry does not
    TextExpressions.register(spark)
    val viaSql = spark.sql(
      "SELECT phrase_runs('x  y the z', 'the,') AS pr").head()
      .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(viaSql == Seq(("x  y", 3L), ("z", 1L)))
  }

  test("TextIndex.bucketOf equals engine xxhash64 bucketing on adversarial strings") {
    // the probe set is resolved DRIVER-side from this hash; a drift
    // would silently read the wrong bucket directories and return an
    // empty posting frame (ScalePostureSpec pins the three production
    // terms; this is the edge-case net: unicode, empty string,
    // surrogate-bearing text, long tokens)
    val prop = Prop.forAll(Gen.listOfN(24,
        Gen.frequency(
          6 -> Gen.alphaNumStr.map(_.take(40)),
          2 -> Gen.oneOf("", " ", "héllo", "日本語のテキスト", "ø😀", "\u0000"),
          2 -> Gen.listOfN(64, Gen.oneOf('x', 'y')).map(_.mkString)))) { terms0 =>
      val terms = terms0.distinct
      val viaSpark = terms.zipWithIndex.map { case (t, i) =>
        pmod(xxhash64(lit(t)), lit(graft.operators.TextIndex.NumBuckets.toLong))
          .as(s"b$i") }
      val row = spark.range(1).select(viaSpark: _*).head()
      terms.indices.forall { i =>
        graft.operators.TextIndex.bucketOf(terms(i)) == row.getLong(i)
      }
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
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

  // ---- extract_anchors anti-drift armor --------------------------------

  /** The pre-r16 links-ONLY walk, verbatim — the reference twin for the
    * unified anchors walk (the cdc/word_chunks HOF-twin precedent):
    * `extractAnchorPairs(html).map(_._1)` must equal this on ANY input,
    * or the anchor-text extension changed which anchors are live.
    */
  private def legacyLinks(html: String): Seq[String] = {
    val n = html.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def matches(at: Int, s: String): Boolean =
      html.regionMatches(true, at, s, 0, s.length)
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
    def nameEndsAt(at: Int): Boolean =
      at >= n || { val c = html.charAt(at); c == '>' || c == '/' || isWs(c) }
    var i = 0
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (matches(i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (matches(i, "<script") && nameEndsAt(i + 7)) {
          var e = i + 7
          while (e < n && !(matches(e, "</script") && nameEndsAt(e + 8))) e += 1
          i = if (e >= n) n else { val g = html.indexOf('>', e); if (g < 0) n else g + 1 }
        } else if (matches(i, "<style") && nameEndsAt(i + 6)) {
          var e = i + 6
          while (e < n && !(matches(e, "</style") && nameEndsAt(e + 7))) e += 1
          i = if (e >= n) n else { val g = html.indexOf('>', e); if (g < 0) n else g + 1 }
        } else if (matches(i, "<a") && nameEndsAt(i + 2)) {
          var j = i + 2
          var href: String = null
          var done = false
          while (j < n && !done) {
            val c = html.charAt(j)
            if (c == '>') done = true
            else if (isWs(c) || c == '/') j += 1
            else {
              val ns = j
              while (j < n && {
                val c2 = html.charAt(j)
                !isWs(c2) && c2 != '=' && c2 != '>' && c2 != '/'
              }) j += 1
              val name = html.substring(ns, j)
              while (j < n && isWs(html.charAt(j))) j += 1
              var value: String = null
              if (j < n && html.charAt(j) == '=') {
                j += 1
                while (j < n && isWs(html.charAt(j))) j += 1
                if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                  val q = html.charAt(j); j += 1
                  val vs = j
                  while (j < n && html.charAt(j) != q) j += 1
                  value = html.substring(vs, j)
                  if (j < n) j += 1
                } else {
                  val vs = j
                  while (j < n && {
                    val c2 = html.charAt(j); !isWs(c2) && c2 != '>'
                  }) j += 1
                  value = html.substring(vs, j)
                }
              }
              if (href == null && value != null && name.equalsIgnoreCase("href"))
                href = TextExpressions.decodeEntitiesString(value)
            }
          }
          if (href != null) out += href
          i = if (j < n) j + 1 else n
        } else {
          val g = html.indexOf('>', i)
          i = if (g < 0) n else g + 1
        }
      } else i += 1
    }
    out.toSeq
  }

  test("extract_anchors: href parity with the pre-r16 walk + anchor invariants, fuzzed") {
    val genFrag: Gen[String] = Gen.frequency(
      4 -> Gen.oneOf("/a", "p.html", "/x?a=1&amp;b=2", "", "/q'", "#f")
        .map(u => s"""<a href="$u">"""),
      2 -> Gen.const("</a>"),
      3 -> Gen.oneOf("see", "x y", "&amp;", "&#65;", "1 < 2", "a > b", "日本", " ", "\n\t"),
      1 -> Gen.const("<a>"),
      1 -> Gen.const("<A HREF='/up' href=\"/dupe\">"),
      1 -> Gen.const("<a href=/bare rel=x>"),
      1 -> Gen.const("<a name=only>"),
      1 -> Gen.const("<!-- <a href=\"/c\">x</a> -->"),
      1 -> Gen.const("<!-- unterminated"),
      1 -> Gen.const("<script>var u=\"</a><a href='/d'>\";</script>"),
      1 -> Gen.const("<style>a{content:\"</a>\"}</style>"),
      1 -> Gen.const("<script>unterminated"),
      1 -> Gen.const("<b>"), 1 -> Gen.const("</b>"),
      1 -> Gen.const("<"), 1 -> Gen.const(">"),
      1 -> Gen.const("<abbr href=/no>"))
    val genHtml: Gen[String] =
      Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, genFrag).map(_.mkString))
    val prop = Prop.forAll(genHtml) { html =>
      val pairs = TextExpressions.extractAnchorPairs(html)
      val hrefParity = pairs.map(_._1) == legacyLinks(html)
      // anchor text invariants: tags never leak ('<' always opens a
      // skipped construct), whitespace is collapsed and trimmed
      val wellFormed = pairs.forall { case (_, a) =>
        !a.contains('<') && a == a.trim && !a.contains("  ") &&
          !a.exists(c => c == '\t' || c == '\n' || c == '\r' || c == '\f')
      }
      hrefParity && wellFormed
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(400), prop)
    assert(res.passed, res.status.toString)
  }
}
