package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontamination

/** Benchmark decontamination: the verbatim n-gram leak rule, the
  * total-function contract (zero-overlap docs still reported), and the
  * broadcast shape of the benchmark join.
  */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val benchText = "alpha beta gamma delta epsilon zeta eta theta"

  test("doc sharing a verbatim 8-gram with the benchmark is flagged; clean doc is not") {
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    // doc 1 embeds the full benchmark 8-gram mid-text; doc 2 shares
    // words but never 8 consecutive ones
    val docs = Seq(
      (1L, s"prefix words $benchText and a suffix"),
      (2L, "alpha beta gamma NOPE delta epsilon zeta eta theta iota")
    ).toDF("doc_id", "text")
    val out = Decontamination
      .overlapReport(docs, Decontamination.benchmarkGrams(bench, 8), 8)
      .orderBy("doc_id")
      .select("doc_id", "n_overlap", "is_contaminated")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out.head._1 === 1L && out.head._2 >= 1L && out.head._3 === 1)
    assert(out(1) === ((2L, 0L, 0)))
  }

  test("report is total: every doc appears, zero-overlap docs with count 0") {
    val bench = Seq((9L, benchText)).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "one two three four five six seven eight nine"),
      (2L, "ten eleven twelve thirteen fourteen fifteen sixteen seventeen"),
      (3L, "short doc") // < n tokens: one truncated gram, still reported
    ).toDF("doc_id", "text")
    val out = Decontamination
      .overlapReport(docs, Decontamination.benchmarkGrams(bench, 8), 8)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_overlap", "overlap_frac", "is_contaminated")
      .as[(Long, Long, Long, Double, Int)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L, 3L))
    assert(out.forall(r => r._3 === 0L && r._4 === 0.0 && r._5 === 0))
    assert(out.forall(_._2 >= 1L), "even a short doc has its truncated gram counted")
  }

  test("overlap_frac counts distinct grams once, even if repeated in the doc") {
    val bench = Seq((9L, "a b c d")).toDF("doc_id", "text")
    // the contaminated 4-gram occurs TWICE in the doc; distinct-gram
    // semantics must count it once in both n_grams and n_overlap
    val docs = Seq((1L, "a b c d x a b c d")).toDF("doc_id", "text")
    val out = Decontamination
      .overlapReport(docs, Decontamination.benchmarkGrams(bench, 4), 4)
      .select("n_grams", "n_overlap").as[(Long, Long)].head()
    assert(out._2 === 1L)
    assert(out._1 === 5L) // 5 distinct of 6 total 4-grams ("a b c d" dup collapses)
  }

  test("fuzz: overlap counts equal a brute-force shared-gram check") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def doc() = Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val n = 3
    def grams(t: String): Set[String] = {
      val ws = t.split(" ").toSeq
      if (ws.length < n) Set(ws.mkString(" "))
      else ws.sliding(n).map(_.mkString(" ")).toSet
    }
    for (trial <- 1 to 3) {
      val bench = (100L until 103L).map(i => (i, doc()))
      val docs = (0L until 25L).map(i => (i, doc()))
      val benchGrams = bench.flatMap(b => grams(b._2)).toSet
      val expected = docs.map { case (id, t) =>
        id -> (grams(t) intersect benchGrams).size.toLong }.toMap
      val out = Decontamination.overlapReport(
          docs.toDF("doc_id", "text"),
          Decontamination.benchmarkGrams(bench.toDF("doc_id", "text"), n), n)
        .select("doc_id", "n_overlap").as[(Long, Long)].collect().toMap
      expected.foreach { case (id, e) =>
        assert(out(id) === e, s"doc $id trial $trial") }
    }
  }

  test("corpus-scale path (broadcastBench = false) is result-identical to the broadcast path") {
    // cross-corpus dedup uses the same operators with a reference set
    // too big to broadcast; the shuffle-join path must not change results
    val bench = Seq((100L, benchText), (101L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, s"pad $benchText pad"),
      (2L, "nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen"),
      (3L, "zz one two three four five six seven eight zz")
    ).toDF("doc_id", "text")
    val grams = Decontamination.benchmarkGrams(bench, 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().toSeq
    val broadcastRows = (
      rows(Decontamination.overlapReport(docs, grams, 8)),
      rows(Decontamination.minhashNearDupReport(docs, bench)))
    // Auto-broadcast would silently plan the tiny bench side as a
    // broadcast join anyway, making this test vacuous — disable it so
    // the broadcastBench=false path REALLY shuffles, and assert it did.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val overlapOff = Decontamination.overlapReport(docs, grams, 8, broadcastBench = false)
      val neardupOff = Decontamination.minhashNearDupReport(docs, bench, broadcastBench = false)
      val p = overlapOff.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a genuine shuffle join with auto-broadcast off, plan:\n$p")
      assert(rows(overlapOff) === broadcastRows._1)
      assert(rows(neardupOff) === broadcastRows._2)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("benchmark side joins as a broadcast by default") {
    val bench = Seq((9L, benchText)).toDF("doc_id", "text")
    val docs = Seq((1L, benchText)).toDF("doc_id", "text")
    val plan = Decontamination
      .overlapReport(docs, Decontamination.benchmarkGrams(bench, 8), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark gram join should be broadcast, plan was:\n$plan")
  }

  test("bloom prefilter path is result-identical to the exact path, even at fpp 0.5") {
    // sf0.001 corpus, same bench/train split the oracled queries use.
    // fpp 0.5 floods the gate with false positives on purpose: the
    // exact confirm join must still reduce the report to EXACTLY the
    // unfiltered one — that identity is the whole contract.
    val docs = Tables.documents(spark, sf0001)
    val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val train = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val exact = Decontamination
      .overlapReport(train, Decontamination.benchmarkGrams(bench, 8), 8)
      .orderBy("doc_id").collect().toSeq
    for (fpp <- Seq(0.01, 0.5)) {
      val bloomed = Decontamination.bloomOverlapReport(train, bench, 8, fpp)
        .orderBy("doc_id").collect().toSeq
      assert(bloomed === exact, s"fpp=$fpp diverged from the exact report")
    }
  }

  test("bloom gate sits in the plan as a map-side filter and prunes clean grams") {
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val docs = Seq(
      (1L, s"pad $benchText pad"),
      (2L, "nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen")
    ).toDF("doc_id", "text")
    val report = Decontamination.bloomOverlapReport(docs, bench, 8)
    val plan = report.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"expected the bloom predicate in the physical plan:\n$plan")
    assert(report.orderBy("doc_id").select("is_contaminated")
      .as[Int].collect().toSeq === Seq(1, 0))
  }

  test("null-text docs are excluded from the report, matching the oracle's gram scan") {
    // the DuckDB oracle derives its per-doc denominator FROM the gram
    // rows, so a null-text doc (no grams) never appears there; both
    // report paths must agree or the hash gate breaks on such corpora
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val docs = Seq((1L, s"pad $benchText pad"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val exact = Decontamination
      .overlapReport(docs, Decontamination.benchmarkGrams(bench, 8), 8)
      .select("doc_id").as[Long].collect().toSeq
    val bloomed = Decontamination.bloomOverlapReport(docs, bench, 8)
      .select("doc_id").as[Long].collect().toSeq
    assert(exact === Seq(1L), "null-text doc must not surface a null-denominator row")
    assert(bloomed === exact)
  }

  test("bloom sketch has zero false negatives over its build set") {
    val bloom = Decontamination.buildGramBloom(
      Seq((1L, benchText)).toDF("doc_id", "text"), 4)
    val grams = Decontamination.benchmarkGrams(
      Seq((1L, benchText)).toDF("doc_id", "text"), 4)
    val misses = grams
      .filter(!graft.functions.SketchExpressions
        .bloom_might_contain_long(bloom, xxhash64(col("s"))))
      .count()
    assert(misses === 0L)
  }

  test("property: in_string_set is exact membership; value-equal across builds") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.Test.{check => scCheck, Parameters}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val prop = forAll { (set: List[String], probes: List[String]) =>
      val expr = graft.functions.InStringSet(
        Literal("x"), new graft.functions.StringSet(set.toArray))
      // exact membership for arbitrary unicode strings, hits and misses
      (probes ++ set).forall(p =>
        expr.test(UTF8String.fromString(p)) == set.contains(p))
    }
    assert(scCheck(Parameters.default.withMinSuccessfulTests(50), prop).passed)
    // two independently built sets with equal content (different input
    // order!) must compare/canonicalize equal, like SketchBytes
    val a = graft.functions.InStringSet(
      Literal(7L), new graft.functions.StringSet(Array("b", "a", "c")))
    val b = graft.functions.InStringSet(
      Literal(7L), new graft.functions.StringSet(Array("c", "a", "b")))
    assert(a === b && a.canonicalized === b.canonicalized && a.semanticEquals(b))
    // duplicate multiplicity and nulls must not break value equality:
    // the constructor canonicalizes to a sorted distinct non-null set
    val c = new graft.functions.StringSet(Array("a", "a", null, "b", "c", "b"))
    val d = new graft.functions.StringSet(Array("c", "b", "a"))
    assert(c === d && c.hashCode === d.hashCode)
    assert(c.probe.size === 3)
  }

  test("identically built bloom predicates are value-equal and canonicalize together") {
    // Two expressions carrying byte-identical sketches must compare
    // equal (content equality via SketchBytes, not array reference
    // equality) — that's what lets Catalyst canonicalization, common
    // subexpression elimination, and exchange reuse fire on plans that
    // mention the same sketch twice.
    import org.apache.spark.sql.catalyst.expressions.Literal
    val bench = Seq((1L, benchText)).toDF("doc_id", "text")
    // build the sketch twice: two DISTINCT byte arrays with equal content
    def pred() = {
      val bos = new java.io.ByteArrayOutputStream()
      Decontamination.buildGramBloom(bench, 4).writeTo(bos)
      graft.functions.BloomMightContainLong(
        Literal(7L), new graft.functions.SketchBytes(bos.toByteArray))
    }
    val (a, b) = (pred(), pred())
    assert(!(a.sketch.bytes eq b.sketch.bytes), "test must exercise two arrays")
    assert(a === b, "semantically identical bloom predicates must be equal")
    assert(a.canonicalized === b.canonicalized,
      "canonicalized forms must match for plan/exchange reuse")
    assert(a.semanticEquals(b))
  }
}
