package graft

import graft.operators.BpeTrainer
import graft.operators.BpeTrainer.{BpeModel, EndOfWord}

/** BPE trainer + greedy apply: the Sennrich fixture's pinned merge
  * table, deterministic tie-breaks, the count-1 early-stop floor,
  * partition-invariance of training, code-point (not UTF-16 unit)
  * symbol splits, and tokenCounts cross-checked against encodeWord.
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  // The worked example from Sennrich et al. 2016 §3.2 (public paper).
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("sennrich fixture: first five merges, in order") {
    val m = BpeTrainer.trainFromCounts(sennrich, 5)
    // Hand-derived: (e,s) ties (s,t),(t,</w>) at 9 and wins
    // lexicographically; then the chain folds; then the low/lower stem.
    assert(m.merges === Vector(
      ("e", "s"), ("es", "t"), ("est", EndOfWord), ("l", "o"), ("lo", "w")))
  }

  test("encodeWord applies ranked merges greedily") {
    val m = BpeTrainer.trainFromCounts(sennrich, 5)
    assert(BpeTrainer.encodeWord("lowest", m) === Vector("low", "est" + EndOfWord))
    assert(BpeTrainer.encodeWord("low", m) === Vector("low", EndOfWord))
    // unseen word falls back to characters + any applicable merges
    assert(BpeTrainer.encodeWord("xy", m) === Vector("x", "y", EndOfWord))
  }

  test("count-1 pairs are never merged (early stop)") {
    // every pair occurs exactly once — the trainer must stop at zero
    val m = BpeTrainer.trainFromCounts(Seq(("abc", 1L)), 10)
    assert(m.merges.isEmpty)
    // and a word whose repeat puts pairs at 2 does merge
    val m2 = BpeTrainer.trainFromCounts(Seq(("ab", 2L)), 10)
    assert(m2.merges.nonEmpty)
  }

  test("numMerges bounds the table; mergedTokens tracks it") {
    val m = BpeTrainer.trainFromCounts(sennrich, 3)
    assert(m.merges.length === 3)
    assert(m.mergedTokens === Vector("es", "est", "est" + EndOfWord))
  }

  test("symbols split on code points, not UTF-16 units") {
    // U+1D11E (musical G clef) is a surrogate pair; a UTF-16-unit split
    // would produce two lone surrogates and corrupt every merge
    val clef = new String(Character.toChars(0x1D11E))
    val m = BpeTrainer.trainFromCounts(Seq((clef + "a", 2L)), 2)
    // ("a","</w>") ties (clef,"a") at 2 and wins lexicographically;
    // the clef then merges as ONE symbol — a UTF-16-unit split would
    // have produced lone-surrogate symbols and a different table
    assert(m.merges === Vector(("a", EndOfWord), (clef, "a" + EndOfWord)))
    assert(BpeTrainer.encodeWord(clef + "a", m) === Vector(clef + "a" + EndOfWord))
  }

  test("training is invariant to corpus partitioning") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog ${i % 7}"))
    val a = BpeTrainer.train(docs.toDF("doc_id", "text"), 30)
    val b = BpeTrainer.train(docs.toDF("doc_id", "text").repartition(13), 30)
    assert(a.merges === b.merges)
  }

  test("tokenCounts matches encodeWord word-by-word") {
    val texts = Seq(
      "low lower lowest",
      "newest widest  newest", // double space: empty token dropped
      "")
    val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      .toDF("doc_id", "text")
    val m = BpeTrainer.trainFromCounts(sennrich, 5)
    val got = BpeTrainer.tokenCounts(spark, docs, m)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val expected = texts.zipWithIndex.map { case (text, i) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      ((i + 1).toLong, ws.length.toLong,
        ws.map(w => BpeTrainer.encodeWord(w, m).length.toLong).sum,
        ws.map(_.length.toLong).sum)
    }.toArray
    assert(got === expected)
    // and one fully hand-pinned row: "low lower lowest" ->
    // [low </w>] [low e r </w>] [low est</w>] = 8 tokens, 14 chars
    assert(got(0) === ((1L, 3L, 8L, 14L)))
  }

  test("a merge can never forge the EndOfWord marker") {
    // literal "</w>" inside corpus words: without the guard the trainer
    // would learn a mid-word symbol string-equal to the marker
    val m = BpeTrainer.trainFromCounts(Seq(("x</w>y", 5L), ("z</w>", 4L)), 50)
    assert(!m.mergedTokens.contains(EndOfWord))
    // segmentation of such a word stays well-formed (ends at the real marker)
    val toks = BpeTrainer.encodeWord("x</w>y", m)
    assert(toks.mkString === "x</w>y" + EndOfWord)
  }

  test("tokenCounts tolerates null text and drops null doc_id") {
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "low low"),
      (java.lang.Long.valueOf(2L), null: String),
      (null: java.lang.Long, "ignored"))
      .toDF("doc_id", "text")
    val m = BpeTrainer.trainFromCounts(sennrich, 5)
    val got = BpeTrainer.tokenCounts(spark, docs, m)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array((1L, 2L, 4L, 6L), (2L, 0L, 0L, 0L)))
  }

  test("model trains end-to-end on the documents table") {
    val docs = Tables.documents(spark, sf0001)
    val m = BpeTrainer.train(docs, 50)
    assert(m.merges.length === 50)
    // apply produces one row per doc with tokens >= words (a word is
    // never fewer than one token) and tokens <= chars + words (</w>)
    val rows = BpeTrainer.tokenCounts(spark, docs, m)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length === docs.count())
    rows.foreach { case (_, w, t, c) =>
      assert(t >= w); assert(t <= c + w)
    }
  }

  test("pinned disjoint merge table: the bpe_apply_fixed oracle's arithmetic cases") {
    // The bpe_apply_fixed query leans on per-rule-disjoint characters
    // making BPE's merge count equal non-overlapping substring counts;
    // these pin the interacting shapes that equality rests on —
    // leftmost-first at equal rank, same-char runs, merged outputs not
    // re-pairing, and the end-of-word merge.
    val model = BpeModel(Vector(
      ("o", "r"), ("t", "h"), ("a", "n"), ("u", "m"), ("v", "e"),
      ("s", "c"), ("w", "i"), ("l", "l"), ("g", "g"), ("p", EndOfWord)))
    def toks(w: String) = BpeTrainer.encodeWord(w, model)
    assert(toks("vector") === Vector("ve", "c", "t", "or", EndOfWord))
    assert(toks("scan") === Vector("sc", "an", EndOfWord))
    assert(toks("small") === Vector("s", "m", "a", "ll", EndOfWord))
    assert(toks("lll") === Vector("ll", "l", EndOfWord)) // leftmost, no re-pair
    assert(toks("agg") === Vector("a", "gg", EndOfWord))
    assert(toks("group") === Vector("g", "r", "o", "u", "p" + EndOfWord))
    assert(toks("oorr") === Vector("o", "or", "r", EndOfWord)) // single occurrence
    assert(toks("oror") === Vector("or", "or", EndOfWord))
    assert(toks("thor") === Vector("th", "or", EndOfWord))
    assert(toks("pp") === Vector("p", "p" + EndOfWord)) // only the LAST p merges EOW
  }
}
