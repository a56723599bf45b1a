package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application — the
  * vocabulary-construction stage of an LLM data pipeline (Sennrich et
  * al. 2016; the greedy apply is the GPT-2 `bpe()` loop — both public
  * algorithms).
  *
  * Distributed shape, and the 100 TB argument: BPE never iterates over
  * the corpus. The ONLY corpus-sized stage is the word-count reduction
  * (map-side partial agg into one hash exchange on the word — the same
  * shuffle class as `dedup_exact`), which collapses 100 TB of text
  * into a word-frequency dictionary whose size tracks VOCABULARY, not
  * corpus bytes (Heaps' law: a few million rows even at web scale).
  * The dictionary is then bounded by `maxWords` (rank by count — the
  * tail it drops is mass-negligible by construction and the bound
  * makes the collect a contract, not an accident) and the merge loop
  * runs on the driver over that dictionary — exactly how production
  * trainers (HuggingFace tokenizers, SentencePiece BPE) are built,
  * because pair-merge iteration is inherently sequential: merge k+1's
  * counts depend on merge k's rewrite. A per-iteration distributed
  * recount would pay `numMerges` shuffles of the SAME small table and
  * still serialize on the argmax; the driver loop is the honest
  * topology. Application back over the corpus is embarrassingly
  * parallel: the merge table broadcasts (a few KB), each task applies
  * greedy ranked merges with a per-partition word memo.
  *
  * Determinism (cross-run AND cross-cluster): the dictionary rank
  * orders by (count desc, word), the merge argmax by (count desc, pair
  * lexicographic) — no hash-map iteration order anywhere in the
  * decision path, so the same corpus always yields the same merge
  * list on any partitioning.
  */
object BpeTrainer {

  /** Word-final marker symbol (Sennrich formulation): lets the model
    * distinguish "er" inside a word from "er" ending one, and makes
    * detokenization lossless for space-separated text.
    *
    * The literal string "&#47;w&gt;"-style sequence CAN occur in real
    * text (this repo ingests HTML), so the trainer refuses to learn
    * any merge whose merged symbol equals the marker — without that
    * guard a corpus rich in literal "</w>" could forge a mid-word
    * symbol string-equal to the marker and make encodeWord apply
    * end-of-word merges mid-word. Single code-point symbols can never
    * collide (the marker is 4 chars), so blocking the merge closes
    * every construction path.
    */
  val EndOfWord = "</w>"

  /** An ordered BPE merge table; rank = position (lower merges first).
    * `merged` is always `left + right`.
    */
  final case class BpeModel(merges: Vector[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.toMap
    /** Final symbol inventory: every single character seen plus one
      * entry per merge (vocabSize = |chars| + |merges|, the knob real
      * tokenizers expose).
      */
    def mergedTokens: Vector[String] = merges.map { case (a, b) => a + b }
  }

  /** Corpus word-frequency dictionary: the one corpus-sized stage.
    * Tokenization matches the repo's convention (`split(text, ' ')`,
    * empty tokens dropped).
    */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** Train `numMerges` merges over the corpus. `maxWords` bounds the
    * driver-side dictionary (rank by count desc, word asc — the
    * deterministic top slice of the mass).
    */
  def train(docs: DataFrame, numMerges: Int, maxWords: Int = 1000000): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxWords > 0, s"maxWords must be > 0, got $maxWords")
    val dict = wordCounts(docs)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(dict.toIndexedSeq, numMerges)
  }

  /** The merge loop over an in-memory word dictionary (exposed for
    * tests and for callers that already hold counts). Each word is a
    * mutable symbol sequence starting as its code points + [[EndOfWord]];
    * each round counts adjacent pairs weighted by word frequency,
    * merges the (count desc, pair asc) argmax everywhere, and records
    * it. Stops early when no pair occurs twice (merging a count-1 pair
    * is noise, and HF/SentencePiece stop there too).
    */
  def trainFromCounts(dict: Seq[(String, Long)], numMerges: Int): BpeModel = {
    // symbol sequences as mutable ArrayBuffers; counts parallel array
    val words = dict.map { case (w, _) =>
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        syms += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      syms += EndOfWord
      syms
    }.toArray
    val counts = dict.map(_._2).toArray
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // pair counts this round (map iteration order never consulted —
      // the argmax below applies an explicit total order)
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val syms = words(wi)
        val c = counts(wi)
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
        wi += 1
      }
      // deterministic argmax: count desc, then lexicographic pair;
      // count-1 pairs are never merged (the early-stop floor)
      var best: (String, String) = null
      var bestCount = 0L
      def pairLess(p: (String, String), q: (String, String)): Boolean = {
        val c1 = p._1.compareTo(q._1)
        c1 < 0 || (c1 == 0 && p._2.compareTo(q._2) < 0)
      }
      pairCounts.foreach { case (p, c) =>
        if (c >= 2 && (p._1 + p._2) != EndOfWord &&
            (best == null || c > bestCount || (c == bestCount && pairLess(p, best)))) {
          best = p; bestCount = c
        }
      }
      if (best == null) exhausted = true
      else {
        merges += best
        val (a, b) = best
        val ab = a + b
        // rewrite every word in place (left-to-right, standard BPE)
        wi = 0
        while (wi < words.length) {
          val syms = words(wi)
          var i = 0
          while (i + 1 < syms.length) {
            if (syms(i) == a && syms(i + 1) == b) {
              syms(i) = ab
              syms.remove(i + 1)
            } else i += 1
          }
          wi += 1
        }
        round += 1
      }
    }
    BpeModel(merges.result())
  }

  /** Greedy ranked-merge segmentation of one word (the GPT-2 `bpe()`
    * loop): repeatedly merge the lowest-rank adjacent pair present
    * until none of the model's merges applies. Ties in rank cannot
    * occur (ranks are distinct by construction); ties in position
    * resolve leftmost-first, matching the trainer's left-to-right
    * rewrite.
    */
  def encodeWord(word: String, model: BpeModel): Vector[String] = {
    val ranks = model.ranks
    var syms = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b += EndOfWord
      b.result()
    }
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i + 1 < syms.length) {
        ranks.get((syms(i), syms(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestAt = i
          case _ => ()
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
          syms.drop(bestAt + 2)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Distributed apply: `doc_id, text -> doc_id, n_words, n_tokens,
    * n_chars` under the model — the sizing pass a dataloader budget
    * runs with a REAL learned vocabulary instead of the whitespace /
    * regex approximations of `text_tokens`. Map-side only: the merge
    * table rides a broadcast local value, and each partition memoizes
    * word segmentations (Zipf makes the memo hit rate enormous).
    */
  def tokenCounts(spark: SparkSession, docs: DataFrame, model: BpeModel): DataFrame = {
    import spark.implicits._
    val bcModel = spark.sparkContext.broadcast(model)
    // null-tolerant like the SQL stage-1 formulation: a NULL text is an
    // empty doc, a NULL doc_id is dropped (it could not be unboxed)
    docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .where(col("doc_id").isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bcModel.value
        val memo = new java.util.HashMap[String, Integer]()
        it.map { case (id, text) =>
          var nWords = 0L
          var nTokens = 0L
          var nChars = 0L
          text.split(" ").foreach { w =>
            if (w.nonEmpty) {
              nWords += 1
              // code points, matching Spark length() and the symbol split
              nChars += w.codePointCount(0, w.length)
              var t = memo.get(w)
              if (t == null) {
                t = Integer.valueOf(encodeWord(w, m).length)
                // bounded memo: Zipf puts nearly all hits in the head,
                // so a cap costs ~nothing and a pathological all-unique
                // partition can't grow the map without limit
                if (memo.size < (1 << 20)) memo.put(w, t)
              }
              nTokens += t.intValue()
            }
          }
          (id, nWords, nTokens, nChars)
        }
      }
      .toDF("doc_id", "n_words", "n_tokens", "n_chars")
  }
}
