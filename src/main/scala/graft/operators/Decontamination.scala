package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Benchmark decontamination — the eval-set-leak check every
  * large-scale training-data pipeline runs before training: a training
  * document that shares a long verbatim word n-gram with a benchmark
  * (eval) document is flagged as contaminated, because training on it
  * inflates the benchmark score without measuring generalization. This
  * is the GPT-3/PaLM-style n-gram collision rule (13-grams there;
  * parameterized here — short documents want a smaller n).
  *
  * Spark shape: the benchmark side is distilled to its DISTINCT gram
  * set once; the corpus side explodes each doc's distinct grams
  * (native one-pass `DistinctShingles` expression — no HOF, no
  * per-gram allocation) and inner-joins the benchmark grams. Eval sets
  * are tiny by nature (MBs against a 100 TB corpus), so the join is a
  * map-side BROADCAST hash join by default. Corpus-side cost, honestly
  * accounted: TWO column-pruned map-side scans (the gram explode
  * feeding the join, and a size() projection for the totality base —
  * cheaper at scale than shuffling the ~100x-wider gram set to carry
  * the count through), no shuffle of the gram set itself, and two
  * narrow doc-level shuffles (the per-doc overlap count over MATCHED
  * rows only — tiny on a healthy corpus — and the totality left join).
  * For a corpus-scale reference set
  * (cross-corpus dedup rather than eval decon) pass
  * `broadcastBench = false`: the join becomes a shuffle join on the
  * gram key, which is high-cardinality and therefore skew-safe the
  * same way the shingle join of `dedup_ngram_jaccard` is.
  */
object Decontamination {

  /** The distinct word n-gram set of a benchmark corpus (`text`
    * column). Distinct BEFORE the join: a gram repeated across
    * benchmark docs must not double-count an overlap.
    */
  def benchmarkGrams(bench: DataFrame, n: Int): DataFrame =
    bench.select(explode(TextOps.distinctShinglesOfText(col("text"), n)).as("s"))
      .distinct()

  /** FUZZY decontamination: near-dup detection between a training
    * corpus and a benchmark set — catches lightly paraphrased or
    * partially rewritten eval leaks that the verbatim n-gram rule
    * misses. Same LSH scheme as `dedup_minhash` (native one-pass
    * MinHash signature, 4 bands x 2 slices) so the two dedup surfaces
    * share one banding definition; the difference is the join shape:
    * candidates are TRAIN x BENCH only (never train x train), and the
    * benchmark band table is broadcast, so the corpus side is one scan
    * + map-side join with no self-join anywhere. Per train doc:
    * `n_bench_neardups` = distinct benchmark docs sharing >= 1 band,
    * `is_fuzzy_contaminated` = any. Total function like
    * [[overlapReport]].
    */
  def minhashNearDupReport(train: DataFrame, bench: DataFrame,
      shingleN: Int = 5, broadcastBench: Boolean = true): DataFrame = {
    def bands(docs: DataFrame): DataFrame =
      TextOps.minhashBandRows(docs, shingleN)
    val benchBands = bands(bench)
      .select(col("band_idx"), col("band_hash"), col("doc_id").as("bench_id"))
      .distinct()
    val bb = if (broadcastBench) broadcast(benchBands) else benchBands
    val matches = bands(train).join(bb, Seq("band_idx", "band_hash"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("bench_id")).as("n_bench_neardups"))
    train.select(col("doc_id"))
      .join(matches, Seq("doc_id"), "left")
      .withColumn("n_bench_neardups", coalesce(col("n_bench_neardups"), lit(0L)))
      .withColumn("is_fuzzy_contaminated", (col("n_bench_neardups") >= 1).cast("int"))
  }

  /** The benchmark gram set as a driver-side array (sorted for
    * determinism) — the input to the STREAMING gate, where the set
    * rides into the plan as a broadcast literal instead of a join side.
    * Legal for the same reason the batch join broadcasts: an eval set
    * is MBs against a 100 TB corpus, so O(bench grams) on the driver is
    * the same budget class as the O(k x dim) centroid fetches.
    */
  def collectBenchGrams(bench: DataFrame, n: Int): Array[String] =
    benchmarkGrams(bench, n).orderBy(col("s"))
      .collect().map(_.getString(0))

  /** Compact membership sketch of the benchmark gram set: a Bloom
    * filter over `xxhash64(gram)`, built DISTRIBUTED (the
    * `DataFrameStatFunctions.bloomFilter` treeAggregate — partial
    * sketches merge on executors; only the final ~10-bits-per-item
    * bitmap reaches the driver). `fpp` trades sketch size against how
    * many non-overlapping grams survive the prefilter to be discarded
    * by the exact confirm join.
    */
  def buildGramBloom(bench: DataFrame, n: Int, fpp: Double = 0.01): BloomFilter =
    gramBloom(rawGramStream(bench, n), fpp)

  /** The NON-distinct exploded gram stream of a corpus — input to the
    * sketch build, which deduplicates at the HASH level instead.
    */
  private def rawGramStream(docs: DataFrame, n: Int): DataFrame =
    docs.select(explode(TextOps.distinctShinglesOfText(col("text"), n)).as("s"))

  /** The ONE sketch-build definition (hash choice, sizing count, fpp)
    * over a gram frame (distinct or not) — shared by [[buildGramBloom]]
    * and [[bloomOverlapReport]] so the two can never drift apart on how
    * the sketch is keyed or sized (a drift would not trip the oracle:
    * the confirm join hides it).
    *
    * Dedup happens on `xxhash64(s)` LONGS, not gram strings: the
    * sketch's membership set — the distinct hash set — is identical
    * either way (hashing commutes with dedup), but the distinct's
    * shuffle carries 8-byte keys with map-side partial aggregation
    * instead of ~60-byte gram text; at a 10x duplicate-heavy bench this
    * was the dominant cost of the whole bloom path. Sizing needs the
    * distinct count up front; the deduped hash set is tiny by contract
    * (an eval set vs a 100 TB corpus), so the extra action runs over a
    * frame the cache already holds.
    */
  private def gramBloom(gramStream: DataFrame, fpp: Double): BloomFilter = {
    val h = gramStream.select(xxhash64(col("s")).as("h")).distinct().cache()
    try h.stat.bloomFilter("h", math.max(h.count(), 1L), fpp)
    finally h.unpersist()
  }

  /** [[overlapReport]] with a Bloom PREFILTER between the corpus-side
    * gram explode and the exact confirm join — the scale path when the
    * reference set is large enough that probing a broadcast hash
    * relation per gram is the dominant cost: the sketch is ~80x
    * smaller than a broadcast join relation of the same set, and grams
    * that miss it (the overwhelming majority on a healthy corpus) are
    * dropped map-side inside whole-stage codegen, so the join machinery
    * only ever sees candidate grams.
    *
    * EXACTLY equal to `overlapReport(docs, benchmarkGrams(bench, n),
    * n)` by construction: the sketch is built over `xxhash64(s)` and
    * probed with the same hash of the same distinct-gram definition, so
    * false negatives cannot occur, and every false positive (bloom or
    * xxhash64 collision) is removed by the exact string-equality join.
    * That identity is what lets the same DuckDB oracle hash-check this
    * physically different plan.
    */
  def bloomOverlapReport(docs: DataFrame, bench: DataFrame, n: Int,
      fpp: Double = 0.01): DataFrame = {
    // The sketch builds from the raw gram stream (gramBloom dedups at
    // the hash level and caches only the deduped longs for its sizing
    // count); the string-distinct gram set is derived lazily at query
    // execution as the confirm join's broadcast side — the bench side
    // is shingled twice in total, both passes map-side-cheap, neither
    // shuffling gram text for the sketch.
    val bg = benchmarkGrams(bench, n)
    val bloom = gramBloom(rawGramStream(bench, n), fpp)
    val candidates = docs.select(col("doc_id"),
        explode(TextOps.distinctShinglesOfText(col("text"), n)).as("s"))
      .filter(graft.functions.SketchExpressions
        .bloom_might_contain_long(bloom, xxhash64(col("s"))))
    val overlap = candidates.join(broadcast(bg), Seq("s"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    contaminationReport(docs, overlap, n)
  }

  /** The ONE report tail (totality join + zero-fill + frac + flag)
    * shared by [[overlapReport]] and [[bloomOverlapReport]] — the two
    * paths are documented result-identical, so the rule/rounding must
    * have a single definition.
    */
  private def contaminationReport(docs: DataFrame, overlap: DataFrame,
      n: Int): DataFrame =
    totalityBase(docs, n)
      .join(overlap, Seq("doc_id"), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("overlap_frac", round(col("n_overlap") / col("n_grams"), 6))
      .withColumn("is_contaminated", (col("n_overlap") >= 1).cast("int"))

  /** The per-doc denominator scan shared by [[overlapReport]] and
    * [[bloomOverlapReport]]: (doc_id, n_grams) over docs WITH text.
    * Null-text docs are excluded deliberately — they have no grams on
    * either engine (the oracle's `unnest` over a null token list emits
    * nothing, so such a doc never reaches its `cnt` CTE), and a
    * null-denominator row here would break the cross-engine hash
    * instead of reporting anything useful.
    */
  private def totalityBase(docs: DataFrame, n: Int): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(TextOps.distinctShinglesOfText(col("text"), n)).cast("long").as("n_grams"))

  /** Per-document contamination report over `docs` (`doc_id`, `text`):
    * `n_grams` = the doc's distinct n-gram count, `n_overlap` = how
    * many of those also occur in the benchmark set, `overlap_frac`
    * their ratio, and `is_contaminated` = the strict verbatim-leak
    * rule (any shared n-gram). Docs with zero overlap are reported
    * (count 0), so the output is a total function of the corpus —
    * the filter step is a consumer decision, not baked in here.
    */
  def overlapReport(docs: DataFrame, benchGrams: DataFrame, n: Int,
      broadcastBench: Boolean = true): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(TextOps.distinctShinglesOfText(col("text"), n)).as("s"))
    val bg = if (broadcastBench) broadcast(benchGrams) else benchGrams
    // Inner join first: only matched rows reach the aggregate, so the
    // shuffled row count is proportional to the contamination, not the
    // corpus.
    val overlap = grams.join(bg, Seq("s"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    contaminationReport(docs, overlap, n)
  }
}
