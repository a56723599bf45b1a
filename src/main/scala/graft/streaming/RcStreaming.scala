package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.RcOps

/** Streaming twin of the reference pipeline (`scanner.py:120-175`) over a
  * Change-schema stream (graft.schema.ChangeSchema.change): Structured
  * Streaming, not DStreams.
  *
  * Mapping (SURVEY.md §2.1):
  *  - F1 streamfilter  -> stateless filter (pushed to the source scan)
  *  - J1 editcount     -> stream-static broadcast join on (user, server_name)
  *  - F2 threshold     -> stateless filter with NULL-disable semantics
  *  - D1 repeat-dedup  -> dropDuplicates("title") with event-time watermark:
  *                        the reference keeps the first flagged title EVER
  *                        (unbounded state, `filter_.py:90-102`); streaming
  *                        bounds state by watermark — documented deviation,
  *                        batch twin (RcOps.firstPerKey) is exact.
  *  - J2 revision text -> stream-static join on revision.new, staged after
  *                        the cheap gates (cheap-predicates-first,
  *                        `scanner.py:131-141`)
  *  - E1 race skip     -> null-text filter (dead-letter side kept)
  *  - R1 regex         -> matched-pattern array, match gate size>0
  *
  * State-store sizing at 100 TB: dedup state is one entry per distinct
  * title inside the watermark horizon; keys hash-partition across
  * executors (RocksDB state store in production), no driver state.
  */
object RcStreaming {

  case class FilterSpec(
      streamfilter: Map[String, Seq[Any]],
      maxEdits: Option[Long],
      skipRepeats: Boolean,
      regexes: Seq[String],
      watermark: String = "1 hour",
      sites: Seq[String] = Nil,
      streams: Seq[String] = Seq("recentchange")) {
    /** The reference force-overwrites the streamfilter's `server_name`
      * with the filter's sites list (`filter_.py:58`) — sites always win
      * over a user-supplied server_name predicate.
      */
    def effectiveStreamfilter: Map[String, Seq[Any]] =
      if (sites.isEmpty) streamfilter
      else streamfilter + ("server_name" -> sites.map(identity[Any]))
  }

  /** C1 config validation at plan-build time (reference:
    * `LOG_LEVEL in [0,3]` else ValueError `scanner.py:70-71`;
    * `skip_repeats` requires `LOG_LEVEL >= 2` else ConfigError
    * `filter_.py:53-55`, `utils.py:46-47` — dedup needs the flag log
    * to exist; here, dedup state needs a checkpoint-backed sink level).
    */
  def validate(logLevel: Int, spec: FilterSpec): Unit = {
    require(logLevel >= 0 && logLevel <= 3,
      s"LOG_LEVEL must be in [0,3], got $logLevel")
    require(!spec.skipRepeats || logLevel >= 2,
      "skip_repeats=true requires LOG_LEVEL >= 2")
  }

  /** Full pipeline: `changes` may be a streaming OR batch DataFrame —
    * the plan is identical (Structured Streaming's batch/stream unification).
    * `users(user, editcount)` and `revisions(revid, text)` are static
    * dimension tables (the API-lookup stand-ins, FIXTURES.md A.3).
    */
  def pipeline(changes: DataFrame, users: DataFrame, revisions: DataFrame,
               spec: FilterSpec, emitDeadLetter: Boolean = false): DataFrame = {
    val filtered = RcOps.streamFilter(changes, spec.effectiveStreamfilter)
      .withColumn("event_time", to_timestamp(col("meta.dt")))

    val enriched = filtered
      .join(broadcast(users), Seq("user"), "left")
      .filter(spec.maxEdits.map(m => col("editcount") <= lit(m)).getOrElse(lit(true)))

    val deduped =
      if (spec.skipRepeats)
        enriched.withWatermark("event_time", spec.watermark)
          .dropDuplicates("title")
      else enriched

    // E1: missing enrichment (page deleted mid-flight) never fails the
    // query. Default: skip-and-continue as the reference does
    // (`scanner.py:77-81`); with emitDeadLetter the skipped rows stay in
    // the frame tagged dead_letter=true so RcSinks can route them to an
    // inspectable side channel instead of losing them.
    val withText = deduped
      .join(broadcast(revisions),
        deduped("revision.new") === revisions("revid"), "left")
      .withColumn("dead_letter", col("text").isNull)

    val pats: Column = filter(array(spec.regexes.map(lit): _*),
      p => regexp_like(col("text"), p))

    val gated = withText
      .withColumn("matched", when(col("dead_letter"), array()).otherwise(pats))
      .filter((size(col("matched")) > 0) ||
        (lit(emitDeadLetter) && col("dead_letter")))

    val out = gated.select(
      col("id"), col("title"), col("user"), col("type"),
      col("revision.new").as("revid"),
      concat_ws(",", col("matched")).as("matched"),
      when(col("dead_letter"), lit(null).cast("string"))
        .otherwise(RcOps.matchMessage(col("matched"), col("meta.uri"))).as("message"),
      to_date(col("meta.dt")).as("event_date"),
      RcOps.sanitizedFilename(col("user"), col("revision.new")).as("filename"),
      col("event_time"), col("text"), col("dead_letter"))
    if (emitDeadLetter) out else out.drop("dead_letter")
  }
}
