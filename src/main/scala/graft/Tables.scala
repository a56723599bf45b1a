package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Parquet carries its own schema; we read it as-is (deterministic, no
  * inference pass). At 100 TB these would be partitioned/bucketed table
  * scans — the reader API is identical, only the path changes, and all
  * filters/projections issued downstream are pushed into the scan by
  * Catalyst (verified via `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  /** Memo for [[load]]: the CONSTRUCTED DataFrame per (session, path,
    * freshness stamp). `spark.read.parquet` is not free on the driver —
    * every call re-resolves the data source, re-lists the path, and
    * re-reads a footer for the schema (~30–60 ms per table on this
    * box), and the suite calls it 1–5 times per query per rep, so a
    * bench pass paid seconds of repeated driver-side metadata work for
    * identical plans (measured via the DevProbe build/plan/exec split:
    * q2_join_agg spent 0.3 s of its 0.7 s wall CONSTRUCTING the frame).
    * Reusing the immutable DataFrame is the catalog-table idiom (a
    * production session resolves a table once); every action on it
    * still reads the parquet — this caches plan metadata, never data
    * or results. Keyed by the same freshness stamp as
    * [[parquetVersion]] (one recursive metadata listing per call —
    * microseconds on any store vs the footer read it avoids), so an
    * in-place rewrite misses and rebuilds; keyed by sessionUUID so a
    * frame never crosses sessions (bounded: #sessions x #tables).
    */
  private val frameMemo = // weak session key: a stopped session's frames GC away
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame)]]())

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val stamp =
      try stampedRowCount(spark, path)._1
      catch { case _: Throwable => // missing path: let read.parquet throw its own error
        return spark.read.parquet(path)
      }
    val perSession = {
      val existing = frameMemo.get(spark)
      if (existing != null) existing
      else frameMemo.synchronized {
        val again = frameMemo.get(spark)
        if (again != null) again
        else {
          val fresh = new java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame)]()
          frameMemo.put(spark, fresh)
          fresh
        }
      }
    }
    val cached = perSession.get(path)
    if (cached != null && cached._1 == stamp) cached._2
    else {
      val df = spark.read.parquet(path)
      perSession.put(path, (stamp, df)) // replaces any superseded entry
      df
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")

  /** The `Change`-stream analog (reference `utils.py:18-36`):
    * `event_type`<->`type`, `user_id`<->`user`, `ts`<->`meta.dt`,
    * `props` (JSON string)<->nested meta.
    *
    * `ts` has shipped as TWO physical types across data drops, so the
    * loader adapts to what the footer says instead of assuming one:
    *   - TIMESTAMP(NANOS): Spark's reader rejects it outright; read as
    *     raw nanos (legacy conf, set at runtime so any session works)
    *     and truncate to microseconds with integer division — the same
    *     ns->us truncation DuckDB applies. Integer `div`, NOT double
    *     division: epoch-nanos (~1.7e18) overflow a double's 53-bit
    *     mantissa.
    *   - TIMESTAMP(MICROS) (isAdjustedToUTC=false): Spark reads it
    *     natively as TIMESTAMP_NTZ; cast to the session-local TIMESTAMP
    *     (session tz pinned UTC in build.sbt/Verify) so downstream
    *     window/date arithmetic and the DuckDB oracle see the same
    *     instants either way.
    * Either path lands on TimestampType micros — consumers and oracles
    * are physical-type agnostic.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // Session-conf mutation, guarded set-once: the NANOS footer type is
    // unreadable without this conf, so the loader must own it, but a
    // loader re-setting a session conf on every call is a global side
    // effect on the shared session (another user reading a genuine
    // nanos column elsewhere would be silently affected by the timing
    // of OUR calls). Idempotent + checked first, so after the first
    // events() call the session is never mutated again.
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as raw nanos
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => raw // already session-local TimestampType
    }
  }

  /** Revision-text analog (reference `scanner.py:178-196`): the corpus the
    * regex stage (`filter_.py:110-112`) and the text-analysis /
    * dedup extension operators run over.
    */
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")

  /** 64-dim float vectors for the similarity-search extension. */
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Exact row count of a parquet file/directory from FOOTER METADATA
    * only — no Spark job, no data pages read. Sizing decisions that
    * need `n` (e.g. the IVF k ~ sqrt(n) rule in operators.Similarity)
    * were paying a full-scan COUNT job for one Long; the count is
    * already sitting in every footer's row-group headers. Driver-side
    * cost is O(#files) metadata reads — the same listing the scan
    * itself performs.
    */
  /** Memo for [[parquetRowCount]]: keyed on the PATH, holding the
    * count together with a freshness stamp of (root mtime, root
    * length, data-file count, max data-file mtime, total data bytes).
    * A rewrite of the path misses the stamp and re-counts — including
    * a same-millisecond rewrite (coarse-mtime filesystems, Spark's
    * rename-commit) that leaves the ROOT's mtime unchanged: the child
    * listing the stamp folds in is the same recursive listing the
    * counting pass performs anyway, so a miss pays nothing extra and a
    * hit pays one listing instead of opening every footer. Keying on
    * the path (stamp in the VALUE) also means a rewrite evicts the
    * superseded entry instead of accumulating one memo row per
    * rewrite forever.
    */
  private val rowCountMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  /** Shared body of [[parquetRowCount]] / [[parquetVersion]]: one
    * recursive listing -> freshness stamp; footer count memoized
    * against that stamp.
    */
  private def stampedRowCount(spark: SparkSession, path: String): (String, Long) = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val rootSt = fs.getFileStatus(root)
    def files(p: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val st = fs.getFileStatus(p)
      if (st.isFile) Seq(st)
      else fs.listStatus(p).toIndexedSeq.flatMap { c =>
        val name = c.getPath.getName
        // skip hidden/metadata entries the parquet reader also skips
        if (name.startsWith("_") || name.startsWith(".")) Seq.empty
        else files(c.getPath)
      }
    }
    val children = files(root)
    val maxChildMtime = if (children.isEmpty) 0L else children.map(_.getModificationTime).max
    val totalBytes = children.map(_.getLen).sum
    val stamp =
      s"${rootSt.getModificationTime}:${rootSt.getLen}:${children.size}:$maxChildMtime:$totalBytes"
    val cached = rowCountMemo.get(path)
    if (cached != null && cached._1 == stamp) (stamp, cached._2)
    else {
      val n = children.map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try r.getRecordCount finally r.close()
      }.sum
      rowCountMemo.put(path, (stamp, n)) // replaces any superseded entry
      (stamp, n)
    }
  }

  def parquetRowCount(spark: SparkSession, path: String): Long =
    stampedRowCount(spark, path)._2

  /** Version TOKEN for store memo keys: `<rowcount>-<stampHash>`,
    * where the stamp folds in file count, mtimes, and byte sizes from
    * the same recursive listing the row count pays anyway. Before r18
    * every train-once store (`doremiLossDirs`, `tokenCountsFrame`,
    * `nbScoreFrame`, …) keyed on `dir@rowCount` alone, so an in-place
    * corpus rewrite that preserved the row count (ScaleCorpus
    * regenerating a perturbed replica into the same /tmp path) served
    * STALE artifacts for the rest of the JVM. Keying on this token
    * makes any byte-level rewrite miss the memo. Hash collisions are
    * a non-risk here: the stamp only ever compares against rewrites
    * of the SAME path, and mtime+bytes+count colliding across a
    * rewrite while all 32 hash bits also collide is not a lifecycle
    * this guards (a production store would version by explicit drop
    * id).
    */
  def parquetVersion(spark: SparkSession, path: String): String = {
    val (stamp, n) = stampedRowCount(spark, path)
    s"$n-${Integer.toHexString(stamp.hashCode)}"
  }

  /** Register every table as a temp view AND every native text
    * expression as a SQL function, so users can drive the engine
    * through plain `spark.sql(...)` — the catalog surface of the
    * library. `events` goes through its ns->us normalization, so SQL
    * users get the same timestamps the DataFrame API serves.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n => load(spark, dir, n).createOrReplaceTempView(n)
    }
    graft.functions.TextExpressions.register(spark)
  }
}
