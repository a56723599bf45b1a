package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.functions.TextExpressions
import graft.operators.Warc
import graft.sources.WarcIngest

/** The crawl link-graph chain: native `extract_links` (comment/script-
  * aware href walk), RFC 3986 `resolve_url`, the WARC fixture replay,
  * and the batch=stream outlink twin.
  */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  implicit private val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def b(s: String): Array[Byte] = s.getBytes(UTF_8)

  /** Record-shaped row for the MemoryStream frontier-horizon spec. */
  case class FrontierRec(path: String, record_idx: Long, record_type: String,
      record_id: String, warc_date: String, target_uri: String,
      http_status: Long, content_type: String, entity: Array[Byte],
      fetch_ts: java.sql.Timestamp)

  test("extract_links: decoys, quoting, case, duplicate attrs, entities") {
    def links(html: String): Seq[String] =
      TextExpressions.extractLinksStrings(html)
    // live anchors in order; script/comment decoys dropped
    assert(links(
      """<script>var u = "<a href='/decoy'>";</a></script>""" +
        """<a href="/one"></a><!-- <a href="/two"></a> --><a href='/three'>t</a>""")
      === Seq("/one", "/three"))
    // quote-aware: '>' inside a quoted href must not end the tag
    assert(links("""<a href="/x?a>b"></a>""") === Seq("/x?a>b"))
    // unquoted value ends at whitespace or '>'
    assert(links("""<a href=/bare rel=nofollow></a>""") === Seq("/bare"))
    // case-insensitive tag + attribute names; first href wins
    assert(links("""<A HREF="/up" href="/dupe"></A>""") === Seq("/up"))
    // entity decode in the value (&amp; in query strings)
    assert(links("""<a href="/q?a=1&amp;b=2"></a>""") === Seq("/q?a=1&b=2"))
    // <a> without href, href on non-anchor tags, <abbr> (name boundary)
    assert(links("""<a name="x"></a><link href="/css"><abbr href="/no"></abbr>""")
      === Seq.empty)
    // href-less then valued anchor; empty href is kept (resolves to base)
    assert(links("""<a></a><a href="">self</a>""") === Seq(""))
    // style raw-text block skipped
    assert(links("""<style>a { content: "<a href='/s'>"; }</style><a href=/ok></a>""")
      === Seq("/ok"))
  }

  test("extract_anchors: inner text, nesting, auto-close, href parity") {
    def anchors(html: String): Seq[(String, String)] =
      TextExpressions.extractAnchorPairs(html)
    // nested tags stripped, entities decoded, whitespace collapsed
    assert(anchors("<a href=\"/x\">see <b>page 7</b> &amp;\n\t site w3</a>")
      === Seq(("/x", "see page 7 & site w3")))
    // empty anchor text; unclosed anchor runs to EOF
    assert(anchors("""<a href="/e"></a><a href="/tail">to the end""")
      === Seq(("/e", ""), ("/tail", "to the end")))
    // comments and script/style blocks INSIDE the anchor contribute
    // nothing (a "</a>" inside script code must not close the anchor)
    assert(anchors("<a href=\"/s\">a<!-- x --><script>\"</a>\"</script>" +
        "<style>b{}</style>b</a>")
      === Seq(("/s", "ab")))
    // nested <a> auto-closes (WHATWG implied end tag): both hrefs
    // survive, text splits at the nested open tag
    assert(anchors("""<a href="/o">out <a href="/i">in</a> tail""")
      === Seq(("/o", "out"), ("/i", "in")))
    // an anchor WITHOUT href still consumes its inner text (no pair
    // emitted) and a nested linked anchor inside it still surfaces
    assert(anchors("""<a>skip <a href="/k">kept</a></a>""")
      === Seq(("/k", "kept")))
    // href parity with extract_links on every shape above — one walk
    // definition serves both extractors
    Seq(
      "<a href=\"/x\">see <b>page 7</b> &amp;\n site w3</a>",
      """<a href="/e"></a><a href="/tail">to the end""",
      "<a href=\"/s\">a<!-- x --><script>\"</a>\"</script>b</a>",
      """<a href="/o">out <a href="/i">in</a> tail""",
      """<a>skip <a href="/k">kept</a></a>""",
      """<script>var u = "<a href='/decoy'>";</a></script><a href="/one"></a>""",
      """<A HREF="/up" href="/dupe">Text</A>"""
    ).foreach { h =>
      assert(anchors(h).map(_._1) === TextExpressions.extractLinksStrings(h),
        s"href drift on: $h")
    }
    // SQL + struct surface
    TextExpressions.register(spark)
    val row = spark.sql(
      """SELECT extract_anchors('<a href="p.html">see <i>more</i></a>') AS la""")
      .selectExpr("la[0].href AS h", "la[0].anchor AS a").head()
    assert(row.getString(0) === "p.html" && row.getString(1) === "see more")
  }

  test("resolve_url: RFC 3986 §5.4 reference-resolution examples") {
    val base = "http://a/b/c/d;p?q"
    def r(ref: String): String = TextExpressions.resolveUrlString(base, ref)
    // normal examples (§5.4.1) — fragments DROPPED by contract
    assert(r("g:h") === "g:h")
    assert(r("g") === "http://a/b/c/g")
    assert(r("./g") === "http://a/b/c/g")
    assert(r("g/") === "http://a/b/c/g/")
    assert(r("/g") === "http://a/g")
    assert(r("//g") === "http://g")
    assert(r("?y") === "http://a/b/c/d;p?y")
    assert(r("g?y") === "http://a/b/c/g?y")
    assert(r("#s") === "http://a/b/c/d;p?q", "fragment-only ref: base sans fragment")
    assert(r("g#s") === "http://a/b/c/g")
    assert(r(";x") === "http://a/b/c/;x")
    assert(r("") === "http://a/b/c/d;p?q")
    assert(r(".") === "http://a/b/c/")
    assert(r("./") === "http://a/b/c/")
    assert(r("..") === "http://a/b/")
    assert(r("../") === "http://a/b/")
    assert(r("../g") === "http://a/b/g")
    assert(r("../..") === "http://a/")
    assert(r("../../") === "http://a/")
    assert(r("../../g") === "http://a/g")
    // abnormal examples (§5.4.2): dot segments past the root vanish
    assert(r("../../../g") === "http://a/g")
    assert(r("../../../../g") === "http://a/g")
    assert(r("/./g") === "http://a/g")
    assert(r("/../g") === "http://a/g")
    assert(r("g.") === "http://a/b/c/g.")
    assert(r(".g") === "http://a/b/c/.g")
    assert(r("g..") === "http://a/b/c/g..")
    assert(r("..g") === "http://a/b/c/..g")
    assert(r("./../g") === "http://a/b/g")
    assert(r("./g/.") === "http://a/b/c/g/")
    assert(r("g/./h") === "http://a/b/c/g/h")
    assert(r("g/../h") === "http://a/b/c/h")
    // authority base with EMPTY path: relative ref hangs off "/"
    assert(TextExpressions.resolveUrlString("https://h.example", "x/y")
      === "https://h.example/x/y")
  }

  test("extract_links + resolve_url run natively, via Column facade and SQL") {
    TextExpressions.register(spark)
    val row = spark.sql(
      """SELECT extract_links('<a href="p.html"></a><a href="/r"></a>') AS ls,
        |       resolve_url('https://h/x/y.html', '../z?a=1') AS u""".stripMargin).head()
    assert(row.getSeq[String](0) === Seq("p.html", "/r"))
    assert(row.getString(1) === "https://h/z?a=1")
    val viaCol = spark.range(1).select(
      TextExpressions.resolve_url(lit("https://h/x/"), lit("p.html")).as("u"))
      .head().getString(0)
    assert(viaCol === "https://h/x/p.html")
  }

  test("linked WARC fixture: the parse chain recovers the planted edges") {
    // driver-side replay of the construction formulas vs the ENGINE
    // chain (real gunzip -> WARC -> HTTP -> extract -> resolve) for a
    // spread of ids covering all five reference shapes and 1..4 links
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 7L, 23L, 96L, 97L, 450L)
    def planted(id: Long): Seq[(Long, String, String)] = {
      val host = s"w${id % 97}.example.org"
      (0 until (id % 4 + 1).toInt).map { j =>
        val t = (id * 31 + j * 17 + 7) % 97
        val p = (id * 13 + j * 11 + 3) % 50
        val dst = (id + j) % 5 match {
          case 0 | 1 => s"https://w$t.example.org/d${p % 5}/p$p.html"
          case 2 => s"https://$host/d${p % 5}/p$p.html"
          case 3 => s"https://$host/d${id % 5}/p$p.html"
          case _ => s"https://$host/d${p % 5}/p$p.html?s=1&t=$j"
        }
        (j.toLong, s"https://$host/d${id % 5}/p$id.html", dst)
      }
    }
    ids.foreach { id =>
      val recs = Warc.decodeWarc(Warc.syntheticLinkedWarcContainer(id))
      assert(recs.length === 1)
      val http = Warc.parseHttpResponse(recs.head.body).get
      val html = new String(http.entity, UTF_8)
      val base = recs.head.targetUri.get
      val got = TextExpressions.extractLinksStrings(html).zipWithIndex.map {
        case (href, j) =>
          (j.toLong, base, TextExpressions.resolveUrlString(base, href))
      }
      assert(got === planted(id), s"doc $id edge mismatch")
      // the decoys never leak
      assert(!got.exists(_._3.contains("decoy")) &&
        !got.exists(_._3.contains("commented")) &&
        !got.exists(_._3.contains("not/a/link")))
      // the planted anchor TEXT normalizes to its formula (nested <b>
      // stripped, &amp; decoded, newline collapsed) — the
      // crawl_anchor_text oracle's replay contract
      val anchorsGot = TextExpressions.extractAnchorPairs(html).map(_._2)
      val anchorsPlanted = (0 until (id % 4 + 1).toInt).map { j =>
        val t = (id * 31 + j * 17 + 7) % 97
        val p = (id * 13 + j * 11 + 3) % 50
        s"see page $p & site w$t"
      }
      assert(anchorsGot === anchorsPlanted, s"doc $id anchor mismatch")
    }
  }

  test("frontier gate: only first discoveries survive across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("frontier").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("frontier_ckpt").toFile
    try {
      def write(name: String, ids: Seq[Long]): Unit =
        java.nio.file.Files.write(new java.io.File(dir, name).toPath,
          ids.map(Warc.syntheticLinkedWarcContainer)
            .foldLeft(Array.emptyByteArray)(_ ++ _))
      // ids 0 and 97 share host w0 and link-target arithmetic mod 97:
      // id 0 -> 1 link, id 97 -> 2 links; overlap comes from later
      // RE-LINKS of already-discovered URLs
      write("seg-0.warc.gz", Seq(5L))
      val q = WarcIngest.frontierGate(
          WarcIngest.streamWarcRecords(spark, dir.getAbsolutePath))
        .writeStream.format("memory").queryName("frontier_gate")
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath).start()
      try {
        q.processAllAvailable()
        val b1 = spark.sql("SELECT dst_url FROM frontier_gate")
          .as[String].collect().toSet
        assert(b1.size === 2) // id 5 -> 5%4+1 = 2 links, distinct targets
        // batch 2: the SAME page re-arrives (identical links — zero new
        // frontier) plus a fresh page
        write("seg-1.warc.gz", Seq(5L, 6L))
        q.processAllAvailable()
        val b2 = spark.sql("SELECT dst_url FROM frontier_gate")
          .as[String].collect()
        assert(b2.length === b2.toSet.size, "a URL re-enqueued")
        val fresh = b2.toSet -- b1
        // id 6's 3 links minus any overlap with id 5's discoveries
        val expect6 = TextExpressions.extractLinksStrings(new String(
            Warc.parseHttpResponse(Warc.decodeWarc(
              Warc.syntheticLinkedWarcContainer(6L)).head.body).get.entity, UTF_8))
          .map(h => TextExpressions.resolveUrlString(
            "https://w6.example.org/d1/p6.html", h)).toSet
        assert(fresh === (expect6 -- b1),
          "frontier delta must be exactly the unseen targets")
      } finally q.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir); rm(ckpt)
    }
  }

  test("frontier gate horizon: URL state evicts past the recrawl window") {
    // the bounded mode the r15 advice asked for (the novelGrams API
    // mirrored): inside the delay a re-discovered URL stays gated;
    // once the event-time watermark passes its horizon the state is
    // evicted and the URL re-enqueues — the recrawl-window semantics
    // of a continuous crawl
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[FrontierRec]
    def rec(idx: Long, src: String, dst: String, min: Int): FrontierRec =
      FrontierRec(path = "mem", record_idx = idx, record_type = "response",
        record_id = s"id-$idx", warc_date = "2026-01-01T00:00:00Z",
        target_uri = src, http_status = 200L, content_type = "text/html",
        entity = b(s"""<html><body><a href="$dst">x</a></body></html>"""),
        fetch_ts = java.sql.Timestamp.valueOf(f"2026-01-01 00:$min%02d:00"))
    val q = WarcIngest.frontierGate(in.toDF(),
        horizon = Some(("fetch_ts", "10 minutes")))
      .writeStream.format("memory").queryName("frontier_wm")
      .outputMode("append").start()
    try {
      def urls(): Seq[String] = spark.table("frontier_wm")
        .select("dst_url").as[String].collect().toSeq
      in.addData(rec(0L, "https://a.org/p1", "https://x.org/t", 0))
      q.processAllAvailable()
      assert(urls() === Seq("https://x.org/t"))
      // re-discovery INSIDE the window: gated
      in.addData(rec(1L, "https://b.org/p2", "https://x.org/t", 5))
      q.processAllAvailable()
      assert(urls().length === 1)
      // unrelated discovery pushes the watermark past t's horizon
      in.addData(rec(2L, "https://c.org/p3", "https://y.org/u", 40))
      q.processAllAvailable()
      // past the window: the SAME URL re-enqueues — state was evicted
      in.addData(rec(3L, "https://d.org/p4", "https://x.org/t", 41))
      q.processAllAvailable()
      assert(urls().count(_ == "https://x.org/t") === 2,
        "frontier URL state must evict once the recrawl window passes")
    } finally q.stop()
  }

  test("streaming frontier scheduler gate equals the batch robots+frontier composition") {
    // cross-batch parity pinned to the batch queries (the
    // standingQueryGate-vs-search_bm25_topk convention): segments
    // arrive over TWO micro-batches, each first-discovered URL flows
    // through the scheduler gate (robots verdict + stream-static
    // priority join), and the emitted set must equal the batch
    // composition — crawl_robots_gate's per-URL verdict x
    // crawl_frontier's (n_refs, n_src_hosts) rollup — over the same
    // segments.
    val streamDir = java.nio.file.Files.createTempDirectory("sched_in").toFile
    val fullDir = java.nio.file.Files.createTempDirectory("sched_full").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("sched_ckpt").toFile
    try {
      def write(d: java.io.File, name: String, ids: Seq[Long]): Unit =
        java.nio.file.Files.write(new java.io.File(d, name).toPath,
          ids.map(Warc.syntheticLinkedWarcContainer)
            .foldLeft(Array.emptyByteArray)(_ ++ _))
      val seg0 = Seq(5L, 7L)
      val seg1 = Seq(5L, 6L, 23L) // id 5 re-arrives: no re-enqueue
      write(fullDir, "all.warc.gz", seg0 ++ seg1)
      // the static priority store = the batch crawl_frontier rollup
      // shape over the full segment set (a prior crawl cycle's store)
      val store = WarcIngest.outlinkEdges(
          WarcIngest.readWarcRecords(spark, fullDir.getAbsolutePath))
        .select(col("dst_url"), expr("parse_url(src_url, 'HOST')").as("sh"))
        .groupBy(col("dst_url"))
        .agg(count(lit(1)).as("n_refs"),
          count_distinct(col("sh")).as("n_src_hosts"))
      write(streamDir, "seg-0.warc.gz", seg0)
      val q = graft.streaming.StreamingCorpusOps.frontierSchedulerGate(
          WarcIngest.frontierGate(
            WarcIngest.streamWarcRecords(spark, streamDir.getAbsolutePath)),
          store)
        .writeStream.format("memory").queryName("sched_gate")
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath).start()
      try {
        q.processAllAvailable()
        write(streamDir, "seg-1.warc.gz", seg1)
        q.processAllAvailable()
        val got = spark.table("sched_gate")
          .as[(String, String, Long, Long)].collect().toSeq
        assert(got.map(_._1).distinct.length === got.length,
          "a URL passed the scheduler gate twice")
        // batch composition: every distinct discovered URL, the shared
        // Robots verdict, priorities from the rollup; blocked URLs absent
        val cache = scala.collection.mutable.HashMap
          .empty[String, Seq[graft.operators.Robots.Rule]]
        val expected = store.as[(String, Long, Long)].collect().toSeq
          .flatMap { case (url, r, h) =>
            val (host, ok) = graft.operators.Robots.syntheticVerdict(url, cache)
            if (ok) Some((url, host, r, h)) else None
          }.toSet
        assert(expected.nonEmpty, "fixture must produce allowed URLs")
        assert(expected.size < store.count(),
          "fixture must produce at least one BLOCKED URL (non-vacuous gate)")
        assert(got.toSet === expected,
          "stream scheduler output must equal the batch robots+frontier composition")
      } finally q.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(streamDir); rm(fullDir); rm(ckpt)
    }
  }

  test("streaming outlink twin equals batch over arriving segments") {
    val dir = java.nio.file.Files.createTempDirectory("link_stream").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("link_stream_ckpt").toFile
    try {
      def write(name: String, ids: Seq[Long]): Unit =
        java.nio.file.Files.write(new java.io.File(dir, name).toPath,
          ids.map(Warc.syntheticLinkedWarcContainer)
            .foldLeft(Array.emptyByteArray)(_ ++ _))
      write("seg-0.warc.gz", Seq(1L, 2L))
      val q = WarcIngest.outlinkEdges(
          WarcIngest.streamWarcRecords(spark, dir.getAbsolutePath))
        .writeStream.format("memory").queryName("link_stream_edges")
        .option("checkpointLocation", ckpt.getAbsolutePath).start()
      try {
        q.processAllAvailable()
        val afterB1 = spark.sql("SELECT * FROM link_stream_edges").count()
        assert(afterB1 === 2 + 3) // id%4+1 links: id 1 -> 2, id 2 -> 3
        // batch 2: two more pages, one with 4 links
        write("seg-1.warc.gz", Seq(3L, 7L))
        q.processAllAvailable()
        val streamed = spark.sql(
          "SELECT record_idx, link_idx, src_url, dst_url FROM link_stream_edges")
          .as[(Int, Long, String, String)].collect().toSet
        // batch twin over the same directory — identical edges
        val batch = WarcIngest.outlinkEdges(
            WarcIngest.readWarcRecords(spark, dir.getAbsolutePath))
          .select(col("record_idx"), col("link_idx"), col("src_url"), col("dst_url"))
          .as[(Int, Long, String, String)].collect().toSet
        assert(streamed === batch)
        assert(streamed.size === (2 + 3 + 4 + 4))
      } finally q.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir); rm(ckpt)
    }
  }

  test("streaming anchor rollup equals the batch anchor-term counts") {
    val dir = java.nio.file.Files.createTempDirectory("anchor_stream").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("anchor_stream_ckpt").toFile
    try {
      def write(name: String, ids: Seq[Long]): Unit =
        java.nio.file.Files.write(new java.io.File(dir, name).toPath,
          ids.map(Warc.syntheticLinkedWarcContainer)
            .foldLeft(Array.emptyByteArray)(_ ++ _))
      // ids chosen so a CROSS-BATCH, CROSS-HOST dst collision exists:
      // id 39 (batch 1, host w39) and id 86 (batch 2, host w86) both
      // link to w86.example.org/d2/p32.html — est_hosts reaches 2 only
      // if the KMV sketch state persisted across the micro-batches
      write("seg-0.warc.gz", Seq(1L, 39L))
      // update mode (flatMapGroupsWithState): the memory table appends
      // each key's refreshed row per batch; counts are monotone, so
      // the row with the max n_refs per key is the final state. NOTE
      // processAllAvailable() is unusable here BY DESIGN (the
      // politenessGateTws precedent): the bounded default registers a
      // processing-time timeout per key, so the engine keeps running
      // no-data batches and never latches noNewData — poll the sink.
      val q = WarcIngest.anchorTermCounts(
          WarcIngest.streamWarcRecords(spark, dir.getAbsolutePath))
        .writeStream.format("memory").queryName("anchor_stream_counts")
        .outputMode("update")
        .option("checkpointLocation", ckpt.getAbsolutePath).start()
      try {
        def finalState() = spark.sql(
          "SELECT dst_url, term, n_refs, est_hosts FROM anchor_stream_counts")
          .as[(String, String, Long, Double)].collect()
          .groupBy(r => (r._1, r._2))
          .map { case (k, rows) => k -> rows.maxBy(_._3) }
        def pollUntil(cond: () => Boolean): Unit = {
          val deadline = System.currentTimeMillis + 120000
          while (!cond() && System.currentTimeMillis < deadline)
            Thread.sleep(200)
        }
        // ids 1,39 plant 2+4 links x 6 terms each = 36 (url, term) keys
        pollUntil(() => finalState().size == 36)
        write("seg-1.warc.gz", Seq(3L, 86L))
        // batch twin over the same directory, same chain, including
        // the EXACT distinct-host column the estimate must match
        def batchTwin() = WarcIngest.outlinkAnchors(
            WarcIngest.readWarcRecords(spark, dir.getAbsolutePath))
          .select(col("dst_url"),
            explode(graft.operators.TextOps.tokens(col("anchor"))).as("term"),
            expr("parse_url(src_url, 'HOST')").as("src_host"))
          .filter(col("term") =!= "")
          .groupBy(col("dst_url"), col("term"))
          .agg(count(lit(1)).as("n_refs"),
            count_distinct(col("src_host")).as("n_hosts"))
          .as[(String, String, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r).toMap
        val batch = batchTwin()
        pollUntil(() => {
          val s = finalState()
          s.keySet == batch.keySet && s.forall { case (k, r) => r._3 == batch(k)._3 }
        })
        val streamed = finalState()
        assert(streamed.keySet === batch.keySet)
        streamed.foreach { case (k, (_, _, n, est)) =>
          val (_, _, bn, bHosts) = batch(k)
          assert(n === bn, s"$k: streamed n_refs $n != batch $bn")
          // the fixture's distinct-host counts are far below k=64, so
          // the KMV estimate is EXACT (est = n when n < k); above k
          // the contract weakens to ~1/sqrt(k-1) relative error
          assert(est === bHosts.toDouble,
            s"$k: est_hosts $est != exact $bHosts (n_hosts < k must be exact)")
        }
        // non-vacuous: 13 planted links (ids 1,39,3,86 -> 2+4+4+3) x 6
        // anchor terms each, minus the 5 keys the colliding pair
        // shares (see/page/32/&/site on the shared dst) = 73
        assert(streamed.size === 73, s"got ${streamed.size} (url, term) rows")
        assert(streamed.count(_._1._2 == "see") === 12)
        // the distinct-host signal is non-vacuous: exactly the 5
        // shared-dst keys must report 2 referring hosts — and the two
        // hosts arrived in DIFFERENT micro-batches, so 2.0 here proves
        // the sketch state itself persisted and merged across batches
        val multiHost = streamed.filter(_._2._4 >= 2.0)
        assert(multiHost.size === 5,
          s"expected the 5 cross-host keys, got ${multiHost.keys}")
        assert(multiHost.keys.forall(
          _._1 === "https://w86.example.org/d2/p32.html"))
      } finally q.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir); rm(ckpt)
    }
  }
}
