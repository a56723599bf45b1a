package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextExpressions
import graft.operators.{TextOps, Warc}
import graft.sources.WarcIngest

/** WARC codec + HTTP split + html_to_text extraction + ingest surface.
  * Fixtures are hand-written ISO 28500 bytes (NOT built by the
  * production encoder), so the decoder owes nothing to its twin.
  */
class WarcSpec extends SparkSpec {

  private def b(s: String): Array[Byte] = s.getBytes(UTF_8)

  // a literal two-header record written out by hand
  private val handRecord =
    "WARC/1.0\r\n" +
    "WARC-Type: response\r\n" +
    "WARC-Record-ID: <urn:test:1>\r\n" +
    "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
    "WARC-Target-URI: https://example.org/a\r\n" +
    "Content-Length: 5\r\n" +
    "\r\n" +
    "hello" +
    "\r\n\r\n"

  test("hand-built WARC record parses: version, headers, body, offset") {
    val payload = b(handRecord)
    val (rec, next) = Warc.decodeWarcAt(payload, 0).get
    assert(rec.version === "1.0")
    assert(rec.recordType === "response")
    assert(rec.recordId === "<urn:test:1>")
    assert(rec.date === "2026-01-01T00:00:00Z")
    assert(rec.targetUri === Some("https://example.org/a"))
    assert(new String(rec.body, UTF_8) === "hello")
    assert(next === payload.length)
    // header lookup is case-insensitive per spec
    assert(rec.header("warc-type") === Some("response"))
    assert(rec.header("CONTENT-LENGTH") === Some("5"))
  }

  test("obs-fold continuation lines join into the previous header value") {
    val payload = b(
      "WARC/1.1\r\n" +
      "WARC-Type: metadata\r\n" +
      "WARC-Record-ID: <urn:test:2>\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "X-Long: first part\r\n" +
      "\t second part\r\n" +
      "Content-Length: 0\r\n" +
      "\r\n\r\n\r\n")
    val (rec, next) = Warc.decodeWarcAt(payload, 0).get
    assert(rec.version === "1.1")
    assert(rec.header("X-Long") === Some("first part second part"))
    assert(rec.body.isEmpty && next === payload.length)
  }

  test("hostile and malformed records reject cleanly") {
    // missing each mandatory header
    for (drop <- Seq("WARC-Type", "WARC-Record-ID", "WARC-Date", "Content-Length")) {
      val lines = handRecord.split("\r\n", -1).filterNot(_.startsWith(drop + ":"))
      val p = b(lines.mkString("\r\n"))
      assert(Warc.decodeWarcAt(p, 0).isEmpty, s"missing $drop must reject")
    }
    // unknown version, bad magic
    assert(Warc.decodeWarcAt(b(handRecord.replace("WARC/1.0", "WARC/2.0")), 0).isEmpty)
    assert(Warc.decodeWarcAt(b(handRecord.replace("WARC/1.0", "HTTP/1.0")), 0).isEmpty)
    // non-numeric / negative / overlong Content-Length
    assert(Warc.decodeWarcAt(b(handRecord.replace("Content-Length: 5", "Content-Length: x")), 0).isEmpty)
    assert(Warc.decodeWarcAt(b(handRecord.replace("Content-Length: 5", "Content-Length: -1")), 0).isEmpty)
    assert(Warc.decodeWarcAt(b(handRecord.replace("Content-Length: 5", "Content-Length: 99999999999999")), 0).isEmpty)
    // body length pointing past the payload
    assert(Warc.decodeWarcAt(b(handRecord.replace("Content-Length: 5", "Content-Length: 500")), 0).isEmpty)
    // missing closing CRLF CRLF
    assert(Warc.decodeWarcAt(b(handRecord.stripSuffix("\r\n\r\n")), 0).isEmpty)
    // header line with no colon
    assert(Warc.decodeWarcAt(b(handRecord.replace("WARC-Type: response", "WARC-Type response")), 0).isEmpty)
    // truncated mid-headers (no terminating empty line)
    assert(Warc.decodeWarcAt(b("WARC/1.0\r\nWARC-Type: response\r\n"), 0).isEmpty)
  }

  test("concatenated records walk; trailing garbage rejects the container") {
    val two = b(handRecord + handRecord)
    val recs = Warc.decodeWarcRecords(two)
    assert(recs.length === 2)
    assert(recs.forall(r => new String(r.body, UTF_8) === "hello"))
    assert(Warc.decodeWarcRecords(two ++ b("junk")) === Nil)
    assert(Warc.decodeWarcRecords(Array.emptyByteArray) === Nil)
  }

  test("per-record gzip members inflate and walk; corrupt gzip rejects") {
    val gz = Warc.gzipMember(b(handRecord)) ++ Warc.gzipMember(b(handRecord))
    assert(Warc.decodeWarc(gz).length === 2)
    // plain payload routes around the gunzip
    assert(Warc.decodeWarc(b(handRecord)).length === 1)
    // flipped byte inside the deflate stream: CRC fails -> Nil, no throw
    val corrupt = gz.clone()
    corrupt(gz.length / 2) = (corrupt(gz.length / 2) ^ 0x55).toByte
    assert(Warc.decodeWarc(corrupt) === Nil)
    // non-gzip bytes with gzip magic reject
    assert(Warc.decodeWarc(Array(0x1f.toByte, 0x8b.toByte, 3, 4)) === Nil)
    // a valid member followed by garbage must reject the WHOLE payload
    // (GZIPInputStream would silently stop at the garbage — a torn
    // segment must quarantine, not half-ingest)
    val one = Warc.gzipMember(b(handRecord))
    assert(Warc.decodeWarc(one ++ b("torn tail")) === Nil)
    assert(Warc.gunzipMembers(one ++ b("torn tail")) === None)
    // truncated trailer (CRC cut off) rejects
    assert(Warc.gunzipMembers(one.dropRight(3)) === None)
    // an FNAME-bearing header (flag 0x08 + zero-terminated name spliced
    // in) still inflates — the optional-field walk is real
    val named = (one.take(3) :+ (one(3) | 0x08).toByte) ++ one.slice(4, 10) ++
      (b("file.warc") :+ 0.toByte) ++ one.drop(10)
    assert(Warc.gunzipMembers(named).map(new String(_, UTF_8)) === Some(handRecord))
  }

  test("gunzipMembers enforces the decompression cap") {
    val big = Warc.gzipMember(new Array[Byte](1 << 20)) // 1 MiB of zeros, ~1 KB gz
    assert(Warc.gunzipMembers(big).exists(_.length === (1 << 20)))
    assert(Warc.gunzipMembers(big, cap = 1 << 16) === None)
  }

  test("embedded HTTP response splits into status, headers, entity") {
    val http = b(
      "HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      "Server: test\r\n" +
      "\r\n" +
      "<p>body bytes</p>")
    val r = Warc.parseHttpResponse(http).get
    assert(r.status === 200)
    assert(r.contentType === Some("text/html; charset=utf-8"))
    assert(r.header("SERVER") === Some("test"))
    assert(new String(r.entity, UTF_8) === "<p>body bytes</p>")
    // status-line variants and malformed input
    assert(Warc.parseHttpResponse(b("HTTP/1.0 404 Not Found\r\n\r\nx")).get.status === 404)
    assert(Warc.parseHttpResponse(b("HTTP/1.1 301\r\n\r\n")).get.status === 301)
    assert(Warc.parseHttpResponse(b("ICY 200 OK\r\n\r\n")).isEmpty)
    assert(Warc.parseHttpResponse(b("HTTP/1.1 2x0 OK\r\n\r\n")).isEmpty)
    assert(Warc.parseHttpResponse(b("HTTP/1.1 200 OK")).isEmpty) // no CRLF
  }

  test("html_to_text: tags, raw-text elements, comments, entities, whitespace") {
    val f = TextExpressions.htmlToTextString _
    assert(f("<p>one</p><p>two</p>") === "one two")
    // the classic trap: '<' INSIDE script code is not a tag
    assert(f("a<script>if (x < 3 && y > 4) { b(); }</script>z") === "a z")
    assert(f("a<SCRIPT>x<1</ScRiPt >z") === "a z") // case-insensitive
    assert(f("a<style>p { content: '<'; }</style>z") === "a z")
    assert(f("a<!-- <p>not text</p> -->z") === "a z")
    // unterminated raw-text element swallows the rest (browser behavior)
    assert(f("a<script>x = 1;") === "a")
    // entities: named, numeric decimal, numeric hex, double-escaped
    assert(f("&lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39; &apos;a&apos;")
      === "<tag> & \"q\" 's' 'a'")
    assert(f("&#65;&#x42;&#x63;") === "ABc")
    assert(f("&amp;lt;") === "&lt;") // double-escape decodes ONE layer
    assert(f("&nbsp;x&nbsp;") === "x") // nbsp -> plain space -> trimmed
    // unknown/bare ampersands stay literal
    assert(f("AT&T &unknown; &#xZZ; &") === "AT&T &unknown; &#xZZ; &")
    // surrogate-range and out-of-range numeric refs stay literal
    assert(f("&#xD800; &#1114112;") === "&#xD800; &#1114112;")
    // whitespace: RE2 \s class collapses, both ends trim
    assert(f("  a\t\tb\r\nc\fd  ") === "a b c d")
    assert(f("<div>\n  <p>word</p>\n</div>") === "word")
    assert(f("") === "")
    assert(f("<p></p>") === "")
    // a tag whose name merely STARTS with script/style is an ordinary
    // element, not raw-text — its content must survive extraction
    assert(f("a<scripty>keep</scripty>z") === "a keep z")
    assert(f("a<styled>keep</styled>z") === "a keep z")
    // and a closing '</scripty>' inside real script code must NOT end
    // raw-text mode early
    assert(f("a<script>x</scripty>y</script>z") === "a z")
    // attribute-bearing form still counts as script
    assert(f("a<script type=\"module\">x<1</script>z") === "a z")
    // '/' after the name is a boundary too; self-closing is void for
    // raw-text elements (browser behavior: swallows to next </script>)
    assert(f("a<script/>z") === "a")
  }

  test("property: extraction inverts the escape for arbitrary text") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab <>&\"'\t\n;#x01&amp;<script>"
    for (trial <- 0 until 200) {
      val raw = Array.fill(rnd.nextInt(40))(
        alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
      val expected = raw.split("[\t\n\f\r ]+").filter(_.nonEmpty).mkString(" ")
      val got = TextExpressions.htmlToTextString(
        "<body><p>" + Warc.escapeHtml(raw) + "</p></body>")
      assert(got === expected, s"trial $trial raw=${raw.map(_.toInt).mkString(",")}")
    }
  }

  test("html_to_text runs as a native expression and via SQL registration") {
    import spark.implicits._
    val df = Seq(
      (1L, "<h1>Title</h1><script>x<1</script><p>body &amp; soul</p>"),
      (2L, null.asInstanceOf[String])).toDF("id", "html")
    val out = df.select(col("id"), TextOps.htmlToText(col("html")).as("t"))
      .orderBy("id").collect()
    assert(out(0).getString(1) === "Title body & soul")
    assert(out(1).isNullAt(1)) // null in, null out
    TextExpressions.register(spark)
    val viaSql = spark.sql(
      "SELECT html_to_text('<p>a</p><style>s</style><p>b</p>') AS t")
      .head().getString(0)
    assert(viaSql === "a b")
  }

  test("synthetic container: parser chain reads back the construction") {
    val text = "quick <brown> fox & \"friends\" 'n pals"
    val payload = Warc.syntheticWarcContainer(11L, text)
    val recs = Warc.decodeWarc(payload)
    val nBytes = text.getBytes(UTF_8).length
    assert(recs.length === nBytes % 3 + 1)
    val https = recs.map(r => Warc.parseHttpResponse(r.body).get)
    // doc 11: record j is 404 when (11 + j) % 7 == 3, i.e. j == 6 only;
    // with <=3 records every one here is a 200
    assert(https.forall(_.status === 200))
    val extracted = TextExpressions.htmlToTextString(
      new String(https.head.entity, UTF_8))
    assert(extracted === s"Doc 11 Rec 0 Doc 11 Rec 0 $text")
    // a doc id hitting the 404 arm: (3 + 0) % 7 == 3
    val nf = Warc.decodeWarc(Warc.syntheticWarcContainer(3L, "xy"))
    val h0 = Warc.parseHttpResponse(nf.head.body).get
    assert(h0.status === 404)
    assert(TextExpressions.htmlToTextString(new String(h0.entity, UTF_8))
      === "404 Not Found")
  }

  test("WarcIngest reads a directory: records, extraction, quarantine") {
    val dir = java.nio.file.Files.createTempDirectory("warc_ingest").toFile
    try {
      val html = "<html><body><p>Visible &amp; text</p><script>no()</script></body></html>"
      val rec1 = Warc.WarcRecord("1.0", Vector(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> "<urn:test:a>",
        "WARC-Date" -> "2026-02-02T00:00:00Z",
        "WARC-Target-URI" -> "https://example.org/page"),
        Warc.encodeHttpResponse(200, "OK",
          Seq("Content-Type" -> "text/html"), b(html)))
      val rec2 = Warc.WarcRecord("1.0", Vector(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> "<urn:test:b>",
        "WARC-Date" -> "2026-02-02T00:00:01Z",
        "WARC-Target-URI" -> "https://example.org/data"),
        Warc.encodeHttpResponse(200, "OK",
          Seq("Content-Type" -> "application/json"), b("{\"k\":1}")))
      val meta = Warc.WarcRecord("1.0", Vector(
        "WARC-Type" -> "warcinfo",
        "WARC-Record-ID" -> "<urn:test:info>",
        "WARC-Date" -> "2026-02-02T00:00:00Z"), b("software: graft"))
      // one gzipped file (3 records), one plain file (1), one garbage
      java.nio.file.Files.write(new java.io.File(dir, "seg-0.warc.gz").toPath,
        Warc.gzipMember(Warc.encodeWarcRecord(meta)) ++
          Warc.gzipMember(Warc.encodeWarcRecord(rec1)) ++
          Warc.gzipMember(Warc.encodeWarcRecord(rec2)))
      java.nio.file.Files.write(new java.io.File(dir, "seg-1.warc").toPath,
        Warc.encodeWarcRecord(rec1))
      java.nio.file.Files.write(new java.io.File(dir, "broken.warc.gz").toPath,
        b("this is not a warc file"))
      val rows = WarcIngest.readWarcRecords(spark, dir.getAbsolutePath)
        .orderBy("path", "record_idx").collect()
      assert(rows.length === 4) // 3 + 1 + 0
      val byType = rows.groupBy(_.getAs[String]("record_type"))
      assert(byType("warcinfo").length === 1)
      assert(byType("response").length === 3)
      val htmlRows = rows.filter(r => r.getAs[String]("content_type") == "text/html")
      assert(htmlRows.length === 2)
      assert(htmlRows.forall(_.getAs[String]("text") === "Visible & text"))
      val jsonRow = rows.find(r => r.getAs[String]("content_type") == "application/json").get
      assert(jsonRow.isNullAt(jsonRow.fieldIndex("text"))) // non-HTML: no extraction
      assert(jsonRow.getAs[Int]("http_status") === 200)
      val infoRow = rows.find(_.getAs[String]("record_type") == "warcinfo").get
      assert(infoRow.isNullAt(infoRow.fieldIndex("http_status")))
      assert(new String(infoRow.getAs[Array[Byte]]("entity"), UTF_8) === "software: graft")
      // the torn segment is named, the good ones are not
      val q = WarcIngest.quarantine(spark, dir.getAbsolutePath).collect()
      assert(q.length === 1)
      assert(q.head.getAs[String]("path").endsWith("broken.warc.gz"))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("streaming WARC ingest: arriving segments over two micro-batches match batch") {
    val dir = java.nio.file.Files.createTempDirectory("warc_stream").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("warc_stream_ckpt").toFile
    val ckptQ = java.nio.file.Files.createTempDirectory("warc_stream_ckpt_q").toFile
    try {
      def respRec(id: String, uri: String, html: String) =
        Warc.WarcRecord("1.0", Vector(
          "WARC-Type" -> "response",
          "WARC-Record-ID" -> s"<urn:test:$id>",
          "WARC-Date" -> "2026-02-02T00:00:00Z",
          "WARC-Target-URI" -> uri),
          Warc.encodeHttpResponse(200, "OK",
            Seq("Content-Type" -> "text/html"), b(html)))
      // micro-batch 1: one two-record gzip segment
      java.nio.file.Files.write(new java.io.File(dir, "seg-0.warc.gz").toPath,
        Warc.gzipMember(Warc.encodeWarcRecord(respRec("a", "https://x.org/1", "<p>one</p>"))) ++
          Warc.gzipMember(Warc.encodeWarcRecord(respRec("b", "https://x.org/2", "<p>two</p>"))))
      val records = WarcIngest.streamWarcRecords(spark, dir.getAbsolutePath)
        .writeStream.format("memory").queryName("warc_stream_records")
        .option("checkpointLocation", ckpt.getAbsolutePath).start()
      val quarantine = WarcIngest.streamQuarantine(spark, dir.getAbsolutePath)
        .writeStream.format("memory").queryName("warc_stream_quarantine")
        .option("checkpointLocation", ckptQ.getAbsolutePath).start()
      try {
        records.processAllAvailable()
        quarantine.processAllAvailable()
        assert(spark.sql("SELECT * FROM warc_stream_records").count() === 2)
        assert(spark.sql("SELECT * FROM warc_stream_quarantine").count() === 0)
        // micro-batch 2: one more good segment + one torn one
        java.nio.file.Files.write(new java.io.File(dir, "seg-1.warc").toPath,
          Warc.encodeWarcRecord(respRec("c", "https://x.org/3", "<p>three</p>")))
        java.nio.file.Files.write(new java.io.File(dir, "broken.warc.gz").toPath,
          b("torn segment bytes"))
        records.processAllAvailable()
        quarantine.processAllAvailable()
        val streamed = spark.sql(
          "SELECT path, record_idx, record_type, record_id, warc_date, " +
          "target_uri, http_status, content_type, text FROM warc_stream_records")
          .orderBy("path", "record_idx").collect()
        assert(streamed.length === 3) // the second batch APPENDED, never re-emitted
        // batch twin over the same directory: identical rows (shared walk)
        val batch = WarcIngest.readWarcRecords(spark, dir.getAbsolutePath)
          .select("path", "record_idx", "record_type", "record_id", "warc_date",
            "target_uri", "http_status", "content_type", "text")
          .orderBy("path", "record_idx").collect()
        assert(streamed.toSeq === batch.toSeq)
        assert(streamed.map(_.getAs[String]("text")).toSeq === Seq("one", "two", "three"))
        // the torn segment dead-letters on the streaming side too
        val q2 = spark.sql("SELECT path FROM warc_stream_quarantine").collect()
        assert(q2.length === 1 && q2.head.getString(0).endsWith("broken.warc.gz"))
      } finally {
        records.stop(); quarantine.stop()
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir); rm(ckpt); rm(ckptQ)
    }
  }
}
