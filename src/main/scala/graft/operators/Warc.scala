package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** WARC (Web ARChive, ISO 28500) record codec — the ingest format of
  * web-crawl corpora (Common Crawl ships ~100 TB per crawl as WARC),
  * and therefore the front door of a large-scale training-data
  * pipeline. Built from the public spec with zero third-party code,
  * same discipline as the multimodal codecs: strict structural
  * validation, long-arithmetic bounds checks, and clean rejection
  * (None/Nil) for anything malformed so callers fall through to a
  * quarantine path instead of crashing a task.
  *
  * Supported surface:
  *   - WARC/1.0 and WARC/1.1 records: version line, CRLF header block
  *     with obs-fold continuation lines, Content-Length-delimited body,
  *     closing CRLF CRLF;
  *   - mandatory-header validation (WARC-Type, WARC-Record-ID,
  *     WARC-Date, Content-Length per ISO 28500 §5);
  *   - concatenated records (a .warc file is records back to back);
  *   - per-record gzip members (the Common Crawl .warc.gz layout:
  *     every record its own gzip stream, members concatenated), with a
  *     decompression-bomb cap;
  *   - the embedded HTTP/1.x response of `response` records (status
  *     line, headers, entity split).
  *
  * Scale posture: one WARC file = one unit of parallelism (gzip
  * members cannot be split without a sync index), which is exactly the
  * granularity crawl archives ship — thousands of ~1 GB segment files
  * per crawl. See [[graft.sources.WarcIngest]] for the DataFrame
  * surface.
  */
object Warc {

  /** Hard cap on bytes produced when inflating a .warc.gz payload —
    * a hostile tiny member claiming gigabytes dies here, not at the
    * allocator. Crawl segments are ~1 GB compressed; tests and the
    * synthetic containers are far below this.
    */
  val MaxInflatedBytes: Int = 1 << 30

  /** Cap on the header block of a single record: real WARC headers are
    * a few hundred bytes; an unterminated "header" spanning the whole
    * payload rejects fast.
    */
  private val MaxHeaderBytes = 1 << 20

  /** One WARC record: protocol version ("1.0"/"1.1"), headers in file
    * order (names case-preserved; lookup is case-insensitive per spec),
    * and the raw Content-Length-delimited body.
    */
  final case class WarcRecord(
      version: String,
      headers: Vector[(String, String)],
      body: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def recordType: String = header("WARC-Type").getOrElse("")
    def recordId: String = header("WARC-Record-ID").getOrElse("")
    def date: String = header("WARC-Date").getOrElse("")
    def targetUri: Option[String] = header("WARC-Target-URI")
  }

  /** The HTTP message inside a `response` record's body: status code,
    * headers, entity bytes.
    */
  final case class HttpResponse(
      status: Int,
      headers: Vector[(String, String)],
      entity: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def contentType: Option[String] = header("Content-Type")
  }

  /** Parse one WARC record starting at `offset`; returns the record and
    * the offset just past its closing CRLF CRLF, or None for anything
    * not well-formed.
    */
  def decodeWarcAt(payload: Array[Byte], offset: Int): Option[(WarcRecord, Int)] = {
    val n = payload.length
    // version line: "WARC/1.0\r\n" or "WARC/1.1\r\n"
    if (offset + 10 > n) return None
    val magic = new String(payload, offset, 5, UTF_8)
    if (magic != "WARC/") return None
    val verEnd = indexOfCrlf(payload, offset, math.min(n, offset + 16))
    if (verEnd < 0) return None
    val version = new String(payload, offset + 5, verEnd - offset - 5, UTF_8)
    if (version != "1.0" && version != "1.1") return None
    var i = verEnd + 2
    val headerCap = math.min(n.toLong, offset.toLong + MaxHeaderBytes).toInt
    // header block: "Name: value\r\n"*, obs-fold continuations, "\r\n"
    val headers = Vector.newBuilder[(String, String)]
    var lastName: String = null
    var lastValue: StringBuilder = null
    var done = false
    while (!done) {
      val e = indexOfCrlf(payload, i, headerCap)
      if (e < 0) return None
      if (e == i) { done = true } // empty line terminates the block
      else {
        val line = new String(payload, i, e - i, UTF_8)
        if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
          // continuation of the previous header's value (obs-fold)
          if (lastName == null) return None
          lastValue.append(' ').append(line.trim)
        } else {
          if (lastName != null) headers += lastName -> lastValue.toString
          val c = line.indexOf(':')
          if (c <= 0) return None
          lastName = line.substring(0, c).trim
          lastValue = new StringBuilder(line.substring(c + 1).trim)
          if (lastName.isEmpty) return None
        }
      }
      i = e + 2
    }
    if (lastName != null) headers += lastName -> lastValue.toString
    val rec0 = WarcRecord(version, headers.result(), Array.emptyByteArray)
    // mandatory headers (ISO 28500 §5); Content-Length in long arithmetic
    if (rec0.recordType.isEmpty || rec0.recordId.isEmpty || rec0.date.isEmpty)
      return None
    val lenStr = rec0.header("Content-Length").getOrElse(return None)
    val len =
      try lenStr.toLong
      catch { case _: NumberFormatException => return None }
    if (len < 0 || len > Int.MaxValue || i + len + 4 > n) return None
    val body = java.util.Arrays.copyOfRange(payload, i, i + len.toInt)
    var e = i + len.toInt
    // closing CRLF CRLF
    if (payload(e) != '\r' || payload(e + 1) != '\n' ||
        payload(e + 2) != '\r' || payload(e + 3) != '\n') return None
    e += 4
    Some((rec0.copy(body = body), e))
  }

  /** All records of a concatenated-WARC payload (plain, not gzip), or
    * Nil if the payload isn't one.
    */
  def decodeWarcRecords(payload: Array[Byte]): Seq[WarcRecord] =
    Multimodal.decodeFramesWith(payload, decodeWarcAt)

  /** Inflate a gzip payload of one or more concatenated members (the
    * .warc.gz layout) with a decompression cap, or None if the bytes
    * are not valid gzip / exceed the cap.
    *
    * Hand-walked members over a raw `Inflater` (RFC 1952 framing) — on
    * purpose, not `GZIPInputStream`: the JDK stream treats a CORRUPT
    * second member as a silent EOF, which would let a torn segment
    * half-ingest as if it were complete. Here every member's header is
    * parsed, its CRC32 and ISIZE trailer are verified, and any
    * leftover bytes that don't form a valid next member reject the
    * whole payload — a torn .warc.gz lands in quarantine, never in the
    * corpus.
    */
  def gunzipMembers(payload: Array[Byte],
      cap: Int = MaxInflatedBytes): Option[Array[Byte]] = {
    val n = payload.length
    if (n < 2 || (payload(0) & 0xff) != 0x1f || (payload(1) & 0xff) != 0x8b)
      return None
    val out = new java.io.ByteArrayOutputStream(math.min(n * 4, 1 << 16))
    var off = 0
    while (off < n) {
      // ---- member header (RFC 1952 §2.3) ----
      if (off + 10 > n || (payload(off) & 0xff) != 0x1f ||
          (payload(off + 1) & 0xff) != 0x8b ||
          (payload(off + 2) & 0xff) != 8) return None // CM must be deflate
      val flg = payload(off + 3) & 0xff
      if ((flg & 0xe0) != 0) return None // reserved bits must be zero
      var p = off + 10
      if ((flg & 0x04) != 0) { // FEXTRA
        if (p + 2 > n) return None
        val xlen = (payload(p) & 0xff) | ((payload(p + 1) & 0xff) << 8)
        p += 2 + xlen
        if (p > n) return None
      }
      if ((flg & 0x08) != 0) { // FNAME, zero-terminated
        while (p < n && payload(p) != 0) p += 1
        if (p >= n) return None
        p += 1
      }
      if ((flg & 0x10) != 0) { // FCOMMENT
        while (p < n && payload(p) != 0) p += 1
        if (p >= n) return None
        p += 1
      }
      if ((flg & 0x02) != 0) { // FHCRC
        p += 2
        if (p > n) return None
      }
      // ---- deflate body, CRC + size accumulated as we go ----
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(payload, p, n - p)
        val crc = new java.util.zip.CRC32
        val buf = new Array[Byte](8192)
        var memberBytes = 0L
        while (!inf.finished()) {
          val got =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => return None }
          if (got == 0 && !inf.finished()) return None // truncated/stuck stream
          if (out.size().toLong + got > cap) return None // bomb: reject
          out.write(buf, 0, got)
          crc.update(buf, 0, got)
          memberBytes += got
        }
        val trailer = p + (inf.getBytesRead).toInt
        // ---- trailer: CRC32 + ISIZE (mod 2^32), little-endian ----
        if (trailer + 8 > n) return None
        def u32le(at: Int): Long =
          (payload(at) & 0xffL) | ((payload(at + 1) & 0xffL) << 8) |
            ((payload(at + 2) & 0xffL) << 16) | ((payload(at + 3) & 0xffL) << 24)
        if (u32le(trailer) != crc.getValue) return None
        if (u32le(trailer + 4) != (memberBytes & 0xffffffffL)) return None
        off = trailer + 8
      } finally inf.end()
    }
    Some(out.toByteArray)
  }

  /** Decode a WARC payload in either on-disk form: per-record-gzip
    * members (.warc.gz) or plain concatenated records (.warc).
    */
  def decodeWarc(payload: Array[Byte]): Seq[WarcRecord] =
    if (payload.length >= 2 && (payload(0) & 0xff) == 0x1f &&
        (payload(1) & 0xff) == 0x8b)
      gunzipMembers(payload).map(decodeWarcRecords).getOrElse(Nil)
    else decodeWarcRecords(payload)

  /** Split the embedded HTTP/1.x response of a `response` record body:
    * status line + headers + CRLF CRLF + entity (the rest of the body —
    * the record's Content-Length already delimits it).
    */
  def parseHttpResponse(body: Array[Byte]): Option[HttpResponse] = {
    val n = body.length
    val lineEnd = indexOfCrlf(body, 0, math.min(n, 8192))
    if (lineEnd < 0) return None
    val statusLine = new String(body, 0, lineEnd, UTF_8)
    // "HTTP/1.x NNN reason"
    if (!statusLine.startsWith("HTTP/1.")) return None
    val sp1 = statusLine.indexOf(' ')
    if (sp1 < 0 || sp1 + 4 > statusLine.length) return None
    val codeStr = statusLine.substring(sp1 + 1, sp1 + 4)
    if (!codeStr.forall(_.isDigit)) return None
    if (sp1 + 4 < statusLine.length && statusLine.charAt(sp1 + 4) != ' ') return None
    val status = codeStr.toInt
    var i = lineEnd + 2
    val headers = Vector.newBuilder[(String, String)]
    var done = false
    while (!done) {
      val e = indexOfCrlf(body, i, n)
      if (e < 0) return None
      if (e == i) done = true
      else {
        val line = new String(body, i, e - i, UTF_8)
        val c = line.indexOf(':')
        if (c <= 0) return None
        headers += line.substring(0, c).trim -> line.substring(c + 1).trim
      }
      i = e + 2
    }
    Some(HttpResponse(status, headers.result(),
      java.util.Arrays.copyOfRange(body, i, n)))
  }

  private def indexOfCrlf(p: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    while (i + 1 < until) {
      if (p(i) == '\r' && p(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  // ---- Encoders (tests + synthetic containers) -------------------------

  /** Serialize one record with correct Content-Length and framing. */
  def encodeWarcRecord(rec: WarcRecord): Array[Byte] = {
    val sb = new StringBuilder("WARC/").append(rec.version).append("\r\n")
    rec.headers.foreach { case (k, v) =>
      if (!k.equalsIgnoreCase("Content-Length"))
        sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("Content-Length: ").append(rec.body.length).append("\r\n\r\n")
    sb.toString.getBytes(UTF_8) ++ rec.body ++ "\r\n\r\n".getBytes(UTF_8)
  }

  /** Serialize an HTTP/1.1 response with correct Content-Length. */
  def encodeHttpResponse(status: Int, reason: String,
      headers: Seq[(String, String)], entity: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("HTTP/1.1 ").append(status).append(' ')
      .append(reason).append("\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(entity.length).append("\r\n\r\n")
    sb.toString.getBytes(UTF_8) ++ entity
  }

  /** One gzip member holding `bytes` (the per-record compression unit
    * of the .warc.gz layout).
    */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    // BEST_SPEED: this writer only feeds the engine's own round trips
    // (the synthetic crawl containers and tests); the decoder verifies
    // the CRC at ANY level, so the level is semantically invisible and
    // deflate is otherwise the hottest instruction stream of the
    // per-row container builds (crawl_pipeline / warc_ingest).
    val gz = new java.util.zip.GZIPOutputStream(bos) {
      `def`.setLevel(java.util.zip.Deflater.BEST_SPEED)
    }
    gz.write(bytes)
    gz.close()
    bos.toByteArray
  }

  /** Minimal HTML escape whose inverse is exactly the fixed-entity
    * decode of `html_to_text`: every `&` becomes `&amp;` first, so the
    * escaped form contains no bare ampersands and decode(escape(s)) == s
    * for ALL inputs.
    */
  def escapeHtml(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case '\'' => sb.append("&#39;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Deterministic per-document .warc.gz container for the oracled
    * `warc_ingest` query — the crawl twin of
    * [[Multimodal.syntheticWavContainer]]. Construction parameters are
    * pure arithmetic over (doc_id, text) that the DuckDB oracle
    * replays:
    *   - n_records = utf8_byte_length(text) % 3 + 1 response records;
    *   - record j is an HTTP 404 when (doc_id + j) % 7 == 3, else a 200
    *     whose HTML wraps the ESCAPED document text in a page with
    *     title/h1 "Doc <id> Rec <j>", a script containing a bare `<`
    *     (the classic tag-stripper trap), a style block, and a comment;
    *   - every record is its own gzip member.
    * The oracled query reports what the REAL parser chain (gunzip →
    * record walk → HTTP split → html_to_text) reads BACK, so the hash
    * gate fails on any framing, header, length, or extraction misparse.
    */
  /** One-record `.warc.gz` container for the LINK-GRAPH fixtures: the
    * crawl page of `docId` at its canonical location (the
    * `crawl_url_canon` host space), carrying `docId % 4 + 1` outlinks
    * that exercise every RFC 3986 reference shape — absolute,
    * scheme-relative, root-relative, same-directory relative, and
    * dot-segment + entity-encoded-query relative. Anchors are EMPTY
    * (an `<a href>` with no text adds nothing to `html_to_text`
    * output) and two DECOYS are planted that a naive regex extractor
    * would emit: an href-looking string inside script code and an
    * anchor inside an HTML comment.
    */
  def syntheticLinkedWarcContainer(docId: Long): Array[Byte] = {
    val host = s"w${docId % 97}.example.org"
    val baseUri = s"https://$host/d${docId % 5}/p$docId.html"
    val k = (docId % 4 + 1).toInt
    val links = (0 until k).map { j =>
      val t = (docId * 31 + j * 17 + 7) % 97
      val p = (docId * 13 + j * 11 + 3) % 50
      val href = (docId + j) % 5 match {
        case 0 => s"https://w$t.example.org/d${p % 5}/p$p.html"
        case 1 => s"//w$t.example.org/d${p % 5}/p$p.html"
        case 2 => s"/d${p % 5}/p$p.html"
        case 3 => s"p$p.html"
        case _ => s"../d${p % 5}/p$p.html?s=1&amp;t=$j"
      }
      // planted anchor TEXT (round 16): a nested tag the extractor must
      // strip, an entity it must decode, a newline it must collapse —
      // and pure string arithmetic the oracle replays
      (href, s"see <b>page $p</b> &amp;\n site w$t")
    }
    val entity =
      "<html><head><title>Page " + docId + "</title>" +
        "<script>var u = \"<a href='/not/a/link'>\"; if (1 < 2) go(u);</script>" +
        "<style>a { color: blue; }</style></head><body>" +
        links.map { case (h, a) => "<a href=\"" + h + "\">" + a + "</a>" }.mkString +
        "<!-- <a href=\"/commented/out\">dead</a> -->" +
        "</body></html>"
    val http = encodeHttpResponse(200, "OK",
      Seq("Content-Type" -> "text/html; charset=utf-8"),
      entity.getBytes(UTF_8))
    val rec = WarcRecord("1.0", Vector(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:graft:page-$docId>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Target-URI" -> baseUri,
      "Content-Type" -> "application/http;msgtype=response"), http)
    gzipMember(encodeWarcRecord(rec))
  }

  def syntheticWarcContainer(docId: Long, text: String): Array[Byte] = {
    val nBytes = text.getBytes(UTF_8).length
    val nRecords = nBytes % 3 + 1
    val out = new java.io.ByteArrayOutputStream()
    var j = 0
    while (j < nRecords) {
      val notFound = (docId + j) % 7 == 3
      val entity =
        if (notFound) "<html><body><p>404 Not Found</p></body></html>"
        else
          "<html><head><title>Doc " + docId + " Rec " + j + "</title>" +
            "<script>var x = 1 < 2 && \"a\";</script>" +
            "<style>p { color: red; }</style></head>" +
            "<body><h1>Doc " + docId + " Rec " + j + "</h1><p>" +
            escapeHtml(text) + "</p><!-- hidden --></body></html>"
      val http = encodeHttpResponse(
        if (notFound) 404 else 200,
        if (notFound) "Not Found" else "OK",
        Seq("Content-Type" -> "text/html; charset=utf-8"),
        entity.getBytes(UTF_8))
      val rec = WarcRecord("1.0", Vector(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:graft:doc-$docId-$j>",
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "WARC-Target-URI" -> s"https://example.org/doc/$docId/$j",
        "Content-Type" -> "application/http;msgtype=response"), http)
      out.write(gzipMember(encodeWarcRecord(rec)))
      j += 1
    }
    out.toByteArray
  }
}
