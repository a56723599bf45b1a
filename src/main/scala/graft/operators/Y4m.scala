package graft.operators

import graft.operators.Multimodal.PgmImage

/** YUV4MPEG2 (.y4m) video container codec — the sixth REAL format and
  * the first VIDEO one. Y4M is the interchange format for raw video
  * (mjpegtools defined it; ffmpeg reads/writes it as `-f yuv4mpeg`):
  * a plain-text stream header, then per frame a `FRAME` marker line
  * followed by raw planar YCbCr — no entropy coder anywhere, so it
  * stays zero-third-party like PGM/BMP/WAV. The reference has no
  * multimodal surface at all (`readme.md:1-20`); this closes the
  * BASELINE north-star "video" modality with real frame parsing.
  *
  * Structure (public mjpegtools y4m spec):
  *   `YUV4MPEG2` then space-separated parameters, `\n`-terminated:
  *   `W<int>` width, `H<int>` height, `F<num>:<den>` frame rate,
  *   `I<p|t|b|m>` interlacing, `A<num>:<den>` pixel aspect,
  *   `C<tag>` chroma subsampling, `X<...>` extensions. Each frame is
  *   `FRAME` (+ optional parameters) `\n`, then the Y plane (W*H
  *   bytes) and — per the chroma tag — Cb and Cr planes.
  *
  * Supported chroma: 4:2:0 (tags `420`, `420jpeg`, `420mpeg2`,
  * `420paldv` — planes (W/2)x(H/2)), `422` ((W/2)xH), `444` (WxH),
  * and `mono` (no chroma planes). Subsampled tags require the even
  * dimensions the layout implies — an odd-width 4:2:0 stream has no
  * well-defined plane size, so it rejects (stub fallback) rather than
  * guessing. Anything else (`411`, `444alpha`, unknown tags) rejects.
  * Unknown parameter LETTERS are skipped per spec ("parameters not
  * recognized should be ignored"); malformed known ones reject.
  *
  * Frames decode to the luma plane as [[Multimodal.PgmImage]] (chroma
  * is parsed for frame framing but not retained — same grayscale
  * contract as every other codec here, and the Y plane of YCbCr IS
  * the ITU-R 601 luma the BMP/PNG/JPEG paths compute). The encoder
  * writes neutral chroma (0x80), so encode->decode round-trips luma
  * exactly.
  */
object Y4m {

  /** A decoded video: luma-plane frames plus the header metadata.
    * `fpsNum`/`fpsDen` are the F parameter's rational frame rate.
    */
  case class Y4mVideo(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      chroma: String, frames: IndexedSeq[PgmImage]) {
    /** Whole milliseconds of video (integer floor — replayable in SQL). */
    def durationMs: Long = frames.length.toLong * 1000L * fpsDen / fpsNum
  }

  // Chroma tag -> bytes of ONE chroma plane for a WxH frame, or -1 if
  // the tag (or the dims under it) are unsupported.
  private def chromaPlaneBytes(tag: String, w: Int, h: Int): Long = tag match {
    case "420" | "420jpeg" | "420mpeg2" | "420paldv" =>
      if (w % 2 != 0 || h % 2 != 0) -1L else (w.toLong / 2) * (h / 2)
    case "422" => if (w % 2 != 0) -1L else (w.toLong / 2) * h
    case "444" => w.toLong * h
    case "mono" => 0L
    case _ => -1L
  }

  // Number of chroma planes (Cb + Cr, or none for mono).
  private def chromaPlaneCount(tag: String): Int = if (tag == "mono") 0 else 2

  private val Magic = "YUV4MPEG2".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val FrameMagic = "FRAME".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  // Parse a bounded ASCII decimal (digits only, no sign) from
  // payload[from,to); returns -1 on empty/non-digit/overflow. Dims and
  // rates are header-line-bounded so Int is plenty.
  private def parseInt(payload: Array[Byte], from: Int, to: Int): Int = {
    if (from >= to) return -1
    var v = 0L
    var i = from
    while (i < to) {
      val c = payload(i)
      if (c < '0' || c > '9') return -1
      v = v * 10 + (c - '0')
      if (v > Int.MaxValue) return -1
      i += 1
    }
    v.toInt
  }

  /** Parse one Y4M stream starting at `offset`; returns the video and
    * the offset just past its last frame, or None if the bytes are not
    * a well-formed stream in the supported envelope. A header with
    * zero frames is legal per spec and returns an empty `frames`.
    */
  def decodeY4mAt(payload: Array[Byte], offset: Int): Option[(Y4mVideo, Int)] = {
    var i = offset
    if (i + Magic.length > payload.length) return None
    var m = 0
    while (m < Magic.length) {
      if (payload(i + m) != Magic(m)) return None
      m += 1
    }
    i += Magic.length
    // Stream-header line: parameters each preceded by a single 0x20,
    // terminated by 0x0A. Bound the scan — a real header is tens of
    // bytes; an unterminated multi-MB "header" is not a y4m file.
    val headerEnd = {
      var j = i
      val bound = math.min(payload.length, i + 512)
      while (j < bound && payload(j) != 0x0a) j += 1
      if (j >= bound || j >= payload.length) return None
      j
    }
    var w = -1
    var h = -1
    var fpsNum = -1
    var fpsDen = -1
    var chroma = "420" // spec default when C is absent
    while (i < headerEnd) {
      if (payload(i) != 0x20) return None // params are space-separated
      i += 1
      if (i >= headerEnd) return None // trailing space, no param
      val pStart = i
      while (i < headerEnd && payload(i) != 0x20) i += 1
      val pEnd = i
      if (pEnd == pStart) return None // double space = empty parameter
      payload(pStart) match {
        case 'W' => w = parseInt(payload, pStart + 1, pEnd); if (w <= 0) return None
        case 'H' => h = parseInt(payload, pStart + 1, pEnd); if (h <= 0) return None
        case 'F' =>
          // F<num>:<den>, both positive
          var colon = pStart + 1
          while (colon < pEnd && payload(colon) != ':') colon += 1
          if (colon >= pEnd) return None
          fpsNum = parseInt(payload, pStart + 1, colon)
          fpsDen = parseInt(payload, colon + 1, pEnd)
          if (fpsNum <= 0 || fpsDen <= 0) return None
        case 'C' =>
          chroma = new String(payload, pStart + 1, pEnd - pStart - 1,
            java.nio.charset.StandardCharsets.US_ASCII)
          // 2x2 probe: rejects unknown tags now, leaves the odd-dims
          // check to the real W/H once the whole header is parsed
          if (chromaPlaneBytes(chroma, 2, 2) < 0) return None
        case 'I' =>
          // progressive / top-field / bottom-field / mixed
          if (pEnd - pStart != 2) return None
          val c = payload(pStart + 1)
          if (c != 'p' && c != 't' && c != 'b' && c != 'm') return None
        case _ => () // A (aspect), X (extension), unknown letters: skip
      }
    }
    if (w < 0 || h < 0 || fpsNum < 0) return None // W, H, F are mandatory
    val lumaBytes = w.toLong * h
    val cPlane = chromaPlaneBytes(chroma, w, h)
    if (cPlane < 0) return None // odd dims under a subsampled tag
    val frameBytes = lumaBytes + cPlane * chromaPlaneCount(chroma)
    if (frameBytes > Int.MaxValue) return None
    i = headerEnd + 1
    val frames = Vector.newBuilder[PgmImage]
    while (i < payload.length && payload(i) == 'F') {
      // FRAME marker line (optional parameters skipped, '\n' bounded)
      if (i + FrameMagic.length > payload.length) return None
      var fm = 0
      while (fm < FrameMagic.length) {
        if (payload(i + fm) != FrameMagic(fm)) return None
        fm += 1
      }
      i += FrameMagic.length
      val lineEnd = {
        var j = i
        val bound = math.min(payload.length, i + 512)
        while (j < bound && payload(j) != 0x0a) j += 1
        if (j >= bound || j >= payload.length) return None
        j
      }
      // frame params must each start with a space (else it's not a
      // well-formed FRAME line — e.g. FRAMEX garbage)
      if (lineEnd > i && payload(i) != 0x20) return None
      i = lineEnd + 1
      if (i + frameBytes > payload.length) return None
      val px = new Array[Byte](lumaBytes.toInt)
      System.arraycopy(payload, i, px, 0, px.length)
      frames += PgmImage(w, h, 255, px)
      i += frameBytes.toInt
    }
    Some((Y4mVideo(w, h, fpsNum, fpsDen, chroma, frames.result()), i))
  }

  /** Decode a complete Y4M payload — full coverage required (zero
    * trailing bytes), same acceptance rule as every other codec's
    * container walk.
    */
  def decodeY4m(payload: Array[Byte]): Option[Y4mVideo] =
    decodeY4mAt(payload, 0) match {
      case Some((v, end)) if end == payload.length => Some(v)
      case _ => None
    }

  /** Serialize with neutral (0x80) chroma planes — luma-exact round
    * trip through [[decodeY4m]]. The header carries the video's own
    * chroma tag so format identity survives a decode->encode cycle.
    */
  def encodeY4m(v: Y4mVideo): Array[Byte] = {
    require(v.width > 0 && v.height > 0 &&
      v.width.toLong * v.height * 3 <= Int.MaxValue,
      s"encode dims out of range: ${v.width}x${v.height}")
    val cPlane = chromaPlaneBytes(v.chroma, v.width, v.height)
    require(cPlane >= 0,
      s"unsupported chroma/dims: ${v.chroma} ${v.width}x${v.height}")
    val header = s"YUV4MPEG2 W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} Ip A1:1 C${v.chroma}\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val lumaBytes = v.width * v.height
    val frameBytes = FrameMagic.length + 1 + lumaBytes +
      cPlane.toInt * chromaPlaneCount(v.chroma)
    val out = new Array[Byte](header.length + v.frames.length * frameBytes)
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    v.frames.foreach { f =>
      require(f.width == v.width && f.height == v.height,
        s"frame dims ${f.width}x${f.height} != stream dims ${v.width}x${v.height}")
      System.arraycopy(FrameMagic, 0, out, off, FrameMagic.length)
      off += FrameMagic.length
      out(off) = 0x0a
      off += 1
      System.arraycopy(f.pixels, 0, out, off, lumaBytes)
      off += lumaBytes
      var c = 0
      val cEnd = cPlane.toInt * chromaPlaneCount(v.chroma)
      while (c < cEnd) { out(off + c) = 0x80.toByte; c += 1 }
      off += cEnd
    }
    out
  }

  /** Nearest-neighbor frame-rate conversion — the video analog of
    * [[Multimodal.resampleWav]]: output frame f copies input frame
    * floor(f * inFrames / outFrames), duration preserved to the
    * millisecond floor. Frames are SHARED (PgmImage is immutable in
    * this codebase's usage), so retiming never copies pixel data.
    */
  def retimeY4m(v: Y4mVideo, newNum: Int, newDen: Int): Y4mVideo = {
    require(newNum > 0 && newDen > 0,
      s"frame rate must be positive, got $newNum:$newDen")
    if ((newNum == v.fpsNum && newDen == v.fpsDen) || v.frames.isEmpty)
      return v.copy(fpsNum = newNum, fpsDen = newDen)
    // out frames = duration * new rate, floored; Long arithmetic — a
    // large retime target must not wrap (same posture as resampleWav)
    val outFramesL = math.max(1L,
      v.frames.length.toLong * newNum * v.fpsDen / (v.fpsNum.toLong * newDen))
    require(outFramesL <= Int.MaxValue, s"retimed video too large: $outFramesL frames")
    val outFrames = outFramesL.toInt
    val out = Vector.tabulate(outFrames) { f =>
      v.frames((f.toLong * v.frames.length / outFrames).toInt)
    }
    Y4mVideo(v.width, v.height, newNum, newDen, v.chroma, out)
  }

  /** Deterministic Y4M container for a document row — the video twin
    * of [[Multimodal.syntheticWavContainer]]. Stream parameters (dims,
    * rate, chroma mode, frame count) and the luma fill derive from the
    * doc's content hash / byte length by arithmetic the
    * `multimodal_video` DuckDB oracle replays; the oracled query
    * ENCODES with this and reports what [[decodeY4m]] reads back —
    * including corner pixel values of the first and last frames — so
    * the hash gate fails if the header parse, chroma-plane sizing
    * (which shifts every later frame's offset), or frame walk
    * misreads anything.
    */
  /** Family-structured synthetic video for the video-fingerprint dedup
    * query — the video twin of `Multimodal.syntheticFamilyPng`: docs
    * sharing `baseHash` get the same multi-frame stream (dims, chroma
    * mode, frame count, and every frame's luma fill from the base-hash
    * arithmetic), and each doc derives TWO member edits from its own
    * `pertHash` — a one-pixel watermark on an ARBITRARY frame (char 3
    * picks the frame, not always 0), and a re-cut: half the members
    * drop the leading frame (char 4), the common trimmed-re-upload
    * case that a first-frame-only fingerprint is structurally blind
    * to. Frame `af`'s fill is `(c[(i+af)%32]*31 + i*7 + af*13) % 256`
    * where `af` is the PRE-trim (absolute) frame index — trimming
    * removes frames, it does not renumber the pixels — which is
    * exactly what the DuckDB oracle replays; the bytes go through the
    * REAL Y4M encoder so the consuming query exercises the
    * stream-header walk and per-chroma plane sizing (a mis-sized
    * chroma plane shifts every later frame and corrupts the decoded
    * frame count).
    */
  def syntheticFamilyY4m(baseHash: String, pertHash: String): Array[Byte] = {
    val w = 16 + (baseHash.charAt(0).toInt % 8) * 4
    val h = 16 + (baseHash.charAt(1).toInt % 8) * 4
    val chroma = (baseHash.charAt(2).toInt % 4) match {
      case 0 => "420"
      case 1 => "422"
      case 2 => "444"
      case _ => "mono"
    }
    val nFrames = baseHash.charAt(3).toInt % 4 + 2 // 2..5
    val frames = Vector.tabulate(nFrames) { f =>
      val px = new Array[Byte](w * h)
      var i = 0
      while (i < px.length) {
        px(i) = ((baseHash.charAt((i + f) % baseHash.length).toInt * 31 +
          i * 7 + f * 13) % 256).toByte
        i += 1
      }
      PgmImage(w, h, 255, px)
    }
    val wmFrame = pertHash.charAt(3).toInt % nFrames
    val ppos = (pertHash.charAt(0).toInt * 31 + pertHash.charAt(1).toInt) % (w * h)
    frames(wmFrame).pixels(ppos) =
      ((pertHash.charAt(2).toInt * 31 + ppos * 7) % 256).toByte
    val trim = pertHash.charAt(4).toInt % 2 // nFrames >= 2, so >= 1 survives
    encodeY4m(Y4mVideo(w, h, 25, 1, chroma, frames.drop(trim)))
  }

  /** Scene-STRUCTURED synthetic Y4M for temporal segmentation tests:
    * 6..9 frames partitioned into 2..3 static scenes (scene id =
    * (f * nScenes) div nFrames — pure integer arithmetic an oracle
    * replays), every frame of a scene pixel-identical, scene
    * boundaries switching the whole fill pattern. A scene-cut
    * detector must fire exactly nScenes - 1 times per clip and never
    * inside a scene. Same dim/chroma derivation as the family
    * fixture; the fill is the family formula with the SCENE id where
    * the frame index was.
    */
  def syntheticSceneY4m(contentHash: String): Array[Byte] = {
    val w = 16 + (contentHash.charAt(0).toInt % 8) * 4
    val h = 16 + (contentHash.charAt(1).toInt % 8) * 4
    val chroma = (contentHash.charAt(2).toInt % 4) match {
      case 0 => "420"
      case 1 => "422"
      case 2 => "444"
      case _ => "mono"
    }
    val nFrames = 6 + (contentHash.charAt(3).toInt % 4) // 6..9
    val nScenes = 2 + (contentHash.charAt(4).toInt % 2) // 2..3
    val frames = Vector.tabulate(nFrames) { f =>
      val scene = f * nScenes / nFrames
      val px = new Array[Byte](w * h)
      var i = 0
      while (i < px.length) {
        px(i) = ((contentHash.charAt((i + scene) % contentHash.length).toInt * 31 +
          i * 7 + scene * 13) % 256).toByte
        i += 1
      }
      PgmImage(w, h, 255, px)
    }
    encodeY4m(Y4mVideo(w, h, 25, 1, chroma, frames))
  }

  def syntheticY4mContainer(contentHash: String, nBytes: Long): Array[Byte] = {
    // dims are multiples of 4 (16..44) so every chroma mode is legal
    val w = 16 + (contentHash.charAt(0).toInt % 8) * 4
    val h = 16 + (contentHash.charAt(1).toInt % 8) * 4
    val fpsNum = 24 + (contentHash.charAt(2).toInt % 3) * 6 // 24/30/36
    val fpsDen = 1 + (nBytes % 2).toInt
    val chroma = (nBytes % 4) match {
      case 0 => "420"
      case 1 => "422"
      case 2 => "444"
      case _ => "mono"
    }
    val nFrames = (nBytes % 6 + 1).toInt
    val frames = Vector.tabulate(nFrames) { f =>
      val px = new Array[Byte](w * h)
      var i = 0
      while (i < px.length) {
        px(i) = ((contentHash.charAt((i + f) % contentHash.length).toInt * 31 +
          i * 7 + f * 13) % 256).toByte
        i += 1
      }
      PgmImage(w, h, 255, px)
    }
    encodeY4m(Y4mVideo(w, h, fpsNum, fpsDen, chroma, frames))
  }
}
