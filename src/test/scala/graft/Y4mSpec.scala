package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.PgmImage
import graft.operators.Y4m
import graft.operators.Y4m.Y4mVideo
import org.scalatest.funsuite.AnyFunSuite

/** Y4M (YUV4MPEG2) video codec: hand-built fixtures with known bytes,
  * all four chroma modes (whose plane sizes shift every later frame's
  * offset), round-trip fuzzer, retiming, hostile inputs, and the
  * Multimodal dispatch integration (features / frame split / resize).
  */
class Y4mSpec extends AnyFunSuite {

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Independent forward construction (NOT via encodeY4m): header
    * string + per-frame FRAME line + planes, so decoder tests don't
    * inherit an encoder bug.
    */
  private def rawStream(header: String, frames: Array[Byte]*): Array[Byte] =
    ascii(header) ++ frames.flatten

  test("decode a hand-built 4x2 mono stream with known pixels") {
    val y = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)
    val payload = rawStream("YUV4MPEG2 W4 H2 F25:1 Ip A1:1 Cmono\n",
      ascii("FRAME\n"), y)
    val v = Y4m.decodeY4m(payload).get
    assert(v.width == 4 && v.height == 2)
    assert(v.fpsNum == 25 && v.fpsDen == 1)
    assert(v.chroma == "mono")
    assert(v.frames.length == 1)
    assert(v.frames.head.pixel(0, 0) == 10)
    assert(v.frames.head.pixel(3, 1) == 80)
    assert(v.durationMs == 40) // 1 frame at 25 fps = 40 ms
  }

  test("420 chroma planes are skipped with the right size (multi-frame)") {
    // 4x2 420: Y=8 bytes, Cb=Cr=(2x1)=2 bytes each -> 12 bytes/frame.
    // A WRONG plane size would misalign frame 2's FRAME magic and fail
    // the full-coverage parse — so two frames decoding at all, plus
    // frame 2's pixels being right, pins the 420 layout.
    val f1y = Array.tabulate[Byte](8)(i => (i + 1).toByte)
    val f2y = Array.tabulate[Byte](8)(i => (i + 101).toByte)
    val chroma = Array.fill[Byte](4)(0x80.toByte)
    val payload = rawStream("YUV4MPEG2 W4 H2 F30:1 C420\n",
      ascii("FRAME\n"), f1y, chroma, ascii("FRAME\n"), f2y, chroma)
    val v = Y4m.decodeY4m(payload).get
    assert(v.frames.length == 2)
    assert(v.frames(0).pixel(0, 0) == 1)
    assert(v.frames(1).pixel(0, 0) == 101)
    assert(v.frames(1).pixel(3, 1) == 108)
  }

  test("422 and 444 chroma plane sizes") {
    // 4x2 422: Cb=Cr=(2x2)=4 each; 444: Cb=Cr=8 each
    val y = Array.tabulate[Byte](8)(i => i.toByte)
    val v422 = Y4m.decodeY4m(rawStream("YUV4MPEG2 W4 H2 F30:1 C422\n",
      ascii("FRAME\n"), y, Array.fill[Byte](8)(1))).get
    assert(v422.frames.length == 1 && v422.chroma == "422")
    val v444 = Y4m.decodeY4m(rawStream("YUV4MPEG2 W4 H2 F30:1 C444\n",
      ascii("FRAME\n"), y, Array.fill[Byte](16)(1))).get
    assert(v444.frames.length == 1 && v444.chroma == "444")
  }

  test("C absent defaults to 420; 420jpeg/420mpeg2/420paldv accepted") {
    val y = Array.fill[Byte](8)(7)
    val chroma = Array.fill[Byte](4)(0x80.toByte)
    val dflt = Y4m.decodeY4m(rawStream("YUV4MPEG2 W4 H2 F30:1\n",
      ascii("FRAME\n"), y, chroma)).get
    assert(dflt.chroma == "420")
    for (tag <- Seq("420jpeg", "420mpeg2", "420paldv")) {
      val v = Y4m.decodeY4m(rawStream(s"YUV4MPEG2 W4 H2 F30:1 C$tag\n",
        ascii("FRAME\n"), y, chroma)).get
      assert(v.chroma == tag, tag)
    }
  }

  test("frame parameters and unknown header parameters are skipped") {
    val y = Array.fill[Byte](8)(9)
    val v = Y4m.decodeY4m(rawStream(
      "YUV4MPEG2 W4 H2 F30:1 It A128:117 Cmono Xcustom=1 Q9\n",
      ascii("FRAME Ip X=2\n"), y)).get
    assert(v.frames.length == 1 && v.frames.head.pixel(0, 0) == 9)
  }

  test("header-only stream (zero frames) is legal") {
    val v = Y4m.decodeY4m(ascii("YUV4MPEG2 W4 H2 F30:1 Cmono\n")).get
    assert(v.frames.isEmpty && v.durationMs == 0)
  }

  test("hostile inputs reject instead of decoding garbage") {
    val y = Array.fill[Byte](8)(1)
    val good = rawStream("YUV4MPEG2 W4 H2 F30:1 Cmono\n", ascii("FRAME\n"), y)
    assert(Y4m.decodeY4m(good).isDefined) // sanity: the base is decodable
    // wrong magic
    assert(Y4m.decodeY4m(ascii("YUV4MPEG3 W4 H2 F30:1 Cmono\nFRAME\n") ++ y).isEmpty)
    // missing mandatory W / H / F
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 H2 F30:1 Cmono\n", ascii("FRAME\n"), y)).isEmpty)
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W4 F30:1 Cmono\n", ascii("FRAME\n"), y)).isEmpty)
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W4 H2 Cmono\n", ascii("FRAME\n"), y)).isEmpty)
    // zero / non-numeric / overflowing dims
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W0 H2 F30:1 Cmono\n", ascii("FRAME\n"), y)).isEmpty)
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 Wx H2 F30:1 Cmono\n", ascii("FRAME\n"), y)).isEmpty)
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W99999999999 H2 F30:1 Cmono\n",
      ascii("FRAME\n"), y)).isEmpty)
    // zero-den / malformed frame rate
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W4 H2 F30:0 Cmono\n", ascii("FRAME\n"), y)).isEmpty)
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W4 H2 F30 Cmono\n", ascii("FRAME\n"), y)).isEmpty)
    // unsupported chroma tags
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W4 H2 F30:1 C411\n", ascii("FRAME\n"), y)).isEmpty)
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W4 H2 F30:1 C444alpha\n",
      ascii("FRAME\n"), y ++ Array.fill[Byte](24)(1))).isEmpty)
    // odd dims under subsampled chroma (no well-defined plane size)
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W3 H2 F30:1 C420\n",
      ascii("FRAME\n"), Array.fill[Byte](6)(1), Array.fill[Byte](2)(1))).isEmpty)
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W3 H2 F30:1 C422\n",
      ascii("FRAME\n"), Array.fill[Byte](6)(1), Array.fill[Byte](4)(1))).isEmpty)
    // ... but odd dims are fine for mono and 444
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W3 H3 F30:1 Cmono\n",
      ascii("FRAME\n"), Array.fill[Byte](9)(1))).isDefined)
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W3 H3 F30:1 C444\n",
      ascii("FRAME\n"), Array.fill[Byte](27)(1))).isDefined)
    // truncated frame data
    assert(Y4m.decodeY4m(good.dropRight(1)).isEmpty)
    // trailing garbage after the last frame
    assert(Y4m.decodeY4m(good ++ Array[Byte](0)).isEmpty)
    assert(Y4m.decodeY4m(good ++ ascii("F")).isEmpty)
    // corrupted FRAME magic / garbage glued to it
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W4 H2 F30:1 Cmono\n",
      ascii("FRAMX\n"), y)).isEmpty)
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W4 H2 F30:1 Cmono\n",
      ascii("FRAMEX\n"), y)).isEmpty)
    // unterminated header (no newline inside the scan bound)
    assert(Y4m.decodeY4m(ascii("YUV4MPEG2 W4 H2 F30:1 " + "x" * 600)).isEmpty)
    // double space / trailing space in the header
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2  W4 H2 F30:1 Cmono\n",
      ascii("FRAME\n"), y)).isEmpty)
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W4 H2 F30:1 Cmono \n",
      ascii("FRAME\n"), y)).isEmpty)
    // bad interlace tag
    assert(Y4m.decodeY4m(rawStream("YUV4MPEG2 W4 H2 F30:1 Iz Cmono\n",
      ascii("FRAME\n"), y)).isEmpty)
  }

  test("property: encode -> decode round-trips luma exactly (all chroma modes)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val chroma = Seq("420", "422", "444", "mono")(rnd.nextInt(4))
      // even dims for subsampled modes; odd allowed otherwise
      val (w, h) = chroma match {
        case "420" => (2 + 2 * rnd.nextInt(8), 2 + 2 * rnd.nextInt(8))
        case "422" => (2 + 2 * rnd.nextInt(8), 1 + rnd.nextInt(16))
        case _ => (1 + rnd.nextInt(16), 1 + rnd.nextInt(16))
      }
      val nFrames = 1 + rnd.nextInt(4)
      val frames = Vector.fill(nFrames) {
        val px = new Array[Byte](w * h)
        rnd.nextBytes(px)
        PgmImage(w, h, 255, px)
      }
      val v = Y4mVideo(w, h, 1 + rnd.nextInt(60), 1 + rnd.nextInt(2), chroma, frames)
      val back = Y4m.decodeY4m(Y4m.encodeY4m(v)).get
      assert(back.width == w && back.height == h && back.chroma == chroma)
      assert(back.fpsNum == v.fpsNum && back.fpsDen == v.fpsDen)
      assert(back.frames.length == nFrames)
      for (f <- 0 until nFrames)
        assert(java.util.Arrays.equals(back.frames(f).pixels, frames(f).pixels),
          s"chroma=$chroma ${w}x$h frame $f")
    }
  }

  test("retimeY4m: nearest-neighbor frame selection, duration preserved") {
    val frames = Vector.tabulate(10) { f =>
      PgmImage(2, 2, 255, Array.fill[Byte](4)(f.toByte))
    }
    val v = Y4mVideo(2, 2, 10, 1, "mono", frames) // 1 second of video
    val up = Y4m.retimeY4m(v, 30, 1)
    assert(up.frames.length == 30)
    assert(up.durationMs == v.durationMs)
    // output frame f copies input floor(f * 10 / 30)
    assert(up.frames(0).pixel(0, 0) == 0)
    assert(up.frames(3).pixel(0, 0) == 1)
    assert(up.frames(29).pixel(0, 0) == 9)
    val down = Y4m.retimeY4m(v, 5, 1)
    assert(down.frames.length == 5)
    assert(down.frames(4).pixel(0, 0) == 8)
    // same-rate retime is identity; zero rate rejects at the driver
    assert(Y4m.retimeY4m(v, 10, 1).frames.length == 10)
    intercept[IllegalArgumentException](Y4m.retimeY4m(v, 0, 1))
  }

  test("synthetic container decodes with the construction parameters") {
    val hash = "0123456789abcdef0123456789abcdef"
    for (nBytes <- 0L to 13L) {
      val v = Y4m.decodeY4m(Y4m.syntheticY4mContainer(hash, nBytes)).get
      assert(v.width == 16 + (hash.charAt(0).toInt % 8) * 4)
      assert(v.height == 16 + (hash.charAt(1).toInt % 8) * 4)
      assert(v.fpsNum == 24 + (hash.charAt(2).toInt % 3) * 6)
      assert(v.fpsDen == 1 + (nBytes % 2).toInt)
      assert(v.chroma == Seq("420", "422", "444", "mono")((nBytes % 4).toInt))
      assert(v.frames.length == (nBytes % 6 + 1).toInt)
      assert(v.frames.head.pixel(0, 0) == (hash.charAt(0).toInt * 31) % 256)
    }
  }

  test("family container: shared base, arbitrary-frame watermark, re-cut trim, all chroma modes") {
    import graft.operators.Multimodal
    // base hashes chosen so char 2 walks all four chroma modes; every
    // variant must decode through the real plane-size walk
    val bhs = Seq("0103456789abcdef0123456789abcdef", // charAt(2)='0' -> 420
      "0113456789abcdef0123456789abcdef",             // '1' -> 422
      "0123456789abcdef0123456789abcdef",             // '2' -> 444
      "0133456789abcdef0123456789abcdef")             // '3' -> mono
    val modes = bhs.map { bh =>
      val nf = bh.charAt(3).toInt % 4 + 2
      val v = Y4m.decodeY4m(Y4m.syntheticFamilyY4m(bh, "aa000")).get // tm=0
      assert(v.width == 16 + (bh.charAt(0).toInt % 8) * 4)
      assert(v.frames.length == nf)
      // fill replays as (c[(i+af)%32]*31 + i*7 + af*13) % 256 away
      // from the watermark — check a frame the watermark is NOT on
      val wf = '0'.toInt % nf
      val af = if (wf == 0) 1 else 0
      val expected = (bh.charAt(af % 32).toInt * 31 + 0 * 7 + af * 13) % 256
      assert((v.frames(af).pixels(0) & 0xff) == expected)
      v.chroma
    }
    assert(modes.toSet === Set("420", "422", "444", "mono"))

    val bh = bhs.head
    val nf = bh.charAt(3).toInt % 4 + 2
    val wf = '0'.toInt % nf // both A and B use ph charAt(3) = '0'
    val a = Y4m.decodeY4m(Y4m.syntheticFamilyY4m(bh, "aa000")).get
    val b = Y4m.decodeY4m(Y4m.syntheticFamilyY4m(bh, "ab000")).get
    val c = Y4m.decodeY4m(Y4m.syntheticFamilyY4m(bh, "aa001")).get // tm=1
    assert(a.frames.length == nf && c.frames.length == nf - 1)
    // arbitrary-frame watermark: ONLY frame wf differs between members
    for (f <- 0 until nf if f != wf)
      assert(java.util.Arrays.equals(a.frames(f).pixels, b.frames(f).pixels),
        s"non-watermark frame $f differs")
    val nDiff = a.frames(wf).pixels.zip(b.frames(wf).pixels)
      .count { case (x, y) => x != y }
    assert(nDiff >= 1 && nDiff <= 2,
      s"watermark frame should differ in 1-2 pixels, got $nDiff")
    // the watermarked frames stay dHash-local (one-pixel edit)
    val (ba, bb) = (Multimodal.dhashBands(a.frames(wf)), Multimodal.dhashBands(b.frames(wf)))
    val ham = (0 until 4).map(i => Integer.bitCount(ba(i) ^ bb(i))).sum
    assert(ham <= 8, s"family members too far apart: hamming $ham")
    // re-cut: C is A minus the leading frame — frame j of the trimmed
    // clip is EXACTLY frame j+1 of the untrimmed member (same
    // watermark), the case an all-frames fingerprint must catch and a
    // frame-0-only fingerprint cannot
    for (j <- 0 until nf - 1)
      assert(java.util.Arrays.equals(c.frames(j).pixels, a.frames(j + 1).pixels),
        s"trimmed frame $j != untrimmed frame ${j + 1}")
    // determinism
    assert(java.util.Arrays.equals(Y4m.syntheticFamilyY4m(bh, "aa000"),
      Y4m.syntheticFamilyY4m(bh, "aa000")))
  }

  test("Multimodal dispatch: features, frame split, resize route video") {
    val hash = "fedcba9876543210fedcba9876543210"
    val payload = Y4m.syntheticY4mContainer(hash, 9L) // 422, 4 frames
    val v = Y4m.decodeY4m(payload).get
    assert(v.frames.length == 4)
    // features: 16-bin luma histogram over ALL frames, sums to ~1
    val feats = Multimodal.decodeFeatures(payload)
    assert(math.abs(feats.sum - 1f) < 1e-3)
    // a stub payload of the same length produces a different histogram
    // (video went through the real decoder, not the byte histogram)
    val stub = Multimodal.decodeStub(payload)
    assert(!java.util.Arrays.equals(feats, stub))
    // frame split: each emitted frame is a complete single-frame y4m
    // with the parent's header parameters
    val one = Y4m.decodeY4m(Y4m.encodeY4m(v.copy(frames = Vector(v.frames(2))))).get
    assert(one.frames.length == 1 &&
      java.util.Arrays.equals(one.frames.head.pixels, v.frames(2).pixels))
    // resize kernel: video in -> video out at the target dims, frame
    // count preserved, odd target dims fall back to 444
    val resized = Y4m.decodeY4m(Multimodal.resizeKernel(payload, 8, 6)).get
    assert(resized.width == 8 && resized.height == 6)
    assert(resized.frames.length == 4 && resized.chroma == "422")
    val odd = Y4m.decodeY4m(Multimodal.resizeKernel(payload, 7, 5)).get
    assert(odd.width == 7 && odd.chroma == "444")
  }

  test("scene fixture: frames pixel-identical inside a scene, different across boundaries") {
    for (seed <- Seq("a1b2c3d4e5f6a7b8c9d0a1b2c3d4e5f6",
        "0f1e2d3c4b5a60718293a4b5c6d7e8f9")) {
      val v = Y4m.decodeY4m(Y4m.syntheticSceneY4m(seed)).get
      val nf = 6 + (seed.charAt(3).toInt % 4)
      val ns = 2 + (seed.charAt(4).toInt % 2)
      assert(v.frames.length === nf)
      def scene(f: Int) = f * ns / nf
      for (f <- 1 until nf) {
        val same = java.util.Arrays.equals(
          v.frames(f).pixels, v.frames(f - 1).pixels)
        if (scene(f) == scene(f - 1))
          assert(same, s"seed $seed: frames $f-1/$f same scene but differ")
        else
          assert(!same, s"seed $seed: boundary $f-1/$f frames identical — no cut signal")
      }
    }
  }
}
